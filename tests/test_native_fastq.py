"""Native FASTQ parser vs the Python reader."""
import numpy as np
import pytest

from gaml_tpu import native
from gaml_tpu.core import dna
from gaml_tpu.core.io import iter_fastq

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native lib unavailable")


def test_native_fastq_matches_python(tmp_path):
    fq = tmp_path / "t.fq"
    fq.write_text(
        "@read1 extra stuff\nACGTACGTAC\n+\nIIIIIIIIII\n"
        "@read2\nTTTTNGGGG\n+\nIIIIIIIII\n"
        "@read3\ttabbed\nACGT\n+\nIIII\n")
    res = native.read_fastq_arrays(str(fq))
    assert res is not None
    buf, off, names = res
    py = list(iter_fastq(str(fq)))
    assert names == [n for n, _ in py]
    for i, (_n, seq) in enumerate(py):
        np.testing.assert_array_equal(buf[off[i]:off[i + 1]],
                                      dna.encode_seq(seq))


def test_native_fastq_missing_file():
    assert native.read_fastq_arrays("/nonexistent/x.fq") is None
