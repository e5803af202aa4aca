"""Device-resident candidate generation (ops.candgen_device) must
reproduce the native max-hash window query bit-for-bit: same candidates,
same emission order (reference GetReadCandsWithPoses + rid-stable sort,
graph.cc:1289-1348)."""
import numpy as np
import pytest

from gaml_tpu.core import dna
from gaml_tpu.index.maxhash import K_INDEX_KMER
from gaml_tpu.native import (NativeAlignBundle, get_lib,
                             query_windows_batch, read_index_build)
from gaml_tpu.ops.candgen_device import DeviceCandGen

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native library unavailable")


def make_bundle(reads: np.ndarray):
    n_reads, read_len = reads.shape
    fp, ok_m, _k, _rc, seed_pos = read_index_build(reads, K_INDEX_KMER)
    okb = ok_m.astype(bool)
    rids = np.arange(n_reads, dtype=np.int64)[okb]
    fps_ok = fp[okb]
    order = np.argsort(fps_ok, kind="stable")
    sf, sr = fps_ok[order], rids[order]
    index = {}
    if len(sf):
        bounds = np.nonzero(np.diff(sf))[0] + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(sf)]))
        for s, e in zip(starts.tolist(), ends.tolist()):
            index[int(sf[s])] = sr[s:e].tolist()
    codes_rc = dna._COMP_LUT[reads][:, ::-1]
    row_of = np.arange(n_reads, dtype=np.int32)
    return NativeAlignBundle(index, read_len, reads, codes_rc, seed_pos,
                             row_of)


def sample_world(seed=0, genome_len=3000, n_reads=300, read_len=40,
                 err=0.02, with_n=False):
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, genome_len).astype(np.uint8)
    if with_n:
        genome[rng.integers(0, genome_len, 5)] = 4
    reads = np.empty((n_reads, read_len), dtype=np.uint8)
    starts = rng.integers(0, genome_len - read_len + 1, n_reads)
    for i in range(n_reads):
        reads[i] = genome[starts[i]:starts[i] + read_len]
    errs = rng.random(reads.shape) < err
    reads[errs] = (reads[errs] + rng.integers(1, 4, int(errs.sum()))) % 4
    flip = np.nonzero(rng.random(n_reads) < 0.5)[0]
    for i in flip.tolist():
        reads[i] = dna.revcomp(reads[i])
    return genome, reads


def check_windows(bundle, windows):
    dev = DeviceCandGen(bundle)
    got = dev.query_host(windows)
    want = query_windows_batch(bundle, windows)
    assert len(got) == len(want)
    for i, (g, wnt) in enumerate(zip(got, want)):
        for name, a, b in zip(("rid", "g0", "r0", "orient"), g, wnt):
            np.testing.assert_array_equal(a, b, err_msg=f"win {i} {name}")


def test_single_window_matches_native():
    genome, reads = sample_world()
    check_windows(make_bundle(reads), [genome])


def test_multi_segment_batch_matches_native():
    genome, reads = sample_world(seed=3, genome_len=5000)
    bundle = make_bundle(reads)
    wins = [genome[:1200], genome[900:2500], genome[2400:],
            genome[::-1].copy(), genome[:37]]  # incl. one shorter than L
    check_windows(bundle, wins)


def test_window_with_n_codes_matches_native():
    genome, reads = sample_world(seed=5, with_n=True)
    check_windows(make_bundle(reads), [genome, genome[100:900]])


def test_repeat_heavy_window_matches_native():
    # tandem repeats force equal-fingerprint runs, ties in the window
    # max, and multi-read fingerprint buckets
    rng = np.random.default_rng(9)
    unit = rng.integers(0, 4, 90).astype(np.uint8)
    genome = np.tile(unit, 30)
    reads = np.empty((120, 40), dtype=np.uint8)
    starts = rng.integers(0, len(genome) - 40 + 1, 120)
    for i in range(120):
        reads[i] = genome[starts[i]:starts[i] + 40]
    check_windows(make_bundle(reads), [genome, genome[:271]])


def test_overflow_retry_returns_full_set():
    genome, reads = sample_world(seed=7)
    bundle = make_bundle(reads)
    dev = DeviceCandGen(bundle)
    want = query_windows_batch(bundle, [genome])
    got = dev.query_host([genome], cap=16)  # force the retry loop
    for a, b in zip(got[0], want[0]):
        np.testing.assert_array_equal(a, b)
