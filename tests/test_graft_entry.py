import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    score, zeros, read_probs = jax.jit(fn)(*args)
    assert np.isfinite(float(score))
    assert int(zeros) == 0  # exact synthetic reads all align
    assert np.all(np.asarray(read_probs) > 0)


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
    ge.dryrun_multichip(4)
