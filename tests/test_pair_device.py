"""Device paired pair-product vs the host paired scorer."""
import numpy as np
import pytest

import jax.numpy as jnp

from gaml_tpu.ops.pair import paired_score_device, stage_positions_dense
from gaml_tpu.scoring.paired import calc_score_for_paths_paired

from fixtures import make_linear_graph
from test_scoring import MATCH, MISMATCH, make_pairs, make_readset


def test_device_paired_matches_host(tmp_path):
    rng = np.random.default_rng(0)
    gr, seqs = make_linear_graph(rng, [500, 90, 450])
    genome = "".join(seqs)
    L, im, istd = 28, 220, 20
    m1, m2 = make_pairs(rng, genome, 40, L, im, istd)
    rs1 = make_readset(tmp_path, m1, "dp1")
    rs2 = make_readset(tmp_path, m2, "dp2")

    host_score, host_zero, tl = calc_score_for_paths_paired(
        gr, [[0, 2, 4]], rs1, rs2, im, istd)
    # reuse the exact positions the host scorer assembled
    pos1, ed1, or1, d1 = stage_positions_dense(rs1.positions, 40)
    pos2, ed2, or2, d2 = stage_positions_dense(rs2.positions, 40)
    assert d1 == 0 and d2 == 0
    lens1 = np.full(40, L, np.int32)
    lens2 = np.full(40, L, np.int32)
    score, zero, _probs = paired_score_device(
        jnp.asarray(pos1), jnp.asarray(ed1), jnp.asarray(or1),
        jnp.asarray(lens1), jnp.asarray(pos2), jnp.asarray(ed2),
        jnp.asarray(or2), jnp.asarray(lens2),
        float(np.log(MATCH)), float(np.log(MISMATCH)), float(im), float(istd),
        tl, -0.7, -10.0)
    assert int(zero) == host_zero
    assert float(score) == pytest.approx(host_score, rel=1e-5)
