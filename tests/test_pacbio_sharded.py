"""Sharded PacBio reduction vs the host scorer (SURVEY section 5.8 —
the last model family without a mesh story in round 1)."""
import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from gaml_tpu.parallel.pacbio_sharded import calc_score_for_pacbio_sharded
from gaml_tpu.scoring.pacbio_score import calc_score_for_pacbio

from fixtures import make_linear_graph
from test_pacbio import PB_MATCH, make_pb_readset


@pytest.fixture
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2)])
def test_sharded_pacbio_matches_host(tmp_path, x64, mesh_shape):
    rng = np.random.default_rng(21)
    gr, seqs = make_linear_graph(rng, [900, 120, 1100, 90, 800])
    rs, _reads = make_pb_readset(tmp_path, gr, seqs, rng, n_reads=14,
                                 rlen=500, err=0.08, name=f"ps{mesh_shape[0]}")
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(mesh_shape),
                ("reads", "cand"))
    for paths in ([[0, 2, 4, 6, 8]], [[0, 2, 4], [6, 8]], [[0, 2, -30, 8]]):
        host = calc_score_for_pacbio(gr, paths, rs, no_cov_penalty=1e-4,
                                     exp_cov_move=100)
        dev = calc_score_for_pacbio_sharded(gr, paths, rs, mesh,
                                            no_cov_penalty=1e-4,
                                            exp_cov_move=100)
        assert dev[1] == host[1], paths
        assert dev[2] == host[2], paths
        assert dev[0] == pytest.approx(host[0], rel=1e-9, abs=1e-9), paths
