"""Golden regression lock: exact likelihood values on a deterministic
synthetic world.  Any change to index semantics, extension semantics,
position assembly, pair geometry, or the reductions will move these —
they are the framework's equivalent of the reference's "bit-matching
assembly likelihood" surface (SURVEY.md section 6)."""
import numpy as np
import pytest

from gaml_tpu.scoring.paired import ScoringState, calc_score_for_paths_incremental
from gaml_tpu.scoring.single import calc_score_for_paths_single

from fixtures import make_linear_graph, sample_reads
from test_scoring import make_pairs, make_readset


@pytest.fixture()
def world(tmp_path):
    rng = np.random.default_rng(777)
    gr, seqs = make_linear_graph(rng, [500, 90, 450, 70, 550])
    genome = "".join(seqs)
    m1, m2 = make_pairs(rng, genome, 30, 28, 220, 20)
    rs1 = make_readset(tmp_path, m1, "g1")
    rs2 = make_readset(tmp_path, m2, "g2")
    reads = sample_reads(rng, genome, 40, 32, err_rate=0.01)
    rs_single = make_readset(tmp_path, reads, "gs")
    return gr, rs1, rs2, rs_single


def test_golden_paired_likelihoods(world):
    gr, rs1, rs2, _ = world
    st = ScoringState()
    s_full, z_full, tl = calc_score_for_paths_incremental(
        gr, [[0, 2, 4, 6, 8]], rs1, rs2, 220, 20, st, use_all_to_cov=True)
    assert tl == 1660
    assert z_full == 0
    assert s_full == pytest.approx(-14.718422561803486, abs=1e-12)

    s_frag, z_frag, tl2 = calc_score_for_paths_incremental(
        gr, [[0, 2, 4], [6, 8]], rs1, rs2, 220, 20, st, use_all_to_cov=True)
    assert tl2 == 1660
    assert z_frag == 5
    assert s_frag == pytest.approx(-20.45910213483624, abs=1e-12)


def test_golden_single_likelihood(world):
    gr, _, _, rs_single = world
    s, z, tl = calc_score_for_paths_single(gr, [[0, 2, 4, 6, 8]], rs_single)
    assert tl == 1660
    assert z == 16
    assert s == pytest.approx(-18.836631741508608, abs=1e-12)


def test_golden_anneal_trajectory(tmp_path):
    """End-to-end fixed-seed anneal regression lock (SURVEY section 4(d)):
    the FULL trajectory — every proposal's likelihood and acceptance — is
    pinned, so any semantic drift in scorers, memos, moves, or the batched
    prefetch fails here first.  Constants regenerate by running this body
    and copying the printed values if an INTENTIONAL semantic change
    lands."""
    import hashlib

    from test_optimizer import build_world
    from gaml_tpu.optimize.anneal import Optimizer
    from gaml_tpu.optimize.settings import AssemblySettings

    gr, pc, _ = build_world(tmp_path, seed=3, n_pairs=60)
    settings = AssemblySettings(threshold=500,
                                output_prefix=str(tmp_path / "g"),
                                max_iterations=120, seed=29)
    opt = Optimizer(gr, pc, settings, longest_read=250, log=lambda *a: None)
    best = opt.run([[0, -30, 4], [8]], write_outputs=False)
    h = hashlib.sha256()
    for rec in opt.history:
        h.update(f"{rec['itnum']},{rec['new_prob']:.12f},"
                 f"{rec['accept']}".encode())
    assert opt.best_prob == pytest.approx(-15.456507968781, abs=1e-11)
    assert h.hexdigest()[:16] == "07ab4e12846341c8"
    assert best == [[9, 7, 5, 3, 1]]
