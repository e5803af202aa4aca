"""End-to-end annealing on a tiny synthetic dataset: start from fragmented
walks and verify the optimizer improves the likelihood (and ideally re-joins
the walk), with outputs and checkpoint/resume working."""
import numpy as np
import pytest

from gaml_tpu.core.io import read_fasta
from gaml_tpu.optimize.anneal import Optimizer
from gaml_tpu.optimize.checkpoint import load_checkpoint, save_checkpoint
from gaml_tpu.optimize.settings import AssemblySettings
from gaml_tpu.scoring.calculator import ProbCalculator
from gaml_tpu.scoring.readset import ReadSet
from gaml_tpu.scoring.config import PairedReadConfig

from fixtures import make_linear_graph, write_fastq
from test_scoring import MATCH, MISMATCH, make_pairs


def build_world(tmp_path, seed=0, n_pairs=40):
    rng = np.random.default_rng(seed)
    gr, seqs = make_linear_graph(rng, [700, 80, 600, 80, 800])
    genome = "".join(seqs)
    L, im, istd = 30, 250, 25
    m1, m2 = make_pairs(rng, genome, n_pairs, L, im, istd)
    f1, f2 = tmp_path / "m1.fq", tmp_path / "m2.fq"
    write_fastq(str(f1), m1)
    write_fastq(str(f2), m2)
    rs1 = ReadSet("o1", str(f1), MATCH, MISMATCH)
    rs2 = ReadSet("o2", str(f2), MATCH, MISMATCH)
    for rs in (rs1, rs2):
        rs.preprocess_reads()
        rs.prepare_read_index()
    cfg = PairedReadConfig(penalty_constant=0.0, step=im - 50.0,
                           insert_mean=im, insert_std=istd)
    pc = ProbCalculator([], [(cfg, (rs1, rs2))], [], gr)
    return gr, pc, genome


def test_optimizer_improves_fragmented_assembly(tmp_path):
    gr, pc, genome = build_world(tmp_path)
    settings = AssemblySettings(threshold=500,
                                output_prefix=str(tmp_path / "out"),
                                max_iterations=40, seed=11)
    opt = Optimizer(gr, pc, settings, longest_read=250, log=lambda *a: None)

    full_score = pc.score([[0, 2, 4, 6, 8]])
    frag_score = pc.score([[0], [4], [8]])
    assert full_score > frag_score  # sanity: joined walk is better

    best = opt.run([[0], [4], [8]])
    assert opt.best_prob > frag_score
    # outputs exist and spell the best walks
    fa = read_fasta(str(tmp_path / "out.fasta"))
    assert len(fa) == len(best)
    assert (tmp_path / "out.onlylarge.fasta").exists()
    assert (tmp_path / "out.walks").exists()


def test_optimizer_checkpoint_resume(tmp_path):
    gr, pc, _ = build_world(tmp_path, seed=1, n_pairs=25)
    settings = AssemblySettings(threshold=500,
                                output_prefix=str(tmp_path / "o1"),
                                max_iterations=6, seed=5)
    opt = Optimizer(gr, pc, settings, longest_read=250, log=lambda *a: None)
    opt.prepare()
    paths = [[0], [4], [8]]
    opt.cur_prob, _ = pc.calc_prob(paths)
    opt.best_prob = opt.cur_prob
    opt.best_paths = [list(p) for p in paths]
    for _ in range(3):
        paths = opt.step(paths, write_outputs=False)
    save_checkpoint(opt, paths, str(tmp_path / "ck"))
    snap = (opt.itnum, opt.cur_prob, opt.best_prob,
            [list(p) for p in paths])

    # continue original
    paths_a = [list(p) for p in paths]
    for _ in range(3):
        paths_a = opt.step(paths_a, write_outputs=False)
    final_a = (opt.itnum, opt.cur_prob, opt.best_prob, paths_a)

    # fresh world resumed from checkpoint must replay identically
    gr2, pc2, _ = build_world(tmp_path, seed=1, n_pairs=25)
    opt2 = Optimizer(gr2, pc2, settings, longest_read=250, log=lambda *a: None)
    opt2.prepare()
    paths_b = load_checkpoint(opt2, str(tmp_path / "ck"))
    assert (opt2.itnum, opt2.cur_prob, opt2.best_prob, paths_b) == snap
    for _ in range(3):
        paths_b = opt2.step(paths_b, write_outputs=False)
    final_b = (opt2.itnum, opt2.cur_prob, opt2.best_prob, paths_b)
    assert final_a[0] == final_b[0]
    assert final_a[1] == pytest.approx(final_b[1], abs=1e-12)
    assert final_a[3] == final_b[3]


def test_score_batch_trajectory_identical(tmp_path):
    """The multi-candidate window prefetch (ProbCalculator.score_batch,
    used by local_change2) must leave the annealing trajectory
    bit-identical to plain sequential scoring."""

    class _NoBatch:
        """Delegate that hides score_batch so moves fall back."""

        def __init__(self, pc):
            self._pc = pc

        def calc_prob(self, paths, zeros=None):
            return self._pc.calc_prob(paths, zeros)

        def score(self, paths):
            return self._pc.score(paths)

    histories = []
    batch_calls = [0]
    for wrap in (False, True):
        gr, pc, _ = build_world(tmp_path, seed=9, n_pairs=40)
        if not wrap:
            orig = pc.score_batch

            def counted(cands, _orig=orig):
                batch_calls[0] += 1
                return _orig(cands)

            pc.score_batch = counted
        settings = AssemblySettings(threshold=500,
                                    output_prefix=str(tmp_path / "sb"),
                                    max_iterations=60, seed=23)
        opt = Optimizer(gr, _NoBatch(pc) if wrap else pc, settings,
                        longest_read=250, log=lambda *a: None)
        # force gap entries so local windows delegate to local_change2
        opt.run([[0, -25, 4], [8]], write_outputs=False)
        histories.append([(h["itnum"], h["new_prob"], h["cur_prob"])
                          for h in opt.history])
    assert histories[0] == histories[1]
    assert batch_calls[0] > 0, "local_change2 never used score_batch"
