"""Deeper move-engine behavior: guided reroutes, repeat interchange,
gap-length fitting, advice joins — with real scorers in the loop."""
import numpy as np
import pytest

from gaml_tpu.core import dna
from gaml_tpu.core.graph import Graph
from gaml_tpu.moves.gaps import fix_gap_length
from gaml_tpu.moves.repeats import fix_rep_for_node2, fix_some_big_reps
from gaml_tpu.moves.structural import local_change2
from gaml_tpu.scoring.calculator import ProbCalculator
from gaml_tpu.scoring.config import PairedReadConfig
from gaml_tpu.utils.rng import GamlRng

from fixtures import make_linear_graph, random_seq, write_fastq
from test_scoring import MATCH, MISMATCH, make_pairs, make_readset


def paired_world(tmp_path, rng, node_lens, n_pairs=30, L=28, im=220, istd=20,
                 name="w"):
    gr, seqs = make_linear_graph(rng, node_lens)
    genome = "".join(seqs)
    m1, m2 = make_pairs(rng, genome, n_pairs, L, im, istd)
    rs1 = make_readset(tmp_path, m1, name + "1")
    rs2 = make_readset(tmp_path, m2, name + "2")
    cfg = PairedReadConfig(step=im - 50.0, insert_mean=im, insert_std=istd)
    pc = ProbCalculator([], [(cfg, (rs1, rs2))], [], gr)
    return gr, pc, genome, seqs


def test_fix_gap_length_converges_to_true_gap(tmp_path):
    """A walk with a wrong gap length: hill-climbing should move the gap
    toward the value that matches the insert-size evidence."""
    rng = np.random.default_rng(0)
    gr, seqs = make_linear_graph(rng, [600, 700])
    true_gap = 120
    genome = seqs[0] + random_seq(rng, true_gap) + seqs[1]
    m1, m2 = make_pairs(rng, genome, 40, 28, 300, 15)
    rs1 = make_readset(tmp_path, m1, "fg1")
    rs2 = make_readset(tmp_path, m2, "fg2")
    cfg = PairedReadConfig(step=250.0, insert_mean=300, insert_std=15)
    pc = ProbCalculator([], [(cfg, (rs1, rs2))], [], gr)

    paths = [[0, -40, 2]]  # start with a too-short gap
    fix_gap_length(paths, 0, 1, pc, -1)
    fitted = -paths[0][1]
    assert abs(fitted - true_gap) <= 30, fitted


def test_repeat_interchange_splits_wrong_join(tmp_path):
    """Two copies of a repeat node joined the wrong way: the interchange
    move must find the tail swap that restores the true arrangement."""
    rng = np.random.default_rng(1)
    # genome: A R B ... C R D with repeat R *shorter than the insert* so
    # read pairs bridge across it (the only way short-insert data can
    # resolve a repeat)
    a, r, b, c, d = (random_seq(rng, 600), random_seq(rng, 260),
                     random_seq(rng, 600), random_seq(rng, 650),
                     random_seq(rng, 620))
    gr = Graph()
    ids = {}
    for nm, s in (("a", a), ("r", r), ("b", b), ("c", c), ("d", d)):
        ids[nm] = gr.add_node_pair(dna.encode_seq(s))
    gr.add_arc(ids["a"], ids["r"])
    gr.add_arc(ids["r"], ids["b"])
    gr.add_arc(ids["c"], ids["r"])
    gr.add_arc(ids["r"], ids["d"])
    gr.calc_prob_sums()
    gr.calc_normalize_map()
    genome = a + r + b + "NNNNNNNNNN" + c + r + d  # two loci sharing R
    im, istd, L = 400, 30, 30
    # pairs within each locus only
    m1a, m2a = make_pairs(rng, a + r + b, 40, L, im, istd)
    m1b, m2b = make_pairs(rng, c + r + d, 40, L, im, istd)
    rs1 = make_readset(tmp_path, m1a + m1b, "ri1")
    rs2 = make_readset(tmp_path, m2a + m2b, "ri2")
    cfg = PairedReadConfig(step=im - 50.0, insert_mean=im, insert_std=istd)
    pc = ProbCalculator([], [(cfg, (rs1, rs2))], [], gr)

    good = [[ids["a"], ids["r"], ids["b"]], [ids["c"], ids["r"], ids["d"]]]
    bad = [[ids["a"], ids["r"], ids["d"]], [ids["c"], ids["r"], ids["b"]]]
    s_good = pc.score(good)
    s_bad = pc.score(bad)
    assert s_good > s_bad

    paths = [list(p) for p in bad]
    fix_rep_for_node2(paths, gr, 500, False, ids["r"], pc)
    assert pc.score(paths) >= s_good - 1e-9


def test_fix_rep_prefetch_trajectory_identical(tmp_path, monkeypatch):
    """The round-level union prefetch in fix_rep_for_node2 must leave the
    hill-climb trajectory bit-identical to unprefetched sequential
    scoring: same score sequence, same final walks — only the aligner
    dispatch count changes (one batched call per round)."""
    rng = np.random.default_rng(1)
    a, r, b, c, d = (random_seq(rng, 600), random_seq(rng, 260),
                     random_seq(rng, 600), random_seq(rng, 650),
                     random_seq(rng, 620))
    gr = Graph()
    ids = {}
    for nm, s in (("a", a), ("r", r), ("b", b), ("c", c), ("d", d)):
        ids[nm] = gr.add_node_pair(dna.encode_seq(s))
    gr.add_arc(ids["a"], ids["r"])
    gr.add_arc(ids["r"], ids["b"])
    gr.add_arc(ids["c"], ids["r"])
    gr.add_arc(ids["r"], ids["d"])
    gr.calc_prob_sums()
    gr.calc_normalize_map()
    im, istd, L = 400, 30, 30
    m1a, m2a = make_pairs(rng, a + r + b, 40, L, im, istd)
    m1b, m2b = make_pairs(rng, c + r + d, 40, L, im, istd)
    cfg = PairedReadConfig(step=im - 50.0, insert_mean=im, insert_std=istd)
    bad = [[ids["a"], ids["r"], ids["d"]], [ids["c"], ids["r"], ids["b"]]]

    def run(prefetch_on: bool, tag: str):
        rs1 = make_readset(tmp_path, m1a + m1b, f"tp1{tag}")
        rs2 = make_readset(tmp_path, m2a + m2b, f"tp2{tag}")
        pc = ProbCalculator([], [(cfg, (rs1, rs2))], [], gr)
        if not prefetch_on:
            pc.prefetch_candidates = None  # getattr -> None disables
        scores = []
        real_score = ProbCalculator.score

        def spy(self, paths):
            s = real_score(self, paths)
            scores.append(s)
            return s

        monkeypatch.setattr(ProbCalculator, "score", spy)
        try:
            paths = [list(p) for p in bad]
            fix_rep_for_node2(paths, gr, 500, False, ids["r"], pc)
        finally:
            monkeypatch.setattr(ProbCalculator, "score", real_score)
        return scores, paths

    scores_pf, paths_pf = run(True, "a")
    scores_seq, paths_seq = run(False, "b")
    assert scores_pf == scores_seq
    assert paths_pf == paths_seq


def test_local_change2_rebuilds_junction(tmp_path):
    """Detach/rebuild between two long anchors chooses the graph route
    supported by the reads."""
    rng = np.random.default_rng(2)
    gr = Graph()
    sA = random_seq(rng, 600)
    s1 = random_seq(rng, 100)
    s2 = random_seq(rng, 100)
    sB = random_seq(rng, 700)
    for s in (sA, s1, s2, sB):
        gr.add_node_pair(dna.encode_seq(s))
    gr.add_arc(0, 2)
    gr.add_arc(0, 4)
    gr.add_arc(2, 6)
    gr.add_arc(4, 6)
    gr.calc_prob_sums()
    gr.calc_normalize_map()
    gr.calc_reachability_limit(500)
    genome = sA + s1 + sB  # truth goes through node 2
    m1, m2 = make_pairs(rng, genome, 40, 28, 300, 20)
    rs1 = make_readset(tmp_path, m1, "lc1")
    rs2 = make_readset(tmp_path, m2, "lc2")
    cfg = PairedReadConfig(step=250.0, insert_mean=300, insert_std=20)
    pc = ProbCalculator([], [(cfg, (rs1, rs2))], [], gr)

    rng_m = GamlRng(5)
    successes = 0
    through_true = 0
    for _ in range(10):
        paths = [[0, 4, 6]]  # wrong route
        if local_change2(paths, gr, 500, 0, 0, 2, pc, rng_m):
            successes += 1
            if 2 in paths[0]:
                through_true += 1
    assert successes >= 3
    assert through_true >= 1


def test_advice_join_uses_mate_evidence(tmp_path):
    """Paired advice: mate-1 anchored at a walk end + mate-2's advice index
    proposes joining the right next long node."""
    from gaml_tpu.moves.advice import extend_paths_adv_paired

    rng = np.random.default_rng(3)
    gr, pc, genome, seqs = paired_world(
        tmp_path, rng, [700, 80, 800], n_pairs=60, L=30, im=400, istd=30,
        name="adv")
    gr.calc_reachability_limit(800)
    (cfg, (rs1, rs2)), = pc.paired_reads

    rng_m = GamlRng(9)
    joined = False
    for _ in range(30):
        paths = [[0], [4]]
        if extend_paths_adv_paired(paths, gr, 500, rs1, rs2, 47, pc, rng_m):
            flat = [abs(e) for p in paths for e in p if e >= 0]
            if len(paths) == 1 and 0 in [e & ~1 for e in flat] and \
                    4 in [e & ~1 for e in flat]:
                joined = True
                break
    assert joined


def test_fix_some_big_reps_noop_without_repeats(tmp_path):
    rng = np.random.default_rng(4)
    gr, pc, _, _ = paired_world(tmp_path, rng, [600, 80, 700], name="nr")
    paths = [[0, 2, 4]]
    assert not fix_some_big_reps(paths, gr, 500, False, pc, GamlRng(1))
