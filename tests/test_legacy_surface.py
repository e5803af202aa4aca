"""Legacy/auxiliary reference surface: slow uncached positions, legacy
paired scorer, exact PacBio probabilities, optimizer metrics/JSONL."""
import json

import numpy as np
import pytest

from gaml_tpu.scoring.paired import calc_score_for_path_paired_legacy
from gaml_tpu.scoring.single import calc_score_for_path_legacy

from fixtures import make_linear_graph, random_seq, sample_reads, write_fastq
from test_scoring import MATCH, MISMATCH, make_pairs, make_readset


def test_get_positions_slow_matches_cached_single_window(tmp_path):
    rng = np.random.default_rng(0)
    gr, seqs = make_linear_graph(rng, [280])
    reads = sample_reads(rng, seqs[0], 15, 30, err_rate=0.0)
    rs = make_readset(tmp_path, reads, "slow")
    pos_slow, tl_slow = rs.get_positions_slow(gr, [0])
    rs2 = make_readset(tmp_path, reads, "cached")
    pos_cached, tl_cached = rs2.get_positions(gr, [0])
    assert tl_slow == tl_cached
    assert pos_slow == pos_cached


def test_legacy_single_scorer_runs(tmp_path):
    rng = np.random.default_rng(1)
    gr, seqs = make_linear_graph(rng, [300])
    reads = sample_reads(rng, seqs[0], 10, 30, err_rate=0.0)
    rs = make_readset(tmp_path, reads, "leg1")
    score = calc_score_for_path_legacy(gr, [0], rs)
    # log10 reduction of m^L/(2*300)
    import math

    expected = math.log10(MATCH ** 30 / (2 * 300))
    assert score == pytest.approx(expected, rel=1e-9)


def test_legacy_paired_scorer_distance_convention(tmp_path):
    rng = np.random.default_rng(2)
    gr, seqs = make_linear_graph(rng, [500])
    genome = seqs[0]
    L, im, istd = 30, 100, 10
    # place mates at known positions; legacy dist = far-near-nearlen
    m1, m2 = make_pairs(rng, genome, 10, L, im + L, istd)
    rs1 = make_readset(tmp_path, m1, "lp1")
    rs2 = make_readset(tmp_path, m2, "lp2")
    score = calc_score_for_path_paired_legacy(gr, [0], rs1, rs2, im, istd)
    assert np.isfinite(score)


def test_exact_pacbio_probabilities(tmp_path):
    from gaml_tpu.scoring.pacbio import PacbioReadSet
    from gaml_tpu.core import dna
    from test_forward_kernel import noisy_copy

    rng = np.random.default_rng(3)
    gr, seqs = make_linear_graph(rng, [400, 80, 400])
    genome = "".join(seqs)
    reads = []
    for _ in range(5):
        p = int(rng.integers(0, 300))
        r = noisy_copy(rng, dna.encode_seq(genome[p:p + 450]), err=0.08)
        reads.append(dna.decode_seq(r))
    fq = tmp_path / "pb.fq"
    write_fastq(str(fq), reads, prefix="pb")
    rs = PacbioReadSet(str(tmp_path / "pbex"), str(fq), 0.85, 0.05)
    rs.preprocess_reads()
    rs.compute_anchors(gr, persist=False)
    positions, tl, tl2 = rs.get_exact_read_probabilities(gr, [0, 2, 4], ps=2)
    assert tl == len(genome)
    assert tl2 <= tl
    assert any(positions[i] for i in range(len(reads)))


def test_optimizer_metrics_and_jsonl(tmp_path):
    from gaml_tpu.optimize.anneal import Optimizer
    from gaml_tpu.optimize.settings import AssemblySettings
    from gaml_tpu.scoring.calculator import ProbCalculator
    from gaml_tpu.scoring.config import PairedReadConfig

    rng = np.random.default_rng(4)
    gr, seqs = make_linear_graph(rng, [600, 80, 700])
    genome = "".join(seqs)
    m1, m2 = make_pairs(rng, genome, 15, 25, 200, 20)
    rs1 = make_readset(tmp_path, m1, "j1")
    rs2 = make_readset(tmp_path, m2, "j2")
    cfg = PairedReadConfig(step=150.0, insert_mean=200, insert_std=20)
    pc = ProbCalculator([], [(cfg, (rs1, rs2))], [], gr)
    jsonl = tmp_path / "hist.jsonl"
    settings = AssemblySettings(threshold=500, max_iterations=3,
                                output_prefix=str(tmp_path / "mx"), seed=1)
    opt = Optimizer(gr, pc, settings, longest_read=200,
                    log=lambda *a: None, history_jsonl=str(jsonl))
    opt.run([[0], [4]])
    snap = opt.metrics.snapshot()
    assert snap["rescore.calls"] >= 3
    lines = [json.loads(l) for l in jsonl.read_text().splitlines()]
    assert len(lines) >= 3
    assert all("new_prob" in r for r in lines)
