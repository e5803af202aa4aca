import math

import numpy as np
import pytest

from gaml_tpu.core import dna
from gaml_tpu.core.logprob import gaussian_pdf
from gaml_tpu.scoring.paired import (
    ScoringState,
    calc_score_for_paths_incremental,
    calc_score_for_paths_paired,
    get_changes,
)
from gaml_tpu.scoring.readset import ReadSet
from gaml_tpu.scoring.single import calc_score_for_paths_single

from fixtures import make_linear_graph, random_seq, sample_reads, write_fastq

MATCH = 1.0 - 4 * 0.01
MISMATCH = 0.01


def make_readset(tmp_path, reads, name="rs"):
    fq = tmp_path / f"{name}.fastq"
    write_fastq(str(fq), reads)
    rs = ReadSet(name, str(fq), MATCH, MISMATCH)
    rs.preprocess_reads()
    rs.prepare_read_index()
    return rs


def test_get_changes_multiset():
    old = [[1, 2], [3], [3]]
    new = [[1, 2], [3], [4, 5]]
    erased, added = get_changes(new, old)
    assert erased == [[3]]
    assert added == [[4, 5]]
    # duplicated walks counted as multiset
    erased, added = get_changes([[3], [3], [3]], [[3]])
    assert erased == [] and added == [[3], [3]]


def test_single_scorer_exact_reads(tmp_path):
    rng = np.random.default_rng(10)
    gr, seqs = make_linear_graph(rng, [400])
    genome = seqs[0]
    L = 30
    reads = sample_reads(rng, genome, 20, L, err_rate=0.0)
    rs = make_readset(tmp_path, reads)
    score, zero, total_len = calc_score_for_paths_single(gr, [[0]], rs)
    assert total_len == 400
    assert zero == 0
    # every exact read aligns once with 0 errors: prob = m^L / (2*total_len)
    expected = math.log(MATCH ** L / (2 * 400))
    assert score == pytest.approx(expected, rel=1e-12)


def test_single_scorer_with_errors(tmp_path):
    rng = np.random.default_rng(11)
    gr, seqs = make_linear_graph(rng, [500])
    genome = seqs[0]
    L = 40
    reads = sample_reads(rng, genome, 30, L, err_rate=0.02)
    rs = make_readset(tmp_path, reads)
    score, zero, total_len = calc_score_for_paths_single(gr, [[0]], rs)
    # Lower bound: a read is discoverable at its planted position only when
    # its (error-bearing) max-hash fingerprint equals the genome window's —
    # an error on the max k-mer legitimately hides the read (max-hash
    # semantics, graph.cc:1289-1323).  Extra alignment positions only add
    # probability, so the real score is >= this bound.
    from gaml_tpu.index.maxhash import maxhash_of_read, window_max_fingerprints

    g_codes = dna.encode_seq(genome)
    fps = {}
    for mh, _pos in window_max_fingerprints(g_codes, L):
        fps.setdefault(mh, True)
    rc_fps = {}
    for mh, _pos in window_max_fingerprints(dna.revcomp(g_codes), L):
        rc_fps.setdefault(mh, True)
    probs_lb = np.zeros(len(reads))
    for i, r in enumerate(reads):
        mh = maxhash_of_read(dna.encode_seq(r))
        if mh in fps or mh in rc_fps:
            ed_best = 4
            for orient_seq in (r, dna.revcomp_str(r)):
                for p in range(len(genome) - L + 1):
                    ed = sum(1 for a, b in zip(orient_seq, genome[p:p + L]) if a != b)
                    ed_best = min(ed_best, ed)
            if ed_best <= 3:
                probs_lb[i] = MISMATCH ** ed_best * MATCH ** (L - ed_best)
    thresh = math.exp(-10 + -0.7 * L)
    lb = float(np.mean(np.log(np.maximum(probs_lb / (2 * 500), thresh))))
    assert score >= lb - 1e-9
    # and the score can't beat the every-read-exact upper bound by much
    # (indel alignments can add tiny extra mass at shifted positions)
    ub = math.log(MATCH ** L / (2 * 500))
    assert score <= ub + 0.01
    assert zero < len(reads)


def test_single_scorer_walk_equals_contig(tmp_path):
    """Scoring a multi-node walk == scoring its spelled sequence."""
    rng = np.random.default_rng(12)
    gr, seqs = make_linear_graph(rng, [200, 150, 250])
    genome = "".join(seqs)
    L = 30
    reads = sample_reads(rng, genome, 40, L, err_rate=0.01)
    rs1 = make_readset(tmp_path, reads, "multi")
    score_multi, _, tl_multi = calc_score_for_paths_single(gr, [[0, 2, 4]], rs1)

    gr2, _ = make_linear_graph(rng, [1])
    gr2.seqs[0] = dna.encode_seq(genome)
    gr2.seqs[1] = dna.revcomp(dna.encode_seq(genome))
    rs2 = make_readset(tmp_path, reads, "flat")
    score_flat, _, tl_flat = calc_score_for_paths_single(gr2, [[0]], rs2)
    assert tl_multi == tl_flat == len(genome)
    assert score_multi == pytest.approx(score_flat, rel=1e-9)


def make_pairs(rng, genome, n, rlen, insert_mean, insert_std):
    """Innie pairs: mate1 forward at p, mate2 = revcomp at p+insert-rlen."""
    m1, m2 = [], []
    for _ in range(n):
        ins = int(rng.normal(insert_mean, insert_std))
        ins = max(2 * rlen, min(ins, len(genome)))
        p = int(rng.integers(0, len(genome) - ins + 1))
        m1.append(genome[p:p + rlen])
        m2.append(dna.revcomp_str(genome[p + ins - rlen:p + ins]))
    return m1, m2


def test_paired_full_scorer(tmp_path):
    rng = np.random.default_rng(13)
    gr, seqs = make_linear_graph(rng, [600])
    genome = seqs[0]
    L, im, istd = 30, 200, 10
    m1, m2 = make_pairs(rng, genome, 15, L, im, istd)
    rs1 = make_readset(tmp_path, m1, "p1")
    rs2 = make_readset(tmp_path, m2, "p2")
    score, zero, total_len = calc_score_for_paths_paired(
        gr, [[0]], rs1, rs2, im, istd)
    assert total_len == 600
    # manual: each pair has one innie combination, p = m^L * m^L * pdf(dist)
    # dist = pos2 - pos1 + L = insert size
    probs = np.zeros(15)
    for i in range(15):
        p1 = genome.find(m1[i])
        p2 = genome.find(dna.revcomp_str(m2[i]))
        dist = (p2 + L) - p1
        probs[i] = (MATCH ** L) * (MATCH ** L) * float(gaussian_pdf(dist, im, istd))
    thresh = math.exp(-10 + -0.7 * 2 * L)
    expected = float(np.mean(np.log(np.maximum(probs / (2 * 600), thresh))))
    assert score == pytest.approx(expected, rel=1e-9)


def test_incremental_matches_fresh_state(tmp_path):
    """Incremental scoring after a sequence of walk edits must equal a
    fresh-state rescore of the same walks (the reference's commented-out
    differential check, prob_calculator.h:80-95, made real)."""
    rng = np.random.default_rng(14)
    gr, seqs = make_linear_graph(rng, [300, 80, 300, 80, 300])
    genome = "".join(seqs)
    L, im, istd = 25, 150, 15
    m1, m2 = make_pairs(rng, genome, 25, L, im, istd)
    rs1 = make_readset(tmp_path, m1, "i1")
    rs2 = make_readset(tmp_path, m2, "i2")

    state = ScoringState()
    walk_sets = [
        [[0, 2, 4, 6, 8]],
        [[0, 2, 4], [6, 8]],
        [[0, 2, 4], [8]],
        [[0, 2, 4, 6, 8]],
        [[4, 6, 8], [0], [2]],
        [[0, 2, 4, 6, 8]],
    ]
    for ws in walk_sets:
        inc_score, inc_zero, inc_tl = calc_score_for_paths_incremental(
            gr, ws, rs1, rs2, im, istd, state, use_all_to_cov=True)
        fresh = ScoringState()
        ref_score, ref_zero, ref_tl = calc_score_for_paths_incremental(
            gr, ws, rs1, rs2, im, istd, fresh, use_all_to_cov=True)
        assert inc_tl == ref_tl
        assert inc_zero == ref_zero
        assert inc_score == pytest.approx(ref_score, abs=1e-9)


def test_incremental_close_to_full(tmp_path):
    """With all nodes <= 300 bp (no window trimming) the incremental and
    full paired scorers see identical alignments and must agree exactly."""
    rng = np.random.default_rng(15)
    gr, seqs = make_linear_graph(rng, [250, 100, 280])
    genome = "".join(seqs)
    L, im, istd = 25, 150, 15
    m1, m2 = make_pairs(rng, genome, 20, L, im, istd)
    rs1 = make_readset(tmp_path, m1, "f1")
    rs2 = make_readset(tmp_path, m2, "f2")
    state = ScoringState()
    inc, _, _ = calc_score_for_paths_incremental(
        gr, [[0, 2, 4]], rs1, rs2, im, istd, state, use_all_to_cov=True)
    full, _, _ = calc_score_for_paths_paired(
        gr, [[0, 2, 4]], rs1, rs2, im, istd, use_all_to_cov=True)
    assert inc == pytest.approx(full, abs=1e-9)


def test_incremental_at_least_full_on_long_first_node(tmp_path):
    """Reference asymmetry: AddPositions (full scorer, graph.cc:600-649)
    has no single-node extra window, so alignments in the trimmed leading
    region of a >300 bp first node are missed there but found by
    GetPositionsOnlyPath (incremental, graph.cc:563-566)."""
    rng = np.random.default_rng(16)
    gr, seqs = make_linear_graph(rng, [400, 100, 400])
    genome = "".join(seqs)
    L, im, istd = 25, 150, 15
    m1, m2 = make_pairs(rng, genome, 20, L, im, istd)
    rs1 = make_readset(tmp_path, m1, "g1")
    rs2 = make_readset(tmp_path, m2, "g2")
    state = ScoringState()
    inc, _, _ = calc_score_for_paths_incremental(
        gr, [[0, 2, 4]], rs1, rs2, im, istd, state, use_all_to_cov=True)
    full, _, _ = calc_score_for_paths_paired(
        gr, [[0, 2, 4]], rs1, rs2, im, istd, use_all_to_cov=True)
    assert inc >= full - 1e-9
