"""Randomized stress tests: many annealing iterations over a branchy graph
with all move families enabled, plus incremental-vs-fresh scoring checks
along the way.  Catches move-engine edge cases (1-node walks, inverted
joins, gap handling) that unit tests miss."""
import numpy as np
import pytest

from gaml_tpu.core import dna
from gaml_tpu.core.graph import Graph
from gaml_tpu.optimize.anneal import Optimizer
from gaml_tpu.optimize.settings import AssemblySettings
from gaml_tpu.scoring.calculator import ProbCalculator
from gaml_tpu.scoring.config import PairedReadConfig
from gaml_tpu.scoring.paired import ScoringState, calc_score_for_paths_incremental

from fixtures import random_seq, write_fastq
from test_scoring import MATCH, MISMATCH, make_pairs, make_readset


def branchy_world(tmp_path, seed=0, n_pairs=60):
    rng = np.random.default_rng(seed)
    gr = Graph()
    # backbone of long nodes with short connectors and branch noise
    lens = [700, 90, 650, 60, 800, 120, 600]
    for ln in lens:
        gr.add_node_pair(dna.encode_seq(random_seq(rng, ln)))
    chain = [0, 2, 4, 6, 8, 10, 12]
    for a, b in zip(chain, chain[1:]):
        gr.add_arc(a, b)
    # noise branches
    for src in (2, 6, 10):
        nid = gr.add_node_pair(dna.encode_seq(random_seq(rng, 70)))
        gr.add_arc(src, nid)
        gr.add_arc(nid, src + 2)
    gr.calc_prob_sums()
    gr.calc_normalize_map()
    genome = "".join(dna.decode_seq(gr.seqs[i]) for i in chain)
    m1, m2 = make_pairs(rng, genome, n_pairs, 30, 300, 25)
    rs1 = make_readset(tmp_path, m1, f"fz1_{seed}")
    rs2 = make_readset(tmp_path, m2, f"fz2_{seed}")
    cfg = PairedReadConfig(penalty_constant=0.00007, step=250.0,
                           insert_mean=300, insert_std=25)
    pc = ProbCalculator([], [(cfg, (rs1, rs2))], [], gr)
    return gr, pc, (cfg, rs1, rs2)


@pytest.mark.parametrize("seed", [0, 1])
def test_optimizer_fuzz_run(tmp_path, seed):
    gr, pc, (cfg, rs1, rs2) = branchy_world(tmp_path, seed=seed)
    settings = AssemblySettings(
        threshold=500, max_iterations=60, seed=100 + seed,
        output_prefix=str(tmp_path / f"fz{seed}"),
        # exercise all move families hard
        extendp=20, breakp=20, fixp=10, localp=40, fixlenp=10)
    opt = Optimizer(gr, pc, settings, longest_read=300, log=lambda *a: None)
    start = [[i] for i in range(0, gr.num_nodes, 2) if gr.node_len(i) > 500]
    best = opt.run(start, write_outputs=False)

    # invariants: every long node appears in the final best walks
    long_fwd = {i for i in range(0, gr.num_nodes, 2) if gr.node_len(i) > 500}
    present = set()
    for p in best:
        for e in p:
            if e >= 0:
                present.add((e // 2) * 2)
    assert long_fwd <= present
    # walks contain only valid node ids / gaps
    for p in best:
        assert p, "empty walk"
        for e in p:
            assert e < gr.num_nodes
    # consecutive non-gap entries are graph edges OR flank a gap
    for p in best:
        for a, b in zip(p, p[1:]):
            if a >= 0 and b >= 0:
                assert gr.has_next(a, b), (a, b)
    assert opt.best_prob >= opt.history[0]["new_prob"] - 50  # sane range

    # incremental state still consistent with a fresh rescore
    final_paths = opt.best_paths
    st = pc.paired_scoring_states[0]
    inc, _, _ = calc_score_for_paths_incremental(
        gr, final_paths, rs1, rs2, cfg.insert_mean, cfg.insert_std, st,
        use_all_to_cov=True, min_prob_per_base=cfg.min_prob_per_base,
        min_prob_start=cfg.min_prob_start)
    fresh = ScoringState()
    ref, _, _ = calc_score_for_paths_incremental(
        gr, final_paths, rs1, rs2, cfg.insert_mean, cfg.insert_std, fresh,
        use_all_to_cov=True, min_prob_per_base=cfg.min_prob_per_base,
        min_prob_start=cfg.min_prob_start)
    assert inc == pytest.approx(ref, abs=1e-6)


@pytest.mark.parametrize("seed", [3])
def test_optimizer_fuzz_memo_stress(tmp_path, seed, monkeypatch):
    """Same anneal with the memo budgets forced to thrash (walk-stage memo
    evicting constantly, contribution memo clearing) must produce the
    bit-identical trajectory: all memo layers are validated caches, never
    semantics."""
    import gaml_tpu.scoring.readset as rsmod

    def run(stress: bool):
        gr, pc, (cfg, rs1, rs2) = branchy_world(tmp_path, seed=seed,
                                                n_pairs=80)
        if stress:
            for _c, (r1, r2) in pc.paired_reads:
                r1._inc_contrib_entries = 10**12  # force clears on store
                r1._walk_stage_elems = 10**12
                r2._walk_stage_elems = 10**12
        settings = AssemblySettings(
            threshold=500, max_iterations=50, seed=7,
            output_prefix=str(tmp_path / f"ms{int(stress)}"),
            extendp=20, breakp=20, fixp=10, localp=40, fixlenp=10)
        opt = Optimizer(gr, pc, settings, longest_read=300,
                        log=lambda *a: None)
        start = [[i] for i in range(0, gr.num_nodes, 2)
                 if gr.node_len(i) > 500]
        opt.run(start, write_outputs=False)
        return [(r["itnum"], r["new_prob"], r["n_paths"])
                for r in opt.history]

    base = run(False)
    stressed = run(True)
    assert base == stressed
