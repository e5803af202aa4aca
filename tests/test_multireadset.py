"""Combined single + paired + PacBio scoring through ProbCalculator, and
an assembly-quality end-to-end check."""
import numpy as np
import pytest

from gaml_tpu.core import dna
from gaml_tpu.scoring.calculator import ProbCalculator
from gaml_tpu.scoring.config import PairedReadConfig, SingleReadConfig
from gaml_tpu.scoring.pacbio import PacbioReadSet

from fixtures import make_linear_graph, sample_reads, write_fastq
from test_pacbio import PB_MATCH, make_pb_readset
from test_scoring import MATCH, MISMATCH, make_pairs, make_readset


def test_all_three_readset_kinds(tmp_path):
    rng = np.random.default_rng(0)
    gr, seqs = make_linear_graph(rng, [600, 90, 700])
    genome = "".join(seqs)

    singles = sample_reads(rng, genome, 20, 30, err_rate=0.0)
    rs_single = make_readset(tmp_path, singles, "mx_s")
    m1, m2 = make_pairs(rng, genome, 20, 28, 250, 20)
    rs1 = make_readset(tmp_path, m1, "mx_p1")
    rs2 = make_readset(tmp_path, m2, "mx_p2")
    rs_pb, _ = make_pb_readset(tmp_path, gr, seqs, rng, n_reads=8, rlen=500,
                               name="mx_pb")

    s_cfg = SingleReadConfig(weight=1.0)
    p_cfg = PairedReadConfig(step=200.0, insert_mean=250, insert_std=20,
                             weight=2.0)
    pb_cfg = SingleReadConfig(weight=0.5)
    pc = ProbCalculator([(s_cfg, rs_single)], [(p_cfg, (rs1, rs2))],
                        [(pb_cfg, rs_pb)], gr)

    zeros = []
    total, tl = pc.calc_prob([[0, 2, 4]], zeros)
    assert np.isfinite(total)
    assert len(zeros) == 3  # one entry per read set
    assert zeros[0][1] == 20 and zeros[1][1] == 20 and zeros[2][1] == 8

    # weighted sum property: doubling a weight moves the total by the
    # component score
    pc2 = ProbCalculator([(s_cfg, rs_single)], [], [], gr)
    s_only, _ = pc2.calc_prob([[0, 2, 4]])
    pc3 = ProbCalculator([], [(p_cfg, (rs1, rs2))], [(pb_cfg, rs_pb)], gr)
    rest, _ = pc3.calc_prob([[0, 2, 4]])
    assert total == pytest.approx(s_only * 1.0 + rest, abs=1e-9)


def test_annealing_recovers_chain(tmp_path):
    """From singleton walks, a few hundred iterations should assemble most
    of the backbone chain (final-quality equivalence surface)."""
    from gaml_tpu.optimize.anneal import Optimizer
    from gaml_tpu.optimize.settings import AssemblySettings
    from test_fuzz import branchy_world

    gr, pc, _ = branchy_world(tmp_path, seed=5, n_pairs=120)
    settings = AssemblySettings(threshold=500, max_iterations=250, seed=21,
                                output_prefix=str(tmp_path / "rec"),
                                extendp=40, breakp=10, fixp=1, localp=30,
                                fixlenp=1)
    opt = Optimizer(gr, pc, settings, longest_read=300, log=lambda *a: None)
    start = [[i] for i in range(0, gr.num_nodes, 2) if gr.node_len(i) > 500]
    best = opt.run(start, write_outputs=False)
    chain_nodes = {0, 4, 8, 12}
    best_cover = 0
    for p in best:
        cover = len({(e // 2) * 2 for e in p if e >= 0} & chain_nodes)
        best_cover = max(best_cover, cover)
    assert best_cover >= 3, (best_cover, best)
