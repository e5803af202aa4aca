import math

import numpy as np
import pytest

from gaml_tpu.core import dna
from gaml_tpu.core.graph import Graph, convert_node_id, invert_node
from gaml_tpu.core.io import load_lastgraph, output_paths_to_file, read_fasta
from gaml_tpu.core.logprob import gaussian_pdf, insert_prob, insert_prob_table, logadd, logsum
from gaml_tpu.core.paths import invert_path, path_len, reverse_path, split_at_gaps

from fixtures import lastgraph_text, make_linear_graph, random_seq


def test_dna_roundtrip():
    s = "GATTACAGGN"
    codes = dna.encode_seq(s)
    assert dna.decode_seq(codes) == s
    # encoding matches the reference trans table (graph.h:327-330)
    assert list(dna.encode_seq("GATC")) == [0, 1, 2, 3]


def test_revcomp():
    assert dna.revcomp_str("ACGT") == "ACGT"
    assert dna.revcomp_str("AACG") == "CGTT"
    assert dna.revcomp_str("ANA") == "TNT"


def test_convert_node_id():
    assert convert_node_id(1) == 0
    assert convert_node_id(-1) == 1
    assert convert_node_id(3) == 4
    assert convert_node_id(-3) == 5
    assert invert_node(6) == 7 and invert_node(7) == 6


def test_logadd_matches_reference_formula():
    rng = np.random.default_rng(0)
    a = rng.uniform(-700, 0, 1000)
    b = rng.uniform(-700, 0, 1000)
    expected = np.maximum(a, b) + np.log1p(np.exp(np.minimum(a, b) - np.maximum(a, b)))
    np.testing.assert_array_equal(logadd(a, b), expected)
    assert logadd(-np.inf, -5.0) == -5.0
    assert logadd(-5.0, -np.inf) == -5.0
    assert np.isneginf(logadd(-np.inf, -np.inf))


def test_logsum_vs_direct():
    vals = np.log(np.array([0.1, 0.25, 1e-30, 0.5]))
    assert logsum(vals) == pytest.approx(math.log(0.1 + 0.25 + 1e-30 + 0.5), rel=1e-12)


def test_insert_prob():
    table = insert_prob_table(100.0, 10.0)
    assert len(table) == 150
    assert table[100] == pytest.approx(1 / (math.sqrt(2 * math.pi) * 10.0))
    # tail computed on demand
    assert insert_prob(500, table, 100.0, 10.0) == pytest.approx(
        float(gaussian_pdf(500, 100.0, 10.0)))


def test_paths_invert_reverse():
    p = [4, 7, -21, 2]
    assert invert_path(p) == [3, -21, 6, 5]
    q = list(p)
    reverse_path(q)
    assert q == [3, -21, 6, 5]
    assert invert_path(invert_path(p)) == p


def test_split_at_gaps():
    ctgs, gaps = split_at_gaps([1, 2, -5, 3, -7, 4])
    assert ctgs == [[1, 2], [3], [4]]
    assert gaps == [5, 7]
    ctgs, gaps = split_at_gaps([1, 2])
    assert ctgs == [[1, 2]] and gaps == []


def test_lastgraph_load(tmp_path):
    rng = np.random.default_rng(1)
    seqs = [random_seq(rng, 30), random_seq(rng, 20), random_seq(rng, 25)]
    text = lastgraph_text(seqs, [(1, 2), (2, 3), (-3, 1)])
    p = tmp_path / "LastGraph"
    p.write_text(text)
    gr = load_lastgraph(str(p))
    assert gr.num_nodes == 6
    assert dna.decode_seq(gr.seqs[0]) == seqs[0]
    assert dna.decode_seq(gr.seqs[1]) == dna.revcomp_str(seqs[0])
    # ARC 1 2 -> edge 0->2 and rc edge 3->1
    assert gr.has_next(0, 2)
    assert gr.has_next(invert_node(2), invert_node(0))
    # ARC -3 1 -> edge 5->0 and 1->4
    assert gr.has_next(5, 0)
    assert gr.has_next(1, 4)


def test_graph_spell_and_lengths():
    rng = np.random.default_rng(2)
    gr, seqs = make_linear_graph(rng, [10, 12])
    walk = [0, -4, 2]
    spelled = dna.decode_seq(gr.spell(walk))
    assert spelled == seqs[0] + "NNNN" + seqs[1]
    assert path_len(gr, walk) == 26


def test_normalize_map():
    gr = Graph()
    gr.add_node_pair(dna.encode_seq("ACG"))
    gr.add_node_pair(dna.encode_seq("ACG"))
    gr.add_node_pair(dna.encode_seq("ACGTACGT"))
    gr.calc_normalize_map()
    assert gr.normalize_map[2] == 0  # duplicate short seq mapped to first
    assert gr.normalize_map[4] == 4  # long node untouched
    assert gr.normalize_path([2, -3, 4]) == [0, -3, 4]


def test_reachability_limit_linear():
    rng = np.random.default_rng(3)
    gr, _ = make_linear_graph(rng, [10, 10, 10, 10])
    gr.calc_reachability_limit(15)
    # node0 -> node2 (id 2) inner path empty; node0 -> node4 via [2]
    assert gr.reach_limit[0][2] == []
    assert gr.reach_limit[0][4] == [2]
    # distance cap: reaching node 6 needs 20 inner bases > 15
    assert 6 not in gr.reach_limit[0]


def test_reachability_big():
    rng = np.random.default_rng(4)
    # long - short - long chain
    gr, _ = make_linear_graph(rng, [600, 50, 700])
    gr.calc_reachability_big(500)
    assert gr.reach_big[0][4] == [2]
    assert 2 not in gr.reach_big[0]  # short nodes are not targets
    assert gr.reach_big[5][1] == [3]  # rc direction


def test_reachability_self_loops():
    gr = Graph()
    gr.add_node_pair(dna.encode_seq("AAAA"))
    gr.add_node_pair(dna.encode_seq("CCCC"))
    gr.add_arc(1, 1)  # velvet-style: edge 0->2? no — direct ids here
    # build manually: 0 -> 2 -> 0 cycle
    gr.next = [[2], [], [0], []]
    gr.next_prob = [[1.0], [], [1.0], []]
    gr.calc_prob_sums()
    gr.calc_reachability()
    assert [0, 2] in gr.reach_self[0]


def test_output_files(tmp_path):
    rng = np.random.default_rng(5)
    gr, seqs = make_linear_graph(rng, [600, 5, 700])
    walk = [0, 2, 4]
    prefix = str(tmp_path / "out")
    output_paths_to_file([walk], gr, 47, 500, prefix)
    fa = read_fasta(prefix + ".fasta")
    assert fa["tmp0"] == seqs[0] + seqs[1] + seqs[2]
    ol = read_fasta(prefix + ".onlylarge.fasta")
    assert ol["tmp0"] == seqs[0] + "N" * 5 + seqs[2]
    walks = (tmp_path / "out.walks").read_text()
    assert walks == ">tmp0-0(0)-2(600)-4(605)\n"


def test_recalculate_probs_by_path():
    rng = np.random.default_rng(6)
    gr, _ = make_linear_graph(rng, [10, 10, 10])
    gr.recalculate_probs_by_path([0, 2, 4])
    assert gr.get_next_prob(0, 2) == 1.0
    assert gr.next_prob[0][0] == 2.0  # kSmooth + 1 jump
    # rc edge got bumped too
    assert gr.next_prob[invert_node(2)][gr.next[invert_node(2)].index(invert_node(0))] == 2.0
