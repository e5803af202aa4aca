"""Starting-assembly ingestion and the k-mer graph bootstrap."""
import numpy as np
import pytest

from gaml_tpu.assembly_import import (
    add_missing_big_nodes,
    align_contig,
    clip_paths,
    find_node_placements,
    get_paths,
)
from gaml_tpu.core import dna
from gaml_tpu.core.graph import Graph
from gaml_tpu.graph_from_assembly import get_graph_from_assembly

from fixtures import make_linear_graph, random_seq


def test_find_placements_and_get_paths(tmp_path):
    rng = np.random.default_rng(0)
    gr, seqs = make_linear_graph(rng, [600, 80, 700])
    contig = seqs[0] + seqs[1] + seqs[2]
    fa = tmp_path / "asm.fasta"
    fa.write_text(f">ctg1\n{contig}\n")
    paths = get_paths(gr, str(fa))
    assert len(paths) == 1
    # the walk visits the three forward nodes in order (short node either
    # placed directly or recovered by the BFS glue)
    p = [e for e in paths[0] if e >= 0]
    assert p[0] == 0 and p[-1] == 4
    assert 2 in p


def test_get_paths_with_gap(tmp_path):
    rng = np.random.default_rng(1)
    gr, seqs = make_linear_graph(rng, [600, 700])
    contig = seqs[0] + "N" * 50 + seqs[1]
    fa = tmp_path / "asm.fasta"
    fa.write_text(f">ctg1\n{contig}\n")
    paths = get_paths(gr, str(fa))
    assert len(paths) == 1
    p = paths[0]
    assert p[0] == 0 and p[-1] == 2
    gaps = [e for e in p if e < 0]
    assert len(gaps) == 1
    assert gaps[0] == -50


def test_align_contig_threads_graph():
    rng = np.random.default_rng(2)
    gr, seqs = make_linear_graph(rng, [300, 40, 300])
    inner = align_contig(gr, 0, 4, seqs[1])
    assert inner == [2]
    # one mismatch tolerated
    mutated = list(seqs[1])
    mutated[10] = "ACGT"[(("ACGT".index(mutated[10])) + 1) % 4]
    inner = align_contig(gr, 0, 4, "".join(mutated))
    assert inner == [2]


def test_clip_and_add_missing():
    rng = np.random.default_rng(3)
    gr, _ = make_linear_graph(rng, [600, 80, 700, 80, 800])
    paths = [[2, 0, 2], [2], [4, 6, 8]]
    clipped = clip_paths(paths, gr)
    assert clipped == [[0], [4, 6, 8]]
    add_missing_big_nodes(clipped, gr)
    # all long fwd nodes present
    present = {e for p in clipped for e in p}
    assert {0, 4, 8} <= present


def test_graph_from_assembly_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    scaffold = random_seq(rng, 800) + "N" * 30 + random_seq(rng, 700)
    fa = tmp_path / "scf.fasta"
    fa.write_text(f">s1\n{scaffold}\n")
    gr = Graph()
    paths = get_graph_from_assembly(str(fa), gr)
    assert gr.num_nodes >= 4  # at least two rc pairs
    assert len(paths) == 1
    # gap entry uses the -(gap + k - 1) convention
    gaps = [e for e in paths[0] if e < 0]
    assert gaps == [-(30 + 101 - 1)]
    # rc pairing: node seq of odd id is revcomp of its even partner's
    s0 = dna.decode_seq(gr.seqs[0])
    s1 = dna.decode_seq(gr.seqs[1])
    assert s1 == dna.revcomp_str(s0)


def test_graph_from_assembly_repeat_collapse(tmp_path):
    """A repeated region inside one contig forces branching k-mers and
    multiple intervals."""
    rng = np.random.default_rng(5)
    rep = random_seq(rng, 300)
    scaffold = random_seq(rng, 400) + rep + random_seq(rng, 350) + rep + \
        random_seq(rng, 400)
    fa = tmp_path / "scf.fasta"
    fa.write_text(f">s1\n{scaffold}\n")
    gr = Graph()
    paths = get_graph_from_assembly(str(fa), gr)
    assert gr.num_nodes >= 6  # repeat splits the contig into several nodes


def test_testrep_finds_duplicates(tmp_path, capsys):
    rng = np.random.default_rng(6)
    rep = random_seq(rng, 600)
    fa = tmp_path / "scf.fasta"
    fa.write_text(f">a\n{rep + random_seq(rng, 100) + rep}\n")
    from gaml_tpu.diagnostics.testrep import main as testrep_main

    assert testrep_main([str(fa)]) == 0
    out = capsys.readouterr().out
    assert "repeat x" in out


def test_graph_from_assembly_native_matches_python(tmp_path, monkeypatch):
    """The native kmer_db phase must reproduce the python KmerDB exactly:
    same node count, sequences, and scaffold walks (including scaffolds
    with gaps and shared repeats across records)."""
    rng = np.random.default_rng(12)
    seg = lambda n: "".join("ACGT"[i] for i in rng.integers(0, 4, n))
    rep = seg(160)
    scf1 = seg(300) + rep + seg(250) + "N" * 7 + seg(220)
    scf2 = seg(180) + rep + seg(210)
    fa = tmp_path / "nm.fa"
    fa.write_text(f">s1\n{scf1}\n>s2\n{scf2}\n")

    from gaml_tpu.core.graph import Graph

    def build():
        gr = Graph()
        paths = get_graph_from_assembly(str(fa), gr, k=101)
        return gr, paths

    gr_n, paths_n = build()
    monkeypatch.setenv("GAML_TPU_NO_NATIVE", "1")
    import gaml_tpu.native as native_mod
    monkeypatch.setattr(native_mod, "_lib", None)
    monkeypatch.setattr(native_mod, "_tried", False)
    gr_p, paths_p = build()
    monkeypatch.setattr(native_mod, "_tried", False)

    assert gr_n.num_nodes == gr_p.num_nodes
    assert paths_n == paths_p
    for a, b in zip(gr_n.seqs, gr_p.seqs):
        np.testing.assert_array_equal(a, b)
