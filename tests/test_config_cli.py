"""Config parsing (with the reference's load-bearing quirks), CLI end to
end, trivial index, device backend via ReadSet, metrics."""
import json

import numpy as np
import pytest

from gaml_tpu.config import load_config, parse_config_text, prepare_read_sets
from gaml_tpu.core import dna

from fixtures import lastgraph_text, make_linear_graph, random_seq, sample_reads, write_fastq
from test_scoring import MATCH, MISMATCH, make_pairs, make_readset


def test_parse_config_sections():
    text = """graph=/tmp/LastGraph
t0=0.02
max_iterations=100

[rs1]
type=paired
filename1=a.fq
filename2=b.fq
insert_mean=180
insert_std=20
min_prob_pre_base=-0.5
advice=true
"""
    configs, rs = parse_config_text(text)
    assert configs["graph"] == "/tmp/LastGraph"
    assert configs["t0"] == "0.02"
    assert rs["rs1"]["type"] == "paired"
    assert rs["rs1"]["advice"] == "true"


def test_prepare_read_sets_quirks(tmp_path):
    for fn in ("a.fq", "b.fq"):
        write_fastq(str(tmp_path / fn), ["ACGT" * 10])
    base = {
        "type": "paired",
        "filename1": str(tmp_path / "a.fq"),
        "filename2": str(tmp_path / "b.fq"),
        "insert_mean": "200",
        "insert_std": "20",
        "penalty_step": "30",
        # documented-but-wrong spelling: silently ignored in strict mode
        "min_prob_per_base": "-0.5",
    }
    _s, paired, _p = prepare_read_sets({"rs": dict(base)})
    cfg = paired[0][0]
    assert cfg.min_prob_per_base == -0.7  # fell back (gaml.cc:855 quirk)
    assert cfg.step == 200 - 30
    assert cfg.insert_mean == 200
    # misspelled key is honored
    base["min_prob_pre_base"] = "-0.5"
    _s, paired, _p = prepare_read_sets({"rs": dict(base)})
    assert paired[0][0].min_prob_per_base == -0.5
    # match prob derived from mismatch
    base["mismatch_prob"] = "0.02"
    _s, paired, _p = prepare_read_sets({"rs": dict(base)})
    assert paired[0][1][0].match_prob == pytest.approx(1 - 4 * 0.02)


def test_settings_quirks():
    from gaml_tpu.optimize.settings import AssemblySettings

    s = AssemblySettings.from_config({"do_proprocess": "true",
                                      "long_contig_threshold": "400"})
    assert s.do_postprocess and s.max_iterations == 1
    assert s.threshold == 400


def test_cli_end_to_end(tmp_path, monkeypatch):
    """Full run through the CLI driver on a tiny synthetic dataset."""
    rng = np.random.default_rng(0)
    node_seqs = [random_seq(rng, 600), random_seq(rng, 80), random_seq(rng, 700)]
    lg = tmp_path / "LastGraph"
    lg.write_text(lastgraph_text(node_seqs, [(1, 2), (2, 3)]))
    genome = "".join(node_seqs)
    m1, m2 = make_pairs(rng, genome, 25, 30, 250, 25)
    write_fastq(str(tmp_path / "m1.fq"), m1)
    write_fastq(str(tmp_path / "m2.fq"), m2)
    cfg = tmp_path / "run.cfg"
    cfg.write_text(f"""graph={lg}
max_iterations=5
t0=0.01
output_prefix={tmp_path}/out
seed=3

[lib1]
type=paired
filename1={tmp_path}/m1.fq
filename2={tmp_path}/m2.fq
insert_mean=250
insert_std=25
cache_prefix={tmp_path}/lib1
""")
    from gaml_tpu.cli import main

    monkeypatch.chdir(tmp_path)
    assert main([str(cfg)]) == 0
    assert (tmp_path / "out.fasta").exists()
    assert (tmp_path / "out.walks").exists()


def test_trivial_index_recall():
    from gaml_tpu.index.trivial import ReadIndexTrivial

    rng = np.random.default_rng(1)
    genome = random_seq(rng, 400)
    idx = ReadIndexTrivial()
    read = genome[50:80]
    idx.add_read(dna.encode_seq(read), 0)
    cands = idx.get_read_cands_with_poses(dna.encode_seq(genome))
    assert 0 in cands
    # the trivial index finds reads even when the max k-mer is mutated
    mutated = list(read)
    # mutate 3 spread positions
    for i in (2, 15, 28):
        mutated[i] = "ACGT"[("ACGT".index(mutated[i]) + 1) % 4]
    idx2 = ReadIndexTrivial()
    idx2.add_read(dna.encode_seq("".join(mutated)), 5)
    cands2 = idx2.get_read_cands_with_poses(dna.encode_seq(genome))
    # 70bp-proximity dedup keeps the list small
    assert all(len(v) <= 4 for v in cands2.values())


def test_device_backend_matches_bfs_on_exact_reads(tmp_path):
    from gaml_tpu.scoring.single import calc_score_for_paths_single

    rng = np.random.default_rng(2)
    gr, seqs = make_linear_graph(rng, [350])
    reads = sample_reads(rng, seqs[0], 25, 30, err_rate=0.0)
    rs_bfs = make_readset(tmp_path, reads, "bfsb")
    rs_dev = make_readset(tmp_path, reads, "devb")
    rs_dev.backend = "device"
    rs_dev.aligner.backend = "device"
    s1, z1, t1 = calc_score_for_paths_single(gr, [[0]], rs_bfs)
    s2, z2, t2 = calc_score_for_paths_single(gr, [[0]], rs_dev)
    assert (z1, t1) == (z2, t2)
    assert s1 == pytest.approx(s2, abs=1e-12)


def test_device_backend_batched_windows(tmp_path):
    """Multi-window walks exercise the batched-across-subpaths device
    precompute; scores must match the bfs backend on exact reads."""
    from gaml_tpu.scoring.single import calc_score_for_paths_single

    rng = np.random.default_rng(7)
    gr, seqs = make_linear_graph(rng, [250, 120, 260, 90, 270])
    genome = "".join(seqs)
    reads = sample_reads(rng, genome, 40, 30, err_rate=0.0)
    rs_bfs = make_readset(tmp_path, reads, "bw1")
    rs_dev = make_readset(tmp_path, reads, "bw2")
    rs_dev.backend = "device"
    rs_dev.aligner.backend = "device"
    s1, z1, t1 = calc_score_for_paths_single(gr, [[0, 2, 4], [6, 8]], rs_bfs)
    s2, z2, t2 = calc_score_for_paths_single(gr, [[0, 2, 4], [6, 8]], rs_dev)
    assert (z1, t1) == (z2, t2)
    assert s1 == pytest.approx(s2, abs=1e-12)
    # caches hold identical alignments
    for key, als in rs_bfs.aligment_cache.items():
        assert rs_dev.aligment_cache.get(key) == als


def test_metrics():
    from gaml_tpu.utils.metrics import Metrics

    m = Metrics()
    m.count("moves.accepted")
    m.count("moves.accepted")
    with m.timer("rescore"):
        pass
    snap = m.snapshot()
    assert snap["moves.accepted"] == 2
    assert snap["rescore.calls"] == 1
    json.loads(m.report())
