"""PacBio subsystem: anchors, cached walk scoring, gap estimation."""
import numpy as np
import pytest

from gaml_tpu.core import dna
from gaml_tpu.scoring.pacbio import PacbioReadSet
from gaml_tpu.scoring.pacbio_score import calc_score_for_pacbio

from fixtures import make_linear_graph, random_seq, write_fastq
from test_forward_kernel import noisy_copy

PB_MATCH = 0.85
PB_MISMATCH = (1 - PB_MATCH) / 2  # reference convention: 1-2*(1-m) floor


def make_pb_readset(tmp_path, graph, seqs, rng, n_reads=12, rlen=600,
                    err=0.1, name="pb"):
    genome = "".join(seqs)
    reads = []
    for _ in range(n_reads):
        p = int(rng.integers(0, max(1, len(genome) - rlen)))
        r = noisy_copy(rng, dna.encode_seq(genome[p:p + rlen]), err=err)
        if rng.random() < 0.5:
            r = dna.revcomp(r)
        reads.append(dna.decode_seq(r))
    fq = tmp_path / f"{name}.fq"
    write_fastq(str(fq), reads, prefix="pb")
    rs = PacbioReadSet(str(tmp_path / name), str(fq), PB_MATCH, 0.05)
    rs.preprocess_reads()
    rs.compute_anchors(graph, persist=False)
    return rs, reads


def test_anchors_cover_spanned_nodes(tmp_path):
    rng = np.random.default_rng(0)
    gr, seqs = make_linear_graph(rng, [400, 60, 500])
    rs, reads = make_pb_readset(tmp_path, gr, seqs, rng, n_reads=10,
                                rlen=700, err=0.08)
    # long reads spanning the junction anchor on both long nodes
    assert rs.anchors_cache.get(0) or rs.anchors_cache.get(1)
    assert rs.anchors_cache.get(4) or rs.anchors_cache.get(5)
    # reverse index consistent with begin anchors
    for node, rids in rs.anchors_begin.items():
        for rid in rids:
            assert node in rs.anchors_reverse[rid]


def test_read_probabilities_cache_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    gr, seqs = make_linear_graph(rng, [400, 60, 500])
    rs, _ = make_pb_readset(tmp_path, gr, seqs, rng, n_reads=6, rlen=500)
    walk = [0, 2, 4]
    pos1, tl1 = rs.get_read_probabilities(gr, walk)
    # second call must come purely from cache and agree
    pos2, tl2 = rs.get_read_probabilities(gr, walk)
    assert tl1 == tl2 == sum(len(s) for s in seqs)
    assert pos1 == pos2
    n_hits = sum(len(p) for p in pos1)
    assert n_hits >= 4  # most reads align somewhere


def test_pacbio_scorer_prefers_true_walk(tmp_path):
    rng = np.random.default_rng(2)
    gr, seqs = make_linear_graph(rng, [500, 80, 500, 80, 500])
    rs, _ = make_pb_readset(tmp_path, gr, seqs, rng, n_reads=14, rlen=800,
                            err=0.08)
    true_walk = [[0, 2, 4, 6, 8]]
    # scrambled: long nodes in wrong order
    wrong_walk = [[4, 2, 0], [8, 6]]
    s_true, z_true, _ = calc_score_for_pacbio(gr, true_walk, rs)
    rs2, _ = make_pb_readset(tmp_path, gr, seqs, rng, n_reads=14, rlen=800,
                             err=0.08, name="pb2")
    s_wrong, z_wrong, _ = calc_score_for_pacbio(gr, wrong_walk, rs2)
    assert np.isfinite(s_true)
    assert s_true > s_wrong


def test_get_gap_estimates_distance(tmp_path):
    rng = np.random.default_rng(3)
    gr, seqs = make_linear_graph(rng, [500, 500])
    gap_true = 150
    bridge = seqs[0] + random_seq(rng, gap_true) + seqs[1]
    # read spanning end of node0 across the gap into node1
    read_seq = bridge[200:900]
    fq = tmp_path / "gap.fq"
    write_fastq(str(fq), [read_seq], prefix="g")
    rs = PacbioReadSet(str(tmp_path / "gaprs"), str(fq), PB_MATCH, 0.05)
    rs.preprocess_reads()
    est = rs.get_gap(gr, 0, 2, 0)
    assert est >= 0
    assert abs(est - gap_true) < 40


def test_production_band_vs_exact_reference_band(tmp_path):
    """The production chain-guided band scorer must agree with the exact
    reference CIGAR-band DP (diagnostics.exact_pacbio — itself pinned
    bit-close to the reference binary in test_reference_differential) on
    per-walk scores: both bands capture the dominant alignment mass."""
    from gaml_tpu.diagnostics.exact_pacbio import ExactPacbioReadSet

    rng = np.random.default_rng(11)
    gr, seqs = make_linear_graph(rng, [900, 120, 1200])
    rs_prod, reads = make_pb_readset(tmp_path, gr, seqs, rng, n_reads=10,
                                     rlen=400, err=0.08, name="pbe")
    rs_exact = ExactPacbioReadSet(str(tmp_path / "pbe_x"),
                                  str(tmp_path / "pbe.fq"),
                                  PB_MATCH, 0.05)
    rs_exact.preprocess_reads()
    rs_exact.compute_anchors(gr, persist=False)
    paths = [[0, 2, 4]]
    sp, zp, tlp = calc_score_for_pacbio(gr, paths, rs_prod)
    se, ze, tle = calc_score_for_pacbio(gr, paths, rs_exact)
    assert tlp == tle
    assert sp == pytest.approx(se, rel=0.02), (sp, se)


def test_forward_batch_chunked_device_route(tmp_path, monkeypatch):
    """The device route chunks every forward batch to ONE fixed
    (GAML_PB_CHUNK, rmax-class) dispatch shape (tail rounds up, read axis
    pads to the read set's longest read) and reassembles chunk outputs in
    job order — scores must match the native route and every dispatch must
    carry the same shape (one compiled executable for the whole run)."""
    import jax.numpy as jnp

    import gaml_tpu.ops.forward_pallas as fp
    from gaml_tpu.ops.forward import banded_forward

    rng = np.random.default_rng(21)
    gr, seqs = make_linear_graph(rng, [900, 120, 1200])
    rs_nat, _ = make_pb_readset(tmp_path, gr, seqs, np.random.default_rng(9),
                                n_reads=160, rlen=400, err=0.08, name="pbc_n")
    rs_dev, _ = make_pb_readset(tmp_path, gr, seqs, np.random.default_rng(9),
                                n_reads=160, rlen=400, err=0.08, name="pbc_d")
    rs_nat.forward_width = 128  # native baseline on the pallas band width
    rs_dev.forward_width = 128
    walk = [0, 2, 4]
    pos_nat, tl_nat = rs_nat.get_read_probabilities(gr, walk)

    calls = []

    def fake_pallas(genome, reads, rlens, centers, gstarts, glens,
                    log_match, log_mismatch, rmax, width=128,
                    interpret=False, return_device=False):
        calls.append((reads.shape, int(rmax)))
        out = np.asarray(banded_forward(
            jnp.asarray(genome), jnp.asarray(np.asarray(reads)),
            jnp.asarray(np.asarray(rlens, dtype=np.int32)),
            jnp.asarray(centers), jnp.asarray(gstarts), jnp.asarray(glens),
            float(log_match), float(log_mismatch), int(rmax), 128))
        return out  # padded [chunk] array; caller slices live rows

    monkeypatch.setattr(fp, "banded_forward_pallas", fake_pallas)
    monkeypatch.setenv("GAML_PB_FORCE_DEVICE", "1")
    monkeypatch.setenv("GAML_PB_DEVICE_MIN_CELLS", "0")
    monkeypatch.setenv("GAML_DEV_EAGER", "1")
    monkeypatch.setenv("GAML_PB_CHUNK", "1")  # rounds up to LANES=128
    monkeypatch.setenv("GAML_PB_RESIDENT", "0")  # dense-staging route

    pos_dev, tl_dev = rs_dev.get_read_probabilities(gr, walk)
    assert calls, "device route never dispatched"
    shapes = {c[0] for c in calls}
    rmaxes = {c[1] for c in calls}
    assert len(shapes) == 1 and len(rmaxes) == 1, (shapes, rmaxes)
    (shape,), (rmax_cls,) = shapes, rmaxes
    assert shape == (128, rmax_cls)
    assert rmax_cls % 128 == 0
    max_rlen = max(len(r) for r in rs_dev.read_seq)
    assert rmax_cls >= max_rlen
    # multi-chunk: the anchored batch must have exceeded one chunk
    assert len(calls) >= 2
    assert rs_dev.dp_cells.get("pallas", 0) > 0
    assert not rs_dev.dp_cells.get("native")

    assert tl_dev == tl_nat
    for p_n, p_d in zip(pos_nat, pos_dev):
        assert len(p_n) == len(p_d)
        for (sp_n, lp_n), (sp_d, lp_d) in zip(p_n, p_d):
            assert sp_n == sp_d
            assert lp_d == pytest.approx(lp_n, rel=1e-4, abs=1e-3)


def test_forward_batch_resident_route_matches_native(tmp_path, monkeypatch):
    """The resident-read device route (ops.forward_device: read rows
    live on the chip, dispatches ship 2-bit band steps + per-job
    metadata, all other staging derived on device) must reproduce the
    native route's positions/logprobs through the REAL staging + pallas
    kernel (interpret mode), including the chunked multi-dispatch and
    the prewarm router marking."""
    from gaml_tpu.utils import warmup

    rng = np.random.default_rng(77)
    gr, seqs = make_linear_graph(rng, [800, 120, 900])
    rs_nat, _ = make_pb_readset(tmp_path, gr, seqs, np.random.default_rng(5),
                                n_reads=60, rlen=300, err=0.08, name="pbr_n")
    rs_dev, _ = make_pb_readset(tmp_path, gr, seqs, np.random.default_rng(5),
                                n_reads=60, rlen=300, err=0.08, name="pbr_d")
    rs_nat.forward_width = 128
    rs_dev.forward_width = 128
    walk = [0, 2, 4]
    pos_nat, tl_nat = rs_nat.get_read_probabilities(gr, walk)

    monkeypatch.setenv("GAML_PB_FORCE_DEVICE", "1")
    monkeypatch.setenv("GAML_PB_DEVICE_MIN_CELLS", "0")
    monkeypatch.setenv("GAML_DEV_EAGER", "1")
    monkeypatch.setenv("GAML_PB_CHUNK", "1")  # rounds up to 128
    monkeypatch.setenv("GAML_PALLAS_INTERPRET", "1")

    rs_dev.prewarm_device()
    rmax_cls = rs_dev._dev_rmax_class
    eng = getattr(rs_dev, "_fwd_engine", None)
    assert eng is not None and eng.rmax_cls == rmax_cls
    warm_keys = [k for k in warmup._STATE
                 if k[:3] == ("pb_forward", 128, rmax_cls)]
    assert warm_keys and warmup._STATE[warm_keys[0]] is True

    pos_dev, tl_dev = rs_dev.get_read_probabilities(gr, walk)
    assert rs_dev.dp_cells.get("pallas", 0) > 0
    assert not rs_dev.dp_cells.get("native")
    assert rs_dev._fwd_engine is eng  # resident matrices uploaded once

    assert tl_dev == tl_nat
    for p_n, p_d in zip(pos_nat, pos_dev):
        assert len(p_n) == len(p_d)
        for (sp_n, lp_n), (sp_d, lp_d) in zip(p_n, p_d):
            assert sp_n == sp_d
            assert lp_d == pytest.approx(lp_n, rel=1e-4, abs=1e-3)


def test_resident_staging_bit_equal_dense(monkeypatch):
    """Unit parity: the engine's on-device staging derivations feed the
    kernel the SAME arrays the dense host prestaging ships — outputs are
    bit-identical between ops.forward_device and banded_forward_pallas
    on random jobs (interpret mode)."""
    import jax.numpy as jnp

    from gaml_tpu.core import dna
    from gaml_tpu.ops.forward_device import ForwardDeviceEngine
    from gaml_tpu.ops.forward_pallas import banded_forward_pallas

    monkeypatch.setenv("GAML_PALLAS_INTERPRET", "1")
    rng = np.random.default_rng(3)
    rmax_cls = 128
    seq = rng.integers(0, 4, 700).astype(np.uint8)
    n_reads, c = 10, 128
    read_seqs = [rng.integers(0, 5, rng.integers(60, rmax_cls + 1))
                 .astype(np.uint8) for _ in range(n_reads)]
    rid = rng.integers(0, n_reads, c).astype(np.int32)
    strand = rng.integers(0, 2, c).astype(np.uint8)
    rlens = np.array([len(read_seqs[r]) for r in rid], np.int32)
    centers = np.zeros((c, rmax_cls + 1), np.int32)
    for i in range(c):
        p = int(rng.integers(0, 300))
        steps = rng.integers(0, 3, rmax_cls)
        centers[i] = np.clip(p + np.concatenate([[0], np.cumsum(steps)]),
                             0, len(seq))
    gstarts = rng.integers(0, 50, c).astype(np.int32)
    glens = np.minimum(len(seq) - gstarts,
                       rng.integers(300, 650, c)).astype(np.int32)
    lm, lmm = float(np.log(0.9)), float(np.log(0.03))

    reads_dense = np.full((c, rmax_cls), 6, np.uint8)
    for i in range(c):
        q = read_seqs[rid[i]] if strand[i] == 0 else \
            dna.revcomp(read_seqs[rid[i]])
        reads_dense[i, :len(q)] = q
    want = banded_forward_pallas(seq, reads_dense, rlens, centers,
                                 gstarts, glens, lm, lmm, rmax_cls,
                                 interpret=True)

    eng = ForwardDeviceEngine(read_seqs, rmax_cls)
    got = np.asarray(eng.dispatch(eng.prepare_seq(seq), rid, strand,
                                  rlens, centers, gstarts, glens,
                                  lm, lmm))[:c]
    assert np.array_equal(got, np.asarray(want)[:c])


def test_resident_cap_falls_back_to_dense(tmp_path, monkeypatch):
    """When the resident packed read matrices would exceed
    GAML_PB_RESIDENT_MAX, _ensure_fwd_engine returns None and the device
    route keeps working on dense staging."""
    rng = np.random.default_rng(5)
    gr, seqs = make_linear_graph(rng, [500, 80, 450])
    rs, _ = make_pb_readset(tmp_path, gr, seqs, rng, n_reads=4, rlen=200,
                            name="cap")
    monkeypatch.setenv("GAML_PB_RESIDENT_MAX", "0")
    assert rs._ensure_fwd_engine(256) is None
    monkeypatch.delenv("GAML_PB_RESIDENT_MAX")
    eng = rs._ensure_fwd_engine(256)
    assert eng is not None and eng.rmax_cls == 256


def test_f32_route_anneal_quality_bound(tmp_path, monkeypatch):
    """Enforce the PARITY.md device-route divergence bound at anneal
    scale: the same seeded anneal run on the exact f64 native forward
    kernel and on the f32 jnp kernel (the device route's accumulation
    class — ~1e-5 per-batch drift can flip accept decisions) must reach
    quality-equivalent final assemblies and near-identical best scores."""
    import sys as sys_mod

    from gaml_tpu.core.io import output_paths_to_file
    from gaml_tpu.optimize.anneal import Optimizer
    from gaml_tpu.optimize.settings import AssemblySettings
    from gaml_tpu.scoring.calculator import ProbCalculator
    from gaml_tpu.scoring.config import SingleReadConfig

    rng = np.random.default_rng(8)
    gr, seqs = make_linear_graph(
        rng, [2200, 150, 2500, 120, 2300, 200, 2400])
    genome = "".join(seqs)

    def run(tag, f32):
        rs, _ = make_pb_readset(tmp_path, gr, seqs,
                                np.random.default_rng(4), n_reads=30,
                                rlen=1000, err=0.08, name=f"f32b_{tag}")
        cfg = SingleReadConfig(penalty_constant=0.0001, step=100)
        pc = ProbCalculator([], [], [(cfg, rs)], gr)
        settings = AssemblySettings(
            threshold=500, max_iterations=120, seed=47,
            output_prefix=str(tmp_path / f"o{tag}"))
        opt = Optimizer(gr, pc, settings, advice_pacbio=[rs],
                        longest_read=1000, log=lambda *a: None)
        opt.prepare()
        if f32:
            import gaml_tpu.native as native

            monkeypatch.setattr(native, "get_lib", lambda: None)
            monkeypatch.setenv("GAML_PB_DEVICE_MIN_CELLS", "0")
        paths = [[i] for i in range(0, gr.num_nodes, 2)
                 if gr.node_len(i) > 500]
        best = opt.run(paths, write_outputs=False)
        assert (rs.dp_cells.get("jnp", 0) > 0) == f32
        output_paths_to_file(best, gr, 47, 500,
                             str(tmp_path / f"fin{tag}"))
        sys_mod.path.insert(0, str(REPO_TOOLS))
        from asm_quality import assembly_quality

        q = assembly_quality(genome, str(tmp_path / f"fin{tag}.fasta"))
        return float(opt.best_prob), q

    s64, q64 = run("64", False)
    s32, q32 = run("32", True)
    # f32 accept flips may alter the trajectory, but the final assembly
    # must be equivalent and the best score within the drift band
    assert abs(s32 - s64) < 0.05, (s32, s64)
    assert abs(q32["kmer_recall"] - q64["kmer_recall"]) <= 0.005, (q32, q64)
    assert q32["kmer_junk"] <= q64["kmer_junk"] + 0.001
    assert q64["ng50"] == 0 or \
        0.95 <= q32["ng50"] / q64["ng50"] <= 1.06, (q32, q64)


import os as _os_p  # noqa: E402

REPO_TOOLS = _os_p.path.join(_os_p.path.dirname(_os_p.path.dirname(
    _os_p.path.abspath(__file__))), "tools")


def test_prewarm_device_marks_router_ready(tmp_path, monkeypatch):
    """prewarm_device dispatches exactly one full dummy chunk eagerly,
    marks the warm-up router's (chunk, rmax-class) key ready, restores
    the routing env vars, and clears the profiling counters; without the
    device force flag it must no-op on CPU platforms."""
    import gaml_tpu.ops.forward_pallas as fp
    from gaml_tpu.utils import warmup

    rng = np.random.default_rng(33)
    gr, seqs = make_linear_graph(rng, [600, 80, 700])
    rs, _ = make_pb_readset(tmp_path, gr, seqs, rng, n_reads=6, rlen=300,
                            name="pbw")
    calls = []

    def fake_pallas(genome, reads, rlens, centers, gstarts, glens,
                    log_match, log_mismatch, rmax, width=128,
                    interpret=False, return_device=False):
        calls.append((reads.shape, int(rmax)))
        return np.zeros(reads.shape[0], dtype=np.float32)

    monkeypatch.setattr(fp, "banded_forward_pallas", fake_pallas)
    monkeypatch.setenv("GAML_PB_CHUNK", "1")  # rounds up to 128
    monkeypatch.setenv("GAML_PB_RESIDENT", "0")  # dense-staging route

    # CPU platform, no force flag: no-op
    monkeypatch.delenv("GAML_PB_FORCE_DEVICE", raising=False)
    rs.prewarm_device()
    assert not calls

    monkeypatch.setenv("GAML_PB_FORCE_DEVICE", "1")
    monkeypatch.setenv("GAML_PB_DEVICE_MIN_CELLS", "999999999")
    eager_before = os_mod.environ.get("GAML_DEV_EAGER")
    rs.prewarm_device()
    assert len(calls) == 1
    (shape, rmax_cls), = calls
    assert shape[0] == 128 and rmax_cls % 128 == 0
    assert warmup._STATE.get(("pb_forward", 128, rmax_cls)) is True
    assert rs.dp_cells == {}
    # the temporarily-forced routing env vars are restored
    assert os_mod.environ.get("GAML_PB_DEVICE_MIN_CELLS") == "999999999"
    assert os_mod.environ.get("GAML_DEV_EAGER") == eager_before


import os as os_mod  # noqa: E402


def test_score_batch_pacbio_union_prefill(tmp_path):
    """score_batch fills the union of all candidates' missing PacBio
    windows in ONE forward-DP batch; scores must equal the sequential
    per-candidate path exactly (per-job kernel outputs are independent
    of batch membership)."""
    from gaml_tpu.scoring.calculator import ProbCalculator
    from gaml_tpu.scoring.config import SingleReadConfig

    rng = np.random.default_rng(17)
    gr, seqs = make_linear_graph(rng, [700, 90, 800])
    rs_seq, _ = make_pb_readset(tmp_path, gr, seqs, np.random.default_rng(4),
                                n_reads=8, rlen=400, name="pbsb_a")
    rs_bat, _ = make_pb_readset(tmp_path, gr, seqs, np.random.default_rng(4),
                                n_reads=8, rlen=400, name="pbsb_b")
    cfg = SingleReadConfig(penalty_constant=1e-4, step=100)
    cands = [[[0, 2, 4]], [[0, 2], [4]], [[4, 2, 0]]]

    pc_seq = ProbCalculator([], [], [(cfg, rs_seq)], gr)
    want = [pc_seq.score(c) for c in cands]

    calls = []
    orig = rs_bat._forward_batch

    def counting(seq, jobs, extents=None):
        calls.append(len(jobs))
        return orig(seq, jobs, extents)

    rs_bat._forward_batch = counting
    pc_bat = ProbCalculator([], [], [(cfg, rs_bat)], gr)
    got = pc_bat.score_batch(cands)
    assert got == want, (got, want)
    # the union prefill serves every candidate: exactly one fill batch
    assert len(calls) == 1, calls
