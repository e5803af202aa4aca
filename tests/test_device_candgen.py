"""Native candidate generation + vectorized staging for the device
backend: must match the Python gen_candidates / python-staged batch path
exactly (VERDICT round-1 item 3: move candidate generation off Python)."""
import numpy as np

from gaml_tpu.align.aligner import gen_candidates, spell_subpath
from gaml_tpu.native import get_lib, query_windows_batch

from fixtures import make_linear_graph, sample_reads
from test_scoring import make_readset

import pytest

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native library unavailable")


def _world(tmp_path):
    rng = np.random.default_rng(42)
    gr, seqs = make_linear_graph(rng, [500, 90, 450, 120, 400])
    genome = "".join(seqs)
    reads = sample_reads(rng, genome, 60, 30, err_rate=0.02)
    rs = make_readset(tmp_path, reads, "qw")
    return gr, rs


def test_query_matches_python_gen_candidates(tmp_path):
    gr, rs = _world(tmp_path)
    bundle = rs.aligner.native_bundle
    assert bundle is not None
    windows = [(0,), (0, 2), (2, 4, 6), (4, 6, 8), (8,)]
    seqs = [np.ascontiguousarray(spell_subpath(gr, w)[0], dtype=np.uint8)
            for w in windows]
    native = query_windows_batch(bundle, seqs)
    for seq, (rid, g0, r0, orient) in zip(seqs, native):
        cands = gen_candidates(rs.aligner.index, rs.aligner.read_seqs, seq,
                               rs.aligner._read_cache)
        assert len(cands) == len(rid)
        for i, (c, _read) in enumerate(cands):
            assert (c.read_id, c.genome_pos, c.read_pos, c.orientation) == \
                (rid[i], g0[i], r0[i], orient[i]), (i, c)


def test_native_batch_path_matches_python_batch_path(tmp_path):
    gr, rs = _world(tmp_path)
    aligner = rs.aligner
    windows = [(0,), (0, 2), (2, 4, 6), (4, 6, 8), (8,), (6, 8)]
    native_out = aligner.align_subpaths_batch(gr, list(windows))
    bundle = aligner.native_bundle
    aligner.native_bundle = None
    try:
        py_out = aligner.align_subpaths_batch(gr, list(windows))
    finally:
        aligner.native_bundle = bundle
    for w, (a, b) in zip(windows, zip(native_out, py_out)):
        assert np.array_equal(a.position, b.position), w
        assert np.array_equal(a.edit_dist, b.edit_dist), w
        assert np.array_equal(a.read_id, b.read_id), w
        assert np.array_equal(a.orientation, b.orientation), w


def test_device_extender_matches_host_staging(tmp_path):
    """The device-resident stage+extend (gathers on device) must be
    bit-equal to the host-staged extension path."""
    from gaml_tpu.ops.extend import extend_staged, stage_candidates_uniform
    from gaml_tpu.ops.extend_device import DeviceExtender

    gr, rs = _world(tmp_path)
    bundle = rs.aligner.native_bundle
    windows = [(0,), (0, 2), (2, 4, 6), (4, 6, 8), (0, 2, 4, 6, 8)]
    seqs = [np.ascontiguousarray(spell_subpath(gr, w)[0], dtype=np.uint8)
            for w in windows]
    qs = query_windows_batch(bundle, seqs)
    counts = np.array([len(q[0]) for q in qs])
    rid = np.concatenate([q[0] for q in qs])
    g0 = np.concatenate([q[1] for q in qs])
    r0 = np.concatenate([q[2] for q in qs])
    orient = np.concatenate([q[3] for q in qs])
    seq_idx = np.repeat(np.arange(len(qs)), counts)
    seq_lens = np.array([len(s) for s in seqs], dtype=np.int64)
    seq_base = np.zeros(len(seqs), dtype=np.int64)
    np.cumsum(seq_lens[:-1], out=seq_base[1:])
    seq_buf = np.concatenate(seqs)
    rows = bundle.row_of[rid]

    st = stage_candidates_uniform(seq_buf, seq_base, seq_lens, seq_idx,
                                  g0, r0, rows, orient, bundle.codes_fwd,
                                  bundle.codes_rc, read_ids=rid)
    ok_h, errs_h, begin_h = extend_staged(st, use_pallas=False)

    ext = DeviceExtender(bundle.codes_fwd, bundle.codes_rc)
    ok_d, errs_d, begin_d = ext.run(seq_buf, seq_base, seq_lens, seq_idx,
                                    g0, r0, rows, orient, use_pallas=False)
    assert np.array_equal(ok_h, ok_d)
    # errs/begin travel back as one packed int32 per candidate; they are
    # defined (and bit-equal) exactly where ok — downstream consumers
    # (aligner dedup, candidates_to_score) mask by ok before use
    assert np.array_equal(errs_h[ok_h], errs_d[ok_d])
    assert np.array_equal(begin_h[ok_h], begin_d[ok_d])


def test_device_extender_sorted_dynamic_matches_host(tmp_path, monkeypatch):
    """The sorted-dynamic pallas path (SWAR forward cost + dynamic-rows
    register backward, candidates block-laid by r0) must agree with the
    host-staged exact path on every consumed value: ok everywhere,
    errs/begin wherever ok.  Runs the real fused code in pallas
    interpret mode; exercises multi-chunk dispatch + the scatter back to
    caller order on both the packed and return_device routes."""
    from gaml_tpu.ops.extend import extend_staged, stage_candidates_uniform
    from gaml_tpu.ops.extend_device import DeviceExtender
    from gaml_tpu.ops.extend_pallas import BLOCK_CANDS

    rng = np.random.default_rng(3)
    gr, seqs_l = make_linear_graph(rng, [900, 80, 700, 90, 600])
    genome = "".join(seqs_l)
    reads = sample_reads(rng, genome, 9000, 30, err_rate=0.03)
    rs = make_readset(tmp_path, reads, "sorted_dyn")
    bundle = rs.aligner.native_bundle
    windows = [(0, 2, 4, 6, 8), (4, 6), (0, 2)]
    seqs = [np.ascontiguousarray(spell_subpath(gr, w)[0], dtype=np.uint8)
            for w in windows]
    qs = query_windows_batch(bundle, seqs)
    counts = np.array([len(q[0]) for q in qs])
    rid = np.concatenate([q[0] for q in qs])
    g0 = np.concatenate([q[1] for q in qs])
    r0 = np.concatenate([q[2] for q in qs])
    orient = np.concatenate([q[3] for q in qs])
    seq_idx = np.repeat(np.arange(len(qs)), counts)
    seq_lens = np.array([len(s) for s in seqs], dtype=np.int64)
    seq_base = np.zeros(len(seqs), dtype=np.int64)
    np.cumsum(seq_lens[:-1], out=seq_base[1:])
    seq_buf = np.concatenate(seqs)
    rows = bundle.row_of[rid]
    assert len(rid) > BLOCK_CANDS  # the sorted path must engage

    st = stage_candidates_uniform(seq_buf, seq_base, seq_lens, seq_idx,
                                  g0, r0, rows, orient, bundle.codes_fwd,
                                  bundle.codes_rc, read_ids=rid)
    ok_h, errs_h, begin_h = extend_staged(st, use_pallas=False)

    monkeypatch.setenv("GAML_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("GAML_DEV_CHUNK", str(BLOCK_CANDS))  # multi-chunk
    ext = DeviceExtender(bundle.codes_fwd, bundle.codes_rc)
    ok_d, errs_d, begin_d = ext.run(seq_buf, seq_base, seq_lens, seq_idx,
                                    g0, r0, rows, orient, use_pallas=True)
    assert np.array_equal(ok_h, ok_d)
    assert np.array_equal(errs_h[ok_h], errs_d[ok_d])
    assert np.array_equal(begin_h[ok_h], begin_d[ok_d])

    okD, errsD, beginD = ext.run(seq_buf, seq_base, seq_lens, seq_idx,
                                 g0, r0, rows, orient, use_pallas=True,
                                 return_device=True)
    okD = np.asarray(okD)[:len(rid)]
    assert np.array_equal(ok_h, okD)
    assert np.array_equal(errs_h[ok_h], np.asarray(errsD)[:len(rid)][okD])
    assert np.array_equal(begin_h[ok_h],
                          np.asarray(beginD)[:len(rid)][okD])


def test_sorted_dynamic_kernels_bit_exact():
    """Unit-level parity of the sorted-dynamic kernels against the
    static pallas kernel (interpret mode): the dynamic-rows register
    kernel is bit-equal on (c, a); the SWAR cost kernel matches under
    its saturated contract (exact <= 6, clamped at 7)."""
    import jax.numpy as jnp

    from gaml_tpu.ops.extend import PAD
    from gaml_tpu.ops.extend_pallas import (
        BLOCK_CANDS, block_bounds, block_layout, dp_rows_pallas,
        dp_rows_pallas_reg_dyn, swar_cost_pallas)

    rng = np.random.default_rng(0)
    n, rmax = BLOCK_CANDS, 32
    read_np = rng.integers(0, 5, (rmax, n)).astype(np.int32)
    gwin_np = rng.integers(0, 5, (rmax + 2 * PAD, n)).astype(np.int32)
    gwin_np[PAD:PAD + rmax, : n // 2] = read_np[:, : n // 2]
    gwin_np[gwin_np == 4] = 8  # genome sentinel
    read_np[read_np == 4] = 6  # read sentinel
    rlen_np = rng.integers(0, rmax + 1, n).astype(np.int32)
    glen_np = rng.integers(0, rmax + PAD, n).astype(np.int32)

    c_ref, a_ref = dp_rows_pallas(
        jnp.asarray(read_np), jnp.asarray(gwin_np),
        jnp.asarray(rlen_np[None, :]), jnp.asarray(glen_np[None, :]),
        rmax, interpret=True)
    c_ref, a_ref = np.asarray(c_ref), np.asarray(a_ref)

    order = np.argsort(rlen_np, kind="stable")
    perm = order[block_layout(n)]
    nrows = block_bounds(rlen_np[order])
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)

    c_d, a_d = dp_rows_pallas_reg_dyn(
        jnp.asarray(read_np[:, perm]), jnp.asarray(gwin_np[:, perm]),
        jnp.asarray(rlen_np[perm]), jnp.asarray(glen_np[perm]), rmax,
        jnp.asarray(nrows), interpret=True)
    assert np.array_equal(np.asarray(c_d)[inv], c_ref)
    assert np.array_equal(np.asarray(a_d)[inv], a_ref)

    c7 = np.asarray(swar_cost_pallas(
        jnp.asarray(read_np[:, perm]), jnp.asarray(gwin_np[:, perm]),
        jnp.asarray(rlen_np[perm]), jnp.asarray(glen_np[perm]), rmax,
        jnp.asarray(nrows), interpret=True))
    assert np.array_equal(c7[inv], np.minimum(c_ref, 7))

    # round-5 backward SWAR kernel: cost under the same saturated
    # contract; accept offset bit-equal wherever the cost is unsaturated
    # (every consumer reads a only for ok = cost <= 3 candidates)
    from gaml_tpu.ops.extend_pallas import swar_cost_accept_pallas

    ca, aa = swar_cost_accept_pallas(
        jnp.asarray(read_np[:, perm]), jnp.asarray(gwin_np[:, perm]),
        jnp.asarray(rlen_np[perm]), jnp.asarray(glen_np[perm]), rmax,
        jnp.asarray(nrows), interpret=True)
    ca, aa = np.asarray(ca)[inv], np.asarray(aa)[inv]
    assert np.array_equal(ca, np.minimum(c_ref, 7))
    m = c_ref <= 6
    assert m.sum() > n // 4
    assert np.array_equal(aa[m], a_ref[m])


def test_stage_uniform_matches_stage_candidates(tmp_path):
    from gaml_tpu.ops.extend import stage_candidates, stage_candidates_uniform

    gr, rs = _world(tmp_path)
    bundle = rs.aligner.native_bundle
    windows = [(0, 2), (2, 4, 6)]
    seqs = [np.ascontiguousarray(spell_subpath(gr, w)[0], dtype=np.uint8)
            for w in windows]
    qs = query_windows_batch(bundle, seqs)
    counts = np.array([len(q[0]) for q in qs])
    rid = np.concatenate([q[0] for q in qs])
    g0 = np.concatenate([q[1] for q in qs])
    r0 = np.concatenate([q[2] for q in qs])
    orient = np.concatenate([q[3] for q in qs])
    seq_idx = np.repeat(np.arange(len(qs)), counts)
    seq_lens = np.array([len(s) for s in seqs], dtype=np.int64)
    seq_base = np.zeros(len(seqs), dtype=np.int64)
    np.cumsum(seq_lens[:-1], out=seq_base[1:])
    seq_buf = np.concatenate(seqs)
    rows = bundle.row_of[rid]
    st_u = stage_candidates_uniform(seq_buf, seq_base, seq_lens, seq_idx,
                                    g0, r0, rows, orient, bundle.codes_fwd,
                                    bundle.codes_rc, read_ids=rid)
    # reference staging via per-candidate python loop
    oriented = [bundle.codes_rc[rows[i]] if orient[i] else
                bundle.codes_fwd[rows[i]] for i in range(len(rid))]
    st_p = stage_candidates(seqs, g0, r0, oriented, rmax=st_u["rmax"],
                            nb=len(st_u["valid"]), read_ids=rid,
                            seq_idx=seq_idx)
    for key in ("read_f", "rlen_f", "gwin_f", "glen_f", "read_b", "rlen_b",
                "gwin_b", "glen_b", "g0", "r0", "read_len", "valid",
                "at_start", "read_id"):
        assert np.array_equal(st_u[key], st_p[key]), key


def test_cold_executable_cost_model_routing(tmp_path, monkeypatch):
    """With a cold fused executable the bulk precompute serves results
    natively (bit-identical) while a background thread warms the device
    path; once warm, bulk batches route to the device."""
    import time

    from gaml_tpu.scoring.readset import ReadSet
    from fixtures import make_linear_graph, sample_reads, write_fastq

    rng = np.random.default_rng(5)
    gr, seqs = make_linear_graph(rng, [700, 90, 650])
    genome = "".join(seqs)
    reads = sample_reads(rng, genome, 40, 30)
    fq = tmp_path / "coldwarm.fq"
    write_fastq(str(fq), reads)
    rs = ReadSet(str(tmp_path / "coldwarm"), str(fq), 0.96, 0.01,
                 backend="device")
    rs.preprocess_reads()
    rs.prepare_read_index()
    monkeypatch.delenv("GAML_DEV_EAGER", raising=False)
    monkeypatch.setattr(rs, "_dev_min_bases", 1)  # everything is "bulk"

    calls = []
    real = rs.aligner.align_subpaths_batch

    def spy(graph, paths, defer=False):
        calls.append(len(paths))
        return real(graph, paths, defer=defer)

    monkeypatch.setattr(rs.aligner, "align_subpaths_batch", spy)

    paths = [[0, 2, 4]]
    rs.precompute_alignment_for_paths(paths, gr)
    # first bulk call went native; a warm-up thread got the batch
    for _ in range(400):
        if rs._device_ready(gr, [(0,)]):
            break
        time.sleep(0.05)
    assert rs._dev_warm_done
    n_before = len(calls)
    rs.aligment_cache.clear()
    rs._precompute_memo.clear()
    rs._stage_memo = {}
    rs.precompute_alignment_for_paths([[4, 2, 0]], gr)
    assert len(calls) > n_before  # warm: bulk routed to the device path


def test_warmup_transient_failure_retries_then_goes_device():
    """A transient warm-up failure must NOT pin the route for the process
    lifetime: the next batch's device_ready re-attempts with its own
    warm_fn, and once an attempt succeeds the route goes device."""
    from gaml_tpu.utils import warmup

    key = ("test_warmup_retry", 1)
    calls = []

    def bad():
        calls.append("bad")
        raise RuntimeError("transient tunnel error")

    def good():
        calls.append("good")

    assert warmup.device_ready(key, bad) is False
    for th in list(warmup._THREADS):
        th.join(5)
    # failed once -> a later batch retries with its warm_fn
    assert warmup.device_ready(key, good) is False
    for th in list(warmup._THREADS):
        th.join(5)
    assert warmup.device_ready(key, good) is True
    assert calls == ["bad", "good"]


def test_warmup_exhausted_retries_pin_native(monkeypatch):
    """Once the bounded attempt budget is spent the key pins to failed:
    the router keeps answering False (native route) without starting new
    threads."""
    from gaml_tpu.utils import warmup

    monkeypatch.setenv("GAML_WARMUP_RETRIES", "1")  # 2 total attempts
    key = ("test_warmup_pin", 1)
    calls = []

    def bad():
        calls.append(1)
        raise RuntimeError("boom")

    for _ in range(2):
        assert warmup.device_ready(key, bad) is False
        for th in list(warmup._THREADS):
            th.join(5)
    assert warmup.device_ready(key, bad) is False
    assert warmup._STATE[key] == ("failed", 2)
    assert warmup.device_ready(key, bad) is False  # pinned: no new attempt
    assert len(calls) == 2
