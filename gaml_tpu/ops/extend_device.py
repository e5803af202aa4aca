"""Device-resident staging + extension for the device backend.

The naive device path staged every candidate's read and genome window on
host and shipped [N, rmax]-shaped arrays to the chip — hundreds of MB per
cold rescore through the remote tunnel.  TPU-natively, the per-read code
matrices are *resident* on the device (uploaded once per read set), and a
rescore ships only:

- the concatenated window sequence bytes (the walk content actually being
  scored), and
- 20 bytes per candidate of metadata (window index, g0, r0, row, orient).

Staging (read-suffix/prefix views, genome windows) happens on device as
gathers inside the same jit that runs the banded-extension DP, so XLA
fuses it all into one dispatch.  Outputs (ok, errs, begin) are bit-equal
to the host-staged path (ops.extend.stage_candidates_uniform +
extend_staged) — tested in tests/test_device_candgen.py.

Two compile-cost rules shape the API:

1. The jitted body is **shape-parametric and module-level**: the resident
   read matrices are passed as *arguments*, never closure-captured.  A
   captured device array becomes a literal constant of the XLA program —
   compiles took minutes per read set, executables embedded the whole
   read matrix, and neither the in-process nor the persistent compile
   cache could share work across read sets.  With arguments, every read
   set whose padded shapes match reuses ONE executable.
2. Shapes are bucketed (candidates to powers of two >= 512, sequence
   bytes to powers of two >= 4096, read-matrix rows to powers of two
   >= 1024) so the compile count stays logarithmic.

The host-return path fetches ONE packed int32 per candidate
((begin+64)<<6 | min(errs,31)<<1 | ok) instead of three arrays — one
round trip, ~3x fewer bytes through the tunnel.
"""
from __future__ import annotations

import os

import numpy as np

from .extend import ERROR_LIMIT, K, PAD, SENT_GEN, SENT_READ

LANES = 128


def _bucket_pow2(n: int, lo: int) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


_CACHE_SET = False


def _enable_compile_cache():
    global _CACHE_SET
    if _CACHE_SET:
        return
    _CACHE_SET = True
    import jax

    # default the persistent compile cache next to the package (survives
    # /tmp wipes between runs on shared build machines); override with
    # GAML_JAX_CACHE
    default_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache")
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("GAML_JAX_CACHE", default_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax: cache flags unavailable


BPW = 8          # bases per packed int32 word (4-bit fields; codes 0..8)
FIELD = 4        # bits per base field
PACK_BIAS = 64   # begin offset in the packed result word


def _pack_words_np(bytes2d: np.ndarray) -> np.ndarray:
    b = bytes2d.astype(np.int32).reshape(
        bytes2d.shape[:-1] + (bytes2d.shape[-1] // BPW, BPW))
    out = b[..., 0]
    for k in range(1, BPW):
        out = out | (b[..., k] << (FIELD * k))
    return out


_FUSED_FNS = {}


def _get_fused(L: int, rmax: int, n_pad: int, s_pad: int, use_pallas: bool,
               sorted_mode: bool = False):
    """The shared jitted fused stage+DP body for one shape bucket.

    Signature: fused(fwd_words [R, W] i32, rc_words [R, W] i32,
                     seq_buf [s_pad] u8, base/glen_c/g0/r0/rows/orient
                     [n_pad] i32) -> (ok, errs, begin, packed), all
    [n_pad].  R and W are traced from the argument shapes, so one
    executable serves every read set with matching (L, rmax) buckets.

    With ``sorted_mode`` the caller lays candidates out sorted by r0
    (block_layout) and passes two extra per-block row-bound arrays
    (nrows_f, nrows_b); the DP then runs as the SWAR cost kernel
    (forward — cost-only is all that direction feeds) plus the dynamic-
    rows register kernel (backward — cost + accept offset), each looping
    only to its block's max live row.  Outputs are in the caller's
    (permuted) candidate order; bit-equal per candidate to the static
    path for every consumed value (ok everywhere; errs/begin wherever
    ok — non-ok errs saturate at 7 per direction, and no consumer reads
    them: ops/score.py zeroes non-ok payloads, the aligner postprocess
    filters by ok first)."""
    key = (L, rmax, n_pad, s_pad, bool(use_pallas), bool(sorted_mode),
           os.environ.get("GAML_PALLAS_INTERPRET") == "1",
           os.environ.get("GAML_SWAR_BACKWARD", "1"))
    fn = _FUSED_FNS.get(key)
    if fn is not None:
        return fn

    import jax

    fused = make_fused_body(L, rmax, use_pallas, sorted_mode,
                            interp=key[-1])
    fn = _FUSED_FNS[key] = jax.jit(fused)
    return fn


def make_fused_body(L: int, rmax: int, use_pallas: bool,
                    sorted_mode: bool = False, interp: bool = False):
    """Unjitted fused stage+DP body (shape-parametric: n_pad/s_pad come
    from the argument shapes).  Exposed so larger jits — the full
    device rescore in ops.rescore_device — can inline it."""
    import jax.numpy as jnp

    def pack_words(bytes2d):
        """[.., BPW*k] uint8 -> [.., k] int32, BPW bases per word in
        FIELD-bit fields (the HBM gather then moves BPW x fewer
        elements)."""
        b = bytes2d.astype(jnp.int32).reshape(
            bytes2d.shape[:-1] + (bytes2d.shape[-1] // BPW, BPW))
        out = b[..., 0]
        for k in range(1, BPW):
            out = out | (b[..., k] << (FIELD * k))
        return out

    def unpack_phase(w, ph, out_len):
        """bytes[i, t] = field (ph[i] + t) of the word stream w[i, :]:
        rotate each row's words by its phase IN THE PACKED DOMAIN (two
        vector shifts on [N, nw] words), then unpack with static field
        offsets — no per-row selection over the unpacked bytes.  Safe
        because packed fields are codes <= 4 (3 bits), so shifted words
        never touch the sign bit."""
        ph4 = (FIELD * ph)[:, None]
        wn = jnp.concatenate([w[:, 1:], jnp.zeros_like(w[:, :1])],
                             axis=1)
        rot = (w >> ph4) | jnp.where(
            ph4 == 0, 0, wn << (FIELD * BPW - ph4))
        mask = (1 << FIELD) - 1
        b = jnp.stack([(rot >> (FIELD * k)) & mask for k in range(BPW)],
                      axis=2).reshape(w.shape[0], BPW * w.shape[1])
        return b[:, 0:out_len]

    def gather_slices(words, starts, out_len, lo: int = None,
                      hi: int = None):
        """bytes[i, t] = src[i, starts[i] + t] for t < out_len, where
        ``words`` is the packed view of src.  words: [N, W] (per-row)
        or [W] (shared).  Out-of-range reads are arbitrary (callers
        mask); word indices are clamped.

        TPU-shaped (round 5): general take_along_axis lowers to scalar
        gathers (~60 ms per 131k-candidate rescore, the whole staging
        wall).  Per-row sources instead sum masked static column slices
        over the word-offset range [lo, hi] (small and statically known
        from L/rmax); the shared 1-D source becomes a sliding word
        matrix built from static shifts plus ONE row gather."""
        nw = out_len // BPW + 2
        base = starts // BPW
        ph = (starts % BPW).astype(jnp.int32)
        if words.ndim == 1:
            nrow = words.shape[0] - nw + 1
            cols = jnp.stack([words[m:m + nrow] for m in range(nw)],
                             axis=1)
            w = cols[jnp.clip(base, 0, nrow - 1)]
        else:
            W = words.shape[1]
            lo = 0 if lo is None else max(lo, 0)
            hi = W - 1 if hi is None else min(hi, W - 1)
            wordsp = jnp.concatenate(
                [words, jnp.zeros((words.shape[0], nw), jnp.int32)],
                axis=1)
            basec = jnp.clip(base, lo, hi)[:, None]
            w = jnp.zeros((words.shape[0], nw), jnp.int32)
            for m in range(lo, hi + 1):
                w = w + jnp.where(basec == m, wordsp[:, m:m + nw], 0)
        return unpack_phase(w, ph, out_len)

    wlen = rmax + 2 * PAD
    # left sentinel pads so every gather start is non-negative; the
    # padded bytes land only at masked positions
    wpad_r = rmax // BPW + 1
    wpad_g = wlen // BPW + 1

    def fused(fwd_words, rc_words, seq_buf, base, glen_c, g0, r0, rows,
              orient, nrows_f=None, nrows_b=None):
        n_pad = g0.shape[0]
        s_pad = seq_buf.shape[0]
        # r0/orient may arrive as uint8 (compact transfer; r0 < L <= 255
        # buckets) — widen before any arithmetic to avoid u8 overflow
        r0 = r0.astype(jnp.int32)
        orient = orient.astype(jnp.int32)
        j = jnp.arange(rmax)
        jj = jnp.arange(wlen)
        owords = jnp.where((orient == 1)[:, None], rc_words[rows],
                           fwd_words[rows])
        pad_b = (-s_pad) % BPW + BPW
        bw = pack_words(jnp.concatenate(
            [seq_buf, jnp.zeros((pad_b,), jnp.uint8)])[None, :])[0]

        # forward: read suffix after the seed vs genome from seed end
        cols = (r0 + K)[:, None] + j[None, :]
        sel = cols < L
        read_f = jnp.where(sel, gather_slices(owords, r0 + K, rmax,
                                              lo=K // BPW, hi=L // BPW),
                           SENT_READ)
        rlen_f = (L - r0 - K).astype(jnp.int32)
        glen_f = (glen_c - (g0 + K)).astype(jnp.int32)
        p = (g0 + K - PAD)[:, None] + jj[None, :]
        inb = (p >= 0) & (p < glen_c[:, None])
        gwin_f = jnp.where(
            inb, gather_slices(bw, base + g0 + K - PAD, wlen), SENT_GEN)

        # backward: reversed read prefix vs reversed genome prefix.
        # read_b[j] = oriented[r0-1-j]: gather the forward slice
        # starting at r0-rmax and flip; gwin_b[jj] = buf[g0-1-(jj-PAD)]:
        # gather from base+g0+PAD-wlen and flip.  Left-padded packed
        # sources keep the (possibly negative) starts in range.
        at_start = g0 == 0
        bsel = ~at_start
        cols_b = r0[:, None] - 1 - j[None, :]
        sel_b = (cols_b >= 0) & bsel[:, None]
        owords_pad = jnp.concatenate(
            [jnp.zeros((owords.shape[0], wpad_r), jnp.int32), owords],
            axis=1)
        read_b = jnp.where(
            sel_b,
            gather_slices(owords_pad, r0 - rmax + BPW * wpad_r,
                          rmax, lo=(BPW * wpad_r - rmax) // BPW,
                          hi=(L - K - rmax + BPW * wpad_r) // BPW
                          )[:, ::-1],
            SENT_READ)
        rlen_b = jnp.where(bsel, r0, 0).astype(jnp.int32)
        glen_b = jnp.where(bsel, g0, 0).astype(jnp.int32)
        pb = g0[:, None] - 1 - (jj[None, :] - PAD)
        inb_b = (jj[None, :] >= PAD) & (pb >= 0) & bsel[:, None]
        bw_pad = jnp.concatenate(
            [jnp.zeros((wpad_g,), jnp.int32), bw])
        gwin_b = jnp.where(
            inb_b,
            gather_slices(bw_pad,
                          base + g0 + PAD - wlen + BPW * wpad_g,
                          wlen)[:, ::-1],
            SENT_GEN)

        if use_pallas and sorted_mode:
            from .extend_pallas import (dp_rows_pallas_reg_dyn,
                                        swar_cost_accept_pallas,
                                        swar_cost_pallas)

            # sorted-dynamic production path: forward cost via the SWAR
            # kernel; backward cost+accept-offset via the packed-field
            # SWAR accept kernel (round 5; GAML_SWAR_BACKWARD=0 restores
            # the dynamic-rows register kernel); each block loops only
            # to its max live row
            cf = swar_cost_pallas(read_f.T, gwin_f.T, rlen_f, glen_f,
                                  rmax, nrows_f, interpret=interp)
            if os.environ.get("GAML_SWAR_BACKWARD", "1") == "1":
                cb, ab = swar_cost_accept_pallas(
                    read_b.T, gwin_b.T, rlen_b, glen_b, rmax, nrows_b,
                    interpret=interp)
            else:
                cb, ab = dp_rows_pallas_reg_dyn(
                    read_b.T, gwin_b.T, rlen_b, glen_b, rmax, nrows_b,
                    interpret=interp)
            ok = (cf <= ERROR_LIMIT) & (cb <= ERROR_LIMIT)
            errs = cf + cb
            d_back = ab
        elif use_pallas:
            from .extend_pallas import dp_rows_pallas

            # both directions in ONE kernel launch: stack along lanes
            read_t = jnp.concatenate([read_f, read_b], axis=0).T
            gwin_t = jnp.concatenate([gwin_f, gwin_b], axis=0).T
            rlen2 = jnp.concatenate([rlen_f, rlen_b])[None, :]
            glen2 = jnp.concatenate([glen_f, glen_b])[None, :]
            c2, a2 = dp_rows_pallas(read_t, gwin_t, rlen2, glen2, rmax)
            cf, cb = c2[:n_pad], c2[n_pad:]
            ab = a2[n_pad:]
            ok = (cf <= ERROR_LIMIT) & (cb <= ERROR_LIMIT)
            errs = cf + cb
            d_back = ab
        else:
            from .extend import _dp_rows

            c0f, _a0f = _dp_rows(read_f.astype(jnp.uint8), rlen_f,
                                 gwin_f.astype(jnp.uint8), glen_f, rmax)
            c0b, a0b = _dp_rows(read_b.astype(jnp.uint8), rlen_b,
                                gwin_b.astype(jnp.uint8), glen_b, rmax)
            ok = (c0f[:, 3] <= ERROR_LIMIT) & (c0b[:, 3] <= ERROR_LIMIT)
            errs = c0f[:, 3] + c0b[:, 3]
            d_back = a0b[:, 3]

        begin = g0 - r0 - d_back
        ok = jnp.where(at_start, ok & (r0 < 6), ok)
        errs = jnp.where(at_start, errs + r0, errs)
        begin = jnp.where(at_start, -1, begin)
        errs = errs.astype(jnp.int32)
        begin = begin.astype(jnp.int32)
        packed = ((jnp.clip(begin, -PACK_BIAS, 1 << 24) + PACK_BIAS) << 6) \
            | (jnp.clip(errs, 0, 31) << 1) | ok.astype(jnp.int32)
        return ok, errs, begin, packed

    return fused


def unpack_results(packed: np.ndarray):
    """Host inverse of the packed result word -> (ok, errs, begin)."""
    ok = (packed & 1).astype(bool)
    errs = ((packed >> 1) & 31).astype(np.int32)
    begin = ((packed >> 6) - PACK_BIAS).astype(np.int32)
    return ok, errs, begin


_ROWS_PAD_SEEN = [1024]  # process-wide max rows bucket (see __init__)


class DeviceExtender:
    """Per-read-set device extension engine with resident read matrices."""

    def __init__(self, codes_fwd: np.ndarray, codes_rc: np.ndarray):
        import jax
        import jax.numpy as jnp

        _enable_compile_cache()
        self.L = int(codes_fwd.shape[1])
        rmax_needed = max(self.L - K, 1)
        self.rmax = ((rmax_needed + 31) // 32) * 32
        # packed 4-bit-per-base views, rows padded to a power of two so
        # read sets of similar size share one executable; built once on
        # host and resident on device (the staging gathers then move BPW x
        # fewer elements than byte gathers).  Later read sets pad up to
        # the LARGEST bucket seen in this process (a few extra MB of
        # resident upload buys executable reuse: every distinct row count
        # otherwise costs its own ~45 s server-side XLA compile).
        # GAML_DEV_ROWS_PAD pins the bucket explicitly.
        n_rows = int(codes_fwd.shape[0])
        env_pad = int(os.environ.get("GAML_DEV_ROWS_PAD", "0"))
        self.n_rows_pad = max(_bucket_pow2(max(n_rows, 1), 1024),
                              _ROWS_PAD_SEEN[0], env_pad)
        _ROWS_PAD_SEEN[0] = self.n_rows_pad
        pad_to4 = (-self.L) % BPW + BPW

        def pack_resident(codes):
            buf = np.zeros((self.n_rows_pad, self.L + pad_to4), np.uint8)
            buf[:n_rows, :self.L] = codes
            return jax.device_put(jnp.asarray(_pack_words_np(buf)))

        if os.environ.get("GAML_DEV_DEBUG") == "1":
            import time as _time

            _t0 = _time.perf_counter()
            self.fwd_words = pack_resident(codes_fwd)
            self.rc_words = pack_resident(codes_rc)
            jax.block_until_ready((self.fwd_words, self.rc_words))
            print(f"[dev.init] rows={n_rows} pad={self.n_rows_pad} "
                  f"upload={_time.perf_counter() - _t0:.2f}s", flush=True)
        else:
            self.fwd_words = pack_resident(codes_fwd)
            self.rc_words = pack_resident(codes_rc)

    # --------------------------------------------------------------- run
    def run(self, seq_buf: np.ndarray, seq_base: np.ndarray,
            seq_lens: np.ndarray, seq_idx: np.ndarray, g0: np.ndarray,
            r0: np.ndarray, rows: np.ndarray, orient: np.ndarray,
            use_pallas: bool = None, return_device: bool = False,
            defer: bool = False):
        """Returns (ok, errs, begin) for the N candidates — numpy arrays,
        or padded device arrays (length >= n) when return_device so a
        downstream on-device reduction avoids the round trip.

        With ``defer`` the dispatches still happen eagerly (JAX is async)
        but the blocking result fetch is packaged into the returned
        zero-arg closure — callers pipelining several read sets' batches
        dispatch ALL of them first and fetch at the end, overlapping
        upload/compute across batches and collapsing several tunnel block
        points into one.

        Batches larger than GAML_DEV_CHUNK candidates are dispatched as a
        sequence of fixed-shape chunks sharing ONE uploaded window buffer:
        XLA compile time grows superlinearly in the candidate-axis length
        (tens of seconds at 128k, unusable beyond), while a warm capped
        dispatch costs ~0.1 s — so chunking bounds compile cost at one
        executable per (chunk, s_pad) bucket and pipelines the rest."""
        import jax

        n = len(g0)
        if n == 0:
            empty = (np.zeros(0, bool), np.zeros(0, np.int32),
                     np.zeros(0, np.int32))
            return (lambda: empty) if defer else empty
        if use_pallas is None:
            use_pallas = jax.devices()[0].platform not in ("cpu",) and \
                os.environ.get("GAML_USE_PALLAS", "1") == "1"
        chunk = int(os.environ.get("GAML_DEV_CHUNK", str(64 * 1024)))
        s_pad = _bucket_pow2(len(seq_buf) + 1, 4096)
        # multi-chunk batches round the tail UP to the full chunk shape:
        # one executable serves every chunk (a second tail-shaped
        # executable costs ~45 s of server-side XLA compile per process)
        tail_to_chunk = n > chunk

        buf = np.zeros(s_pad, dtype=np.uint8)
        buf[:len(seq_buf)] = seq_buf
        import jax.numpy as jnp

        buf_dev = jnp.asarray(buf)

        base_all = seq_base[seq_idx]
        glen_all = seq_lens[seq_idx]
        r0_fill = max(self.L - K, 0)

        # sorted-dynamic mode: candidates globally sorted by r0 (ascending
        # seed position) so every kernel block sees a tight live-row range
        # in BOTH directions (fwd rows = L-K-r0 descend, bwd rows = r0
        # ascend); per-chunk block_layout + per-block row bounds drive the
        # SWAR/dynamic-rows kernels (~8x the static kernel pair on the
        # chip, bit-equal consumed outputs).  GAML_DEV_SORTED=0 restores
        # the static stacked kernel.
        from .extend_pallas import BLOCK_CANDS, block_layout

        # every chunk of a run shares one n_pad (tail rounds up), so the
        # sorted decision is global: on only when that shape fits the
        # block-laid kernels (>= 8*512 candidates)
        n_pad_all = chunk if tail_to_chunk else _bucket_pow2(n, 512)
        sort_ok = use_pallas and n_pad_all % BLOCK_CANDS == 0 and \
            os.environ.get("GAML_DEV_SORTED", "1") == "1"
        if sort_ok:
            order = np.argsort(np.asarray(r0), kind="stable").astype(
                np.int64)
            g0_a = np.asarray(g0)[order]
            r0_a = np.asarray(r0)[order]
            rows_a = np.asarray(rows)[order]
            orient_a = np.asarray(orient)[order]
            base_a = base_all[order]
            glen_a = glen_all[order]
        else:
            order = None
            g0_a, r0_a, rows_a, orient_a = g0, r0, rows, orient
            base_a, glen_a = base_all, glen_all

        debug = os.environ.get("GAML_DEV_DEBUG") == "1"
        t_disp = 0.0
        if debug:
            import time as _time

            _t0 = _time.perf_counter()
        outs = []  # (nc, results, src_lay or None)
        for c0 in range(0, n, chunk):
            c1 = min(c0 + chunk, n)
            nc = c1 - c0
            n_pad = n_pad_all

            # r0/orient transfer as uint8 when they fit (the kernel widens
            # on device) — 25% less per-candidate metadata on the wire
            r0_dt = np.uint8 if max(self.L, r0_fill) <= 255 else np.int32

            if sort_ok:
                # src_lay[slot] = sorted-global candidate position, -1 pad
                lay = block_layout(n_pad)
                src = np.full(n_pad, -1, dtype=np.int64)
                src[:nc] = np.arange(c0, c1)
                src_lay = src[lay]
                live = src_lay >= 0

                def padL(a, fill=0, dtype=np.int32):
                    out = np.full(n_pad, fill, dtype=dtype)
                    out[live] = a[src_lay[live]].astype(dtype)
                    return out

                # per-block row bounds from the SORTED order (each block
                # holds a contiguous sorted run by construction); pads
                # contribute 0 rows in both directions (r0 = L-K, g0 = 0)
                r0_srt = np.full(n_pad, r0_fill, dtype=np.int64)
                r0_srt[:nc] = r0_a[c0:c1]
                g0_srt = np.zeros(n_pad, dtype=np.int64)
                g0_srt[:nc] = g0_a[c0:c1]
                rf = np.maximum(self.L - K - r0_srt, 0)
                rb = np.where(g0_srt > 0, r0_srt, 0)
                nb_blocks = n_pad // BLOCK_CANDS
                nrows_f = rf.reshape(nb_blocks, BLOCK_CANDS).max(1)\
                    .astype(np.int32)
                nrows_b = rb.reshape(nb_blocks, BLOCK_CANDS).max(1)\
                    .astype(np.int32)
                # pad slots: g0 = 0 + r0 = L-K -> rlen_f = rlen_b = 0
                fn = _get_fused(self.L, self.rmax, n_pad, s_pad,
                                use_pallas, sorted_mode=True)
                outs.append((nc, fn(
                    self.fwd_words, self.rc_words, buf_dev,
                    jnp.asarray(padL(base_a)), jnp.asarray(padL(glen_a)),
                    jnp.asarray(padL(g0_a, 0)),
                    jnp.asarray(padL(r0_a, r0_fill, r0_dt)),
                    jnp.asarray(padL(rows_a)),
                    jnp.asarray(padL(orient_a, 0, np.uint8)),
                    jnp.asarray(nrows_f), jnp.asarray(nrows_b)),
                    src_lay))
                continue

            def pad32(a, fill=0, dtype=np.int32):
                out = np.full(n_pad, fill, dtype=dtype)
                out[:nc] = a[c0:c1]
                return out

            # pad rows stage as zero-length reads against empty genome:
            # rlen_f = L - r0 - K with r0 = L - K makes them cost-0 no-ops
            fn = _get_fused(self.L, self.rmax, n_pad, s_pad, use_pallas)
            outs.append((nc, fn(
                self.fwd_words, self.rc_words, buf_dev,
                jnp.asarray(pad32(base_a)), jnp.asarray(pad32(glen_a)),
                jnp.asarray(pad32(g0_a, 1)),
                jnp.asarray(pad32(r0_a, r0_fill, r0_dt)),
                jnp.asarray(pad32(rows_a)),
                jnp.asarray(pad32(orient_a, 0, np.uint8))), None))
        if debug:
            t_disp = _time.perf_counter() - _t0

        def finish():
            if debug:
                import time as _time

                _t1 = _time.perf_counter()
            if return_device:
                if order is None:
                    if len(outs) == 1:
                        ok, errs, begin, _packed = outs[0][1]
                        return ok, errs, begin
                    ok = jnp.concatenate([o[1][0][:o[0]] for o in outs])
                    errs = jnp.concatenate([o[1][1][:o[0]] for o in outs])
                    begin = jnp.concatenate(
                        [o[1][2][:o[0]] for o in outs])
                    return ok, errs, begin
                # sorted mode: map original candidate i -> its slot in
                # the concatenated padded outputs (one device gather per
                # result array restores the caller's candidate order)
                ok = jnp.concatenate([o[1][0] for o in outs]) \
                    if len(outs) > 1 else outs[0][1][0]
                errs = jnp.concatenate([o[1][1] for o in outs]) \
                    if len(outs) > 1 else outs[0][1][1]
                begin = jnp.concatenate([o[1][2] for o in outs]) \
                    if len(outs) > 1 else outs[0][1][2]
                gpos = np.empty(n, dtype=np.int32)
                at = 0
                for _nc_o, _res, src_lay in outs:
                    live = src_lay >= 0
                    gpos[order[src_lay[live]]] = \
                        (at + np.nonzero(live)[0]).astype(np.int32)
                    at += len(src_lay)
                gj = jnp.asarray(gpos)
                return (jnp.take(ok, gj), jnp.take(errs, gj),
                        jnp.take(begin, gj))
            if order is None:
                packed = np.concatenate(
                    [np.asarray(o[1][3])[:o[0]] for o in outs])
            else:
                packed = np.empty(n, dtype=np.int32)
                for nc_o, res, src_lay in outs:
                    pk = np.asarray(res[3])
                    live = src_lay >= 0
                    packed[order[src_lay[live]]] = pk[live]
            if debug:
                print(f"[dev.run] n={n} chunks={len(outs)} s_pad={s_pad} "
                      f"dispatch={t_disp:.2f}s fetch="
                      f"{_time.perf_counter() - _t1:.2f}s", flush=True)
            return unpack_results(packed)

        return finish if defer else finish()
