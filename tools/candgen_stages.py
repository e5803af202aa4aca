"""Intra-jit stage bisection for the device rescore pipeline: times a
ladder of partial graphs (each a prefix of the full computation) so the
expensive stage is identified by differencing.  Chip tool.

    python tools/candgen_stages.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def chain(fn, k=6):
    import jax

    def run(reps):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(reps)]
        jax.block_until_ready(outs)
        return time.perf_counter() - t0

    t1 = min(run(1) for _ in range(2))
    tk = min(run(k) for _ in range(2))
    return (tk - t1) / (k - 1)


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_world
    from gaml_tpu.core.dna import _COMP_LUT
    from gaml_tpu.index.maxhash import HASH_XOR, K_INDEX_KMER
    from gaml_tpu.native import NativeAlignBundle, read_index_build
    from gaml_tpu.ops.candgen_device import DeviceCandGen
    from gaml_tpu.ops.extend_device import make_fused_body
    from gaml_tpu.ops.rescore_device import (DeviceRescorer,
                                             _stage_layout)

    K = K_INDEX_KMER
    genome_len, n_reads, L = 400_000, 100_000, 100
    genome, reads = build_world(genome_len, n_reads, L)
    fp, ok_m, _k, _rc, seed_pos = read_index_build(reads, K)
    okb = ok_m.astype(bool)
    rids_np = np.arange(n_reads, dtype=np.int64)[okb]
    fps_ok = fp[okb]
    order = np.argsort(fps_ok, kind="stable")
    sf_np, sr = fps_ok[order], rids_np[order]
    index = {}
    bounds = np.nonzero(np.diff(sf_np))[0] + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [len(sf_np)]))
    for s, e in zip(starts.tolist(), ends.tolist()):
        index[int(sf_np[s])] = sr[s:e].tolist()
    codes_rc = _COMP_LUT[reads][:, ::-1]
    bundle = NativeAlignBundle(index, L, reads, codes_rc, seed_pos,
                               np.arange(n_reads, dtype=np.int32))
    dev = DeviceRescorer(bundle)
    gen = dev.gen
    cap = 131072

    packed2, fixpos, seg_base, seg_len, g_total, s_pad = \
        DeviceCandGen.pack_windows([genome])
    packed2 = np.concatenate(
        [packed2, np.zeros(s_pad // 4 - len(packed2), np.uint8)])
    p2 = jax.device_put(jnp.asarray(packed2))
    fx = jax.device_put(jnp.asarray(fixpos))
    sb = jax.device_put(jnp.asarray(seg_base))
    sl = jax.device_put(jnp.asarray(seg_len))
    w = L - K + 1
    rq = max(4096, s_pad // 8)

    # ---------- candgen stage ladder (mirrors _candgen_impl)
    def front(packed2, fixpos, seg_base, seg_len):
        shifts = jnp.arange(4, dtype=jnp.int32) * 2
        codes = ((packed2[:, None].astype(jnp.int32) >> shifts[None, :])
                 & 3).reshape(s_pad)
        codes = jnp.concatenate([codes, jnp.zeros(1, jnp.int32)])
        codes = codes.at[fixpos].set(4, mode="drop")[:s_pad]
        j = jnp.arange(s_pad, dtype=jnp.int32)
        nseg_pad = seg_base.shape[0]
        seg_ids = jnp.arange(nseg_pad, dtype=jnp.int32)
        pid0 = jnp.zeros(s_pad + 1, jnp.int32).at[
            jnp.where(seg_ids < 1, seg_base, s_pad)].max(
            seg_ids, mode="drop")[:s_pad]
        pid = jax.lax.associative_scan(jnp.maximum, pid0)
        segb = seg_base[pid]
        segl = seg_len[pid]
        src = jnp.clip(segb + segl - 1 - (j - segb), 0, s_pad - 1)
        in_seg = (j < g_total) & (j - segb < segl)
        rcv = codes[src]
        rc_codes = jnp.where(in_seg, jnp.where(rcv < 4, 3 - rcv, rcv), 0)
        return codes, rc_codes, pid, j, segl

    def hashes(buf):
        v = jnp.where(buf < 4, buf, 0).astype(jnp.int32)
        v = jnp.concatenate([v, jnp.zeros(K, jnp.int32)])
        acc = jnp.zeros(s_pad, jnp.int32)
        for i in range(K):
            acc = (acc << 2) | v[i:i + s_pad]
        return acc ^ jnp.int32(HASH_XOR)

    def wmax(h):
        val, pos = h, jnp.arange(s_pad, dtype=jnp.int32)

        def comb(v1, p1, v2, p2):
            left = v1 >= v2
            return jnp.where(left, v1, v2), jnp.where(left, p1, p2)

        def sh(a, k, fill):
            return jnp.concatenate([a[k:], jnp.full((k,), fill, a.dtype)])

        size = 1
        while size * 2 <= w:
            val, pos = comb(val, pos, sh(val, size, -1), sh(pos, size, 0))
            size *= 2
        if size < w:
            d = w - size
            val, pos = comb(val, pos, sh(val, d, -1), sh(pos, d, 0))
        return val, pos

    def ladder_a(p2, fx, sb, sl):  # unpack + pid + rc
        codes, rc_codes, pid, j, segl = front(p2, fx, sb, sl)
        return codes.sum() + rc_codes.sum() + pid.sum()

    def ladder_b(p2, fx, sb, sl):  # + hashes + window max, both strands
        codes, rc_codes, pid, j, segl = front(p2, fx, sb, sl)
        f1, k1 = wmax(hashes(codes))
        f2, k2 = wmax(hashes(rc_codes))
        return f1.sum() + k1.sum() + f2.sum() + k2.sum()

    def ladder_c(p2, fx, sb, sl):  # + newrun/cumsum/compaction
        codes, rc_codes, pid, j, segl = front(p2, fx, sb, sl)
        pid_pad = jnp.concatenate([pid, jnp.full((L,), -1, jnp.int32)])
        wv = (pid_pad[L - 1:L - 1 + s_pad] == pid) & \
            (j + L - 1 < g_total) & (segl >= L)
        out = []
        for buf in (codes, rc_codes):
            fpv, kp = wmax(hashes(buf))
            prev_fp = jnp.concatenate(
                [jnp.full((1,), -1, jnp.int32), fpv[:-1]])
            prev_pid = jnp.concatenate(
                [jnp.full((1,), -1, jnp.int32), pid[:-1]])
            newrun = wv & ((j == 0) | (pid != prev_pid)
                           | (fpv != prev_fp))
            rpos = jnp.cumsum(newrun.astype(jnp.int32)) - 1
            tgt = jnp.where(newrun, rpos, rq)

            def compact(x, fill):
                return jnp.full(rq + 1, fill, jnp.int32).at[tgt].set(
                    x, mode="drop")[:rq]

            out.append(compact(fpv, -1).sum() + compact(kp, 0).sum()
                       + compact(j, 0).sum())
        return out[0] + out[1]

    js = {}
    for name, f in (("a:unpack+pid+rc", ladder_a),
                    ("b:+hash+winmax", ladder_b),
                    ("c:+runs+compact", ladder_c)):
        jf = jax.jit(f)
        t0 = time.perf_counter()
        jax.block_until_ready(jf(p2, fx, sb, sl))
        tc = time.perf_counter() - t0
        dt = chain(lambda jf=jf: jf(p2, fx, sb, sl))
        print(f"{name:18s} marginal={dt*1000:7.1f} ms (compile {tc:.0f}s)",
              flush=True)

    # full candgen for reference + inputs for the rescore ladder
    out = gen.query([genome], cap=cap, return_layout=True)
    jax.block_until_ready(out[:7])
    codes_u8, rid, g0, r0, orient, seg, n_tot, seg_base2, seg_len2 = out
    dt = chain(lambda: gen.query([genome], cap=cap)[1])
    print(f"candgen full       marginal={dt*1000:7.1f} ms", flush=True)

    # ---------- rescore ladder
    lay = dev._lay(cap)
    sbj = jnp.asarray(seg_base2)
    slj = jnp.asarray(seg_len2)
    row_of = gen.row_of_dev
    rmax = dev.ext.rmax

    def fill(rid, g0, r0, orient, seg, n_tot):
        iota = jnp.arange(cap, dtype=jnp.int32)
        valid = iota < n_tot
        r0f = jnp.where(valid, r0, L - K)
        g0f = jnp.where(valid, g0, 0)
        base = jnp.where(valid, sbj[jnp.clip(seg, 0, sbj.shape[0] - 1)],
                         0)
        glen = jnp.where(valid, slj[jnp.clip(seg, 0, slj.shape[0] - 1)],
                         0)
        rows = row_of[jnp.clip(rid, 0, row_of.shape[0] - 1)]
        return iota, valid, r0f, g0f, base, glen, rows

    def ladder_f(rid, g0, r0, orient, seg, n_tot):  # layout only
        iota, valid, r0f, g0f, base, glen, rows = fill(
            rid, g0, r0, orient, seg, n_tot)
        gidx, nrows_f, nrows_b = _stage_layout(r0f, g0f, lay, L, cap)
        return gidx.sum() + nrows_f.sum() + nrows_b.sum()

    def ladder_g(rid, g0, r0, orient, seg, n_tot):  # + gathers + DP
        iota, valid, r0f, g0f, base, glen, rows = fill(
            rid, g0, r0, orient, seg, n_tot)
        gidx, nrows_f, nrows_b = _stage_layout(r0f, g0f, lay, L, cap)
        bases, glens, g0s, r0s, rowss, ors = (
            x[gidx] for x in (base, glen, g0f, r0f, rows, orient))
        body = make_fused_body(L, rmax, True, True, False)
        ok, errs, begin, pk = body(dev.ext.fwd_words, dev.ext.rc_words,
                                   codes_u8, bases, glens, g0s, r0s,
                                   rowss, ors, nrows_f, nrows_b)
        return pk.sum()

    for name, f in (("f:fill+layout", ladder_f),
                    ("g:+gathers+DP", ladder_g)):
        jf = jax.jit(f)
        t0 = time.perf_counter()
        jax.block_until_ready(jf(rid, g0, r0, orient, seg, n_tot))
        tc = time.perf_counter() - t0
        dt = chain(lambda jf=jf: jf(rid, g0, r0, orient, seg, n_tot))
        print(f"{name:18s} marginal={dt*1000:7.1f} ms (compile {tc:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
