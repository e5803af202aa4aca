"""Bisect the fused staging+DP body (ops.extend_device.make_fused_body):
which of row-gathers / slice-gathers / unpack / kernels costs the 75 ms.

    python tools/staging_stages.py
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
    from gaml_tpu.index.maxhash import K_INDEX_KMER
    from gaml_tpu.native import NativeAlignBundle, read_index_build
    from gaml_tpu.ops.extend import PAD, SENT_GEN, SENT_READ
    from gaml_tpu.ops.extend_device import BPW, FIELD
    from gaml_tpu.ops.rescore_device import DeviceRescorer, _stage_layout

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
    cap = 131072
    rmax = dev.ext.rmax

    out = dev.gen.query([genome], cap=cap, return_layout=True)
    jax.block_until_ready(out[:7])
    codes_u8, rid, g0, r0, orient, seg, n_tot, seg_base2, seg_len2 = out
    sbj = jnp.asarray(seg_base2)
    slj = jnp.asarray(seg_len2)
    row_of = dev.gen.row_of_dev
    lay = dev._lay(cap)
    fwd_words, rc_words = dev.ext.fwd_words, dev.ext.rc_words

    wlen = rmax + 2 * PAD
    wpad_r = rmax // BPW + 1
    wpad_g = wlen // BPW + 1

    def pack_words(bytes2d):
        b = bytes2d.astype(jnp.int32).reshape(
            bytes2d.shape[:-1] + (bytes2d.shape[-1] // BPW, BPW))
        o = b[..., 0]
        for k2 in range(1, BPW):
            o = o | (b[..., k2] << (FIELD * k2))
        return o

    def gather_slices(words, starts, out_len):
        nw = out_len // BPW + 2
        base = starts // BPW
        ph = (starts % BPW).astype(jnp.int32)
        wmax = (words.shape[-1] - 1)
        wordcols = jnp.clip(base[:, None] + jnp.arange(nw)[None, :],
                            0, wmax)
        if words.ndim == 1:
            wv = words[wordcols]
        else:
            wv = jnp.take_along_axis(words, wordcols, axis=1)
        mask = (1 << FIELD) - 1
        b = jnp.stack([(wv >> (FIELD * k2)) & mask for k2 in range(BPW)],
                      axis=2).reshape(wv.shape[0], BPW * nw)
        o = b[:, 0:out_len]
        for k2 in range(1, BPW):
            o = jnp.where((ph == k2)[:, None], b[:, k2:k2 + out_len], o)
        return o

    def prefix(rid, g0, r0, orient, seg, n_tot):
        iota = jnp.arange(cap, dtype=jnp.int32)
        valid = iota < n_tot
        r0f = jnp.where(valid, r0, L - K)
        g0f = jnp.where(valid, g0, 0)
        base = jnp.where(valid, sbj[jnp.clip(seg, 0, sbj.shape[0] - 1)],
                         0)
        glen = jnp.where(valid, slj[jnp.clip(seg, 0, slj.shape[0] - 1)],
                         0)
        rows = row_of[jnp.clip(rid, 0, row_of.shape[0] - 1)]
        gidx, nrows_f, nrows_b = _stage_layout(r0f, g0f, lay, L, cap)
        bases, glens, g0s, r0s, rowss, ors = (
            x[gidx] for x in (base, glen, g0f, r0f, rows, orient))
        return bases, glens, g0s, r0s, rowss, ors, nrows_f, nrows_b

    def s1_rows(rid, g0, r0, orient, seg, n_tot):
        base, glen_c, g0v, r0v, rows, ors, _nf, _nb = prefix(
            rid, g0, r0, orient, seg, n_tot)
        owords = jnp.where((ors == 1)[:, None], rc_words[rows],
                           fwd_words[rows])
        return owords.sum()

    def s2_read(rid, g0, r0, orient, seg, n_tot):
        base, glen_c, g0v, r0v, rows, ors, _nf, _nb = prefix(
            rid, g0, r0, orient, seg, n_tot)
        r0v = r0v.astype(jnp.int32)
        owords = jnp.where((ors == 1)[:, None], rc_words[rows],
                           fwd_words[rows])
        j = jnp.arange(rmax)
        cols = (r0v + K)[:, None] + j[None, :]
        sel = cols < L
        read_f = jnp.where(sel, gather_slices(owords, r0v + K, rmax),
                           SENT_READ)
        owords_pad = jnp.concatenate(
            [jnp.zeros((owords.shape[0], wpad_r), jnp.int32), owords],
            axis=1)
        cols_b = r0v[:, None] - 1 - j[None, :]
        read_b = jnp.where(cols_b >= 0,
                           gather_slices(owords_pad,
                                         r0v - rmax + BPW * wpad_r,
                                         rmax)[:, ::-1], SENT_READ)
        return read_f.sum() + read_b.sum()

    def s3_gwin(rid, g0, r0, orient, seg, n_tot):
        base, glen_c, g0v, r0v, rows, ors, _nf, _nb = prefix(
            rid, g0, r0, orient, seg, n_tot)
        s_pad2 = codes_u8.shape[0]
        pad_b = (-s_pad2) % BPW + BPW
        bw = pack_words(jnp.concatenate(
            [codes_u8, jnp.zeros((pad_b,), jnp.uint8)])[None, :])[0]
        jj = jnp.arange(wlen)
        p = (g0v + K - PAD)[:, None] + jj[None, :]
        inb = (p >= 0) & (p < glen_c[:, None])
        gwin_f = jnp.where(
            inb, gather_slices(bw, base + g0v + K - PAD, wlen), SENT_GEN)
        bw_pad = jnp.concatenate([jnp.zeros((wpad_g,), jnp.int32), bw])
        pb = g0v[:, None] - 1 - (jj[None, :] - PAD)
        inb_b = (jj[None, :] >= PAD) & (pb >= 0)
        gwin_b = jnp.where(
            inb_b,
            gather_slices(bw_pad, base + g0v + PAD - wlen + BPW * wpad_g,
                          wlen)[:, ::-1], SENT_GEN)
        return gwin_f.sum() + gwin_b.sum()

    names = (("s1:oword row gathers", s1_rows),
             ("s2:+read slice/unpack", s2_read),
             ("s3:gwin slice/unpack", s3_gwin))
    for name, f in names:
        jf = jax.jit(f)
        t0 = time.perf_counter()
        jax.block_until_ready(jf(rid, g0, r0, orient, seg, n_tot))
        tc = time.perf_counter() - t0
        dt = chain(lambda jf=jf: jf(rid, g0, r0, orient, seg, n_tot))
        print(f"{name:24s} marginal={dt*1000:7.1f} ms "
              f"(compile {tc:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
