"""SWAR band-DP prototype: band costs in 4-bit fields of one int32.

One int32 per candidate holds the whole 7-slot band (4-bit saturating
fields, spare MSB per field for carry-free SWAR compares), so a (8, 128)
vreg covers 1024 candidates x 7 band cells.  Cost-only kernel, validated
bit-for-bit on hardware against the int32 sublane kernel under the
saturated contract (exact where <= 6, clamped at 7 — downstream only
consumes ok <= 3 entries).

Measured on the v5e (marginal cost inside a 16-deep on-device chain, so
tunnel round-trip latency is excluded): ~2.1 ms per 131M-band-cell call
(~62 G cells/s) vs ~4.4 ms (~30 G cells/s) for the production sublane
kernel.  Not integrated: the backward direction also needs the
accept-offset propagation, whose SWAR form (~55 extra ops/row of
eq-masks and selects) eats most of the margin; kept as the recipe for a
future cost-only fast path.  Run: python tools/swar_kernel_proto.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import sys
sys.path.insert(0, "/root/repo")
from gaml_tpu.ops.extend import PAD, INF, INVALID_A
from gaml_tpu.ops.extend_pallas import BAND8, LANES, dp_rows_pallas

L7 = 0x1111111          # 7 fields of 1
H7 = 0x8888888          # 7 field MSBs
INF7 = 0x7777777        # 7 fields of 7 (saturated INF)
M28 = 0x0FFFFFFF
DCONST = 0x6543210      # field d holds value d


def pack_bandchars(gwin_t, rmax):
    """bandchars[r, c] = sum_d remap(gwin[r+1+d, c]) << 4d  (d=0..6)."""
    g = jnp.where(gwin_t >= 6, gwin_t - 2, gwin_t).astype(jnp.int32)
    out = jnp.zeros((rmax,) + gwin_t.shape[1:], jnp.int32)
    for d in range(7):
        out = out | (jax.lax.dynamic_slice_in_dim(g, 1 + d, rmax, 0) << (4 * d))
    return out


def _swar_min(a, b):
    """Per-4bit-field min; fields must be <= 7 (spare MSB)."""
    d = (a | H7) - b
    ge = d & H7                       # MSB set iff a >= b
    full = (ge >> 3) * 15             # 0xF where a >= b
    return (b & full) | (a & ~full)


def _sat_add1(w):
    """+1 per field, saturating at 7 (fields <= 7 on input)."""
    s = w + L7
    ov = s & H7
    return s - (ov >> 3)


def _swar_kernel(bc_ref, rc_ref, rlen_ref, glen_ref, c_ref, *, rmax: int,
                 unroll: int):
    W = LANES
    rlens = [rlen_ref[:, u * W:(u + 1) * W] for u in range(unroll)]
    glens = [glen_ref[:, u * W:(u + 1) * W] for u in range(unroll)]

    def row_step(r, bc, rc, rlen, glen, c):
        x = bc ^ rc
        eq = H7 & ~((x | H7) - L7)
        fm = (eq >> 3) * 15
        t = jnp.clip(glen - r + 2, 0, 7)
        ge = H7 & ((DCONST | H7) - t * L7)
        fgpi = ((H7 ^ ge) >> 3) * 15
        lr_full = jnp.where(rlen == r + 1, -1, 0)
        acc_full = jnp.where(r >= rlen, -1, 0)

        dcond = fm & (fgpi | lr_full)
        diag = (c & dcond) | (INF7 & ~dcond)
        add1 = _sat_add1(c)
        scond = fgpi & ~fm
        sub = (add1 & scond) | (INF7 & ~scond)
        c_dm1 = ((c << 4) | 0x7) & M28
        rk = _sat_add1(c_dm1)
        rskip = (rk & ~fm & M28) | (INF7 & fm)
        c_row = _swar_min(_swar_min(diag, sub), rskip)
        for _ in range(3):
            up = (c_row >> 4) | (0x7 << 24)
            m = _swar_min(c_row, _sat_add1(up))
            c_row = (m & scond) | (c_row & ~scond)
        c_row = c_row & ~acc_full
        return c_row

    def body(kk, carry):
        r = rmax - 1 - kk
        bct = bc_ref[pl.ds(r, 1), :, :][0]
        rct = rc_ref[pl.ds(r, 1), :, :][0]
        out = list(carry)
        for u in range(unroll):
            out[u] = row_step(r, bct[:, u * W:(u + 1) * W],
                              rct[:, u * W:(u + 1) * W],
                              rlens[u], glens[u], out[u])
        return tuple(out)

    init = tuple(jnp.zeros((8, W), jnp.int32) for _ in range(unroll))
    outs = jax.lax.fori_loop(0, rmax, body, init)
    for u in range(unroll):
        c_ref[:, u * W:(u + 1) * W] = outs[u]


@functools.partial(jax.jit, static_argnames=("rmax", "unroll"))
def swar_costs(read_t, gwin_t, rlen, glen, rmax: int, unroll: int = 4):
    n = read_t.shape[1]
    bc = pack_bandchars(gwin_t, rmax)
    rt = jnp.where(read_t >= 6, read_t - 2, read_t).astype(jnp.int32)
    rc = rt * L7
    m = n // 8
    W = LANES * unroll
    bc_r = bc.reshape(rmax, 8, m).transpose(0, 1, 2).reshape(rmax, 8, m)
    # lay candidates as (8, m): candidate c -> (c // m, c % m)
    bc_r = bc.reshape(rmax, 8, m)
    rc_r = rc.reshape(rmax, 8, m)
    rlen_r = rlen.reshape(8, m)
    glen_r = glen.reshape(8, m)
    grid = (m // W,)
    kernel = functools.partial(_swar_kernel, rmax=rmax, unroll=unroll)
    c0 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rmax, 8, W), lambda i: (0, 0, i)),
            pl.BlockSpec((rmax, 8, W), lambda i: (0, 0, i)),
            pl.BlockSpec((8, W), lambda i: (0, i)),
            pl.BlockSpec((8, W), lambda i: (0, i)),
        ],
        out_specs=[pl.BlockSpec((8, W), lambda i: (0, i))],
        out_shape=[jax.ShapeDtypeStruct((8, m), jnp.int32)],
    )(bc_r, rc_r, rlen_r, glen_r)[0]
    return c0.reshape(n)


def main():
    rng = np.random.default_rng(0)
    n, rmax = 131072, 96
    read_np = rng.integers(0, 5, (rmax, n)).astype(np.int32)
    gwin_np = rng.integers(0, 5, (rmax + 2 * PAD, n)).astype(np.int32)
    gwin_np[PAD:PAD + rmax, : n // 2] = read_np[:, : n // 2]
    # sprinkle sentinels
    gwin_np[gwin_np == 4] = 8
    read_np[read_np == 4] = 6
    read_t = jnp.asarray(read_np)
    gwin_t = jnp.asarray(gwin_np)
    rlen = jnp.asarray(rng.integers(0, rmax + 1, (1, n)).astype(np.int32))
    glen = jnp.asarray(rng.integers(0, rmax + PAD, (1, n)).astype(np.int32))

    c_ref, _a = dp_rows_pallas(read_t, gwin_t, rlen, glen, rmax, width=128)
    c_ref = np.asarray(c_ref)

    for unroll in (1, 2, 4, 8):
        cw = swar_costs(read_t, gwin_t, rlen, glen, rmax, unroll=unroll)
        jax.block_until_ready(cw)
        got = (np.asarray(cw) >> (4 * 3)) & 0xF
        want = np.minimum(c_ref, 7)
        bad = got != want
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            cw = swar_costs(read_t, gwin_t, rlen, glen, rmax, unroll=unroll)
            jax.block_until_ready(cw)
            ts.append(time.perf_counter() - t0)
        t = sorted(ts)[2]
        cells = n * rmax * BAND8
        print(f"unroll={unroll}: t={t*1000:7.2f} ms  {cells/t/1e9:6.2f} G "
              f"cells/s  mismatches={int(bad.sum())}", flush=True)
        if bad.any():
            i = int(np.nonzero(bad.ravel())[0][0])
            print("  first bad cand", i, "got", got.ravel()[i],
                  "want", want.ravel()[i], "rlen", int(np.asarray(rlen)[0, i]),
                  "glen", int(np.asarray(glen)[0, i]))


if __name__ == "__main__":
    main()
