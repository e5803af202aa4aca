"""Pallas TPU kernel for the banded log-space forward DP (long reads).

The gather-free formulation (ops.forward.banded_forward) becomes a fully
static Pallas pipeline once everything data-dependent is prestaged on host:

- per-row band steps delta in {0,1,2} (host-clipped guide path);
- the 2 chars entering the band's right edge each row (band bases are a
  host cumsum of deltas, so the chars are one host gather);
- per-row in-target band bounds [lo, hi).

Layout mirrors the extend kernel: the 128-wide band occupies the sublane
axis and 128 reads occupy the lane axis; the read-position axis is the
second (sequential) grid dimension, with per-row inputs delivered as
(1, 128) blocks by their BlockSpec index maps and the DP state (m, cw) in
VMEM scratch persisting across grid steps — no dynamic slicing anywhere.
The within-row gap chain is relaxed with doubling steps 1+2+4+8 (chains
beyond 15 gaps carry < e^-45 relative mass, far below float32 resolution;
blocked band cells only occur at the edges, so jumps never hop an interior
break).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
WIDTH = 128   # band (sublane axis)
LANES = 128   # reads per program (lane axis)


ROWS_PER_STEP = 8  # sublane-aligned row blocks, statically unrolled


def _fwd_kernel(reads_ref, steps_ref, fetch_ref, lo_ref, hi_ref, cw0_ref,
                m0_ref, rlen_ref, out_ref, m_scr, cw_scr, *,
                rmax: int, log_match: float, log_mismatch: float):
    j = pl.program_id(1)
    offs = jax.lax.broadcasted_iota(jnp.int32, (WIDTH, LANES), 0)

    @pl.when(j == 0)
    def _():
        m_scr[:, :] = m0_ref[:, :]
        cw_scr[:, :] = cw0_ref[:, :]

    def logaddexp(a, b):
        hi = jnp.maximum(a, b)
        lo = jnp.minimum(a, b)
        return hi + jnp.log1p(jnp.exp(lo - hi))

    rlens = rlen_ref[:, :]           # [1, L]
    m_cur = m_scr[:, :]
    cw_cur = cw_scr[:, :]

    neg1 = jnp.full((1, LANES), NEG)
    neg2 = jnp.full((2, LANES), NEG)

    for r in range(ROWS_PER_STEP):
        m_prev = m_cur
        cw = cw_cur
        delta = steps_ref[r:r + 1, :]          # [1, L]
        fetch = fetch_ref[r]                   # [2, L]
        lo = lo_ref[r:r + 1, :]
        hi = hi_ref[r:r + 1, :]
        rchar = reads_ref[r:r + 1, :]

        cw1 = jnp.concatenate([cw[1:], fetch[1:2]], axis=0)
        cw2 = jnp.concatenate([cw[2:], fetch], axis=0)
        cw_new = jnp.where(delta == 0, cw, jnp.where(delta == 1, cw1, cw2))

        m_m1 = jnp.concatenate([neg1, m_prev[:-1]], axis=0)
        m_p1 = jnp.concatenate([m_prev[1:], neg1], axis=0)
        m_p2 = jnp.concatenate([m_prev[2:], neg2], axis=0)

        up = jnp.where(delta == 0, m_prev, jnp.where(delta == 1, m_p1, m_p2))
        diag = jnp.where(delta == 0, m_m1, jnp.where(delta == 1, m_prev, m_p1))

        s_diag = jnp.where(cw_new == rchar, log_match, log_mismatch)
        s_diag = jnp.where(cw_new >= 8, NEG, s_diag)
        in_target = (offs >= lo) & (offs < hi)
        base_val = logaddexp(diag + s_diag, up + log_mismatch)
        base_val = jnp.where(in_target, base_val, NEG)

        gap_ok = in_target & (cw_new < 8)
        x = base_val
        for step in (1, 2, 4, 8):
            moved = jnp.concatenate(
                [jnp.full((step, LANES), NEG), x[:-step]], axis=0)
            x = jnp.where(gap_ok, logaddexp(x, moved + step * log_mismatch), x)

        active = (j * ROWS_PER_STEP + r + 1) <= rlens
        m_cur = jnp.where(active, x, m_prev)
        cw_cur = jnp.where(active, cw_new, cw)

    m_scr[:, :] = m_cur
    cw_scr[:, :] = cw_cur

    @pl.when(j == (rmax // ROWS_PER_STEP) - 1)
    def _():
        mx = jnp.max(m_cur, axis=0, keepdims=True)
        s = jnp.sum(jnp.exp(m_cur - mx), axis=0, keepdims=True)
        out_ref[:, :] = mx + jnp.log(s)


@functools.partial(jax.jit, static_argnames=("rmax", "interpret", "log_match",
                                             "log_mismatch"))
def banded_forward_pallas_call(reads_t, steps_t, fetch_t, lo_t, hi_t, cw0_t,
                               m0_t, rlens_t, log_match: float,
                               log_mismatch: float, rmax: int,
                               interpret: bool = False):
    """All inputs transposed: per-row arrays [rmax, Bp]; fetch [rmax, 2, Bp];
    cw0/m0 [WIDTH, Bp]; rlens [1, Bp].  The big per-row arrays arrive as
    int8/uint8 (codes <= 9, steps <= 2, band bounds <= 128) and widen to
    int32 here ON DEVICE — the host->device transfer is the dominant cost
    of a dispatch on tunneled chips, and this cuts it 4x."""
    reads_t = reads_t.astype(jnp.int32)
    steps_t = steps_t.astype(jnp.int32)
    fetch_t = fetch_t.astype(jnp.int32)
    lo_t = lo_t.astype(jnp.int32)
    hi_t = hi_t.astype(jnp.int32)
    bp = reads_t.shape[1]
    assert bp % LANES == 0
    assert rmax % ROWS_PER_STEP == 0
    grid = (bp // LANES, rmax // ROWS_PER_STEP)
    kernel = functools.partial(_fwd_kernel, rmax=rmax,
                               log_match=float(log_match),
                               log_mismatch=float(log_mismatch))
    row_spec = pl.BlockSpec((ROWS_PER_STEP, LANES), lambda i, j: (j, i))
    fixed_spec = pl.BlockSpec((WIDTH, LANES), lambda i, j: (0, i))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            row_spec,                                           # reads
            row_spec,                                           # steps
            pl.BlockSpec((ROWS_PER_STEP, 2, LANES),
                         lambda i, j: (j, 0, i)),               # fetch
            row_spec,                                           # lo
            row_spec,                                           # hi
            fixed_spec,                                         # cw0
            fixed_spec,                                         # m0
            pl.BlockSpec((1, LANES), lambda i, j: (0, i)),      # rlens
        ],
        out_specs=pl.BlockSpec((1, LANES), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((1, bp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((WIDTH, LANES), jnp.float32),
            pltpu.VMEM((WIDTH, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(reads_t, steps_t, fetch_t, lo_t, hi_t, cw0_t, m0_t, rlens_t)
    return out[0]


def banded_forward_pallas(genome, reads, rlens, centers, gstarts, glens,
                          log_match, log_mismatch, rmax: int,
                          width: int = WIDTH, interpret: bool = False,
                          return_device: bool = False):
    """Drop-in for ops.forward.banded_forward (width fixed to 128): host
    prestaging + Pallas kernel.  ``return_device=True`` skips the blocking
    fetch and returns the padded [Bp] device array (the caller slices to
    the live batch after fetching) — callers chunking one logical batch
    into several fixed-shape dispatches pipeline them this way."""
    genome = np.asarray(genome)
    reads = np.asarray(reads)
    rlens_np = np.asarray(rlens)
    centers = np.asarray(centers)
    gstarts = np.asarray(gstarts)
    glens = np.asarray(glens)
    b = reads.shape[0]
    bp = ((b + LANES - 1) // LANES) * LANES

    steps = np.clip(np.diff(centers, axis=1), 0, 2).astype(np.int32)
    bases = (centers[:, 0] - WIDTH // 2)[:, None] + \
        np.concatenate([np.zeros((b, 1), np.int32),
                        np.cumsum(steps, axis=1)], axis=1)

    def g_at(idx):
        safe = np.clip(idx, 0, len(genome) - 1)
        ch = genome[safe].astype(np.int32)
        return np.where((idx >= 0) & (idx < len(genome)), ch, 9)

    offs = np.arange(WIDTH)
    cw0 = g_at(bases[:, 0:1] + offs[None, :] - 1).astype(np.int32)
    g0 = bases[:, 0:1] + offs[None, :]
    in0 = (g0 >= gstarts[:, None]) & (g0 < (gstarts + glens)[:, None])
    m0 = np.where(in0, 0.0, NEG).astype(np.float32)

    fetch = np.stack([g_at(bases[:, 1:] + WIDTH - 3),
                      g_at(bases[:, 1:] + WIDTH - 2)], axis=1)  # [B,2,rmax]
    lo = np.clip(gstarts[:, None] - bases[:, 1:], 0, WIDTH).astype(np.int32)
    hi = np.clip((gstarts + glens)[:, None] - bases[:, 1:], 0,
                 WIDTH).astype(np.int32)

    def padb(a, fill=0):
        if a.shape[0] == bp:
            return a
        out = np.full((bp,) + a.shape[1:], fill, a.dtype)
        out[:b] = a
        return out

    rmax_p = ((rmax + ROWS_PER_STEP - 1) // ROWS_PER_STEP) * ROWS_PER_STEP

    def padr(a, axis):
        if a.shape[axis] == rmax_p:
            return a
        pad = [(0, 0)] * a.ndim
        pad[axis] = (0, rmax_p - a.shape[axis])
        return np.pad(a, pad)

    # compact dtypes for the transfer: codes fit int8, band bounds uint8
    reads_t = np.ascontiguousarray(padr(padb(reads.astype(np.int8)), 1).T)
    steps_t = np.ascontiguousarray(
        padr(padb(steps.astype(np.int8)), 1).T)              # [rmax_p, Bp]
    fetch_t = np.ascontiguousarray(
        np.transpose(padr(padb(fetch.astype(np.int8)), 2),
                     (2, 1, 0)))                             # [rmax_p,2,Bp]
    lo_t = np.ascontiguousarray(padr(padb(lo.astype(np.uint8)), 1).T)
    hi_t = np.ascontiguousarray(padr(padb(hi.astype(np.uint8)), 1).T)
    cw0_t = np.ascontiguousarray(padb(cw0).T)                # [WIDTH, Bp]
    m0_t = np.ascontiguousarray(padb(m0, NEG).T)
    rlens_t = padb(rlens_np.astype(np.int32))[None, :]       # [1, Bp]

    out = banded_forward_pallas_call(
        jnp.asarray(reads_t), jnp.asarray(steps_t), jnp.asarray(fetch_t),
        jnp.asarray(lo_t), jnp.asarray(hi_t), jnp.asarray(cw0_t),
        jnp.asarray(m0_t), jnp.asarray(rlens_t),
        float(log_match), float(log_mismatch), rmax_p, interpret=interpret)
    if return_device:
        return out
    return np.asarray(out)[:b]
