"""Pallas TPU kernel for the banded-extension DP.

Same math as ops.extend._dp_rows (cost-to-accept + preferred-accept-offset
propagation), laid out TPU-natively: candidates occupy the 128-wide lane
dimension, the +-3 band occupies 8 sublanes (one f32/i32 tile), and the row
loop walks the read with *static* per-row slices of the transposed inputs —
no gathers anywhere.  The grid tiles the candidate axis; each program
processes 128 candidates entirely in VMEM.

Inputs are the transposed int32 views of the stage_candidates arrays:
    read_t [rmax, N], gwin_t [rmax + 2*PAD, N], rlen/glen [1, N].
Outputs: c0/a0 [1, N] (cost and preferred accept offset of the start
state).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .extend import BAND, ERROR_LIMIT, INF, INVALID_A, PAD

LANES = 128
BAND8 = 8  # band padded to one sublane tile; row 7 (d=+4) is masked off

# candidates per grid program in the sorted-dynamic kernels (8 sublanes x
# 512 lanes); batches smaller than one block fall back to the static path
BLOCK_CANDS = 8 * 512

# SWAR constants: the whole 7-slot band lives in 4-bit fields of one
# int32 (spare MSB per field keeps compares carry-free); costs saturate
# at 7 — exact wherever the true cost is <= 6, far above the downstream
# ok <= ERROR_LIMIT = 3 consumption (see swar_cost_pallas docstring)
L7 = 0x1111111          # 7 fields of 1
H7 = 0x8888888          # 7 field MSBs
INF7 = 0x7777777        # 7 fields of 7 (saturated INF)
M28 = 0x0FFFFFFF
DCONST = 0x6543210      # field d holds value d


def _dp_kernel(read_ref, gwin_ref, rlen_ref, glen_ref, c_ref, a_ref,
               *, rmax: int, width: int = LANES):
    """Rows are processed DESCENDING in groups of 8: each group loads one
    sublane-ALIGNED (16, width) genome tile and one (8, width) read tile,
    and the 8 unrolled row steps slice them statically — Mosaic requires
    dynamic sublane starts to be multiples of 8 for wide vector loads
    (group start = base_r + PAD - 4 with 8 | base_r and PAD = 20), and the
    grouping also cuts VMEM ref loads 8x vs a per-row dynamic slice."""
    rlen = rlen_ref[0, :]
    glen = glen_ref[0, :]
    d_off = jax.lax.broadcasted_iota(jnp.int32, (BAND8, width), 0) - 3
    band_ok = d_off <= 3  # row 7 is outside the +-3 band

    inf = jnp.full((BAND8, width), INF, jnp.int32)
    invalid = jnp.full((BAND8, width), INVALID_A, jnp.int32)

    def shift_dm1(x, fill):
        return jnp.concatenate([fill[:1], x[:-1]], axis=0)

    def shift_dp1(x, fill):
        return jnp.concatenate([x[1:], fill[:1]], axis=0)

    def row_step(r, chars, rchar, carry):
        c_next, a_next = carry
        match = chars == rchar
        g_plus_in = (r + d_off + 1) < glen[None, :]
        last_row = (r + 1) == rlen[None, :]

        diag = jnp.where(match & (g_plus_in | last_row), c_next, INF)
        sub = jnp.where(~match & g_plus_in, c_next + 1, INF)
        c_next_dm1 = shift_dm1(c_next, inf)
        rskip = jnp.where(~match, c_next_dm1 + 1, INF)
        c_row = jnp.minimum(jnp.minimum(diag, sub), rskip)
        gskip_ok = (~match) & g_plus_in
        for _ in range(3):
            c_row = jnp.where(gskip_ok,
                              jnp.minimum(c_row, shift_dp1(c_row, inf) + 1),
                              c_row)
        in_accept = r >= rlen[None, :]
        c_row = jnp.where(in_accept, 0, c_row)
        c_row = jnp.where(band_ok, c_row, INF)

        take_sub = (~match) & g_plus_in & (c_next == c_row - 1)
        take_gskip = (~match) & ~take_sub & gskip_ok & \
            (shift_dp1(c_row, inf) == c_row - 1)
        take_rskip = (~match) & ~take_sub & ~take_gskip & \
            (c_next_dm1 == c_row - 1)
        a_row = jnp.where(match, a_next,
                          jnp.where(take_sub, a_next,
                                    jnp.where(take_rskip,
                                              shift_dm1(a_next, invalid),
                                              INVALID_A)))
        for _ in range(4):
            a_row = jnp.where(take_gskip, shift_dp1(a_row, invalid), a_row)
        a_row = jnp.where(in_accept, d_off, a_row)
        return c_row, a_row

    n_groups = rmax // 8  # rmax is rounded to a multiple of 32 upstream

    def body(kk, carry):
        base_r = rmax - 8 * (kk + 1)
        # Mosaic needs PROOF that wide vector-load sublane starts are
        # 8-aligned; both starts are 8 | base_r (+16) by construction
        gtile = gwin_ref[pl.ds(pl.multiple_of(base_r + (PAD - 4), 8),
                               16), :]
        rtile = read_ref[pl.ds(pl.multiple_of(base_r, 8), 8), :]
        for o in range(7, -1, -1):
            # row r = base_r + o needs genome rows r+PAD-3 .. r+PAD+4 =
            # tile offsets o+1 .. o+8 (static slice of the loaded value)
            carry = row_step(base_r + o, gtile[o + 1:o + 9],
                             rtile[o:o + 1], carry)
        return carry

    c_init = jnp.zeros((BAND8, width), jnp.int32)
    a_init = d_off
    c0, a0 = jax.lax.fori_loop(0, n_groups, body, (c_init, a_init))
    c_ref[0, :] = c0[3, :]
    a_ref[0, :] = a0[3, :]


def _dp_kernel_reg(read_ref, gwin_ref, rlen_ref, glen_ref, c_ref, a_ref,
                   *, rmax: int):
    """Band-in-REGISTERS formulation: each band offset d in [-3, +3] is a
    separate named (8, MB) array, so every cross-band dependency
    (min/select against d±1) is plain register renaming — ZERO
    cross-sublane shuffles, vs ~10 per row in the sublane-band kernel
    (the measured bottleneck: throughput was flat in block width, i.e.
    latency-bound on the shuffle-heavy serial row chain).  Candidates
    fill dense (8, MB) tiles (the 8 sublanes are candidates, not band
    slots); per row the only memory traffic is two (1, 8, MB) row loads
    (read char + the one new genome row entering the rolling char ring).

    refs: read [rmax, 8, MB], gwin [rmax + 2*PAD, 8, MB],
    rlen/glen [8, MB]; outs c/a [8, MB] (the d=0 start state)."""
    rlen = rlen_ref[:, :]
    glen = glen_ref[:, :]
    shape = rlen.shape

    inf = jnp.full(shape, INF, jnp.int32)
    invalid = jnp.full(shape, INVALID_A, jnp.int32)

    def gwin_row(r):
        return gwin_ref[pl.ds(r, 1), :, :][0]

    def body(it, carry):
        cs, a_s, ch = carry  # tuples of 7: band d = idx, d_off = idx - 3
        r = rmax - 1 - it
        rchar = read_ref[pl.ds(r, 1), :, :][0]
        match = [ch[d] == rchar for d in range(7)]
        gpi = [(r + d - 3 + 1) < glen for d in range(7)]
        last_row = (r + 1) == rlen
        in_accept = r >= rlen

        diag = [jnp.where(match[d] & (gpi[d] | last_row), cs[d], INF)
                for d in range(7)]
        sub = [jnp.where(~match[d] & gpi[d], cs[d] + 1, INF)
               for d in range(7)]
        c_dm1 = [inf] + list(cs[:6])
        rskip = [jnp.where(~match[d], c_dm1[d] + 1, INF) for d in range(7)]
        c_row = [jnp.minimum(jnp.minimum(diag[d], sub[d]), rskip[d])
                 for d in range(7)]
        gskip_ok = [(~match[d]) & gpi[d] for d in range(7)]
        for _ in range(3):
            up = list(c_row[1:]) + [inf]
            c_row = [jnp.where(gskip_ok[d],
                               jnp.minimum(c_row[d], up[d] + 1), c_row[d])
                     for d in range(7)]
        c_row = [jnp.where(in_accept, 0, c_row[d]) for d in range(7)]

        c_up = list(c_row[1:]) + [inf]
        take_sub = [(~match[d]) & gpi[d] & (cs[d] == c_row[d] - 1)
                    for d in range(7)]
        take_gskip = [(~match[d]) & ~take_sub[d] & gskip_ok[d] &
                      (c_up[d] == c_row[d] - 1) for d in range(7)]
        take_rskip = [(~match[d]) & ~take_sub[d] & ~take_gskip[d] &
                      (c_dm1[d] == c_row[d] - 1) for d in range(7)]
        a_dm1 = [invalid] + list(a_s[:6])
        a_row = [jnp.where(match[d] | take_sub[d], a_s[d],
                           jnp.where(take_rskip[d], a_dm1[d], INVALID_A))
                 for d in range(7)]
        for _ in range(4):
            a_up = list(a_row[1:]) + [invalid]
            a_row = [jnp.where(take_gskip[d], a_up[d], a_row[d])
                     for d in range(7)]
        a_row = [jnp.where(in_accept, d - 3, a_row[d]) for d in range(7)]

        # roll the char ring down one genome row (descending r): next row
        # r-1 has char_d(r-1) = char_{d-1}(r); one new load at gwin row r
        ch_new = (gwin_row(r),) + tuple(ch[:6])
        return tuple(c_row), tuple(a_row), ch_new

    c_init = tuple(jnp.zeros(shape, jnp.int32) for _ in range(7))
    a_init = tuple(jnp.full(shape, d - 3, jnp.int32) for d in range(7))
    # char_d(rmax-1) = gwin row (rmax - 1) + PAD - 3 + d = rmax + d
    ch_init = tuple(gwin_row(rmax + d) for d in range(7))
    cs, a_s, _ch = jax.lax.fori_loop(0, rmax, body,
                                     (c_init, a_init, ch_init))
    c_ref[:, :] = cs[3]
    a_ref[:, :] = a_s[3]


def _reg_block(m: int) -> int:
    """Lanes-dim block for the register kernel (power-of-two divisor of m,
    capped at GAML_PALLAS_W; VMEM per program ~ (2*rmax + 8) * 8 * MB * 4 B)."""
    import os

    cap = int(os.environ.get("GAML_PALLAS_W", "512"))
    w = LANES
    while w * 2 <= cap and m % (w * 2) == 0:
        w *= 2
    return w


def dp_rows_pallas_reg(read_t, gwin_t, rlen, glen, rmax: int,
                       interpret: bool = False):
    """Register-band variant of dp_rows_pallas (same contract); requires
    the candidate axis divisible by 8*128."""
    n = read_t.shape[1]
    m = n // 8
    read_r = read_t.reshape(rmax, 8, m)
    gwin_r = gwin_t.reshape(gwin_t.shape[0], 8, m)
    rlen_r = rlen.reshape(8, m)
    glen_r = glen.reshape(8, m)
    mb = _reg_block(m)
    grid = (m // mb,)
    kernel = functools.partial(_dp_kernel_reg, rmax=rmax)
    c0, a0 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rmax, 8, mb), lambda i: (0, 0, i)),
            pl.BlockSpec((gwin_t.shape[0], 8, mb), lambda i: (0, 0, i)),
            pl.BlockSpec((8, mb), lambda i: (0, i)),
            pl.BlockSpec((8, mb), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((8, mb), lambda i: (0, i)),
            pl.BlockSpec((8, mb), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, m), jnp.int32),
            jax.ShapeDtypeStruct((8, m), jnp.int32),
        ],
        interpret=interpret,
    )(read_r, gwin_r, rlen_r, glen_r)
    return c0.reshape(n), a0.reshape(n)


def _block_width(n: int) -> int:
    """Candidate-axis block width per grid program: the largest
    power-of-two divisor of n, capped at GAML_PALLAS_W (default 1024).
    Wider blocks amortize the sequential row loop's per-op overhead over
    more lanes (the (8, 128) tiles of the original kernel left the VPU
    mostly idle between row steps); VMEM per program is
    (2*rmax + 2*PAD + 4) * W * 4 B — ~1 MB at rmax=96, W=1024."""
    import os

    cap = int(os.environ.get("GAML_PALLAS_W", "1024"))
    w = LANES
    while w * 2 <= cap and n % (w * 2) == 0:
        w *= 2
    return w


@functools.partial(jax.jit, static_argnames=("rmax", "interpret", "width"))
def dp_rows_pallas(read_t, gwin_t, rlen, glen, rmax: int,
                   interpret: bool = False, width: int = 0):
    """read_t [rmax, N] i32; gwin_t [rmax+2*PAD, N] i32; rlen/glen [1, N].
    Returns (c0, a0) each [N].  ``width`` = candidates per grid program
    (0 = auto via _block_width)."""
    n = read_t.shape[1]
    assert n % LANES == 0
    assert rmax % 8 == 0, "row grouping needs 8 | rmax"
    import os

    if n % (8 * LANES) == 0 and width == 0 and \
            os.environ.get("GAML_PALLAS_KERNEL", "reg") == "reg":
        return dp_rows_pallas_reg(read_t, gwin_t, rlen, glen, rmax,
                                  interpret=interpret)
    w = width or _block_width(n)
    grid = (n // w,)
    kernel = functools.partial(_dp_kernel, rmax=rmax, width=w)
    c0, a0 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rmax, w), lambda i: (0, i)),
            pl.BlockSpec((rmax + 2 * PAD, w), lambda i: (0, i)),
            pl.BlockSpec((1, w), lambda i: (0, i)),
            pl.BlockSpec((1, w), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((1, w), lambda i: (0, i)),
            pl.BlockSpec((1, w), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.int32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
        ],
        interpret=interpret,
    )(read_t, gwin_t, rlen, glen)
    return c0[0], a0[0]


# --------------------------------------------------------------------------
# Sorted-dynamic production path: candidates sorted by seed position r0 so
# each grid block holds a contiguous run of the sort, and every block's row
# loop runs only to the block's max live row (rows >= rlen are identity
# accept rows — skipping them is bit-exact).  r0 is ~uniform over the read
# (it is a max-hash argmax), so the mean live row count is ~rmax/2 per
# direction; with the block bound tight the DP processes ~0.62x the cells.
# The cost-only forward direction additionally runs as a SWAR kernel (the
# whole 7-slot band in one int32, ~2x the cells/s of the register kernel).
# Reference kernel being accelerated: ProcessHit, graph.cc:753-837.
# --------------------------------------------------------------------------


_LAYOUTS = {}


def block_layout(n: int) -> np.ndarray:
    """Slot permutation placing a SORTED candidate order into the (8, m)
    tile layout so that each grid program's 8x512 block holds a
    contiguous run of the sort (tight per-block row bounds).

    Returns lay [n] with lay[slot] = sorted-position; slot j maps to
    sublane j // m, lane j % m of the reshaped arrays, and grid block b
    covers lanes [b*512, (b+1)*512) of every sublane — which under this
    layout is exactly sorted positions [b*4096, (b+1)*4096).  Cached per
    n (it is a pure function recomputed on every chunk otherwise)."""
    lay = _LAYOUTS.get(n)
    if lay is not None:
        return lay
    assert n % BLOCK_CANDS == 0
    mb = BLOCK_CANDS // 8
    lay = (np.arange(n).reshape(n // BLOCK_CANDS, 8, mb)
           .transpose(1, 0, 2).reshape(n))
    lay.setflags(write=False)
    _LAYOUTS[n] = lay
    return lay


def block_bounds(vals_sorted: np.ndarray) -> np.ndarray:
    """Per-block max of a SORTED per-candidate value array (the dynamic
    row bound of each 8x512 block)."""
    n = len(vals_sorted)
    return (vals_sorted.reshape(n // BLOCK_CANDS, BLOCK_CANDS)
            .max(axis=1).astype(np.int32))


def pack_bandchars(gwin_t, rmax: int):
    """bandchars[r, c] = sum_d remap(gwin[r+1+d, c]) << 4d (d = 0..6):
    the 7 band characters of row r packed into one int32.  Sentinel code
    8 remaps to 6 so every code fits a 4-bit field (6 never equals a
    remapped read code: read sentinel 6 remaps to 4)."""
    g = jnp.where(gwin_t >= 6, gwin_t - 2, gwin_t).astype(jnp.int32)
    out = jnp.zeros((rmax,) + gwin_t.shape[1:], jnp.int32)
    for d in range(7):
        out = out | (jax.lax.dynamic_slice_in_dim(g, 1 + d, rmax, 0)
                     << (4 * d))
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


def _swar_row_step(r, bc, rc, rlen, glen, c):
    """One DP row over 7 band slots packed in int32 fields — the SWAR
    form of the register kernel's cost recurrence (match/sub/genome-skip/
    read-skip with the boundary rules of ops.extend), saturating at 7."""
    x = bc ^ rc
    eq = H7 & ~((x | H7) - L7)
    fm = (eq >> 3) * 15               # 0xF per matching field
    t = jnp.clip(glen - r + 2, 0, 7)
    ge = H7 & ((DCONST | H7) - t * L7)
    fgpi = ((H7 ^ ge) >> 3) * 15      # g_plus_in per field
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
    return c_row & ~acc_full


def _swar_kernel_dyn(nrows_ref, bc_ref, rc_ref, rlen_ref, glen_ref, c_ref,
                     *, unroll: int):
    W = LANES
    R = nrows_ref[pl.program_id(0)]
    rlens = [rlen_ref[:, u * W:(u + 1) * W] for u in range(unroll)]
    glens = [glen_ref[:, u * W:(u + 1) * W] for u in range(unroll)]

    def body(kk, carry):
        r = R - 1 - kk
        bct = bc_ref[pl.ds(r, 1), :, :][0]
        rct = rc_ref[pl.ds(r, 1), :, :][0]
        out = list(carry)
        for u in range(unroll):
            out[u] = _swar_row_step(r, bct[:, u * W:(u + 1) * W],
                                    rct[:, u * W:(u + 1) * W],
                                    rlens[u], glens[u], out[u])
        return tuple(out)

    init = tuple(jnp.zeros((8, W), jnp.int32) for _ in range(unroll))
    outs = jax.lax.fori_loop(0, R, body, init)
    for u in range(unroll):
        c_ref[:, u * W:(u + 1) * W] = outs[u]


@functools.partial(jax.jit,
                   static_argnames=("rmax", "interpret"))
def swar_cost_pallas(read_t, gwin_t, rlen, glen, rmax: int, nrows,
                     interpret: bool = False):
    """Cost-only banded DP, SWAR form: returns the d=0 cost per candidate
    saturated at 7 (int32 [n]).  Exact wherever the true cost <= 6 —
    which covers every downstream consumer: ok needs cost <= ERROR_LIMIT
    (3) and errs is only consumed for ok candidates (ops/score.py zeroes
    non-ok payloads; the aligner's postprocess filters by ok before
    touching errs/begin).  Validated bit-for-bit on hardware against
    dp_rows_pallas under this contract (tools/swar_kernel_proto.py).

    ``nrows`` [n / BLOCK_CANDS] int32 gives each block's dynamic row
    bound (max rlen in the block; callers lay candidates out with
    block_layout so the bound is tight).  Inputs follow the dp_rows
    convention: read_t [rmax, n], gwin_t [rmax + 2*PAD, n],
    rlen/glen [1, n] or [n]."""
    n = read_t.shape[1]
    assert n % BLOCK_CANDS == 0
    m = n // 8
    unroll = 4
    wu = LANES * unroll  # lanes per program; 8 * wu == BLOCK_CANDS
    bc = pack_bandchars(gwin_t, rmax)
    rt = jnp.where(read_t >= 6, read_t - 2, read_t).astype(jnp.int32)
    rc = rt * L7
    bc_r = bc.reshape(rmax, 8, m)
    rc_r = rc.reshape(rmax, 8, m)
    rlen_r = rlen.reshape(8, m)
    glen_r = glen.reshape(8, m)
    grid = (m // wu,)
    kernel = functools.partial(_swar_kernel_dyn, unroll=unroll)
    c0 = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((rmax, 8, wu), lambda i, *_: (0, 0, i)),
                pl.BlockSpec((rmax, 8, wu), lambda i, *_: (0, 0, i)),
                pl.BlockSpec((8, wu), lambda i, *_: (0, i)),
                pl.BlockSpec((8, wu), lambda i, *_: (0, i)),
            ],
            out_specs=[pl.BlockSpec((8, wu), lambda i, *_: (0, i))],
        ),
        out_shape=[jax.ShapeDtypeStruct((8, m), jnp.int32)],
        interpret=interpret,
    )(nrows, bc_r, rc_r, rlen_r, glen_r)[0]
    return (c0.reshape(n) >> 12) & 0xF  # field 3 = band offset d = 0


def _swar_eqmask(u, v):
    """0xF per field where u == v (field values <= 8 on u, <= 7 on v).
    The one false-positive shape (u=8 vs v=0) cannot occur at any field
    the callers consult: every take condition carries a ~match factor and
    ~match forces c_row >= 1 at non-accept cells (accept cells overwrite
    a wholesale)."""
    z = u ^ v
    e = H7 & ~((z | H7) - L7)
    return (e >> 3) * 15


def _swar_row_step_acc(r, bc, rc, rlen, glen, c, a):
    """One DP row of the backward direction in SWAR form: the cost
    recurrence of _swar_row_step PLUS the preferred-accept-offset
    propagation (the register kernel's take_sub/take_gskip/take_rskip
    priority chain), with offsets packed 4 bits per band slot (value
    d+3 in 0..6; 7 = INVALID).  Exactness contract: a is bit-exact
    wherever the final cost <= 6 — every cell on a surviving chain has
    cost <= its start cost, so all consulted comparisons are
    unsaturated (see _swar_eqmask note); downstream only consumes a for
    ok (cost <= ERROR_LIMIT = 3) candidates."""
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

    # take masks against the (accept-zeroed) row, register-kernel order
    fsub = scond & _swar_eqmask(c + L7, c_row)
    c_up = (c_row >> 4) | (0x7 << 24)
    fgsk = scond & ~fsub & _swar_eqmask(c_up + L7, c_row)
    frsk = (~fm & M28) & ~fsub & ~fgsk & \
        _swar_eqmask(c_dm1 + L7, c_row)
    a_dm1 = ((a << 4) | 0x7) & M28
    keep = fm | fsub
    a_row = (a & keep) | (a_dm1 & frsk & ~keep) | \
        (INF7 & ~keep & ~frsk & M28)
    for _ in range(4):
        a_up = (a_row >> 4) | (0x7 << 24)
        a_row = (a_up & fgsk) | (a_row & ~fgsk)
    a_row = (DCONST & acc_full) | (a_row & ~acc_full)
    return c_row, a_row


def _swar_kernel_acc_dyn(nrows_ref, bc_ref, rc_ref, rlen_ref, glen_ref,
                         c_ref, a_ref, *, unroll: int):
    W = LANES
    R = nrows_ref[pl.program_id(0)]
    rlens = [rlen_ref[:, u * W:(u + 1) * W] for u in range(unroll)]
    glens = [glen_ref[:, u * W:(u + 1) * W] for u in range(unroll)]

    def body(kk, carry):
        r = R - 1 - kk
        bct = bc_ref[pl.ds(r, 1), :, :][0]
        rct = rc_ref[pl.ds(r, 1), :, :][0]
        cs, a_s = list(carry[0]), list(carry[1])
        for u in range(unroll):
            cs[u], a_s[u] = _swar_row_step_acc(
                r, bct[:, u * W:(u + 1) * W], rct[:, u * W:(u + 1) * W],
                rlens[u], glens[u], cs[u], a_s[u])
        return tuple(cs), tuple(a_s)

    c_init = tuple(jnp.zeros((8, W), jnp.int32) for _ in range(unroll))
    a_init = tuple(jnp.full((8, W), DCONST, jnp.int32)
                   for _ in range(unroll))
    cs, a_s = jax.lax.fori_loop(0, R, body, (c_init, a_init))
    for u in range(unroll):
        c_ref[:, u * W:(u + 1) * W] = cs[u]
        a_ref[:, u * W:(u + 1) * W] = a_s[u]


@functools.partial(jax.jit, static_argnames=("rmax", "interpret"))
def swar_cost_accept_pallas(read_t, gwin_t, rlen, glen, rmax: int, nrows,
                            interpret: bool = False):
    """Backward-direction SWAR kernel: (cost saturated at 7, accept
    offset) per candidate — the packed-field form of
    dp_rows_pallas_reg_dyn, ~2x fewer vector ops per row than the
    7-array register kernel.  Bit-exact for every consumed value: ok
    compares cost <= 3 (exact wherever true cost <= 6) and begin/errs
    are consumed only for ok candidates.  Inputs as swar_cost_pallas;
    returns (c0 [n] int32, a0 [n] int32 with INVALID_A where no accept
    edge is preferred)."""
    n = read_t.shape[1]
    assert n % BLOCK_CANDS == 0
    m = n // 8
    unroll = 4
    wu = LANES * unroll
    bc = pack_bandchars(gwin_t, rmax)
    rt = jnp.where(read_t >= 6, read_t - 2, read_t).astype(jnp.int32)
    rc = rt * L7
    bc_r = bc.reshape(rmax, 8, m)
    rc_r = rc.reshape(rmax, 8, m)
    rlen_r = rlen.reshape(8, m)
    glen_r = glen.reshape(8, m)
    grid = (m // wu,)
    kernel = functools.partial(_swar_kernel_acc_dyn, unroll=unroll)
    c0, a0 = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((rmax, 8, wu), lambda i, *_: (0, 0, i)),
                pl.BlockSpec((rmax, 8, wu), lambda i, *_: (0, 0, i)),
                pl.BlockSpec((8, wu), lambda i, *_: (0, i)),
                pl.BlockSpec((8, wu), lambda i, *_: (0, i)),
            ],
            out_specs=[pl.BlockSpec((8, wu), lambda i, *_: (0, i)),
                       pl.BlockSpec((8, wu), lambda i, *_: (0, i))],
        ),
        out_shape=[jax.ShapeDtypeStruct((8, m), jnp.int32),
                   jax.ShapeDtypeStruct((8, m), jnp.int32)],
        interpret=interpret,
    )(nrows, bc_r, rc_r, rlen_r, glen_r)
    cv = (c0.reshape(n) >> 12) & 0xF
    av = (a0.reshape(n) >> 12) & 0xF
    return cv, jnp.where(av == 7, INVALID_A, av - 3)


def _dp_kernel_reg_dyn(nrows_ref, read_ref, gwin_ref, rlen_ref, glen_ref,
                       c_ref, a_ref):
    """_dp_kernel_reg with a per-block dynamic row bound R from scalar
    prefetch: the loop starts at row R-1 instead of rmax-1.  Rows
    r >= rlen are accept rows whose outputs equal the loop init
    (c = 0, a = d_off), so skipping rows >= R = max rlen in the block is
    bit-exact; callers lay candidates out sorted so R is tight."""
    R = nrows_ref[pl.program_id(0)]
    rlen = rlen_ref[:, :]
    glen = glen_ref[:, :]
    shape = rlen.shape

    inf = jnp.full(shape, INF, jnp.int32)
    invalid = jnp.full(shape, INVALID_A, jnp.int32)

    def gwin_row(r):
        return gwin_ref[pl.ds(r, 1), :, :][0]

    def body(it, carry):
        cs, a_s, ch = carry
        r = R - 1 - it
        rchar = read_ref[pl.ds(r, 1), :, :][0]
        match = [ch[d] == rchar for d in range(7)]
        gpi = [(r + d - 3 + 1) < glen for d in range(7)]
        last_row = (r + 1) == rlen
        in_accept = r >= rlen

        diag = [jnp.where(match[d] & (gpi[d] | last_row), cs[d], INF)
                for d in range(7)]
        sub = [jnp.where(~match[d] & gpi[d], cs[d] + 1, INF)
               for d in range(7)]
        c_dm1 = [inf] + list(cs[:6])
        rskip = [jnp.where(~match[d], c_dm1[d] + 1, INF) for d in range(7)]
        c_row = [jnp.minimum(jnp.minimum(diag[d], sub[d]), rskip[d])
                 for d in range(7)]
        gskip_ok = [(~match[d]) & gpi[d] for d in range(7)]
        for _ in range(3):
            up = list(c_row[1:]) + [inf]
            c_row = [jnp.where(gskip_ok[d],
                               jnp.minimum(c_row[d], up[d] + 1), c_row[d])
                     for d in range(7)]
        c_row = [jnp.where(in_accept, 0, c_row[d]) for d in range(7)]

        c_up = list(c_row[1:]) + [inf]
        take_sub = [(~match[d]) & gpi[d] & (cs[d] == c_row[d] - 1)
                    for d in range(7)]
        take_gskip = [(~match[d]) & ~take_sub[d] & gskip_ok[d] &
                      (c_up[d] == c_row[d] - 1) for d in range(7)]
        take_rskip = [(~match[d]) & ~take_sub[d] & ~take_gskip[d] &
                      (c_dm1[d] == c_row[d] - 1) for d in range(7)]
        a_dm1 = [invalid] + list(a_s[:6])
        a_row = [jnp.where(match[d] | take_sub[d], a_s[d],
                           jnp.where(take_rskip[d], a_dm1[d], INVALID_A))
                 for d in range(7)]
        for _ in range(4):
            a_up = list(a_row[1:]) + [invalid]
            a_row = [jnp.where(take_gskip[d], a_up[d], a_row[d])
                     for d in range(7)]
        a_row = [jnp.where(in_accept, d - 3, a_row[d]) for d in range(7)]

        ch_new = (gwin_row(r),) + tuple(ch[:6])
        return tuple(c_row), tuple(a_row), ch_new

    c_init = tuple(jnp.zeros(shape, jnp.int32) for _ in range(7))
    a_init = tuple(jnp.full(shape, d - 3, jnp.int32) for d in range(7))
    ch_init = tuple(gwin_row(R + d) for d in range(7))
    cs, a_s, _ch = jax.lax.fori_loop(0, R, body,
                                     (c_init, a_init, ch_init))
    c_ref[:, :] = cs[3]
    a_ref[:, :] = a_s[3]


@functools.partial(jax.jit, static_argnames=("rmax", "interpret"))
def dp_rows_pallas_reg_dyn(read_t, gwin_t, rlen, glen, rmax: int, nrows,
                           interpret: bool = False):
    """Register-band kernel with per-block dynamic row bounds (same
    contract as dp_rows_pallas; bit-exact).  ``nrows`` as in
    swar_cost_pallas."""
    n = read_t.shape[1]
    assert n % BLOCK_CANDS == 0
    m = n // 8
    mb = BLOCK_CANDS // 8
    read_r = read_t.reshape(rmax, 8, m)
    gwin_r = gwin_t.reshape(gwin_t.shape[0], 8, m)
    rlen_r = rlen.reshape(8, m)
    glen_r = glen.reshape(8, m)
    grid = (m // mb,)
    c0, a0 = pl.pallas_call(
        _dp_kernel_reg_dyn,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((rmax, 8, mb), lambda i, *_: (0, 0, i)),
                pl.BlockSpec((gwin_t.shape[0], 8, mb),
                             lambda i, *_: (0, 0, i)),
                pl.BlockSpec((8, mb), lambda i, *_: (0, i)),
                pl.BlockSpec((8, mb), lambda i, *_: (0, i)),
            ],
            out_specs=[
                pl.BlockSpec((8, mb), lambda i, *_: (0, i)),
                pl.BlockSpec((8, mb), lambda i, *_: (0, i)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((8, m), jnp.int32),
            jax.ShapeDtypeStruct((8, m), jnp.int32),
        ],
        interpret=interpret,
    )(nrows, read_r, gwin_r, rlen_r, glen_r)
    return c0.reshape(n), a0.reshape(n)


def extend_kernel_pallas(st: dict, interpret: bool = False):
    """Run both directions through the Pallas kernel from a
    stage_candidates dict.  Returns (ok, errs, d_back) numpy arrays over
    the padded batch."""
    rmax = st["rmax"]

    def prep(read, gwin, rlen, glen):
        read_t = jnp.asarray(np.ascontiguousarray(read.T).astype(np.int32))
        gwin_t = jnp.asarray(np.ascontiguousarray(gwin.T).astype(np.int32))
        return (read_t, gwin_t, jnp.asarray(rlen[None, :].astype(np.int32)),
                jnp.asarray(glen[None, :].astype(np.int32)))

    rf = prep(st["read_f"], st["gwin_f"], st["rlen_f"], st["glen_f"])
    rb = prep(st["read_b"], st["gwin_b"], st["rlen_b"], st["glen_b"])
    cf, _af = dp_rows_pallas(rf[0], rf[1], rf[2], rf[3], rmax,
                             interpret=interpret)
    cb, ab = dp_rows_pallas(rb[0], rb[1], rb[2], rb[3], rmax,
                            interpret=interpret)
    errs_f = np.asarray(cf)
    errs_b = np.asarray(cb)
    ok = (errs_f <= ERROR_LIMIT) & (errs_b <= ERROR_LIMIT)
    return ok, errs_f + errs_b, np.asarray(ab)
