"""Device banded-extension kernel (short reads).

TPU-native replacement for the reference's per-candidate 0-1 BFS
(ProcessHit, graph.cc:753-837).  The BFS explores a *restricted* alignment
graph: on a matching character only the diagonal move exists; on a mismatch
three cost-1 moves (substitution, genome-skip, read-skip).  With the error
cap of 3 the diagonal drift is bounded by +-3, so the whole search collapses
into a banded min-plus DP with band 7 — a static-shape scan that vectorizes
over tens of thousands of candidates at once.

Both extension directions reduce to the same "forward" DP after a coordinate
flip (reverse the read prefix and the genome prefix), including the boundary
rules:
- a match consuming the last genome char is only allowed if it completes
  the read (graph.cc:778, graph.cc:819);
- genome-advancing mismatch moves must stay inside the genome;
- a seed at genome position 0 skips the backward phase: accept iff
  read_pos < 6 with read_pos errors and begin_pos = -1 (graph.cc:797-798).

The begin position reported by the BFS is tie-broken by its deque order:
substitution > genome-skip > read-skip at the earliest divergence.  We
replicate it with a greedy walk over the cost-to-accept table (verified
against the BFS oracle in tests/test_extend_kernel.py).

Returned edit distances are forward + backward minima — like the reference,
the *total* may exceed 3 (up to 6) because each direction is capped
independently.
"""
from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

PAD = 4          # gwin padding; diagonal drift is at most 3
BAND = 7         # offsets d in [-3, 3]
INF = 100
ERROR_LIMIT = 3
K = 15
SENT_READ = 6    # read padding sentinel
SENT_GEN = 8     # out-of-genome sentinel (never equals any read code)


def _dp_rows(read_arr, rlen_eff, gwin, glen_eff, rmax: int):
    """Cost-to-accept DP.

    read_arr: [N, rmax] direction-view read codes; rlen_eff: [N];
    gwin: [N, rmax + 2*PAD] with gwin[n, j] = genome_view[j - PAD];
    glen_eff: [N].

    Returns (c0: [N, BAND] costs at row 0, table: [N, rmax+1, BAND]) where
    table[r] is the cost-to-accept of states in row r (rows >= rlen_eff are
    the accept region, cost 0).
    """
    n = read_arr.shape[0]
    d_off = jnp.arange(-3, 4)  # [BAND]

    def row_step(c_next, r):
        # chars on diagonals d=-3..3 at row r: j = r + d + PAD
        chars = jax.lax.dynamic_slice_in_dim(gwin, r + PAD - 3, BAND, axis=1)
        rchar = jax.lax.dynamic_slice_in_dim(read_arr, r, 1, axis=1)  # [N,1]
        match = chars == rchar
        g_plus_in = (r + d_off[None, :] + 1) < glen_eff[:, None]
        last_row = (r + 1) == rlen_eff[:, None]

        diag = jnp.where(match & (g_plus_in | last_row), c_next, INF)
        sub = jnp.where(~match & g_plus_in, c_next + 1, INF)
        # read-skip: (r, d) -> (r+1, d-1), so read c_next at d-1
        c_next_dm1 = jnp.concatenate(
            [jnp.full((n, 1), INF, c_next.dtype), c_next[:, :-1]], axis=1)
        rskip = jnp.where(~match, c_next_dm1 + 1, INF)
        c_row = jnp.minimum(jnp.minimum(diag, sub), rskip)
        # genome-skip within the row: (r, d) -> (r, d+1); relax 3x
        gskip_ok = (~match) & g_plus_in
        for _ in range(3):
            c_dp1 = jnp.concatenate(
                [c_row[:, 1:], jnp.full((n, 1), INF, c_row.dtype)], axis=1)
            c_row = jnp.where(gskip_ok, jnp.minimum(c_row, c_dp1 + 1), c_row)
        # accept region
        c_row = jnp.where(r >= rlen_eff[:, None], 0, c_row)
        return c_row, c_row

    init = jnp.zeros((n, BAND), dtype=jnp.int32)  # row rmax: accept or unused
    rows = jnp.arange(rmax - 1, -1, -1)
    c0, table_rev = jax.lax.scan(row_step, init, rows)
    # table_rev[i] corresponds to row rmax-1-i; flip to row order, append the
    # virtual all-zero row rmax for the walk's r+1 lookups.
    table = jnp.flip(table_rev, axis=0)                  # [rmax, N, BAND]
    table = jnp.moveaxis(table, 0, 1)                    # [N, rmax, BAND]
    table = jnp.concatenate(
        [table, jnp.zeros((n, 1, BAND), dtype=table.dtype)], axis=1)
    return c0, table


def _greedy_walk(read_arr, rlen_eff, gwin, glen_eff, table, rmax: int):
    """Replicates the BFS tie-break to pick the accept diagonal: at each
    mismatch prefer substitution, then genome-skip, then read-skip among
    cost-consistent moves; matches are forced diagonals.  Returns the final
    offset d (g - r) at acceptance, per candidate."""
    n = read_arr.shape[0]

    def lookup(tab_n, r, d):
        # tab_n: [rmax+1, BAND]; d in [-3,3] -> index d+3; out of band = INF
        idx = jnp.clip(d + 3, 0, BAND - 1)
        v = tab_n[r, idx]
        return jnp.where((d >= -3) & (d <= 3), v, INF)

    def step(state, _):
        r, d, done = state
        rr = jnp.minimum(r, rmax - 1)
        rchar = jnp.take_along_axis(read_arr, rr[:, None], axis=1)[:, 0]
        j = jnp.clip(rr + d + PAD, 0, gwin.shape[1] - 1)
        gchar = jnp.take_along_axis(gwin, j[:, None], axis=1)[:, 0]
        match = rchar == gchar

        cur = jax.vmap(lookup)(table, rr, d)
        nxt = jnp.minimum(rr + 1, rmax)
        g_plus_in = (rr + d + 1) < glen_eff
        sub_ok = (~match) & g_plus_in & (jax.vmap(lookup)(table, nxt, d) == cur - 1)
        gskip_ok = (~match) & g_plus_in & (jax.vmap(lookup)(table, rr, d + 1) == cur - 1)
        rskip_ok = (~match) & (jax.vmap(lookup)(table, nxt, d - 1) == cur - 1)

        # priority: match(diag) > sub > gskip > rskip
        take_diag = match
        take_sub = (~match) & sub_ok
        take_gskip = (~match) & ~sub_ok & gskip_ok
        take_rskip = (~match) & ~sub_ok & ~gskip_ok & rskip_ok

        new_r = jnp.where(take_diag | take_sub | take_rskip, r + 1, r)
        new_d = jnp.where(take_gskip, d + 1, jnp.where(take_rskip, d - 1, d))
        # stuck (shouldn't happen on optimal paths) -> finish to avoid loops
        stuck = ~(take_diag | take_sub | take_gskip | take_rskip)
        new_done = done | (new_r >= rlen_eff) | stuck
        r = jnp.where(done, r, new_r)
        d = jnp.where(done, d, new_d)
        return (r, d, new_done | done), None

    r0 = jnp.zeros(n, dtype=jnp.int32)
    d0 = jnp.zeros(n, dtype=jnp.int32)
    done0 = r0 >= rlen_eff
    (rf, df, _), _ = jax.lax.scan(step, (r0, d0, done0), None, length=rmax + 8)
    return df


@functools.partial(jax.jit, static_argnums=(8,))
def extend_kernel(read_f, rlen_f, gwin_f, glen_f,
                  read_b, rlen_b, gwin_b, glen_b, rmax: int):
    """Batched two-direction extension.

    Returns (ok, errs, d_back): d_back is the backward accept offset
    (begin = g0 - r0 - d_back, host-side); candidates with g0 == 0 are
    handled by the caller (rlen_b set to 0 there, d unused)."""
    cf, _ = _dp_rows(read_f, rlen_f, gwin_f, glen_f, rmax)
    errs_f = cf[:, 3]
    cb, table_b = _dp_rows(read_b, rlen_b, gwin_b, glen_b, rmax)
    errs_b = cb[:, 3]
    d_back = _greedy_walk(read_b, rlen_b, gwin_b, glen_b, table_b, rmax)
    ok = (errs_f <= ERROR_LIMIT) & (errs_b <= ERROR_LIMIT)
    return ok, errs_f + errs_b, d_back


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def stage_candidates(seq: np.ndarray, g0s: np.ndarray, r0s: np.ndarray,
                     reads: List[np.ndarray], rmax: int = None,
                     nb: int = None, read_ids: np.ndarray = None):
    """Build the kernel's direction-view arrays on host.

    Returns a dict of numpy arrays (kernel inputs + candidate metadata),
    padded to nb candidates and rmax rows."""
    n = len(reads)
    glen = len(seq)
    rlens = np.array([len(r) for r in reads], dtype=np.int32)
    if rmax is None:
        rmax_needed = int(max(int((rlens - r0s - K).max(initial=1)),
                              int(r0s.max(initial=1)), 1))
        rmax = _round_up(rmax_needed, 32)
    if nb is None:
        nb = _round_up(max(n, 1), 64)

    read_f = np.full((nb, rmax), SENT_READ, dtype=np.uint8)
    read_b = np.full((nb, rmax), SENT_READ, dtype=np.uint8)
    gwin_f = np.full((nb, rmax + 2 * PAD), SENT_GEN, dtype=np.uint8)
    gwin_b = np.full((nb, rmax + 2 * PAD), SENT_GEN, dtype=np.uint8)
    rlen_f = np.zeros(nb, dtype=np.int32)
    rlen_b = np.zeros(nb, dtype=np.int32)
    glen_f = np.zeros(nb, dtype=np.int32)
    glen_b = np.zeros(nb, dtype=np.int32)

    for i, read in enumerate(reads):
        g0, r0, rl = int(g0s[i]), int(r0s[i]), int(rlens[i])
        # forward view: read suffix after the seed vs genome from seed end
        fl = rl - r0 - K
        rlen_f[i] = fl
        read_f[i, :fl] = read[r0 + K:]
        gl = glen - (g0 + K)
        glen_f[i] = gl
        lo = g0 + K - PAD
        src = seq[max(0, lo):min(glen, lo + rmax + 2 * PAD)]
        dst0 = max(0, -lo)
        gwin_f[i, dst0:dst0 + len(src)] = src
        # backward view: reversed read prefix vs reversed genome prefix
        if g0 > 0:
            rlen_b[i] = r0
            read_b[i, :r0] = read[r0 - 1::-1] if r0 > 0 else read[:0]
            glen_b[i] = g0
            # genome_view[g'] = seq[g0 - 1 - g'] at j = g' + PAD; j < PAD
            # (g' < 0) is unreachable from the start state, left as sentinel
            rev = seq[:g0][::-1]
            m = min(len(rev), rmax + PAD)
            gwin_b[i, PAD:PAD + m] = rev[:m]
        # g0 == 0: backward skipped; rlen_b stays 0 -> errs_b = 0 from DP

    g0_pad = np.zeros(nb, dtype=np.int32)
    r0_pad = np.zeros(nb, dtype=np.int32)
    rlen_pad = np.zeros(nb, dtype=np.int32)
    g0_pad[:n] = g0s
    r0_pad[:n] = r0s
    rlen_pad[:n] = rlens
    valid = np.zeros(nb, dtype=bool)
    valid[:n] = True
    rid_pad = np.zeros(nb, dtype=np.int32)
    if read_ids is not None:
        rid_pad[:n] = read_ids
    return {
        "read_f": read_f, "rlen_f": rlen_f, "gwin_f": gwin_f, "glen_f": glen_f,
        "read_b": read_b, "rlen_b": rlen_b, "gwin_b": gwin_b, "glen_b": glen_b,
        "g0": g0_pad, "r0": r0_pad, "read_len": rlen_pad, "valid": valid,
        "at_start": g0_pad == 0 if n else np.zeros(nb, dtype=bool),
        "read_id": rid_pad, "rmax": rmax, "n": n,
    }


def batch_extend_arrays(seq: np.ndarray, g0s: np.ndarray, r0s: np.ndarray,
                        reads: List[np.ndarray]):
    """Host staging + kernel run.  Returns (ok, errs, begin) numpy arrays
    replicating ProcessHit outputs (modulo the documented min-cost
    improvement)."""
    n = len(reads)
    if n == 0:
        return (np.zeros(0, bool), np.zeros(0, np.int32), np.zeros(0, np.int32))
    st = stage_candidates(seq, g0s, r0s, reads)
    ok, errs, d_back = extend_kernel(
        jnp.asarray(st["read_f"]), jnp.asarray(st["rlen_f"]),
        jnp.asarray(st["gwin_f"]), jnp.asarray(st["glen_f"]),
        jnp.asarray(st["read_b"]), jnp.asarray(st["rlen_b"]),
        jnp.asarray(st["gwin_b"]), jnp.asarray(st["glen_b"]), st["rmax"])
    ok = np.asarray(ok)[:n]
    errs = np.asarray(errs)[:n].astype(np.int32)
    d_back = np.asarray(d_back)[:n]

    begin = (g0s - r0s - d_back).astype(np.int32)
    # genome-start special case (graph.cc:797-798)
    at_start = g0s == 0
    ok = np.where(at_start, ok & (r0s < 6), ok)
    errs = np.where(at_start, errs + r0s, errs)
    begin = np.where(at_start, -1, begin)
    return ok, errs, begin


def batch_extend_host(seq: np.ndarray, cands) -> List[Tuple[bool, int, int]]:
    """SubpathAligner device backend: cands is [(Candidate, oriented_read)].
    Returns [(ok, errs, begin)] matching the oracle's contract."""
    g0s = np.array([c.genome_pos for c, _ in cands], dtype=np.int32)
    r0s = np.array([c.read_pos for c, _ in cands], dtype=np.int32)
    reads = [r for _, r in cands]
    ok, errs, begin = batch_extend_arrays(seq, g0s, r0s, reads)
    return [(bool(ok[i]), int(errs[i]), int(begin[i])) for i in range(len(cands))]
