"""Extension-kernel microbench: banded-extension DP cells/s.

Two sections:

1. block-width sweep of the static kernel (dp_rows_pallas) — the round-2
   diagnostic that established the op-bound regime;
2. the PRODUCTION sorted-dynamic path (SWAR forward cost + dynamic-rows
   register backward, candidates block-laid by seed position r0) against
   the static both-directions pair it replaced, on a realistic uniform
   r0 distribution.

Timing is the CHAINED MARGINAL cost: dispatch K back-to-back calls and
block once, then report (t_K - t_1) / (K - 1) — the tunnel round trip
(~21-35 ms on this setup) cancels out, so the number is the kernel's
device-serial execution time, comparable to the VPU roofline.  The
honest end-to-end number (staging + transfers + reduction) lives in
bench.py.  Usage:

    python tools/kernel_bench.py [n_candidates] [rmax] [widths...]

"cells/s" counts the FULL-PROBLEM band cells (n * rmax * 8 per
direction): the sorted-dynamic path produces bit-equal consumed outputs
while processing only each block's live rows, so its full-problem rate
exceeds the per-processed-cell rate of either kernel.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def chain_time(fn, k=12):
    import jax

    o = fn()
    jax.block_until_ready(o)
    jax.device_get(o)

    def run(reps):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(reps)]
        jax.block_until_ready(outs)
        jax.device_get(outs[-1])
        return time.perf_counter() - t0

    t1 = min(run(1) for _ in range(5))
    tk = min(run(k) for _ in range(4))
    return max((tk - t1) / (k - 1), 1e-9)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    rmax = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    widths = [int(w) for w in sys.argv[3:]] or [128, 256, 512, 1024, 2048]

    import jax
    import jax.numpy as jnp

    from gaml_tpu.ops.extend import K, PAD
    from gaml_tpu.ops.extend_pallas import (
        BAND8, BLOCK_CANDS, block_bounds, block_layout, dp_rows_pallas,
        dp_rows_pallas_reg_dyn, swar_cost_pallas)

    rng = np.random.default_rng(0)
    read_t = jnp.asarray(rng.integers(0, 4, (rmax, n)).astype(np.int32))
    gwin = rng.integers(0, 4, (rmax + 2 * PAD, n)).astype(np.int32)
    # half the candidates match so both all-match and mismatch-heavy rows
    # are represented (the DP's work is data-independent; this only keeps
    # the outputs meaningful)
    gwin[PAD:PAD + rmax, : n // 2] = np.asarray(read_t)[:, : n // 2]
    gwin_t = jnp.asarray(gwin)
    rlen = jnp.full((1, n), rmax, jnp.int32)
    glen = jnp.full((1, n), rmax + PAD, jnp.int32)

    cells = n * rmax * BAND8
    dev = jax.devices()[0].platform
    print(f"device={dev} n={n} rmax={rmax} cells/call={cells/1e6:.0f}M "
          f"(chained-marginal timing)", flush=True)
    for w in widths:
        if n % w:
            continue
        try:
            t = chain_time(lambda: dp_rows_pallas(read_t, gwin_t, rlen,
                                                  glen, rmax, width=w))
            rate = cells / t
            print(f"width={w:5d}  t={t*1000:8.2f} ms  {rate/1e9:7.2f} G "
                  f"cells/s", flush=True)
        except Exception as e:
            print(f"width={w:5d}  FAILED: {type(e).__name__}: {e}",
                  flush=True)

    if n % BLOCK_CANDS:
        return
    # ---- production sorted-dynamic path vs the static pair it replaced.
    # r0 uniform over the read (max-hash argmax position), L chosen so
    # the live rows fill rmax: fwd rows = L-K-r0, bwd rows = r0.
    L = rmax + K
    r0 = rng.integers(0, L - K + 1, n).astype(np.int32)
    rlen_f = (L - K - r0).astype(np.int32)
    rlen_b = r0.copy()
    glen_np = np.full(n, rmax + PAD, np.int32)

    order = np.argsort(r0, kind="stable")
    perm = order[block_layout(n)]
    read_s = jnp.asarray(np.asarray(read_t)[:, perm])
    gwin_s = jnp.asarray(gwin[:, perm])
    glen_s = jnp.asarray(glen_np[perm])
    rlf_s = jnp.asarray(rlen_f[perm])
    rlb_s = jnp.asarray(rlen_b[perm])
    nrf = jnp.asarray(block_bounds(rlen_f[order]))
    nrb = jnp.asarray(block_bounds(rlen_b[order]))
    rlf_j = jnp.asarray(rlen_f[None, :])
    rlb_j = jnp.asarray(rlen_b[None, :])

    def static_pair():
        a = dp_rows_pallas(read_t, gwin_t, rlf_j, glen, rmax)
        b = dp_rows_pallas(read_t, gwin_t, rlb_j, glen, rmax)
        return a, b

    def sorted_pair_r4():
        a = swar_cost_pallas(read_s, gwin_s, rlf_s, glen_s, rmax, nrf)
        b = dp_rows_pallas_reg_dyn(read_s, gwin_s, rlb_s, glen_s, rmax,
                                   nrb)
        return a, b

    def sorted_pair_r5():
        from gaml_tpu.ops.extend_pallas import swar_cost_accept_pallas

        a = swar_cost_pallas(read_s, gwin_s, rlf_s, glen_s, rmax, nrf)
        b = swar_cost_accept_pallas(read_s, gwin_s, rlb_s, glen_s, rmax,
                                    nrb)
        return a, b

    t_old = chain_time(static_pair)
    t_r4 = chain_time(sorted_pair_r4)
    t_new = chain_time(sorted_pair_r5)
    full = 2 * cells
    print(f"static pair (both dirs):         t={t_old*1000:8.2f} ms  "
          f"{full/t_old/1e9:7.2f} G full-problem cells/s", flush=True)
    print(f"round-4 sorted-dynamic pair:     t={t_r4*1000:8.2f} ms  "
          f"{full/t_r4/1e9:7.2f} G full-problem cells/s  "
          f"({t_old/t_r4:.2f}x)", flush=True)
    print(f"PRODUCTION r5 pair (SWAR both):  t={t_new*1000:8.2f} ms  "
          f"{full/t_new/1e9:7.2f} G full-problem cells/s  "
          f"({t_old/t_new:.2f}x static, {t_r4/t_new:.2f}x r4; "
          f"fwd rows avg {rlen_f.mean():.0f}, "
          f"bwd {rlen_b.mean():.0f} of {rmax})", flush=True)


if __name__ == "__main__":
    main()
