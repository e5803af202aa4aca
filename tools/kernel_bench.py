"""Extension-kernel microbench: banded-extension DP cells/s by block width.

Times ONLY the kernel (inputs device-resident, output block_until_ready) so
the number is comparable against the chip's VPU roofline — the honest
end-to-end number lives in bench.py.  Usage:

    python tools/kernel_bench.py [n_candidates] [rmax] [widths...]

Prints one row per block width: warm median kernel time, DP cells/s, and
%-of-roofline (v5e ~50 int32 Tops, ~25 elementwise ops per band cell).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    rmax = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    widths = [int(w) for w in sys.argv[3:]] or [128, 256, 512, 1024, 2048]

    import jax
    import jax.numpy as jnp

    from gaml_tpu.ops.extend import PAD
    from gaml_tpu.ops.extend_pallas import BAND8, dp_rows_pallas

    rng = np.random.default_rng(0)
    read_t = jnp.asarray(rng.integers(0, 4, (rmax, n)).astype(np.int32))
    gwin = rng.integers(0, 4, (rmax + 2 * PAD, n)).astype(np.int32)
    # make most candidates match so the DP runs its full length
    gwin[PAD:PAD + rmax, :] = np.asarray(read_t)
    gwin_t = jnp.asarray(gwin)
    rlen = jnp.full((1, n), rmax, jnp.int32)
    glen = jnp.full((1, n), rmax + PAD, jnp.int32)

    cells = n * rmax * BAND8
    dev = jax.devices()[0].platform
    print(f"device={dev} n={n} rmax={rmax} cells/call={cells/1e6:.0f}M",
          flush=True)
    for w in widths:
        if n % w:
            continue
        try:
            c, a = dp_rows_pallas(read_t, gwin_t, rlen, glen, rmax, width=w)
            jax.block_until_ready((c, a))
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                c, a = dp_rows_pallas(read_t, gwin_t, rlen, glen, rmax,
                                      width=w)
                jax.block_until_ready((c, a))
                ts.append(time.perf_counter() - t0)
            t = sorted(ts)[len(ts) // 2]
            rate = cells / t
            # ~25 int32 elementwise ops per band cell vs ~50 Tops peak
            pct = 100.0 * rate * 25 / 50e12
            print(f"width={w:5d}  t={t*1000:8.2f} ms  {rate/1e9:7.2f} G "
                  f"cells/s  ~{pct:.1f}% of int32 roofline", flush=True)
        except Exception as e:
            print(f"width={w:5d}  FAILED: {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
