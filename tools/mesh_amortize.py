"""When does the mesh incremental paired scorer pay?  (VERDICT r4 #7)

Measures the HOST incremental scorer's per-move cost at increasing
read-pair counts and fits cost(n) = a + b*n; the mesh path's per-move
cost is dominated by its ~2-3 device round trips (measured on the real
chip by tools/mesh_smoke.py), so the crossover is the n where the host
line crosses that latency.  Host-side runs on CPU; pass the measured
mesh per-move ms as argv[1] (default: the recorded 116 ms band).

    python tools/mesh_amortize.py [mesh_ms] [workdir]
"""
import os
import pathlib
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np


def main():
    mesh_ms = float(sys.argv[1]) if len(sys.argv) > 1 else 116.0
    workdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/gaml_amortize"
    os.makedirs(workdir, exist_ok=True)
    import jax

    jax.config.update("jax_platforms", "cpu")

    from fixtures import make_linear_graph
    from test_scoring import make_pairs, make_readset

    from gaml_tpu.scoring.paired import (ScoringState,
                                         calc_score_for_paths_incremental)

    tmp = pathlib.Path(workdir)
    rng = np.random.default_rng(0)
    gr, seqs = make_linear_graph(rng, [3000, 90, 2500, 120, 2750])
    genome = "".join(seqs)
    L, im, istd = 28, 220, 20
    kw = dict(no_cov_penalty=1e-4, exp_cov_move=150, use_all_to_cov=True)
    sequence = [
        [[0, 2, 4, 6, 8]],
        [[0, 2, 4], [6, 8]],
        [[0, 2, 4], [6, 8], [0, 2, 4]],
        [[0, 2, 4], [6, 8]],
        [[0, 2, -35, 6, 8]],
        [[0, 2, 4, 6, 8]],
    ]

    sizes = [2000, 8000, 32000]
    rows = []
    for n in sizes:
        m1, m2 = make_pairs(rng, genome, n, L, im, istd)
        rs1 = make_readset(tmp, m1, f"a{n}")
        rs2 = make_readset(tmp, m2, f"b{n}")
        st = ScoringState()
        for paths in sequence:  # warm cache + state
            calc_score_for_paths_incremental(gr, paths, rs1, rs2, im,
                                             istd, st, **kw)
        ts = []
        for _ in range(4):
            for paths in sequence[-4:]:
                t0 = time.perf_counter()
                calc_score_for_paths_incremental(gr, paths, rs1, rs2, im,
                                                 istd, st, **kw)
                ts.append(time.perf_counter() - t0)
        med = sorted(ts)[len(ts) // 2] * 1000
        rows.append((n, med))
        print(f"host incremental, {n:6d} pairs: median "
              f"{med:7.2f} ms/move over {len(ts)} moves", flush=True)

    # linear fit host(n) = a + b n  (ms)
    ns = np.array([r[0] for r in rows], float)
    ms = np.array([r[1] for r in rows], float)
    b, a = np.polyfit(ns, ms, 1)
    cross = (mesh_ms - a) / b if b > 0 else float("inf")
    print(f"\nfit: host_ms(n) = {a:.2f} + {b*1000:.4f} * n/1000")
    print(f"mesh per-move latency (measured, tools/mesh_smoke.py): "
          f"{mesh_ms:.0f} ms")
    print(f"=> mesh pays above ~{cross/1000:.0f}k pairs "
          f"(~{2*cross/1000:.0f}k reads) per incremental move "
          f"on this tunnel; co-located chips (sub-ms dispatch) cross "
          f"at ~{(1.0 - a)/b/1000 if b > 0 else 0:.1f}k pairs",
          flush=True)


if __name__ == "__main__":
    main()
