"""Mesh scorers on REAL TPU hardware (1-device mesh).

The sharded paths (paired bucket products + psum_scatter incremental
deltas, PacBio forward_batch + distributed log-sum-exp reduction) are
validated functionally on CPU virtual meshes and 2-process
jax.distributed; this tool exercises the SAME shard_map code on the
actual TPU chip available here — TPU-only compile/layout issues in
shard_map + psum_scatter would surface now, not at deployment — and
records per-call latency next to the host numbers (BENCHMARKS.md
§Scaling).

    python tools/mesh_smoke.py [workdir]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gaml_mesh_smoke"
    os.makedirs(workdir, exist_ok=True)
    import pathlib

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    dev = jax.devices()[0]
    print(f"device: {dev.platform} ({dev.device_kind})", flush=True)
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                ("reads", "cand"))

    from fixtures import make_linear_graph
    from test_scoring import make_pairs, make_readset

    from gaml_tpu.parallel.paired_sharded import (
        calc_score_for_paths_incremental_sharded)
    from gaml_tpu.scoring.paired import (ScoringState,
                                         calc_score_for_paths_incremental)

    tmp = pathlib.Path(workdir)
    rng = np.random.default_rng(0)
    gr, seqs = make_linear_graph(rng, [3000, 90, 2500, 120, 2750])
    genome = "".join(seqs)
    L, im, istd = 28, 220, 20
    m1, m2 = make_pairs(rng, genome, 2000, L, im, istd)
    rs1 = make_readset(tmp, m1, "ms1")
    rs2 = make_readset(tmp, m2, "ms2")
    rs1h = make_readset(tmp, m1, "ms1h")
    rs2h = make_readset(tmp, m2, "ms2h")

    kw = dict(no_cov_penalty=1e-4, exp_cov_move=150, use_all_to_cov=True)
    st_host = ScoringState()
    st_dev = ScoringState()
    # ONE scorer for the whole run, as ProbCalculator wires it — a fresh
    # scorer per move would re-create the jax.jit wrappers and pay a
    # ~600 ms trace+lower per bucket call even with warm XLA caches
    from gaml_tpu.parallel.paired_sharded import ShardedPairedScorer

    scorer = ShardedPairedScorer(
        mesh, np.log(rs1.match_prob), np.log(rs1.mismatch_prob),
        np.log(rs2.match_prob), np.log(rs2.mismatch_prob), im, istd,
        collect_events=True)
    kw_dev = dict(kw, scorer=scorer)
    sequence = [
        [[0, 2, 4, 6, 8]],
        [[0, 2, 4], [6, 8]],
        [[0, 2, 4], [6, 8], [0, 2, 4]],
        [[0, 2, 4], [6, 8]],
        [[0, 2, -35, 6, 8]],
        [[0, 2, 4, 6, 8]],
    ]
    print("\n-- paired incremental on the TPU mesh "
          "(bucket products + psum_scatter deltas into device totals) --",
          flush=True)
    worst = 0.0
    for i, paths in enumerate(sequence):
        t0 = time.perf_counter()
        host = calc_score_for_paths_incremental(
            gr, paths, rs1h, rs2h, im, istd, st_host, **kw)
        t_host = time.perf_counter() - t0
        t0 = time.perf_counter()
        devr = calc_score_for_paths_incremental_sharded(
            gr, paths, rs1, rs2, im, istd, st_dev, mesh, **kw_dev)
        t_dev = time.perf_counter() - t0
        rel = abs(devr[0] - host[0]) / max(abs(host[0]), 1e-9)
        worst = max(worst, rel)
        ok = devr[1] == host[1] and devr[2] == host[2] and rel < 1e-4
        print(f"move {i}: host {host[0]:.6f} ({t_host*1000:6.1f} ms)  "
              f"mesh {devr[0]:.6f} ({t_dev*1000:6.1f} ms)  "
              f"rel={rel:.2e} zeros {host[1]}=={devr[1]} "
              f"{'OK' if ok else 'MISMATCH'}", flush=True)
        assert ok, (host, devr)
    # warm per-move latency: replay the last two moves a few times
    ts = []
    for _ in range(5):
        for paths in sequence[-2:]:
            t0 = time.perf_counter()
            calc_score_for_paths_incremental_sharded(
                gr, paths, rs1, rs2, im, istd, st_dev, mesh, **kw_dev)
            ts.append(time.perf_counter() - t0)
    print(f"warm per-move mesh latency: median "
          f"{sorted(ts)[len(ts)//2]*1000:.1f} ms over {len(ts)} moves "
          f"(worst value drift {worst:.2e})", flush=True)

    # ---- PacBio forward_batch under shard_map on the TPU
    print("\n-- PacBio forward_batch on the TPU mesh --", flush=True)
    import mp_common as mc

    from gaml_tpu.ops.forward import banded_forward
    from gaml_tpu.parallel.pacbio_sharded import ShardedPacbioScorer

    scorer = ShardedPacbioScorer(mesh, dtype=jnp.float32)
    genome_c, reads_f, rlens_f, centers_f, gst_f, gl_f = \
        mc.pb_forward_world()
    out = scorer.forward_batch(genome_c, reads_f, rlens_f, centers_f,
                               gst_f, gl_f, mc.PB_FWD_LM, mc.PB_FWD_LMM,
                               mc.PB_FWD_RMAX, mc.PB_FWD_WIDTH)
    want = np.asarray(banded_forward(
        jnp.asarray(genome_c), jnp.asarray(reads_f), jnp.asarray(rlens_f),
        jnp.asarray(centers_f), jnp.asarray(gst_f), jnp.asarray(gl_f),
        jnp.asarray(mc.PB_FWD_LM, dtype=jnp.float32),
        jnp.asarray(mc.PB_FWD_LMM, dtype=jnp.float32),
        mc.PB_FWD_RMAX, mc.PB_FWD_WIDTH))
    rel = np.max(np.abs(out - want) / np.maximum(np.abs(want), 1e-9))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        scorer.forward_batch(genome_c, reads_f, rlens_f, centers_f,
                             gst_f, gl_f, mc.PB_FWD_LM, mc.PB_FWD_LMM,
                             mc.PB_FWD_RMAX, mc.PB_FWD_WIDTH)
        ts.append(time.perf_counter() - t0)
    ok = rel < 1e-5
    print(f"forward_batch {mc.PB_FWD_JOBS} jobs: warm "
          f"{sorted(ts)[2]*1000:.1f} ms  max rel vs unsharded "
          f"{rel:.2e}  {'OK' if ok else 'MISMATCH'}", flush=True)
    assert ok

    # ---- PacBio reduction (distributed stable log-sum-exp) on the TPU
    rid, lp, _m = mc.pacbio_rows(0, mc.PB_ROWS)
    s, z = scorer.score(rid, lp.astype(np.float64), mc.PB_N_READS,
                        np.full(mc.PB_N_READS, mc.PB_READ_LEN),
                        mc.PB_TOTAL_LEN, -0.7, -10.0)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        scorer.score(rid, lp.astype(np.float64), mc.PB_N_READS,
                     np.full(mc.PB_N_READS, mc.PB_READ_LEN),
                     mc.PB_TOTAL_LEN, -0.7, -10.0)
        ts.append(time.perf_counter() - t0)
    print(f"pacbio reduction: score {s:.6f} zeros {z}  warm "
          f"{sorted(ts)[2]*1000:.1f} ms", flush=True)
    print("\nALL MESH SURFACES RAN ON", dev.platform.upper(), flush=True)


if __name__ == "__main__":
    main()
