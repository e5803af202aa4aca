"""Benchmark: reads/sec likelihood-scored per chip — HONEST end-to-end.

Pipeline per rescore (the hot loop of every annealing iteration), with NO
phase excluded from the steady-state number.  Round 5 moved candidate
generation ON DEVICE (ops.candgen_device): the fingerprint index and
read-code matrices are resident, so one full rescore ships only

  - the 2-bit-packed window buffer (~G/4 bytes ≈ 128 KB at 400 kb) up,
  - three scalars (score, zero_reads, candidate count) down,

and runs max-hash window query -> candidate expansion -> banded
extension DP -> dedup -> score reduction as one device-side chain
(reference surfaces: graph.cc:1289-1348 query, graph.cc:753-837
extension, graph.cc:1482-1537 reduction).

Weather hardening (the shared tunnel's latency swings >2x day to day and
can wedge for minutes — see BENCHMARKS.md):

  - the cold compile runs in a BACKGROUND thread while the host
    baselines are measured, so it is off the critical path (the
    production warm-up-router pattern, utils/warmup.py);
  - a tiny chained-call probe reports the tunnel's per-call latency
    alongside every timing window;
  - both sides of the ratio take time-budgeted best-of-N windows
    (not best-of-2) — the minimum is the reproducible floor;
  - if the device never becomes ready inside GAML_BENCH_WARM_BUDGET
    seconds, the bench reports the production fallback route (the
    OpenMP host path that the cost-model router would actually serve)
    and flags it in the detail line instead of hanging.

vs_baseline: ratio against the reference-architecture stand-in — the
serial native C++ aligner (query + exact 0-1 BFS extension + dedup, one
thread, same machine) running the same rescore.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SMALL = os.environ.get("GAML_BENCH_SMALL") == "1"


def build_world(genome_len, n_reads, read_len, err_rate=0.01, seed=7):
    from gaml_tpu.core import dna

    rng = np.random.default_rng(seed)
    genome_codes = rng.integers(0, 4, genome_len).astype(np.uint8)
    reads = np.empty((n_reads, read_len), dtype=np.uint8)
    starts = rng.integers(0, genome_len - read_len + 1, n_reads)
    for i in range(n_reads):
        reads[i] = genome_codes[starts[i]:starts[i] + read_len]
    errs = rng.random(reads.shape) < err_rate
    reads[errs] = (reads[errs] + rng.integers(1, 4, int(errs.sum()))) % 4
    flip = np.nonzero(rng.random(n_reads) < 0.5)[0]
    for i in flip.tolist():
        reads[i] = dna.revcomp(reads[i])
    return genome_codes, reads


def best_of_windows(run_once, budget_s, n_min=2, n_max=6):
    """Time-budgeted best-of-N: at least n_min windows, then keep
    running until the budget is spent or n_max windows — the minimum is
    the reproducible floor under shared-box / shared-tunnel noise."""
    times = []
    t_start = time.time()
    while len(times) < n_max:
        times.append(run_once())
        if len(times) >= n_min and time.time() - t_start > budget_s:
            break
    return min(times), times


def main():
    import jax
    import jax.numpy as jnp

    from gaml_tpu.index.maxhash import K_INDEX_KMER
    from gaml_tpu.native import (NativeAlignBundle, align_window,
                                 align_windows_batch, get_lib,
                                 read_index_build)
    from gaml_tpu.ops.rescore_device import DeviceRescorer

    assert get_lib() is not None, "native library required for bench"
    genome_len = 20_000 if SMALL else 400_000
    n_reads = 2_000 if SMALL else 100_000
    read_len = 100

    t0 = time.time()
    genome, reads = build_world(genome_len, n_reads, read_len)
    t_world = time.time() - t0

    # ---- one-time ingestion: index build + resident device uploads
    t0 = time.time()
    fp, ok_m, kmers, rc, seed_pos = read_index_build(reads, K_INDEX_KMER)
    okb = ok_m.astype(bool)
    rids = np.arange(n_reads, dtype=np.int64)[okb]
    fps_ok = fp[okb]
    order = np.argsort(fps_ok, kind="stable")
    sf, sr = fps_ok[order], rids[order]
    index = {}
    if len(sf):
        bounds = np.nonzero(np.diff(sf))[0] + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(sf)]))
        for s, e in zip(starts.tolist(), ends.tolist()):
            index[int(sf[s])] = sr[s:e].tolist()
    from gaml_tpu.core.dna import _COMP_LUT

    codes_rc = _COMP_LUT[reads][:, ::-1]
    row_of = np.arange(n_reads, dtype=np.int32)
    bundle = NativeAlignBundle(index, read_len, reads, codes_rc, seed_pos,
                               row_of)
    t_index = time.time() - t0

    # ALL device contact happens in the warm thread (constructor
    # included: the resident uploads are device RPCs, and a wedged
    # tunnel must hit the warm BUDGET, not hang the main thread)
    engine = {}

    def get_dev():
        if "dev" not in engine:
            engine["dev"] = DeviceRescorer(bundle)
        return engine["dev"]

    match, mismatch = 0.96, 0.01
    log_m, log_mm = float(np.log(match)), float(np.log(mismatch))
    # cap: a BLOCK_CANDS multiple with ~15% slack over the candidate
    # count (pads concentrate in near-empty tail blocks of the dynamic
    # kernels, but the layout sorts/gathers still scale with cap)
    cap0 = int(os.environ.get("GAML_BENCH_CAP",
                              str(4096 if SMALL else 98304)))
    # batched mode: BATCH independent rescores per device dispatch (the
    # production bulk shape).  Opt-in: it wins when the relay's
    # per-dispatch cost dominates (small worlds: 9.6 vs 12 ms/rescore)
    # but at bench scale the batched executable's compute grows
    # super-linearly (sorts) and loses to the pipelined singles
    # (84.8 vs 74 ms measured) while adding background compile time.
    BATCH = int(os.environ.get("GAML_BENCH_BATCH", "0"))
    state = {"cap": cap0, "bcap": cap0 * max(BATCH, 1)}

    def rescore_async(staged=None):
        """Dispatch one FULL rescore; returns (score, zeros, n) device
        handles.  Ships only the packed window + scalars."""
        return get_dev().rescore([genome] if staged is None else None,
                           cap=state["cap"], log_match=log_m,
                           log_mismatch=log_mm, total_len=genome_len,
                           min_prob_per_base=-0.7, min_prob_start=-10.0,
                           staged=staged)

    def rescore_batched_async(staged=None):
        """Dispatch BATCH independent full rescores in ONE device call;
        returns ([BATCH] scores, [BATCH] zeros, n) handles."""
        if staged is None:
            staged = get_dev().stage([genome] * BATCH)
        return get_dev().rescore(
            cap=state["bcap"], log_match=log_m, log_mismatch=log_mm,
            total_len=[genome_len] * BATCH, min_prob_per_base=-0.7,
            min_prob_start=-10.0, staged=staged,
            seg_job=np.arange(BATCH, dtype=np.int32), n_jobs=BATCH)

    def rescore_checked():
        """Blocking rescore with candidate-cap overflow retry."""
        while True:
            s, z, n = rescore_async()
            n = int(n)
            if n <= state["cap"]:
                return float(s), int(z), n
            while state["cap"] < n:
                state["cap"] *= 2

    def rescore_batched_checked():
        while True:
            s, z, n = rescore_batched_async()
            n = int(n)
            if n <= state["bcap"]:
                return np.asarray(s), np.asarray(z), n
            while state["bcap"] < n:
                state["bcap"] *= 2

    # ---- background warm-up (compiles both executables server-side)
    # while the host baselines are measured — the production router
    # pattern: the cold compile never blocks the critical path.
    warm = {"done": False, "err": None, "dt": None}

    def warm_run():
        t = time.time()
        try:
            warm["result"] = rescore_checked()
            if BATCH > 0:
                sb, zb, _nb = rescore_batched_checked()
                s0, z0, _n0 = warm["result"]
                assert np.allclose(sb, s0, rtol=1e-5) and \
                    (zb == z0).all(), (sb, s0, zb, z0)
            warm["done"] = True
        except Exception as e:  # wedged tunnel / compile failure
            warm["err"] = e
        warm["dt"] = time.time() - t

    warm_th = threading.Thread(target=warm_run, daemon=True)
    t_warm_start = time.time()
    warm_th.start()

    # ---- baseline: native C++ aligner (reference architecture): same
    # query + exact 0-1 BFS + dedup, ONE thread.  The reference binary is
    # single-threaded (no -fopenmp/-lpthread anywhere in its CMakeLists /
    # sources), so the serial native path is the faithful stand-in for
    # the architecture whose numbers BASELINE.md pins.  The repo's own
    # OpenMP-parallel host path (the strongest host configuration on this
    # box) is measured too; vs_baseline tracks the reference bar.
    def serial_window():
        t0 = time.time()
        if SMALL:
            align_window(bundle, genome, 0)
            return time.time() - t0
        frac = 8
        sub = genome[:genome_len // frac]
        align_window(bundle, sub, 0)
        return (time.time() - t0) * frac

    def parallel_window():
        t0 = time.time()
        n_win = max(2, (os.cpu_count() or 2))
        cut = genome_len // n_win
        wins = [genome[max(0, i * cut - read_len):
                       min(genome_len, (i + 1) * cut + read_len)]
                for i in range(n_win)]
        if SMALL:
            align_windows_batch(bundle, wins, [0] * len(wins))
            return time.time() - t0
        sub_wins = [w[: len(w) // 8] for w in wins]
        align_windows_batch(bundle, sub_wins, [0] * len(sub_wins))
        return (time.time() - t0) * 8

    # ---- host bars, looped until the background compile lands (the
    # wait is spent on more measurement instead of idling, so the
    # critical-path cold stall t_cold stays ~0 even on a slow compile
    # day).  Both sides of the ratio get the SAME best-of-N treatment
    # (N = BENCH_WINDOWS, matching the device side): the recorded floor
    # uses only the first N windows — min over an unbounded wait would
    # fish out the shared box's rare idle moments and bias the bar.
    BENCH_WINDOWS = int(os.environ.get("GAML_BENCH_WINDOWS", "8"))
    host_budget = float(os.environ.get("GAML_BENCH_HOST_BUDGET", "25"))
    warm_budget = float(os.environ.get("GAML_BENCH_WARM_BUDGET", "780"))
    host_times, host_par_times = [], []
    t_host0 = time.time()
    while True:
        if len(host_times) < BENCH_WINDOWS:
            host_times.append(serial_window())
            host_par_times.append(parallel_window())
        else:
            # floors recorded: idle-wait so the warm thread's client-side
            # tracing/lowering is not starved for CPU by host windows
            time.sleep(2)
        spent = time.time() - t_host0
        if len(host_times) < 2 or spent < 2 * host_budget:
            continue
        if warm["dt"] is not None or \
                time.time() - t_warm_start > warm_budget:
            break
    host_dt = min(host_times)
    host_serial_rps = n_reads / host_dt if host_dt > 0 else float("inf")
    host_par_dt = min(host_par_times)
    host_reads_per_s = n_reads / host_par_dt if host_par_dt > 0 \
        else float("inf")

    # ---- wait for the warm-up (already overlapped with the host bars)
    t0 = time.time()
    warm_th.join(timeout=max(0.0, warm_budget - (t0 - t_warm_start)))
    t_cold = time.time() - t0  # critical-path stall, NOT compile time
    device_ok = warm.get("done", False)

    def tunnel_probe():
        """Chained-marginal per-call latency of the tunnel right now."""
        try:
            x = jnp.ones(8)
            t0 = time.time()
            h = [x.sum() for _ in range(4)]
            float(h[0])
            t1 = time.time()
            _ = [float(v) for v in h]
            t2 = time.time()
            return (t2 - t1) / 3 * 1000 if t2 > t1 else (t1 - t0) * 1000
        except Exception:
            return float("nan")

    iters = 3 if SMALL else 10
    if device_ok:
        score, zeros, n_cands = warm["result"]
        probe_ms = tunnel_probe()

        # warm single-rescore median (blocking each fetch)
        times = []
        for _ in range(iters):
            t0 = time.time()
            rescore_checked()
            times.append(time.time() - t0)
        t_warm = float(np.median(times))

        # pipelined throughput: issue every rescore without blocking so
        # the host-side packing of iteration i+1 overlaps the device
        # work of i (the async-dispatch shape a production bulk
        # rescorer uses).  GAML_JAX_TRACE=<dir> captures a profile.
        trace_dir = os.environ.get("GAML_JAX_TRACE", "")
        if trace_dir:
            jax.profiler.start_trace(trace_dir)

        def pipelined_window():
            # stage all windows first (async uploads overlap earlier
            # dispatches' device compute), then chain the rescores; the
            # uploads are INSIDE the timed window — this changes
            # scheduling, not the bytes shipped per rescore.  All
            # scores come back in ONE stacked fetch (per-handle floats
            # would pay one tunnel round trip each).
            t0 = time.time()
            stages = [get_dev().stage([genome]) for _ in range(iters)]
            handles = [rescore_async(staged=s)[0] for s in stages]
            _ = np.asarray(jnp.stack(handles))
            return (time.time() - t0) / iters

        pipe_budget = float(os.environ.get("GAML_BENCH_PIPE_BUDGET",
                                           "60"))
        t_pipe, pipe_times = best_of_windows(pipelined_window,
                                             pipe_budget, n_min=3,
                                             n_max=8)

        def batched_window():
            nd = max(1, (iters + BATCH - 1) // BATCH)
            t0 = time.time()
            stages = [get_dev().stage([genome] * BATCH) for _ in range(nd)]
            handles = [rescore_batched_async(staged=s)[0]
                       for s in stages]
            _ = np.asarray(jnp.stack(handles))
            return (time.time() - t0) / (nd * BATCH)

        if BATCH > 0:
            t_batch, batch_times = best_of_windows(batched_window,
                                                   pipe_budget, n_min=3,
                                                   n_max=8)
        else:
            t_batch, batch_times = t_pipe, []
        if trace_dir:
            jax.profiler.stop_trace()
        # headline: the better of the two production dispatch shapes
        # (per-move latency pipeline vs bulk batched dispatches); both
        # are full rescores with every phase counted
        reads_per_s = n_reads / min(t_pipe, t_batch)
        route = "device"
    else:
        # tunnel wedged or compile never finished: report the
        # production fallback route (what the cost-model router serves)
        score, zeros, n_cands = float("nan"), -1, -1
        probe_ms = float("nan")
        t_warm = float("nan")
        pipe_times, batch_times = [], []
        t_pipe = t_batch = host_par_dt
        reads_per_s = host_reads_per_s
        route = "host-fallback"

    vs_serial = reads_per_s / host_serial_rps
    vs_parallel = reads_per_s / host_reads_per_s
    result = {
        "metric": "reads_scored_per_sec_per_chip",
        "value": round(reads_per_s, 1),
        "unit": "reads/s",
        "vs_baseline": round(vs_serial, 2),
        "vs_baseline_serial": round(vs_serial, 2),
        "vs_baseline_parallel": round(vs_parallel, 2),
    }
    print(json.dumps(result))
    print(f"# detail: route={route} n_reads={n_reads} cands={n_cands} "
          f"score={score:.4f} zeros={zeros} cap={state['cap']} "
          f"t_world={t_world:.1f}s t_index={t_index:.1f}s "
          f"t_cold={t_cold:.1f}s t_compile_bg={warm['dt'] or -1:.1f}s "
          f"probe_ms={probe_ms:.1f} "
          f"t_warm_median={t_warm * 1000:.0f}ms "
          f"t_pipelined={t_pipe * 1000:.0f}ms "
          f"t_batched={t_batch * 1000:.1f}ms/rescore (batch={BATCH}) "
          f"pipe_windows_ms={[round(t * 1000) for t in pipe_times]} "
          f"batch_windows_ms={[round(t * 1000, 1) for t in batch_times]} "
          f"host_serial={host_serial_rps:.0f} r/s "
          f"(best of {len(host_times)}) "
          f"host_parallel={host_reads_per_s:.0f} r/s "
          f"device={jax.devices()[0].platform}", file=sys.stderr)


if __name__ == "__main__":
    main()
