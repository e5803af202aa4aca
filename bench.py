"""Benchmark: reads/sec likelihood-scored per chip.

Builds a synthetic read set + genome, generates seed candidates with the
max-hash index (host), and measures the steady-state throughput of the
device likelihood pipeline (banded extension + dedup + score reduction) —
the hot loop of every annealing iteration.

vs_baseline: ratio against the single-threaded host-oracle path (the exact
reference-semantics 0-1 BFS + numpy reduction) measured on a subsample in
the same run — the architectural stand-in for the reference's
single-threaded CPU scorer.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SMALL = os.environ.get("GAML_BENCH_SMALL") == "1"


def build_world(genome_len, n_reads, read_len, err_rate=0.01, seed=7):
    from gaml_tpu.core import dna
    from gaml_tpu.index.maxhash import ReadIndexMaxHash

    rng = np.random.default_rng(seed)
    genome_codes = rng.integers(0, 4, genome_len).astype(np.uint8)
    reads = []
    for _ in range(n_reads):
        p = int(rng.integers(0, genome_len - read_len + 1))
        r = genome_codes[p:p + read_len].copy()
        errs = rng.random(read_len) < err_rate
        r[errs] = (r[errs] + rng.integers(1, 4, int(errs.sum()))) % 4
        if rng.random() < 0.5:
            r = dna.revcomp(r)
        reads.append(r)
    idx = ReadIndexMaxHash()
    for i, r in enumerate(reads):
        idx.add_read(r, i)
    return genome_codes, reads, idx


def main():
    import jax
    import jax.numpy as jnp

    from gaml_tpu.align.aligner import gen_candidates
    from gaml_tpu.ops.extend import stage_candidates
    from gaml_tpu.ops.score import single_end_forward

    genome_len = 20_000 if SMALL else 400_000
    n_reads = 2_000 if SMALL else 100_000
    read_len = 100
    t0 = time.time()
    genome, reads, idx = build_world(genome_len, n_reads, read_len)
    read_seqs = {i: r for i, r in enumerate(reads)}
    cands = gen_candidates(idx, read_seqs, genome)
    t_cand = time.time() - t0

    g0s = np.array([c.genome_pos for c, _ in cands], dtype=np.int32)
    r0s = np.array([c.read_pos for c, _ in cands], dtype=np.int32)
    rids = np.array([c.read_id for c, _ in cands], dtype=np.int32)
    oriented = [r for _, r in cands]
    t1 = time.time()
    st = stage_candidates(genome, g0s, r0s, oriented, read_ids=rids)
    t_stage = time.time() - t1

    match, mismatch = 0.96, 0.01
    args = (
        jnp.asarray(st["read_f"]), jnp.asarray(st["rlen_f"]),
        jnp.asarray(st["gwin_f"]), jnp.asarray(st["glen_f"]),
        jnp.asarray(st["read_b"]), jnp.asarray(st["rlen_b"]),
        jnp.asarray(st["gwin_b"]), jnp.asarray(st["glen_b"]),
        jnp.asarray(st["g0"]), jnp.asarray(st["r0"]),
        jnp.asarray(st["valid"]), jnp.asarray(st["read_id"]),
        jnp.asarray(st["read_len"]), jnp.asarray(st["at_start"]),
        jnp.full((n_reads,), read_len, dtype=jnp.int32),
        jnp.float32(np.log(match)), jnp.float32(np.log(mismatch)),
        jnp.int32(genome_len), jnp.float32(-0.7), jnp.float32(-10.0),
    )
    import functools

    use_pallas = os.environ.get("GAML_USE_PALLAS", "1") == "1" and \
        jax.devices()[0].platform not in ("cpu",)
    if use_pallas:
        from gaml_tpu.ops.score import single_end_forward_pallas

        def t32(a):
            return jnp.asarray(np.ascontiguousarray(a.T).astype(np.int32))

        args = (
            t32(st["read_f"]), jnp.asarray(st["rlen_f"][None, :]),
            t32(st["gwin_f"]), jnp.asarray(st["glen_f"][None, :]),
            t32(st["read_b"]), jnp.asarray(st["rlen_b"][None, :]),
            t32(st["gwin_b"]), jnp.asarray(st["glen_b"][None, :]),
        ) + args[8:]
        fn = functools.partial(single_end_forward_pallas, rmax=st["rmax"],
                               n_reads=n_reads)
    else:
        fn = jax.jit(functools.partial(single_end_forward, rmax=st["rmax"],
                                       n_reads=n_reads))
    # compile + warmup
    tc = time.time()
    score, zeros, _ = fn(*args)
    score = float(score)
    t_compile = time.time() - tc

    iters = 3 if SMALL else 10
    ts = time.time()
    for _ in range(iters):
        score_j, zeros_j, _ = fn(*args)
    score_j.block_until_ready()
    dt = time.time() - ts
    reads_per_s = n_reads * iters / dt
    cands_per_s = len(cands) * iters / dt

    # host-oracle baseline on a subsample (single thread, exact reference
    # semantics)
    from gaml_tpu.align.bfs import process_hit

    sub = min(len(cands), 300 if SMALL else 2000)
    th = time.time()
    for (cand, read) in cands[:sub]:
        process_hit(cand.genome_pos, cand.read_pos, read, genome)
    host_dt = (time.time() - th) / sub * len(cands)
    host_reads_per_s = n_reads / host_dt if host_dt > 0 else float("inf")

    vs_baseline = reads_per_s / host_reads_per_s
    result = {
        "metric": "reads_scored_per_sec_per_chip",
        "value": round(reads_per_s, 1),
        "unit": "reads/s",
        "vs_baseline": round(vs_baseline, 2),
    }
    print(json.dumps(result))
    print(f"# detail: n_reads={n_reads} cands={len(cands)} "
          f"cands/s={cands_per_s:.0f} score={score:.4f} zeros={int(zeros)} "
          f"t_cand={t_cand:.1f}s t_stage={t_stage:.1f}s "
          f"t_compile={t_compile:.1f}s host_extrap={host_reads_per_s:.0f} r/s "
          f"device={jax.devices()[0].platform}", file=sys.stderr)


if __name__ == "__main__":
    main()
