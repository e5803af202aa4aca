"""Isolate the tunnel's per-rescore upload cost: chained-marginal
candgen dispatch with (a) a resident window buffer (zero upload), (b) a
fresh device_put per call, (c) fresh numpy passed straight as the jit
argument.  Distinguishes RPC-latency-bound from bandwidth-bound.

    python tools/upload_cost.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def chain(fn, k=8):
    import jax

    def run(reps):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(reps)]
        jax.block_until_ready(outs)
        return time.perf_counter() - t0

    t1 = min(run(1) for _ in range(3))
    tk = min(run(k) for _ in range(3))
    return (tk - t1) / (k - 1)


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_world
    from gaml_tpu.core.dna import _COMP_LUT
    from gaml_tpu.index.maxhash import K_INDEX_KMER
    from gaml_tpu.native import NativeAlignBundle, read_index_build
    from gaml_tpu.ops.rescore_device import DeviceRescorer

    K = K_INDEX_KMER
    genome_len, n_reads, L = 400_000, 100_000, 100
    genome, reads = build_world(genome_len, n_reads, L)
    fp, ok_m, _k, _rc, seed_pos = read_index_build(reads, K)
    okb = ok_m.astype(bool)
    rids_np = np.arange(n_reads, dtype=np.int64)[okb]
    fps_ok = fp[okb]
    order = np.argsort(fps_ok, kind="stable")
    sf_np, sr = fps_ok[order], rids_np[order]
    index = {}
    bounds = np.nonzero(np.diff(sf_np))[0] + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [len(sf_np)]))
    for s, e in zip(starts.tolist(), ends.tolist()):
        index[int(sf_np[s])] = sr[s:e].tolist()
    codes_rc = _COMP_LUT[reads][:, ::-1]
    bundle = NativeAlignBundle(index, L, reads, codes_rc, seed_pos,
                               np.arange(n_reads, dtype=np.int32))
    dev = DeviceRescorer(bundle)
    gen = dev.gen
    cap = 98304

    staged = gen.stage_upload([genome])
    jax.block_until_ready(gen.query(staged=staged, cap=cap)[1])

    def resident():
        return gen.query(staged=staged, cap=cap)[1]

    def fresh_put():
        return gen.query([genome], cap=cap)[1]

    p2_np = np.asarray(staged[0])
    fx_np = np.asarray(staged[1])

    def fresh_arg():
        # numpy straight into the jit call: the transfer rides the
        # dispatch instead of a separate device_put RPC
        st = (p2_np, fx_np) + staged[2:]
        return gen.query(staged=st, cap=cap)[1]

    for name, f in (("resident window (no upload)", resident),
                    ("device_put per call", fresh_put),
                    ("numpy as jit arg", fresh_arg)):
        dt = chain(f)
        print(f"{name:30s} marginal={dt*1000:7.1f} ms", flush=True)

    # raw device_put cost for the packed window alone
    def put_only():
        return jax.device_put(p2_np)

    dt = chain(put_only)
    print(f"{'device_put(106KB) alone':30s} marginal={dt*1000:7.1f} ms "
          f"({len(p2_np)/dt/1e6:.1f} MB/s)", flush=True)


if __name__ == "__main__":
    main()
