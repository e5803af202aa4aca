"""Stage-level profile of the device rescore pipeline: chained-marginal
time of the candgen jit and the rescore jit separately, plus compile
walls.  Run on the chip, tunnel quiet.  Usage:

    python tools/candgen_profile.py [genome_len] [n_reads]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def chain(fn, k=6):
    import jax

    def run(reps):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(reps)]
        jax.block_until_ready(outs)
        return time.perf_counter() - t0

    t1 = min(run(1) for _ in range(3))
    tk = min(run(k) for _ in range(3))
    return (tk - t1) / (k - 1), t1


def main():
    genome_len = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    n_reads = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tests"))
    from bench import build_world
    from gaml_tpu.index.maxhash import K_INDEX_KMER
    from gaml_tpu.native import NativeAlignBundle, read_index_build
    from gaml_tpu.core.dna import _COMP_LUT
    from gaml_tpu.ops.rescore_device import DeviceRescorer, _rescore
    from gaml_tpu.ops.candgen_device import _candgen

    genome, reads = build_world(genome_len, n_reads, 100)
    fp, ok_m, _k, _rc, seed_pos = read_index_build(reads, K_INDEX_KMER)
    okb = ok_m.astype(bool)
    rids = np.arange(n_reads, dtype=np.int64)[okb]
    fps_ok = fp[okb]
    order = np.argsort(fps_ok, kind="stable")
    sf, sr = fps_ok[order], rids[order]
    index = {}
    bounds = np.nonzero(np.diff(sf))[0] + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [len(sf)]))
    for s, e in zip(starts.tolist(), ends.tolist()):
        index[int(sf[s])] = sr[s:e].tolist()
    codes_rc = _COMP_LUT[reads][:, ::-1]
    bundle = NativeAlignBundle(index, 100, reads, codes_rc, seed_pos,
                               np.arange(n_reads, dtype=np.int32))
    dev = DeviceRescorer(bundle)
    cap = 131072

    t0 = time.perf_counter()
    out = dev.gen.query([genome], cap=cap, return_layout=True)
    jax.block_until_ready(out[:7])
    print(f"candgen compile+run: {time.perf_counter() - t0:.1f}s",
          flush=True)
    codes_u8, rid, g0, r0, orient, seg, n_tot, seg_base, seg_len = out
    print("n_tot:", int(n_tot), flush=True)

    lm, lmm = float(np.log(0.96)), float(np.log(0.01))
    args = dict(L=100, rmax=dev.ext.rmax, use_pallas=True,
                sorted_mode=True, interp=False)
    t0 = time.perf_counter()
    sc = _rescore(dev.ext.fwd_words, dev.ext.rc_words, codes_u8, rid, g0,
                  r0, orient, seg, n_tot, jnp.asarray(seg_base),
                  jnp.asarray(seg_len), dev.gen.row_of_dev,
                  dev._lay(cap), dev.lens_dev, jnp.int32(dev.n_reads),
                  jnp.float32(lm), jnp.float32(lmm),
                  jnp.int32(genome_len), jnp.float32(-0.7),
                  jnp.float32(-10.0), **args)
    jax.block_until_ready(sc)
    print(f"rescore compile+run: {time.perf_counter() - t0:.1f}s "
          f"score={float(sc[0]):.4f} zeros={int(sc[1])}", flush=True)

    def candgen_only():
        return dev.gen.query([genome], cap=cap)[1]

    def rescore_only():
        return _rescore(dev.ext.fwd_words, dev.ext.rc_words, codes_u8,
                        rid, g0, r0, orient, seg, n_tot,
                        jnp.asarray(seg_base), jnp.asarray(seg_len),
                        dev.gen.row_of_dev, dev._lay(cap), dev.lens_dev,
                        jnp.int32(dev.n_reads), jnp.float32(lm),
                        jnp.float32(lmm), jnp.int32(genome_len),
                        jnp.float32(-0.7), jnp.float32(-10.0),
                        **args)[0]

    def full():
        s, z, n = dev.rescore([genome], cap=cap, log_match=lm,
                              log_mismatch=lmm, total_len=genome_len,
                              min_prob_per_base=-0.7,
                              min_prob_start=-10.0)
        return s

    for name, fn in (("candgen", candgen_only),
                     ("rescore", rescore_only), ("full", full)):
        dt, t1 = chain(fn)
        print(f"{name:8s} marginal={dt*1000:7.1f} ms  single={t1*1000:7.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
