"""Multiprocess JAX worker: index own read shard, stage locally, score on
the GLOBAL mesh, write the psum-merged replicated result.

Env: GAML_MP_COORD, GAML_MP_NPROC, GAML_MP_PROC, GAML_MP_OUT.
XLA_FLAGS / JAX_PLATFORMS must be set by the spawner (before python
starts — the container's sitecustomize imports jax at startup).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    # the container's sitecustomize may have force-registered a remote-TPU
    # backend at interpreter startup; switch to CPU before first use
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=os.environ["GAML_MP_COORD"],
        num_processes=int(os.environ["GAML_MP_NPROC"]),
        process_id=int(os.environ["GAML_MP_PROC"]))
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import mp_common as mc

    n_dev = len(jax.devices())
    assert n_dev == mc.N_ROWS, (n_dev, mc.N_ROWS)
    n_local = len(jax.local_devices())
    proc = int(os.environ["GAML_MP_PROC"])
    my_rows = list(range(proc * n_local, (proc + 1) * n_local))

    seq, reads = mc.build_world()
    # each process indexes ONLY its own rows' reads
    nb_local = mc.local_nb(seq, reads, my_rows)
    nb_all = multihost_utils.process_allgather(
        np.array([nb_local], dtype=np.int64))
    nb = mc.round_nb(int(nb_all.max()))

    staged_local, (lens_l, mask_l), n_reads_local = mc.stage_for_rows(
        seq, reads, my_rows, nb)

    mesh = Mesh(np.asarray(jax.devices()).reshape(mc.N_ROWS, 1),
                ("reads", "cand"))
    sh2 = NamedSharding(mesh, P("reads", "cand"))
    sh1 = NamedSharding(mesh, P("reads"))
    staged = {k: jax.make_array_from_process_local_data(sh2, v)
              for k, v in staged_local.items()}
    lens_g = jax.make_array_from_process_local_data(sh1, lens_l)
    mask_g = jax.make_array_from_process_local_data(sh1, mask_l)

    from gaml_tpu.parallel.sharded import sharded_single_end_score

    score, zeros = sharded_single_end_score(
        mesh, staged, (lens_g, mask_g), float(np.log(mc.MATCH)),
        float(np.log(mc.MISMATCH)), mc.GENOME_LEN, -0.7, -10.0, mc.RMAX,
        n_reads_local, mc.N_READS)
    out = {"score": float(score), "zeros": int(zeros), "nb": nb}
    with open(os.environ["GAML_MP_OUT"], "w") as f:
        json.dump(out, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
