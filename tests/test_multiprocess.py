"""The REAL scoring pipeline under multiprocess JAX (SURVEY.md section
4(e) / VERDICT round-1 item 4): two OS processes, each indexing only its
own read shard, run the sharded single-end scorer over one global mesh;
the psum-merged score must equal the single-process score.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import mp_common as mc

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_expected():
    import jax
    from jax.sharding import Mesh

    seq, reads = mc.build_world()
    nb = mc.round_nb(max(mc.local_nb(seq, reads, [r])
                         for r in range(mc.N_ROWS)))
    staged, lens_mask, n_reads_local = mc.stage_for_rows(
        seq, reads, list(range(mc.N_ROWS)), nb)
    mesh = Mesh(np.asarray(jax.devices()[:mc.N_ROWS]).reshape(mc.N_ROWS, 1),
                ("reads", "cand"))
    from gaml_tpu.parallel.sharded import sharded_single_end_score

    score, zeros = sharded_single_end_score(
        mesh, staged, lens_mask, float(np.log(mc.MATCH)),
        float(np.log(mc.MISMATCH)), mc.GENOME_LEN, -0.7, -10.0, mc.RMAX,
        n_reads_local, mc.N_READS)
    return float(score), int(zeros)


def test_two_process_pipeline_matches_single(tmp_path):
    expected_score, expected_zeros = _single_process_expected()

    port = _free_port()
    nproc = 2
    procs = []
    outs = []
    for p in range(nproc):
        out = tmp_path / f"mp_out_{p}.json"
        outs.append(out)
        env = dict(os.environ)
        env.pop("PYTEST_CURRENT_TEST", None)
        env.update({
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "JAX_PLATFORMS": "cpu",
            "GAML_MP_COORD": f"127.0.0.1:{port}",
            "GAML_MP_NPROC": str(nproc),
            "GAML_MP_PROC": str(p),
            "GAML_MP_OUT": str(out),
        })
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "mp_child.py")],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    for proc in procs:
        stdout, _ = proc.communicate(timeout=540)
        logs.append(stdout.decode(errors="replace"))
    for proc, log in zip(procs, logs):
        assert proc.returncode == 0, log[-3000:]

    results = [json.loads(out.read_text()) for out in outs]
    # both processes hold the same replicated psum-merged result
    assert results[0] == results[1]
    assert results[0]["zeros"] == expected_zeros
    assert results[0]["score"] == pytest.approx(expected_score, rel=1e-6)
