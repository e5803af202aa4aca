"""Sharded scoring on a virtual 8-device CPU mesh: the psum-merged score
must match the host oracle scorer."""
import numpy as np
import pytest

import jax

from gaml_tpu.core import dna
from gaml_tpu.index.maxhash import ReadIndexMaxHash
from gaml_tpu.align.aligner import gen_candidates
from gaml_tpu.parallel.sharded import (
    make_mesh,
    sharded_single_end_score,
    stage_sharded,
)

from fixtures import random_seq, sample_reads

MATCH = 0.96
MISMATCH = 0.01


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4)])
def test_sharded_score_matches_host(mesh_shape):
    rng = np.random.default_rng(21)
    genome = random_seq(rng, 800)
    seq = dna.encode_seq(genome)
    n_reads = 64
    L = 32
    reads = sample_reads(rng, genome, n_reads, L, err_rate=0.0)

    # host truth: every exact read aligns (at least) at its position
    idx_all = ReadIndexMaxHash()
    codes = [dna.encode_seq(r) for r in reads]
    for i, c in enumerate(codes):
        idx_all.add_read(c, i)
    read_seqs = {i: c for i, c in enumerate(codes)}
    cands = gen_candidates(idx_all, read_seqs, seq)

    from gaml_tpu.align.bfs import process_hit

    host_probs = np.zeros(n_reads)
    seen = set()
    for cand, read in cands:
        res = process_hit(cand.genome_pos, cand.read_pos, read, seq)
        if res is None:
            continue
        key = (cand.read_id, res[1])
        if key in seen:
            continue
        seen.add(key)
        host_probs[cand.read_id] += MISMATCH ** res[0] * MATCH ** (L - res[0])
    thresh = np.exp(-10 + -0.7 * L)
    host_score = float(np.mean(np.log(np.maximum(host_probs / (2 * len(genome)), thresh))))
    host_zero = int(np.sum(host_probs / (2 * len(genome)) < thresh))

    # sharded: reads round-robin into reads-axis shards
    nr, nc = mesh_shape
    mesh = make_mesh(jax.devices(), nr, nc)
    shard_of = [i % nr for i in range(n_reads)]
    local_id = {}
    read_lens = [[] for _ in range(nr)]
    for i in range(n_reads):
        local_id[i] = len(read_lens[shard_of[i]])
        read_lens[shard_of[i]].append(L)
    cand_by_shard = [[] for _ in range(nr)]
    for cand, read in cands:
        sh = shard_of[cand.read_id]
        cand_by_shard[sh].append(
            (local_id[cand.read_id], cand.genome_pos, cand.read_pos, read))

    staged, lens_mask, n_reads_local = stage_sharded(
        seq, cand_by_shard, mesh, rmax=64,
        read_lens=[np.array(rl) for rl in read_lens])
    score, zeros = sharded_single_end_score(
        mesh, staged, lens_mask, float(np.log(MATCH)), float(np.log(MISMATCH)),
        len(genome), -0.7, -10.0, 64, n_reads_local, n_reads)
    assert int(zeros) == host_zero
    assert float(score) == pytest.approx(host_score, rel=2e-6)
