"""Device banded-extend kernel contract tests.

The reference's 0-1 BFS (ProcessHit) marks states visited at *push* time,
so a substitution branch's cost-2 children can permanently block the
genome/read-skip branches' cost-1 match chains: indel alignments are charged
~2 per indel or rejected outright.  The device kernel deliberately does NOT
replicate that search-order artifact — it computes the true min-cost over
the same restricted alignment graph (forced-match semantics, band +-3),
which is a strict superset aligner:

  - every oracle-accepted candidate is kernel-accepted;
  - kernel errors <= oracle errors (equal on substitution-only optima);
  - when the costs agree, the begin position matches the BFS tie-break;
  - kernel errors equal an independent Dijkstra over the restricted graph.

Bit-exact reference parity is the job of the "bfs" backend (align.bfs),
tested in test_bfs_align.py.
"""
import numpy as np
import pytest

from gaml_tpu.align.bfs import K, process_hit
from gaml_tpu.core import dna
from gaml_tpu.ops.extend import batch_extend_arrays

from fixtures import random_seq
from test_bfs_align import dijkstra_min_cost


def kernel_one(seq, g0, r0, read):
    ok, errs, begin = batch_extend_arrays(
        seq, np.array([g0], dtype=np.int32), np.array([r0], dtype=np.int32), [read])
    return bool(ok[0]), int(errs[0]), int(begin[0])


def dijkstra_total(seq, read, g0, r0):
    f = dijkstra_min_cost(seq, read, g0 + K, r0 + K, "fwd")
    if f is None:
        return None
    if g0 == 0:
        if r0 < 6:
            return f[0] + r0, {-1}
        return None
    b = dijkstra_min_cost(seq, read, g0 - 1, r0 - 1, "bwd")
    if b is None:
        return None
    return f[0] + b[0], {g + 1 for g in b[1]}


def seeds_of(read, seq):
    out = []
    hay = seq.tobytes()
    for rp in range(len(read) - K + 1):
        window = read[rp:rp + K].tobytes()
        start = 0
        while True:
            gp = hay.find(window, start)
            if gp < 0:
                break
            out.append((gp, rp))
            start = gp + 1
    return out


def random_case(rng, seq, rlen=40):
    pos = int(rng.integers(3, len(seq) - rlen - 3))
    read = seq[pos:pos + rlen].copy()
    for _ in range(int(rng.integers(1, 4))):
        i = int(rng.integers(0, len(read)))
        roll = rng.random()
        if roll < 0.6:
            read[i] = (read[i] + 1 + int(rng.integers(0, 3))) % 4
        elif roll < 0.8 and len(read) > 20:
            read = np.delete(read, i)
        else:
            read = np.insert(read, i, int(rng.integers(0, 4)))
    return read


@pytest.mark.parametrize("seed", range(8))
def test_kernel_superset_of_oracle_and_exact_mincost(seed):
    rng = np.random.default_rng(seed)
    seq = dna.encode_seq(random_seq(rng, 350))
    n_checked = 0
    for _ in range(40):
        read = random_case(rng, seq)
        seeds = seeds_of(read, seq)
        if not seeds:
            continue
        g0, r0 = seeds[int(rng.integers(0, len(seeds)))]
        oracle = process_hit(g0, r0, read, seq)
        ok, errs, begin = kernel_one(seq, g0, r0, read)
        exact = dijkstra_total(seq, read, g0, r0)
        n_checked += 1
        # kernel == independent min-cost search
        if exact is None:
            assert not ok
        else:
            assert ok
            assert errs == exact[0], (g0, r0, errs, exact)
            assert begin in exact[1], (g0, r0, begin, exact)
        # superset of the BFS oracle
        if oracle is not None:
            assert ok
            assert errs <= oracle[0]
            if errs == oracle[0]:
                assert begin == oracle[1], (g0, r0, oracle, (errs, begin))
    assert n_checked > 10


def test_kernel_genome_boundaries():
    rng = np.random.default_rng(99)
    seq = dna.encode_seq(random_seq(rng, 80))
    for overhang in range(0, 8):
        read = np.concatenate([
            dna.encode_seq(random_seq(rng, overhang)), seq[:25]]).astype(np.uint8)
        oracle = process_hit(0, overhang, read, seq)
        ok, errs, begin = kernel_one(seq, 0, overhang, read)
        if overhang < 6:
            assert ok and oracle is not None
            assert (errs, begin) == (oracle[0], oracle[1]) == (overhang, -1)
        else:
            assert not ok and oracle is None
    # read running off the genome end: forward must fail like the oracle
    tail = seq[60:].copy()
    read = np.concatenate([tail, dna.encode_seq(random_seq(rng, 6))]).astype(np.uint8)
    oracle = process_hit(60, 0, read, seq)
    ok, errs, begin = kernel_one(seq, 60, 0, read)
    exact = dijkstra_total(seq, read, 60, 0)
    assert ok == (exact is not None)
    if oracle is not None:
        assert ok


def test_kernel_substitution_only_dense():
    """High-substitution-density candidates: the kernel may still find a
    cheaper indel path the BFS blocks, but never a worse one, and begins
    must agree whenever costs do."""
    rng = np.random.default_rng(7)
    seq = dna.encode_seq(random_seq(rng, 300))
    n = 0
    for _ in range(150):
        rlen = 40
        pos = int(rng.integers(3, len(seq) - rlen - 3))
        read = seq[pos:pos + rlen].copy()
        for _ in range(int(rng.integers(1, 5))):
            i = int(rng.integers(0, rlen))
            read[i] = (read[i] + 1 + int(rng.integers(0, 3))) % 4
        seeds = seeds_of(read, seq)
        if not seeds:
            continue
        g0, r0 = seeds[int(rng.integers(0, len(seeds)))]
        oracle = process_hit(g0, r0, read, seq)
        ok, errs, begin = kernel_one(seq, g0, r0, read)
        n += 1
        if oracle is None:
            continue
        assert ok
        assert errs <= oracle[0]
        if errs == oracle[0]:
            assert begin == oracle[1]
    assert n > 50
