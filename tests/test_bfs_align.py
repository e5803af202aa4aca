"""Oracle extension kernel tests: exactness vs an independent Dijkstra over
the same restricted alignment graph, plus targeted edge cases."""
import heapq

import numpy as np
import pytest

from gaml_tpu.core import dna
from gaml_tpu.align.bfs import ERROR_LIMIT, K, process_hit

from fixtures import random_seq


def dijkstra_min_cost(genome, read, start_g, start_r, direction):
    """Independent min-cost search over the restricted graph (match moves
    forced).  Returns (cost, set of accepting genome endpoints at min cost)
    or None."""
    glen, rlen = len(genome), len(read)
    step = 1 if direction == "fwd" else -1
    accept_r = rlen if direction == "fwd" else -1
    dist = {(start_g, start_r): 0}
    pq = [(0, start_g, start_r)]
    best = None
    ends = set()
    while pq:
        c, g, r = heapq.heappop(pq)
        if c > ERROR_LIMIT:
            break
        if dist.get((g, r), 1 << 30) < c:
            continue
        if r == accept_r:
            if best is None:
                best = c
            if c == best:
                ends.add(g)
            continue
        gc = genome[g] if 0 <= g < glen else -1
        moves = []
        if gc == read[r]:
            if direction == "fwd":
                if g + 1 < glen or r + 1 == rlen:
                    moves.append((c, g + 1, r + 1))
            else:
                if g - 1 >= 0 or r - 1 == -1:
                    moves.append((c, g - 1, r - 1))
        else:
            if direction == "fwd":
                if g + 1 < glen:
                    moves += [(c + 1, g + 1, r + 1), (c + 1, g + 1, r)]
                moves.append((c + 1, g, r + 1))
            else:
                if g - 1 >= 0:
                    moves += [(c + 1, g - 1, r - 1), (c + 1, g - 1, r)]
                moves.append((c + 1, g, r - 1))
        for nc, ng, nr in moves:
            if nc < dist.get((ng, nr), 1 << 30):
                dist[(ng, nr)] = nc
                heapq.heappush(pq, (nc, ng, nr))
    if best is None:
        return None
    return best, ends


def reference_total(genome, read, genome_pos, read_pos):
    f = dijkstra_min_cost(genome, read, genome_pos + K, read_pos + K, "fwd")
    if f is None:
        return None
    if genome_pos == 0:
        if read_pos < 6:
            return f[0] + read_pos
        return None
    b = dijkstra_min_cost(genome, read, genome_pos - 1, read_pos - 1, "bwd")
    if b is None:
        return None
    return f[0] + b[0]


def plant_read(rng, genome, pos, rlen, n_sub=0, indel=None):
    read = list(genome[pos:pos + rlen])
    if n_sub:
        for i in rng.choice(np.arange(rlen), size=n_sub, replace=False):
            read[i] = (read[i] + 1 + rng.integers(0, 3)) % 4
    if indel == "del":  # read misses one genome base
        read = list(genome[pos:pos + rlen + 1])
        del read[rlen // 2]
    if indel == "ins":
        read.insert(rlen // 2, rng.integers(0, 4))
        read = read[:rlen]
    return np.array(read, dtype=np.uint8)


def find_seed(read, genome):
    for rp in range(len(read) - K + 1):
        for gp in range(len(genome) - K + 1):
            if np.array_equal(read[rp:rp + K], genome[gp:gp + K]):
                return gp, rp
    return None


def test_exact_match():
    rng = np.random.default_rng(0)
    genome = dna.encode_seq(random_seq(rng, 200))
    read = genome[50:80].copy()
    res = process_hit(50, 0, read, genome)
    assert res == (0, 50, 79)


def test_substitutions_counted():
    rng = np.random.default_rng(1)
    genome = dna.encode_seq(random_seq(rng, 200))
    read = genome[50:90].copy()
    read[2] = (read[2] + 1) % 4  # before seed
    read[35] = (read[35] + 1) % 4  # after seed
    # seed at read offset 5 (clean 15-mer at genome 55)
    res = process_hit(55, 5, read, genome)
    assert res is not None
    errs, begin, end = res
    assert errs == 2
    assert begin == 50


def test_error_limit():
    rng = np.random.default_rng(2)
    genome = dna.encode_seq(random_seq(rng, 200))
    read = genome[50:90].copy()
    for i in (20, 24, 28, 32):  # 4 errors after the seed at offset 0
        read[i] = (read[i] + 1) % 4
    assert process_hit(50, 0, read, genome) is None


def test_genome_start_rule():
    rng = np.random.default_rng(3)
    genome = dna.encode_seq(random_seq(rng, 100))
    read = np.concatenate([
        dna.encode_seq(random_seq(rng, 4)), genome[:30]]).astype(np.uint8)
    # seed: read[4:19] == genome[0:15]
    res = process_hit(0, 4, read, genome)
    assert res is not None
    errs, begin, end = res
    assert errs == 4  # read_pos counted as errors (graph.cc:797-798)
    assert begin == -1
    # read_pos >= 6 fails outright
    read2 = np.concatenate([
        dna.encode_seq(random_seq(rng, 7)), genome[:30]]).astype(np.uint8)
    assert process_hit(0, 7, read2, genome) is None


@pytest.mark.parametrize("case", range(40))
def test_total_errors_match_independent_search_subs_only(case):
    """Substitution-only reads: no visited-blocking artifacts are possible
    (the diagonal/substitution branch is always pushed first), so the BFS
    equals the exact min-cost search.  Indel cases intentionally excluded —
    there the BFS's push-marked visited set over-charges or rejects (see
    tests/test_extend_kernel.py docstring)."""
    rng = np.random.default_rng(100 + case)
    genome = dna.encode_seq(random_seq(rng, 300))
    rlen = 40
    pos = int(rng.integers(1, 250))
    read = plant_read(rng, genome, pos, rlen, n_sub=(case % 4))
    seed = find_seed(read, genome)
    if seed is None:
        return
    gp, rp = seed
    got = process_hit(gp, rp, read, genome)
    expect = reference_total(genome, read, gp, rp)
    if expect is None:
        assert got is None
    else:
        assert got is not None
        assert got[0] == expect


def test_bfs_indel_blocking_artifact():
    """Document the reference's search-order artifact: for a single clean
    deletion downstream of the seed, the substitution branch's children
    mark the off-diagonal match chain's next state visited one step ahead
    at every depth, so the cost-1 alignment is never completed and the BFS
    rejects the candidate outright — while the true restricted-graph min
    cost is 1.  The device kernel (ops.extend) fixes this."""
    rng = np.random.default_rng(500)
    checked = 0
    for _ in range(50):
        genome = dna.encode_seq(random_seq(rng, 200))
        pos = int(rng.integers(10, 120))
        read = list(genome[pos:pos + 41])
        del read[30]  # deletion well after a seed at offset 0
        read = np.array(read, dtype=np.uint8)
        if find_seed(read, genome) != (pos, 0):
            continue
        got = process_hit(pos, 0, read, genome)
        exact = dijkstra_min_cost(genome, read, pos + K, K, "fwd")
        assert exact is not None and exact[0] == 1
        assert got is None
        checked += 1
        if checked >= 5:
            break
    assert checked >= 5
