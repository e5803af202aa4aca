"""Shared world/staging builder for the multiprocess JAX test.

Each reads-shard row indexes ONLY its own reads (its own ReadIndexMaxHash)
— the multi-host ingestion model of SURVEY.md section 5.8 — and candidate
generation is deterministic per row, so any process can build any row's
staging identically.
"""
import numpy as np

N_ROWS = 8          # global mesh reads axis
GENOME_LEN = 400
N_READS = 16
READ_LEN = 24
RMAX = 32
MATCH, MISMATCH = 0.96, 0.01


def build_world(seed=1):
    from gaml_tpu.core import dna

    rng = np.random.default_rng(seed)
    genome = "".join("ACGT"[i] for i in rng.integers(0, 4, GENOME_LEN))
    seq = dna.encode_seq(genome)
    reads = []
    for _ in range(N_READS):
        p = int(rng.integers(0, GENOME_LEN - READ_LEN + 1))
        reads.append(genome[p:p + READ_LEN])
    return seq, reads


def row_members(row):
    return [i for i in range(N_READS) if i % N_ROWS == row]


def build_row(seq, reads, row):
    """Index + candidates for one reads-shard row (local read ids)."""
    from gaml_tpu.align.aligner import gen_candidates
    from gaml_tpu.core import dna
    from gaml_tpu.index.maxhash import ReadIndexMaxHash

    members = row_members(row)
    idx = ReadIndexMaxHash()
    codes = {}
    for local, rid in enumerate(members):
        c = dna.encode_seq(reads[rid])
        idx.add_read(c, local)
        codes[local] = c
    cands = gen_candidates(idx, codes, seq)
    out = [(c.read_id, c.genome_pos, c.read_pos, read) for c, read in cands]
    lens = np.full(len(members), READ_LEN, dtype=np.int32)
    return out, lens


def stage_for_rows(seq, reads, rows, nb):
    """Staged arrays for a subset of rows with a fixed global nb."""
    from gaml_tpu.parallel.sharded import split_cells, stage_rows

    cand_rows = []
    lens_rows = []
    for r in rows:
        cands, lens = build_row(seq, reads, r)
        cand_rows.append(cands)
        lens_rows.append(lens)
    per_cell, _local_nb = split_cells(cand_rows, nc=1)
    n_reads_local = max(len(row_members(r)) for r in range(N_ROWS))
    staged, lens_mask = stage_rows(seq, per_cell, 1, RMAX, nb, lens_rows,
                                   n_reads_local)
    return staged, lens_mask, n_reads_local


def local_nb(seq, reads, rows):
    from gaml_tpu.parallel.sharded import split_cells

    cand_rows = [build_row(seq, reads, r)[0] for r in rows]
    _cells, nb = split_cells(cand_rows, nc=1)
    return nb


def round_nb(nb):
    return ((nb + 127) // 128) * 128


# ---------------------------------------------------------------- paired
PAIRED_ROWS = 32      # global (walk, read) pair rows
PAIRED_K = 4
PAIRED_L = 30
PAIRED_IM, PAIRED_ISTD = 200, 20
PAIRED_N_READS = 24


def paired_row_block(lo, hi):
    """Deterministic pair-position rows [lo, hi) — the stand-in for a
    process's own position collection over its read shard."""
    rng = np.random.default_rng(99)
    pos1 = np.full((PAIRED_ROWS, PAIRED_K), -1, np.int32)
    ed1 = np.zeros((PAIRED_ROWS, PAIRED_K), np.int32)
    or1 = np.zeros((PAIRED_ROWS, PAIRED_K), np.int32)
    pos2 = np.full((PAIRED_ROWS, PAIRED_K), -1, np.int32)
    ed2 = np.zeros((PAIRED_ROWS, PAIRED_K), np.int32)
    or2 = np.zeros((PAIRED_ROWS, PAIRED_K), np.int32)
    rid = np.zeros(PAIRED_ROWS, np.int32)
    l1 = np.full(PAIRED_ROWS, PAIRED_L, np.int32)
    l2 = np.full(PAIRED_ROWS, PAIRED_L, np.int32)
    mask = np.zeros(PAIRED_ROWS, bool)
    for i in range(PAIRED_ROWS):
        p = int(rng.integers(0, 500))
        k = int(rng.integers(1, PAIRED_K + 1))
        pos1[i, :k] = p + np.arange(k)
        ed1[i, :k] = rng.integers(0, 3, k)
        pos2[i, :k] = p + PAIRED_IM - PAIRED_L + np.arange(k)
        ed2[i, :k] = rng.integers(0, 3, k)
        or2[i, :k] = 1
        rid[i] = i % PAIRED_N_READS
        mask[i] = True
    sl = slice(lo, hi)
    return {"pos1": pos1[sl], "ed1": ed1[sl], "or1": or1[sl],
            "pos2": pos2[sl], "ed2": ed2[sl], "or2": or2[sl],
            "rid": rid[sl], "len1": l1[sl], "len2": l2[sl],
            "mask": mask[sl]}


# ---------------------------------------------------------------- pacbio
PB_ROWS = 32          # global (read, alignment-hit) rows
PB_N_READS = 12
PB_READ_LEN = 500.0
PB_TOTAL_LEN = 2000.0


def pacbio_rows(lo, hi):
    """Deterministic (rid, logprob) alignment-hit rows [lo, hi) — the
    stand-in for a process's own PacBio position collection."""
    rng = np.random.default_rng(123)
    rid = rng.integers(0, PB_N_READS, PB_ROWS).astype(np.int32)
    lp = (-rng.random(PB_ROWS) * 200.0 - 50.0).astype(np.float32)
    mask = np.ones(PB_ROWS, bool)
    sl = slice(lo, hi)
    return rid[sl], lp[sl], mask[sl]


def pacbio_reduction_inputs(n_pad):
    """Dense per-read floors + lens-mask (global [n_pad] arrays)."""
    floors = np.full(n_pad, -np.inf, np.float32)
    floors[:PB_N_READS] = -10.0 + (-0.7) * PB_READ_LEN
    lens_mask = np.zeros(n_pad, bool)
    lens_mask[:PB_N_READS] = True
    return floors, lens_mask


# ------------------------------------------------- pacbio forward DP jobs
PB_FWD_JOBS = 8        # == N_ROWS: one job per mesh row
PB_FWD_RMAX = 64
PB_FWD_WIDTH = 64
PB_FWD_GLEN = 300
PB_FWD_LM = float(np.log(0.9))
PB_FWD_LMM = float(np.log(0.03))


def pb_forward_world():
    """Deterministic staged forward-DP job batch (genome + per-job read,
    band centers along the sampling diagonal) for the mesh forward_batch
    coverage; any process can rebuild any job identically."""
    rng = np.random.default_rng(7)
    genome = rng.integers(0, 4, PB_FWD_GLEN).astype(np.uint8)
    reads = np.full((PB_FWD_JOBS, PB_FWD_RMAX), 6, np.uint8)
    rlens = np.zeros(PB_FWD_JOBS, np.int32)
    centers = np.zeros((PB_FWD_JOBS, PB_FWD_RMAX + 1), np.int32)
    gstarts = np.zeros(PB_FWD_JOBS, np.int32)
    glens = np.full(PB_FWD_JOBS, PB_FWD_GLEN, np.int32)
    for i in range(PB_FWD_JOBS):
        L = int(rng.integers(40, PB_FWD_RMAX + 1))
        p = int(rng.integers(0, PB_FWD_GLEN - PB_FWD_RMAX - 1))
        r = genome[p:p + L].copy()
        errs = rng.random(L) < 0.1
        r[errs] = (r[errs] + rng.integers(1, 4, int(errs.sum()))) % 4
        reads[i, :L] = r
        rlens[i] = L
        centers[i] = np.minimum(p + np.arange(PB_FWD_RMAX + 1),
                                PB_FWD_GLEN - 1)
    return genome, reads, rlens, centers, gstarts, glens


# --------------------------------------- incremental bucket_apply blocks
# Two "walks" worth of pair rows: block A = global rows [0, 16), block B
# = [16, 32).  The incremental scenario applies +A, +B, then -B into the
# device-resident running totals; the result must match scoring A alone
# (to f32 add/sub cancellation accuracy — the reference's sequential
# probs[read] += p / -= p has the same cancellation class).
PAIRED_BLK = PAIRED_ROWS // 2


def paired_inc_block(which, lo, hi):
    """Local [lo, hi) slice of incremental block 'A' or 'B'."""
    off = 0 if which == "A" else PAIRED_BLK
    return paired_row_block(off + lo, off + hi)
