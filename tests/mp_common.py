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
