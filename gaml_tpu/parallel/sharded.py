"""Multi-chip data-parallel likelihood scoring.

The reference is single-threaded (SURVEY.md section 2.2); the workload's
embarrassingly-parallel axes are reads and alignment candidates.  We map
both onto a 2-D device mesh:

- axis "reads": reads (and their per-read totals) are sharded; each shard
  reduces its own floored log-probs and zero counts, merged with a psum.
- axis "cand": candidates *of the same reads* are split; per-read totals
  are partial on each device and merged with a psum over this axis before
  the floor/log reduction.

The graph and walk set stay host-side/replicated; the annealing driver
proposes moves on host process 0 (or replicated-deterministically on all
hosts), exactly as SURVEY.md section 5.8 prescribes.
"""
from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.extend import extend_kernel


def make_mesh(devices=None, reads_axis: int = None, cand_axis: int = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if reads_axis is None:
        # widest reads axis with cand_axis = n // reads_axis
        reads_axis = n
        cand_axis = 1
        for r in range(n, 0, -1):
            if n % r == 0:
                reads_axis, cand_axis = r, n // r
                break
    mesh_devices = np.asarray(devices).reshape(reads_axis, cand_axis)
    return Mesh(mesh_devices, ("reads", "cand"))


def sharded_single_end_score(mesh: Mesh, staged: Dict[str, jnp.ndarray],
                             read_lens_all, log_match: float,
                             log_mismatch: float, total_len: int,
                             min_prob_per_base: float, min_prob_start: float,
                             rmax: int, n_reads_local: int, n_reads: int):
    """Sharded forward scoring step.

    staged arrays have leading dims [NR, NC, nb, ...]; read_lens_all is
    [NR, n_reads_local].  Returns (score, zero_reads) replicated scalars.
    """

    def shard_fn(read_f, rlen_f, gwin_f, glen_f, read_b, rlen_b, gwin_b,
                 glen_b, g0, r0, valid, read_id, read_len, at_start, lens,
                 read_mask):
        # squeeze the sharded leading axes
        sq = lambda x: x.reshape(x.shape[2:])
        read_f, rlen_f, gwin_f, glen_f = map(sq, (read_f, rlen_f, gwin_f, glen_f))
        read_b, rlen_b, gwin_b, glen_b = map(sq, (read_b, rlen_b, gwin_b, glen_b))
        g0, r0, valid, read_id, read_len, at_start = map(
            sq, (g0, r0, valid, read_id, read_len, at_start))
        lens = lens.reshape(lens.shape[1:])
        read_mask = read_mask.reshape(read_mask.shape[1:])

        ok, errs, d_back = extend_kernel(read_f, rlen_f, gwin_f, glen_f,
                                         read_b, rlen_b, gwin_b, glen_b, rmax)
        begin = g0 - r0 - d_back
        ok = jnp.where(at_start, ok & (r0 < 6), ok)
        errs = jnp.where(at_start, errs + r0, errs)
        begin = jnp.where(at_start, -1, begin)

        good = ok & valid
        from ..ops.score import dedup_alignments

        order, good_s = dedup_alignments(read_id, begin, good)
        errs_s = errs[order]
        rid_s = read_id[order]
        rlen_s = read_len[order]

        p = jnp.exp(errs_s * log_mismatch + (rlen_s - errs_s) * log_match)
        p = jnp.where(good_s, p, 0.0)
        # read ids are local to this reads-shard
        local_probs = jax.ops.segment_sum(p, rid_s, num_segments=n_reads_local)
        # merge candidate splits of the same reads
        local_probs = jax.lax.psum(local_probs, "cand")

        tl = max(total_len, 1)
        probs = local_probs / (2.0 * tl)
        thresholds = jnp.exp(min_prob_start + min_prob_per_base * lens)
        floored = (probs < thresholds) & read_mask
        zero_local = jnp.sum(floored.astype(jnp.int32))
        probs = jnp.where(probs < thresholds, thresholds, probs)
        log_local = jnp.sum(jnp.where(read_mask, jnp.log(probs), 0.0))
        # merge read shards
        log_total = jax.lax.psum(log_local, "reads")
        zero_total = jax.lax.psum(zero_local, "reads")
        return log_total / n_reads, zero_total

    in_specs = tuple([P("reads", "cand")] * 14 + [P("reads"), P("reads")])
    fn = jax.shard_map(shard_fn, mesh=mesh, in_specs=in_specs,
                       out_specs=(P(), P()), check_vma=False)
    read_lens_arr, read_mask = read_lens_all
    args = [staged[k] for k in
            ("read_f", "rlen_f", "gwin_f", "glen_f", "read_b", "rlen_b",
             "gwin_b", "glen_b", "g0", "r0", "valid", "read_id", "read_len",
             "at_start")] + [read_lens_arr, read_mask]
    return jax.jit(fn)(*args)


def split_cells(cand_by_read_shard: List[list], nc: int):
    """Split each reads-shard's candidates round-robin by read id across
    the cand axis (duplicate alignments of one read stay in one cell — the
    (read, begin) dedup is per-shard).  Returns (per_cell, local_nb)."""
    per_cell: List[List[list]] = [[[] for _ in range(nc)]
                                  for _ in cand_by_read_shard]
    for ri, cands in enumerate(cand_by_read_shard):
        for c in cands:
            per_cell[ri][c[0] % nc].append(c)
    nb = max(1, max((len(cell) for row in per_cell for cell in row),
                    default=1))
    return per_cell, nb


def stage_rows(seq: np.ndarray, per_cell: List[List[list]], nc: int,
               rmax: int, nb: int, read_lens: List[np.ndarray],
               n_reads_local: int):
    """Stage a set of reads-shard rows into [n_rows, NC, nb, ...] arrays
    (one row per reads shard; a multiprocess worker stages only its own
    rows).  ``nb`` must be the GLOBAL per-cell capacity (consistent
    padding across processes)."""
    from ..ops.extend import stage_candidates

    cells = []
    for ri in range(len(per_cell)):
        row = []
        for ci in range(nc):
            cell = per_cell[ri][ci]
            g0s = np.array([c[1] for c in cell], dtype=np.int32)
            r0s = np.array([c[2] for c in cell], dtype=np.int32)
            reads = [c[3] for c in cell]
            rids = np.array([c[0] for c in cell], dtype=np.int32)
            if not cell:
                g0s = np.zeros(0, np.int32)
                r0s = np.zeros(0, np.int32)
                rids = np.zeros(0, np.int32)
            st = stage_candidates(seq, g0s, r0s, reads, rmax=rmax, nb=nb,
                                  read_ids=rids)
            row.append(st)
        cells.append(row)

    staged = {}
    for key in ("read_f", "rlen_f", "gwin_f", "glen_f", "read_b", "rlen_b",
                "gwin_b", "glen_b", "g0", "r0", "valid", "read_id",
                "read_len", "at_start"):
        staged[key] = np.stack(
            [np.stack([cells[ri][ci][key] for ci in range(nc)])
             for ri in range(len(per_cell))])
    lens = np.zeros((len(per_cell), n_reads_local), dtype=np.int32)
    mask = np.zeros((len(per_cell), n_reads_local), dtype=bool)
    for ri, rl in enumerate(read_lens):
        lens[ri, :len(rl)] = rl
        mask[ri, :len(rl)] = True
    return staged, (lens, mask)


def stage_sharded(seq: np.ndarray, cand_by_read_shard: List[list],
                  mesh: Mesh, rmax: int, read_lens: List[np.ndarray]):
    """Build [NR, NC, nb, ...] staged arrays from per-reads-shard candidate
    lists; each candidate is (read_id_local, genome_pos, read_pos, read)."""
    nr = mesh.shape["reads"]
    nc = mesh.shape["cand"]
    assert len(cand_by_read_shard) == nr
    per_cell, nb = split_cells(cand_by_read_shard, nc)
    nb = ((nb + 127) // 128) * 128
    n_reads_local = max(len(rl) for rl in read_lens)
    staged, lens_mask = stage_rows(seq, per_cell, nc, rmax, nb, read_lens,
                                   n_reads_local)
    return staged, lens_mask, n_reads_local
