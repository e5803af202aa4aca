"""Multi-chip PacBio (long-read) likelihood reduction.

The PacBio scorer's per-read work — log-sum-exp over each read's
alignment masses (reference AddPositionsToReadProbsPacbio,
graph.cc:3052-3060) and the floored mean-log reduction
(GetTotalProbPacbio, graph.cc:3062-3088) — maps onto a device mesh
exactly like the paired model: alignment hits become (read, logprob)
rows sharded over the mesh "reads" axis; each shard computes a stable
segment log-sum-exp into per-read totals merged with psum_scatter, and
the floored reduction merges shard partials with psum.

Position collection, the forward-DP windows, and the coverage interval
sweep stay host-side (scoring/pacbio.py / pacbio_score.py); this module
replaces the O(hits) + O(n_reads) host reduction — the per-iteration
cost that grows with read-set size.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np


class ShardedPacbioScorer:
    """Segment log-sum-exp + floored mean reduction on a mesh."""

    def __init__(self, mesh, dtype=None):
        import jax
        import jax.numpy as jnp

        self.mesh = mesh
        self.nr = mesh.shape["reads"]
        if dtype is None:
            dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        self.dtype = dtype
        self._fns = {}
        self._forward_fns = {}

    # ------------------------------------------------------- forward DP
    def _make_forward(self, rmax: int, width: int):
        import jax
        from jax.sharding import PartitionSpec as P

        from ..ops.forward import banded_forward

        def shard_fn(genome, reads, rlens, centers, gstarts, glens, lm,
                     lmm):
            # pure data parallelism over the job axis: each shard runs the
            # banded forward on its jobs slice against the replicated
            # target buffer; no cross-shard terms
            return banded_forward(genome, reads, rlens, centers, gstarts,
                                  glens, lm, lmm, rmax, width)

        return jax.jit(jax.shard_map(
            shard_fn, mesh=self.mesh,
            in_specs=(P(), P("reads"), P("reads"), P("reads"), P("reads"),
                      P("reads"), P(), P()),
            out_specs=P("reads"), check_vma=False))

    def forward_fn(self, b_pad: int, g_pad: int, rmax: int, width: int):
        key = (b_pad, g_pad, rmax, width)
        fn = self._forward_fns.get(key)
        if fn is None:
            fn = self._forward_fns[key] = self._make_forward(rmax, width)
        return fn

    def forward_batch(self, seq: np.ndarray, reads: np.ndarray,
                      rlens: np.ndarray, centers: np.ndarray,
                      gstarts: np.ndarray, glens: np.ndarray,
                      log_match: float, log_mismatch: float,
                      rmax: int, width: int) -> np.ndarray:
        """Run one staged forward-DP job batch sharded over the mesh
        "reads" axis (SURVEY §2.2/§5.8: the PacBio compute itself under
        the mesh, not just the reduction).  Installed as
        PacbioReadSet.forward_dispatch by
        ProbCalculator.enable_sharded_pacbio; per-job outputs are
        bit-identical to the unsharded jnp kernel (the job axis is purely
        data-parallel).  Jobs pad to power-of-two multiples of the shard
        count, targets to power-of-two buffers, so compile count stays
        logarithmic."""
        import jax.numpy as jnp

        b = int(reads.shape[0])
        if b == 0:
            return np.zeros(0)
        b_pad = self.nr
        while b_pad < b:
            b_pad *= 2
        g_pad = 4096
        while g_pad < max(len(seq), 1):
            g_pad *= 2
        g = np.full(g_pad, 9, np.uint8)
        g[:len(seq)] = seq
        reads_p = np.full((b_pad, reads.shape[1]), 6, np.uint8)
        reads_p[:b] = reads
        rlens_p = np.zeros(b_pad, np.int32)
        rlens_p[:b] = rlens
        centers_p = np.zeros((b_pad, centers.shape[1]), np.int32)
        centers_p[:b] = centers
        gstarts_p = np.zeros(b_pad, np.int32)
        gstarts_p[:b] = gstarts
        glens_p = np.zeros(b_pad, np.int32)
        glens_p[:b] = glens
        fn = self.forward_fn(b_pad, g_pad, rmax, width)
        out = fn(jnp.asarray(g), jnp.asarray(reads_p),
                 jnp.asarray(rlens_p), jnp.asarray(centers_p),
                 jnp.asarray(gstarts_p), jnp.asarray(glens_p),
                 jnp.asarray(log_match, dtype=self.dtype),
                 jnp.asarray(log_mismatch, dtype=self.dtype))
        return np.asarray(out)[:b].astype(np.float64)

    def _make(self, n_rows: int, n_pad: int, n_reads: int):
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P

        dtype = self.dtype
        NEG = jnp.array(-jnp.inf, dtype)

        # numerically-stable distributed log-sum-exp: each shard computes
        # dense [n_pad] segment maxima, pmax makes the base global, exp
        # sums psum across shards, then each shard reduces its read slice
        def shard_fn2(rid, lp, mask, floors, lens_mask, total_len, n_valid):
            seg = jnp.where(mask, rid, n_pad)
            m_local = jax.ops.segment_max(jnp.where(mask, lp, NEG), seg,
                                          num_segments=n_pad + 1)[:-1]
            m = jax.lax.pmax(m_local, "reads")          # [n_pad] global max
            finite = jnp.isfinite(m)
            base = jnp.where(finite, m, 0.0)
            ex = jnp.where(mask, jnp.exp(lp - base[rid]), 0.0)
            s_local = jax.ops.segment_sum(ex, seg, num_segments=n_pad + 1)[:-1]
            s = jax.lax.psum(s_local, "reads")          # [n_pad]
            read_lp = jnp.where(finite & (s > 0), base + jnp.log(s), NEG)
            # floored mean-log over this shard's read slice
            idx = jax.lax.axis_index("reads")
            n_local = n_pad // self.nr
            lo = idx * n_local
            sl = jax.lax.dynamic_slice(read_lp, (lo,), (n_local,))
            fl = floors
            lm = lens_mask
            floored = (sl < fl) & lm
            sl = jnp.where(sl < fl, fl, sl)
            zero_local = jnp.sum(floored.astype(jnp.int32))
            sum_local = jnp.sum(jnp.where(lm, sl, 0.0))
            total = jax.lax.psum(sum_local, "reads")
            zeros = jax.lax.psum(zero_local, "reads")
            tl = jnp.maximum(total_len, 1).astype(dtype)
            return total / n_reads - jnp.log(2.0 * tl), zeros

        from jax.sharding import PartitionSpec as P  # noqa: F811

        return jax.jit(jax.shard_map(
            shard_fn2, mesh=self.mesh,
            in_specs=(P("reads"), P("reads"), P("reads"), P("reads"),
                      P("reads"), P(), P()),
            out_specs=(P(), P()), check_vma=False))

    def score_fn(self, n_rows: int, n_pad: int, n_reads: int):
        """The jitted shard_map for one shape — multiprocess callers build
        global mesh arrays themselves and invoke this directly (numpy
        inputs are only valid single-process)."""
        key = (n_rows, n_pad, n_reads)
        fn = self._fns.get(key)
        if fn is None:
            fn = self._fns[key] = self._make(*key)
        return fn

    def score(self, rid: np.ndarray, lp: np.ndarray, n_reads: int,
              read_lens: np.ndarray, total_len: int,
              min_prob_per_base: float, min_prob_start: float):
        """(score, zero_reads) from flat (read, logprob) alignment rows."""
        import jax.numpy as jnp

        nr = self.nr
        n = len(rid)
        n_rows = max(((n + nr - 1) // nr) * nr, nr)
        n_pad = ((n_reads + nr - 1) // nr) * nr
        rid_p = np.zeros(n_rows, np.int32)
        rid_p[:n] = rid
        lp_p = np.full(n_rows, -np.inf)
        lp_p[:n] = lp
        mask = np.zeros(n_rows, bool)
        mask[:n] = True
        floors = np.full(n_pad, np.inf)
        floors[:n_reads] = (min_prob_start +
                            min_prob_per_base *
                            np.asarray(read_lens, dtype=np.float64))
        lens_mask = np.zeros(n_pad, bool)
        lens_mask[:n_reads] = True
        # floors for the pad slots: -inf so they never floor (masked)
        floors[n_reads:] = -np.inf

        fn = self.score_fn(n_rows, n_pad, n_reads)
        s, z = fn(jnp.asarray(rid_p),
                  jnp.asarray(lp_p, dtype=self.dtype),
                  jnp.asarray(mask),
                  jnp.asarray(floors, dtype=self.dtype),
                  jnp.asarray(lens_mask),
                  jnp.asarray(float(total_len), dtype=self.dtype),
                  jnp.asarray(n_reads, dtype=jnp.int32))
        return float(s), int(z)


def calc_score_for_pacbio_sharded(graph, paths, read_set, mesh,
                                  no_cov_penalty: float = 0.0,
                                  exp_cov_move: float = 0.75,
                                  min_prob_per_base: float = -0.7,
                                  min_prob_start: float = -10.0,
                                  scorer: Optional[ShardedPacbioScorer]
                                  = None):
    """CalcScoreForPacbio with the per-read reduction on the mesh.
    Host: position collection + the coverage interval sweep (identical to
    scoring.pacbio_score.calc_score_for_pacbio); device: the per-read
    log-sum-exp + floored mean.  Returns (score, zero_reads, total_len).
    """
    from ..scoring.pacbio_score import sweep_walk

    if scorer is None:
        scorer = ShardedPacbioScorer(mesh)

    # host position collection + coverage sweep SHARED with the host
    # reducer (scoring.pacbio_score.sweep_walk — single source of truth
    # for the coverage semantics); only the per-read log-sum-exp +
    # floored mean run on the mesh
    rows_rid: List[int] = []
    rows_lp: List[float] = []
    total_len = 0
    bad_bases = 0

    read_set.precompute_ranges_for_paths(graph, paths)
    for path in paths:
        positions2, tl, bad = sweep_walk(graph, path, read_set,
                                         exp_cov_move)
        for i in range(len(positions2)):
            for _span, lp in positions2[i]:
                rows_rid.append(i)
                rows_lp.append(lp)
        total_len += tl
        bad_bases += bad

    score, zero_reads = scorer.score(
        np.asarray(rows_rid, dtype=np.int32),
        np.asarray(rows_lp, dtype=np.float64),
        read_set.get_number_of_reads(),
        np.asarray(read_set.read_lens, dtype=np.float64), total_len,
        min_prob_per_base, min_prob_start)
    return score - bad_bases * no_cov_penalty, zero_reads, total_len
