"""Device paired-end pair-product reduction.

The paired likelihood's hot reduction (reference graph.cc:2054-2091): for
each read, all (pos1, pos2) combinations with opposite orientations in
innie geometry contribute ``p1 * p2 * insert_pdf(dist)``.  Position lists
per read are short (coverage-bounded); staged as dense [R, K] arrays the
whole combination is one [R, K, K] broadcast on the VPU, followed by the
floored mean-log reduction.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .score import reduce_read_probs


@functools.partial(jax.jit, static_argnames=())
def paired_pair_product(pos1, ed1, or1, len1, pos2, ed2, or2, len2,
                        log_match, log_mismatch, insert_mean, insert_std):
    """read_probs [R] from dense position arrays [R, K] (invalid entries
    have pos == -1)."""
    v1 = (pos1 >= 0)[:, :, None]
    v2 = (pos2 >= 0)[:, None, :]
    x_pos = pos1[:, :, None]
    y_pos = pos2[:, None, :]
    x_or = or1[:, :, None]
    y_or = or2[:, None, :]

    x_first = x_pos < y_pos
    geom_ok = jnp.where(
        x_first, (x_or == 0) & (y_or == 1), (x_or == 1) & (y_or == 0))
    dist = jnp.where(x_first,
                     y_pos - x_pos + len2[:, None, None],
                     x_pos - y_pos + len1[:, None, None]).astype(jnp.float32)

    z = (dist - insert_mean) / insert_std
    insprob = jnp.exp(-z * z / 2.0) / (np.sqrt(2 * np.pi) * insert_std)

    lp1 = ed1 * log_mismatch + (len1[:, None] - ed1) * log_match
    lp2 = ed2 * log_mismatch + (len2[:, None] - ed2) * log_match
    p = jnp.exp(lp1[:, :, None] + lp2[:, None, :]) * insprob
    p = jnp.where(v1 & v2 & geom_ok, p, 0.0)
    return jnp.sum(p, axis=(1, 2))


def paired_score_device(pos1, ed1, or1, len1, pos2, ed2, or2, len2,
                        log_match, log_mismatch, insert_mean, insert_std,
                        total_len, min_prob_per_base, min_prob_start):
    """Full device paired score: pair products + floored mean-log
    reduction.  Returns (score, zero_reads, read_probs)."""
    read_probs = paired_pair_product(
        pos1, ed1, or1, len1, pos2, ed2, or2, len2,
        log_match, log_mismatch, insert_mean, insert_std)
    lens = len1 + len2
    return reduce_read_probs(read_probs, lens, total_len,
                             min_prob_per_base, min_prob_start)


def stage_positions_dense(positions, n_reads: int, k_cap: int = 12):
    """positions: per-read list of (pos, (ed, orient)) tuples (the ReadSet
    positions structure) -> dense [R, k_cap] int32 arrays (pos, ed, orient),
    truncating beyond k_cap (log a warning count via return)."""
    pos = np.full((n_reads, k_cap), -1, dtype=np.int32)
    ed = np.zeros((n_reads, k_cap), dtype=np.int32)
    orient = np.zeros((n_reads, k_cap), dtype=np.int32)
    dropped = 0
    for i in range(n_reads):
        plist = positions[i] if i < len(positions) else []
        for j, (p, (e, o)) in enumerate(plist):
            if j >= k_cap:
                dropped += len(plist) - k_cap
                break
            pos[i, j] = p
            ed[i, j] = e
            orient[i, j] = o
    return pos, ed, orient, dropped
