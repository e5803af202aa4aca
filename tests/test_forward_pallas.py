"""Pallas forward kernel (interpret mode) vs the jnp gather-free kernel."""
import numpy as np
import pytest

import jax.numpy as jnp

from gaml_tpu.core import dna
from gaml_tpu.ops.forward import banded_forward
from gaml_tpu.ops.forward_pallas import banded_forward_pallas

from fixtures import random_seq
from test_forward_kernel import MATCH, MISMATCH, noisy_copy


def make_batch(rng, n_reads=5, glen=400):
    genome = dna.encode_seq(random_seq(rng, glen))
    rmax = 0
    reads_list, centers_list, rlens = [], [], []
    for _ in range(n_reads):
        start = int(rng.integers(0, glen // 2))
        span = int(rng.integers(100, 200))
        read = noisy_copy(rng, genome[start:start + span], err=0.1)
        steps = rng.choice([0, 1, 1, 1, 2], size=len(read))
        centers = np.concatenate([[start], start + np.cumsum(steps)])
        reads_list.append(read)
        centers_list.append(centers.astype(np.int32))
        rlens.append(len(read))
        rmax = max(rmax, len(read))
    b = n_reads
    reads = np.full((b, rmax), 6, dtype=np.uint8)
    centers = np.zeros((b, rmax + 1), dtype=np.int32)
    for i in range(b):
        reads[i, :rlens[i]] = reads_list[i]
        centers[i, :rlens[i] + 1] = centers_list[i][:rlens[i] + 1]
        centers[i, rlens[i] + 1:] = centers_list[i][rlens[i]]
    return genome, reads, np.array(rlens, np.int32), centers


@pytest.mark.parametrize("seed", range(3))
def test_pallas_forward_matches_jnp(seed):
    rng = np.random.default_rng(seed)
    genome, reads, rlens, centers = make_batch(rng)
    rmax = reads.shape[1]
    gstarts = np.zeros(len(rlens), np.int32)
    glens = np.full(len(rlens), len(genome), np.int32)
    ref = np.asarray(banded_forward(
        jnp.asarray(genome), jnp.asarray(reads), jnp.asarray(rlens),
        jnp.asarray(centers), jnp.asarray(gstarts), jnp.asarray(glens),
        float(np.log(MATCH)), float(np.log(MISMATCH)), rmax, 128))
    got = banded_forward_pallas(
        genome, reads, rlens, centers, gstarts, glens,
        float(np.log(MATCH)), float(np.log(MISMATCH)), rmax,
        interpret=True)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=1e-3)


def test_pallas_forward_padded_dummy_rows():
    """Tail-chunk round-up appends dummy jobs (rlens=0, glens=0,
    centers=0, reads=6): live-row outputs must be unaffected and finite."""
    rng = np.random.default_rng(5)
    genome, reads, rlens, centers = make_batch(rng)
    b, rmax = reads.shape
    gstarts = np.zeros(b, np.int32)
    glens = np.full(b, len(genome), np.int32)
    base = banded_forward_pallas(
        genome, reads, rlens, centers, gstarts, glens,
        float(np.log(MATCH)), float(np.log(MISMATCH)), rmax, interpret=True)

    pad = 4
    reads_p = np.concatenate(
        [reads, np.full((pad, rmax), 6, np.uint8)], axis=0)
    rlens_p = np.concatenate([rlens, np.zeros(pad, np.int32)])
    centers_p = np.concatenate(
        [centers, np.zeros((pad, rmax + 1), np.int32)], axis=0)
    gstarts_p = np.concatenate([gstarts, np.zeros(pad, np.int32)])
    glens_p = np.concatenate([glens, np.zeros(pad, np.int32)])
    got = banded_forward_pallas(
        genome, reads_p, rlens_p, centers_p, gstarts_p, glens_p,
        float(np.log(MATCH)), float(np.log(MISMATCH)), rmax, interpret=True)
    assert np.all(np.isfinite(got[:b]))
    np.testing.assert_allclose(got[:b], base, rtol=1e-6)
