"""Banded forward DP vs the unbanded float64 oracle."""
import numpy as np
import pytest

from gaml_tpu.core import dna
from gaml_tpu.ops.forward import banded_forward, forward_full_numpy

from fixtures import random_seq

MATCH = 0.85
MISMATCH = 0.05


def noisy_copy(rng, seq, err=0.12):
    out = []
    for ch in seq:
        r = rng.random()
        if r < err * 0.4:
            continue  # deletion
        if r < err * 0.8:
            out.append(int(rng.integers(0, 4)))  # substitution
            continue
        out.append(int(ch))
        if rng.random() < err * 0.3:
            out.append(int(rng.integers(0, 4)))  # insertion
    return np.array(out, dtype=np.uint8)


def run_banded(genome, read, centers, width=64):
    import jax.numpy as jnp

    rmax = len(read)
    reads = np.full((1, rmax), 6, dtype=np.uint8)
    reads[0, :len(read)] = read
    c = np.zeros((1, rmax + 1), dtype=np.int32)
    c[0, :len(centers)] = centers
    c[0, len(centers):] = centers[-1]
    out = banded_forward(
        jnp.asarray(genome), jnp.asarray(reads),
        jnp.asarray(np.array([len(read)], dtype=np.int32)),
        jnp.asarray(c), jnp.asarray(np.array([0], dtype=np.int32)),
        jnp.asarray(np.array([len(genome)], dtype=np.int32)),
        float(np.log(MATCH)), float(np.log(MISMATCH)), rmax, width)
    return float(out[0])


def test_gatherfree_matches_gather_formulation():
    """The delta-select formulation must agree with the gather formulation
    whenever the guide steps are already in {0,1,2}."""
    import jax.numpy as jnp

    from gaml_tpu.ops.forward import banded_forward_gather

    rng = np.random.default_rng(9)
    genome = dna.encode_seq(random_seq(rng, 300))
    for trial in range(4):
        read = noisy_copy(rng, genome[40:240], err=0.1)
        rmax = len(read)
        # unit-step centers with occasional stalls/doubles
        steps = rng.choice([0, 1, 1, 1, 2], size=rmax)
        centers = np.concatenate([[40], 40 + np.cumsum(steps)]).astype(np.int32)
        reads = np.full((1, rmax), 6, dtype=np.uint8)
        reads[0] = read
        c = centers[None, :]
        args = (jnp.asarray(genome), jnp.asarray(reads),
                jnp.asarray(np.array([rmax], dtype=np.int32)),
                jnp.asarray(c), jnp.asarray(np.zeros(1, np.int32)),
                jnp.asarray(np.array([len(genome)], np.int32)),
                float(np.log(MATCH)), float(np.log(MISMATCH)))
        new = float(banded_forward(*args, rmax, 64)[0])
        old = float(banded_forward_gather(*args, rmax, 64)[0])
        assert new == pytest.approx(old, rel=1e-5), trial


def test_banded_matches_full_small():
    """Genome small enough that a wide band covers the full matrix."""
    rng = np.random.default_rng(0)
    genome = dna.encode_seq(random_seq(rng, 40))
    read = genome[5:30].copy()
    centers = np.arange(len(read) + 1) + 5
    got = run_banded(genome, read, centers, width=128)
    expect = forward_full_numpy(genome, read, MATCH, MISMATCH)
    assert got == pytest.approx(expect, rel=1e-4)


def test_banded_matches_full_noisy():
    rng = np.random.default_rng(1)
    genome = dna.encode_seq(random_seq(rng, 60))
    read = noisy_copy(rng, genome[10:50])
    centers = np.arange(len(read) + 1) + 10
    got = run_banded(genome, read, centers, width=128)
    expect = forward_full_numpy(genome, read, MATCH, MISMATCH)
    assert got == pytest.approx(expect, rel=1e-4)


def test_banded_band_captures_bulk():
    """On a longer genome a modest band around the true diagonal captures
    essentially all the mass."""
    rng = np.random.default_rng(2)
    genome = dna.encode_seq(random_seq(rng, 500))
    read = noisy_copy(rng, genome[100:300])
    centers = np.linspace(100, 300, len(read) + 1).astype(np.int32)
    got = run_banded(genome, read, centers, width=64)
    expect = forward_full_numpy(genome, read, MATCH, MISMATCH)
    # banded mass <= full mass, and nearly equal
    assert got <= expect + 1e-3
    assert got == pytest.approx(expect, rel=0.01)


def test_chaining_guides_alignment():
    """End-to-end: chain a noisy long read, build the guide, integrate."""
    from gaml_tpu.align.longread import align_long_read, guide_path

    rng = np.random.default_rng(3)
    genome = dna.encode_seq(random_seq(rng, 2000))
    read = noisy_copy(rng, genome[400:1300])
    chains = align_long_read(genome, read, min_seeds=3)
    assert chains
    best = chains[0]
    assert best.strand == 0
    assert abs(best.tstart - 400) < 60
    centers = guide_path(best, len(read), len(genome))
    got = run_banded(genome, read, centers, width=64)
    expect = forward_full_numpy(genome, read, MATCH, MISMATCH)
    assert got == pytest.approx(expect, rel=0.02)

    # reverse strand read
    rc = dna.revcomp(read)
    chains_rc = align_long_read(genome, rc, min_seeds=3)
    assert chains_rc and chains_rc[0].strand == 1
