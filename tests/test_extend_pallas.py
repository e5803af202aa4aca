"""Pallas extend kernel (interpret mode on CPU) vs the jnp reference."""
import numpy as np
import pytest

from gaml_tpu.core import dna
from gaml_tpu.ops.extend import batch_extend_arrays, extend_kernel, stage_candidates
from gaml_tpu.ops.extend_pallas import extend_kernel_pallas

from fixtures import random_seq
from test_extend_kernel import random_case, seeds_of


@pytest.mark.parametrize("seed", range(4))
def test_pallas_matches_jnp(seed):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    seq = dna.encode_seq(random_seq(rng, 350))
    g0s, r0s, reads = [], [], []
    for _ in range(40):
        read = random_case(rng, seq)
        seeds = seeds_of(read, seq)
        if not seeds:
            continue
        g0, r0 = seeds[int(rng.integers(0, len(seeds)))]
        g0s.append(g0)
        r0s.append(r0)
        reads.append(read)
    assert len(reads) > 10
    g0s = np.array(g0s, dtype=np.int32)
    r0s = np.array(r0s, dtype=np.int32)

    st = stage_candidates(seq, g0s, r0s, reads)
    ok_j, errs_j, d_j = extend_kernel(
        jnp.asarray(st["read_f"]), jnp.asarray(st["rlen_f"]),
        jnp.asarray(st["gwin_f"]), jnp.asarray(st["glen_f"]),
        jnp.asarray(st["read_b"]), jnp.asarray(st["rlen_b"]),
        jnp.asarray(st["gwin_b"]), jnp.asarray(st["glen_b"]), st["rmax"])
    ok_p, errs_p, d_p = extend_kernel_pallas(st, interpret=True)
    n = st["n"]
    np.testing.assert_array_equal(np.asarray(ok_j)[:n], ok_p[:n])
    np.testing.assert_array_equal(np.asarray(errs_j)[:n], errs_p[:n])
    # d only meaningful where ok
    mask = ok_p[:n]
    np.testing.assert_array_equal(np.asarray(d_j)[:n][mask], d_p[:n][mask])


def test_reg_kernel_matches_sublane_kernel():
    """The band-in-registers kernel is bit-equal to the sublane-band
    kernel (and hence to the BFS oracle) on a big random batch."""
    import jax.numpy as jnp
    from gaml_tpu.ops.extend import PAD
    from gaml_tpu.ops.extend_pallas import dp_rows_pallas, dp_rows_pallas_reg

    rng = np.random.default_rng(3)
    n, rmax = 2048, 32
    read_t = jnp.asarray(rng.integers(0, 5, (rmax, n)).astype(np.int32))
    gwin = rng.integers(0, 5, (rmax + 2 * PAD, n)).astype(np.int32)
    # half the candidates: perfect diagonal matches of varying length
    half = np.asarray(read_t)[:, : n // 2]
    gwin[PAD:PAD + rmax, : n // 2] = half
    gwin_t = jnp.asarray(gwin)
    rlen = jnp.asarray(rng.integers(0, rmax + 1, (1, n)).astype(np.int32))
    glen = jnp.asarray(rng.integers(0, rmax + PAD, (1, n)).astype(np.int32))

    c_reg, a_reg = dp_rows_pallas_reg(read_t, gwin_t, rlen, glen, rmax,
                                      interpret=True)
    c_sub, a_sub = dp_rows_pallas(read_t, gwin_t, rlen, glen, rmax,
                                  interpret=True, width=128)
    np.testing.assert_array_equal(np.asarray(c_reg), np.asarray(c_sub))
    np.testing.assert_array_equal(np.asarray(a_reg), np.asarray(a_sub))
