"""Device-resident ScoringState on an 8-virtual-device CPU mesh: the
sharded scatter-add + floored-log reduction must match the host
incremental-scorer arithmetic (scoring/reduce.py) bit-closely in float64."""
import numpy as np
import pytest

import jax

from gaml_tpu.parallel.device_state import DeviceScoringState
from gaml_tpu.parallel.sharded import make_mesh
from gaml_tpu.scoring.reduce import floor_thresholds, get_total_prob

@pytest.fixture()
def x64():
    """f64 device state needs jax_enable_x64; scope it to the test so the
    f32-compiled kernels of other modules are unaffected."""
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def host_reduce(probs, total_len, lens):
    return get_total_prob(probs, total_len, -0.7, -10.0, lens)


@pytest.mark.parametrize("n_reads", [37, 1000])
def test_device_state_matches_host(n_reads, x64):
    mesh = make_mesh()
    rng = np.random.default_rng(9)
    lens = rng.integers(80, 120, n_reads).astype(np.int64)
    st = DeviceScoringState(mesh, n_reads, lens)
    host = np.zeros(n_reads, dtype=np.float64)

    total_len = 50_000
    for step in range(6):
        k = int(rng.integers(1, 400))
        rids = rng.integers(0, n_reads, k).astype(np.int32)
        ps = (rng.random(k) * 1e-6).astype(np.float64)
        sign = 1 if step % 3 != 2 else -1
        st.apply(rids, ps, sign)
        np.add.at(host, rids, sign * ps)

        s_dev, z_dev = st.reduce(total_len + step, -0.7, -10.0)
        s_host, z_host = host_reduce(host, total_len + step, lens)
        assert z_dev == z_host
        assert s_dev == pytest.approx(s_host, rel=1e-12, abs=1e-12)

    # host round-trip (checkpoint path)
    np.testing.assert_allclose(st.to_host(), host, rtol=1e-15, atol=0)
    st2 = DeviceScoringState(mesh, n_reads, lens)
    st2.from_host(host)
    s2, z2 = st2.reduce(total_len, -0.7, -10.0)
    s1, z1 = host_reduce(host, total_len, lens)
    assert (s2, z2) == (pytest.approx(s1, rel=1e-12), z1)


def test_device_state_2d_mesh(x64):
    """P('reads') state on a 2-D (reads, cand) mesh: replicas along the
    cand axis stay consistent through apply/reduce."""
    devices = jax.devices()
    if len(devices) < 4:
        pytest.skip("needs >= 4 devices")
    mesh = make_mesh(devices[:4], reads_axis=2, cand_axis=2)
    n = 100
    lens = np.full(n, 100, dtype=np.int64)
    st = DeviceScoringState(mesh, n, lens)
    host = np.zeros(n, dtype=np.float64)
    rng = np.random.default_rng(3)
    for _ in range(3):
        k = 50
        rids = rng.integers(0, n, k).astype(np.int32)
        ps = rng.random(k) * 1e-7
        st.apply(rids, ps)
        np.add.at(host, rids, ps)
    s_dev, z_dev = st.reduce(10_000, -0.7, -10.0)
    s_host, z_host = host_reduce(host, 10_000, lens)
    assert z_dev == z_host
    assert s_dev == pytest.approx(s_host, rel=1e-12)


def test_anneal_with_device_state_matches_host(tmp_path, x64):
    """Short anneal with the device-resident ScoringState: per-iteration
    scores match the host scorer closely (f64 on the CPU mesh)."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_optimizer import build_world
    from gaml_tpu.optimize.anneal import Optimizer
    from gaml_tpu.optimize.settings import AssemblySettings

    gr, pc, _ = build_world(tmp_path, seed=4, n_pairs=60)
    settings = AssemblySettings(threshold=500,
                                output_prefix=str(tmp_path / "o"),
                                max_iterations=25, seed=7)
    opt = Optimizer(gr, pc, settings, longest_read=250, log=lambda *a: None)
    paths = [[i] for i in range(0, gr.num_nodes, 2) if gr.node_len(i) > 500]
    opt.run([list(p) for p in paths], write_outputs=False)
    host_hist = [(r["itnum"], r["new_prob"]) for r in opt.history]

    gr2, pc2, _ = build_world(tmp_path, seed=4, n_pairs=60)
    pc2.enable_device_scoring_state(make_mesh())
    opt2 = Optimizer(gr2, pc2, settings, longest_read=250,
                     log=lambda *a: None)
    opt2.run([list(p) for p in paths], write_outputs=False)
    dev_hist = [(r["itnum"], r["new_prob"]) for r in opt2.history]

    assert len(host_hist) == len(dev_hist)
    for (i1, p1), (i2, p2) in zip(host_hist, dev_hist):
        assert i1 == i2
        assert p2 == pytest.approx(p1, rel=1e-9, abs=1e-9)
    assert opt2.best_prob == pytest.approx(opt.best_prob, rel=1e-9)
