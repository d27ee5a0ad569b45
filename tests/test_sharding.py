"""Multi-device sharding tests on the 8-virtual-CPU mesh."""

import numpy as np
import jax
import pytest

from ptnn import PTConfig, sample
from ptnn.data import load_regression
from ptnn.parallel import mesh as mesh_mod


@pytest.fixture(scope="module")
def sunspot():
    p = load_regression("Sunspot")
    return p.train, p.test


def cfg(**kw):
    base = dict(
        task="regression",
        topology=(4, 10, 1),
        num_samples=3200,  # 400 per chain
        num_chains=8,
        maxtemp=2.0,
        swap_interval=40,
        swap_offset=0,
        swap_payload="tempered_times_T",
        use_langevin_gradients=False,
        chunk_steps=100,
    )
    base.update(kw)
    return PTConfig(**base).validate()


def test_eight_devices_present():
    assert jax.device_count() == 8


@pytest.mark.slow
def test_sharded_matches_single_device(sunspot):
    """One chain per device must give the same traces as unsharded (the
    permutation gather crosses every device boundary here)."""
    c = cfg()
    r_plain = sample(c, *sunspot, seed=7)
    m = mesh_mod.make_mesh()
    r_mesh = sample(c, *sunspot, seed=7, mesh=m)
    for k in r_plain.traces:
        np.testing.assert_allclose(
            r_plain.traces[k], r_mesh.traces[k], rtol=2e-4, atol=1e-4
        )
    np.testing.assert_array_equal(
        r_plain.final_state.n_accept, r_mesh.final_state.n_accept
    )
    assert r_plain.swap_percent == r_mesh.swap_percent


@pytest.mark.slow
def test_sharded_langevin(sunspot):
    """Langevin drift (scan inside the chain axis) under sharding."""
    c = cfg(
        num_samples=1600,
        use_langevin_gradients=True,
        learn_rate=0.1,
        drift_mode="sequential",
    )
    m = mesh_mod.make_mesh()
    r = sample(c, *sunspot, seed=1, mesh=m)
    assert np.isfinite(r.traces["ll"][1:]).all()


@pytest.mark.slow
def test_more_chains_than_devices(sunspot):
    """64 chains on 8 devices: 8 chains per device."""
    c = cfg(num_chains=64, num_samples=64 * 100, swap_interval=25)
    m = mesh_mod.make_mesh()
    r = sample(c, *sunspot, seed=2, mesh=m)
    assert r.traces["ll"].shape == (100, 64)
    assert np.isfinite(r.traces["ll"][1:]).all()
    assert r.temperatures.shape == (64,)


def test_state_is_actually_sharded(sunspot):
    """The chain axis of the running state must be distributed, not replicated."""
    from ptnn import init_state, make_dataset

    c = cfg()
    m = mesh_mod.make_mesh()
    data = mesh_mod.replicate_tree(make_dataset(c, *sunspot), m)
    st = init_state(jax.random.PRNGKey(0), c, data)
    st = mesh_mod.shard_chain_tree(st, m)
    shard_shapes = {s.device.id: s.data.shape for s in st.w.addressable_shards}
    assert len(shard_shapes) == 8
    assert all(shape == (1, c.w_size) for shape in shard_shapes.values())


@pytest.mark.slow
def test_2d_mesh_data_sharding(sunspot):
    """(chains, data) mesh: dataset rows sharded, likelihood psum-reduced —
    results must match the unsharded run."""
    c = cfg(num_samples=1600)
    m = mesh_mod.make_mesh_2d(2)
    tr, te = sunspot
    # trim rows to a multiple of the data axis
    tr2, te2 = tr[: len(tr) - len(tr) % 2], te[: len(te) - len(te) % 2]
    r_plain = sample(c, tr2, te2, seed=4)
    r_mesh = sample(c, tr2, te2, seed=4, mesh=m)
    for k in r_plain.traces:
        np.testing.assert_allclose(
            r_plain.traces[k], r_mesh.traces[k], rtol=2e-4, atol=1e-4
        )
