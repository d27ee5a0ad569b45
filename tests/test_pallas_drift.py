"""Pallas drift kernel tests (interpret mode on CPU)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import ptnn
from ptnn.data import load_regression
from ptnn.ops import drift, pallas_drift


@pytest.mark.parametrize("topo,task", [((4, 10, 1), "regression"), ((4, 12, 3), "classification")])
def test_pallas_matches_scan(rng, topo, task):
    c, n = 8, 17
    w = jnp.asarray(rng.standard_normal((c, sum([topo[0] * topo[1], topo[1] * topo[2], topo[1], topo[2]]))), jnp.float32)
    x = jnp.asarray(rng.random((n, topo[0])), jnp.float32)
    if task == "classification":
        y = jnp.asarray(rng.integers(0, topo[2], n), jnp.float32)
    else:
        y = jnp.asarray(rng.random(n), jnp.float32)
    t = drift.make_targets(y, topo[2], task)
    ref = jax.vmap(lambda wi: drift.sgd_epoch_sequential(wi, x, t, topo, 0.1))(w)
    got = pallas_drift.sgd_epoch_sequential_pallas(w, x, t, topo, 0.1, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-6)


def test_pallas_depth_two(rng):
    topo = (4, 10, 1)
    c, n = 4, 9
    w = jnp.asarray(rng.standard_normal((c, 61)), jnp.float32)
    x = jnp.asarray(rng.random((n, 4)), jnp.float32)
    t = jnp.asarray(rng.random((n, 1)), jnp.float32)
    one = pallas_drift.sgd_epoch_sequential_pallas(w, x, t, topo, 0.1, interpret=True)
    two = pallas_drift.sgd_epoch_sequential_pallas(w, x, t, topo, 0.1, depth=2, interpret=True)
    again = pallas_drift.sgd_epoch_sequential_pallas(one, x, t, topo, 0.1, interpret=True)
    np.testing.assert_allclose(np.asarray(two), np.asarray(again), rtol=2e-4, atol=2e-6)


@pytest.mark.slow
def test_sampler_with_pallas_drift_mode(monkeypatch):
    monkeypatch.setenv("PTNN_PALLAS_INTERPRET", "1")
    prob = load_regression("Sunspot")
    base = dataclasses.replace(
        ptnn.regression_preset(
            num_samples=800, num_chains=8, maxtemp=3.0, use_langevin_gradients=True,
            learn_rate=0.1,
        ),
        record_w=False,
        chunk_steps=50,
    )
    r_seq = ptnn.sample(base, prob.train, prob.test, seed=0)
    r_pal = ptnn.sample(
        dataclasses.replace(base, drift_mode="pallas"), prob.train, prob.test, seed=0
    )
    # bit-compatible drift => statistically identical runs (tiny float diffs
    # can flip rare accepts, so compare trajectories loosely + counters tightly)
    assert np.isfinite(r_pal.traces["ll"][1:]).all()
    n_diff = np.abs(
        r_seq.final_state.n_accept.astype(int) - r_pal.final_state.n_accept.astype(int)
    )
    assert n_diff.max() <= 3


def test_pallas_epoch_row_block_split_matches_scan(rng):
    """Datasets past the SMEM row budget split into sequential row-block
    kernel calls (plus a remainder); the epoch must equal the unsplit
    scan bitwise-modulo-float-assoc, including depth > 1."""
    import jax.numpy as jnp

    from ptnn.ops import pallas_drift as pd

    topo = (4, 6, 3)
    n = 2000  # > the 768-row cap -> 2 full blocks + remainder
    x = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    y = rng.integers(0, 3, size=(n,)).astype(np.float32)
    t = drift.make_targets(jnp.asarray(y), 3, "classification")
    from ptnn.models import fnn as fnn_mod
    w = jnp.asarray(rng.normal(size=(5, fnn_mod.w_size(topo))), jnp.float32) * 0.2
    for depth in (1, 2):
        ref = w
        for _ in range(depth):
            ref = jax.vmap(
                lambda wi: drift.sgd_epoch_sequential(wi, x, t, topo, 0.05)
            )(ref)
        got = pd.sgd_epoch_sequential_pallas(
            w, x, t, topo, 0.05, depth=depth, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6,
            err_msg=f"depth={depth}",
        )
