"""Tests for row-mask padding and the vmapped cross-dataset grid
(BASELINE.json config 4 — sweeps.dataset_grid).

The load-bearing property: a padded, masked cell computes EXACTLY what the
unpadded serial run computes — masked likelihood/RMSE/drift make padded rows
no-ops and the RNG stream is shape-independent of padding (proposal noise is
(chains, w_size); only dataset rows pad)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ptnn import PTConfig, kernel, sweeps
from ptnn.data import load_regression
from ptnn.ops import drift, likelihood
from ptnn.sampler import _step_keys, make_dataset


def grid_cfg(**kw):
    base = dict(
        task="regression",
        topology=(4, 10, 1),
        num_samples=8 * 300,
        num_chains=8,
        maxtemp=5.0,
        swap_interval=30,
        swap_offset=0,
        swap_payload="tempered_times_T",
        use_langevin_gradients=True,
        langevin_prob=0.5,
        learn_rate=0.01,
        chunk_steps=100,
    )
    base.update(kw)
    return PTConfig(**base).validate()


def test_masked_eval_exact(rng):
    fx = rng.standard_normal(50).astype(np.float32)
    y = rng.standard_normal(50).astype(np.float32)
    ref = likelihood.regression_eval_from_fx(
        jnp.asarray(fx), jnp.asarray(y), jnp.asarray(0.3)
    )
    pad = 23
    fx_p = jnp.asarray(np.concatenate([fx, rng.standard_normal(pad).astype(np.float32)]))
    y_p = jnp.asarray(np.concatenate([y, np.zeros(pad, np.float32)]))
    mask = jnp.asarray(np.concatenate([np.ones(50), np.zeros(pad)]).astype(np.float32))
    got = likelihood.regression_eval_from_fx(fx_p, y_p, jnp.asarray(0.3), mask)
    np.testing.assert_allclose(float(got.loglik), float(ref.loglik), rtol=1e-6)
    np.testing.assert_allclose(float(got.rmse), float(ref.rmse), rtol=1e-6)


@pytest.mark.parametrize("mode", ["sequential", "batch"])
def test_masked_drift_exact(rng, mode):
    topo = (4, 10, 1)
    w = jnp.asarray(rng.standard_normal(kernel.fnn.w_size(topo)).astype(np.float32))
    x = rng.standard_normal((40, 4)).astype(np.float32)
    t = rng.standard_normal((40, 1)).astype(np.float32)
    fn = (
        drift.sgd_epoch_sequential if mode == "sequential" else drift.sgd_epoch_batch
    )
    ref = fn(w, jnp.asarray(x), jnp.asarray(t), topo, 0.01)
    pad = 17
    x_p = jnp.asarray(np.concatenate([x, rng.standard_normal((pad, 4)).astype(np.float32)]))
    t_p = jnp.asarray(np.concatenate([t, np.zeros((pad, 1), np.float32)]))
    mask = jnp.asarray(np.concatenate([np.ones(40), np.zeros(pad)]).astype(np.float32))
    got = fn(w, x_p, t_p, topo, 0.01, mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-7)


def test_padded_cell_equals_unpadded_run():
    """One grid cell (padded + masked, traced lp/lr) must reproduce the
    unpadded kernel run with the same keys draw-for-draw."""
    cfg = grid_cfg()
    prob = load_regression("Lazer")  # shorter than Sunspot -> real padding
    data = make_dataset(cfg, prob.train, prob.test)
    from ptnn.ops import ladder

    temps = jnp.asarray(
        ladder.assign_temperatures(cfg.num_chains, cfg.maxtemp), jnp.float32
    )
    key = jax.random.PRNGKey(11)
    k_init, k_run = jax.random.split(key)
    n = cfg.n_steps

    def run(data_c, lp, lr):
        state = kernel.init_state(k_init, cfg, data_c)
        step = kernel.make_step_fn(
            cfg, data_c, temps, langevin_prob_t=lp, learn_rate_t=lr
        )
        switch = cfg.temper_switch_step
        for a, b in [(0, switch), (switch, n)]:
            if a > 0:
                state = step.recompute_ll(state)
            idx = a + jnp.arange(b - a)
            state, _ = jax.lax.scan(
                step, state, (idx, _step_keys(k_run, jnp.asarray(a), b - a))
            )
        return state

    plain = jax.jit(lambda: run(data, jnp.asarray(0.5), jnp.asarray(0.01)))()

    pad_tr, pad_te = 37, 19
    padded = kernel.Dataset(
        x_train=jnp.pad(data.x_train, ((0, pad_tr), (0, 0))),
        y_train=jnp.pad(data.y_train, (0, pad_tr)),
        t_train=jnp.pad(data.t_train, ((0, pad_tr), (0, 0))),
        x_test=jnp.pad(data.x_test, ((0, pad_te), (0, 0))),
        y_test=jnp.pad(data.y_test, (0, pad_te)),
        mask_train=jnp.pad(
            jnp.ones(data.x_train.shape[0], jnp.float32), (0, pad_tr)
        ),
        mask_test=jnp.pad(
            jnp.ones(data.x_test.shape[0], jnp.float32), (0, pad_te)
        ),
    )
    masked = jax.jit(lambda: run(padded, jnp.asarray(0.5), jnp.asarray(0.01)))()
    np.testing.assert_array_equal(
        np.asarray(plain.n_accept), np.asarray(masked.n_accept)
    )
    np.testing.assert_allclose(
        np.asarray(plain.w), np.asarray(masked.w), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(plain.rmse_test), np.asarray(masked.rmse_test), rtol=1e-3
    )


def test_dataset_grid_smoke_and_modes():
    cfg = grid_cfg()
    out = sweeps.dataset_grid(cfg, ["Sunspot", "Lazer"], modes=("rw", "lg001"))
    assert out["test_mean"].shape == (4,)
    assert np.isfinite(out["test_mean"]).all()
    assert out["cells"] == [
        ("Sunspot", "rw"),
        ("Sunspot", "lg001"),
        ("Lazer", "rw"),
        ("Lazer", "lg001"),
    ]
    assert (out["test_std"] >= 0).all()
    assert (out["test_best"] <= out["test_mean"] + 1e-6).all()
    # grid cell statistically matches a serial seed-sweep cell
    cell = sweeps.seed_sweep(
        dataclasses.replace(cfg, langevin_prob=0.0).validate(),
        [0],
        *(lambda p: (p.train, p.test))(load_regression("Sunspot")),
    )
    assert abs(float(out["test_mean"][0]) - float(cell["test_mean"][0])) < 0.15
