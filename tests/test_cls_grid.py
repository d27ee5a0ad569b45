"""Tests for classification envelope padding and the vmapped classification
grid (BASELINE.json config 4, classification half — sweeps.classification_grid).

Load-bearing properties:

* the padded+masked network is EXACTLY the small network on real
  coordinates: eval (likelihood/rmse/acc), prior, and both drift modes match
  the unpadded computation when the small parameter vector is embedded in
  the envelope (padded hidden units have zero outgoing weights; padded class
  columns are removed from the softmax by class_mask);
* all-ones masks are a draw-for-draw identity (mask plumbing adds nothing);
* a grid cell statistically matches the serial per-dataset run.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import ptnn
from ptnn import kernel, sweeps
from ptnn.data import load_classification
from ptnn.models import fnn
from ptnn.ops import drift, likelihood
from ptnn.sampler import _step_keys, make_dataset

SMALL = (4, 6, 3)
ENV = (7, 9, 5)


def embed_w(w_small: np.ndarray, small, env) -> np.ndarray:
    """Scatter a small-topology flat vector into its envelope positions
    (the inverse image of sweeps.envelope_w_mask)."""
    p = fnn.unpack(jnp.asarray(w_small), small)
    ei, eh, eo = env
    w1 = np.zeros((ei, eh), np.float32)
    w1[: small[0], : small[1]] = np.asarray(p.w1)
    w2 = np.zeros((eh, eo), np.float32)
    w2[: small[1], : small[2]] = np.asarray(p.w2)
    b1 = np.zeros(eh, np.float32)
    b1[: small[1]] = np.asarray(p.b1)
    b2 = np.zeros(eo, np.float32)
    b2[: small[2]] = np.asarray(p.b2)
    return np.concatenate([w1.ravel(), w2.ravel(), b1, b2])


def _pad_rows(a, n):
    spec = [(0, n - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
    return np.pad(a, spec)


def test_envelope_mask_layout():
    m = sweeps.envelope_w_mask(SMALL, ENV)
    assert m.shape == (fnn.w_size(ENV),)
    assert m.sum() == fnn.w_size(SMALL)
    # embedding ones lands exactly on the mask support
    ones = embed_w(np.ones(fnn.w_size(SMALL), np.float32), SMALL, ENV)
    np.testing.assert_array_equal(ones, m)


def test_envelope_eval_exact(rng):
    n, pad_rows = 30, 11
    x = rng.standard_normal((n, SMALL[0])).astype(np.float32)
    y = rng.integers(0, SMALL[2], n).astype(np.float32)
    w = rng.standard_normal(fnn.w_size(SMALL)).astype(np.float32)

    out_s = fnn.forward(jnp.asarray(w), jnp.asarray(x), SMALL)
    ref = likelihood.classification_eval_from_logp(
        jax.nn.log_softmax(out_s, axis=-1), out_s, jnp.asarray(y)
    )

    w_e = embed_w(w, SMALL, ENV)
    x_e = np.zeros((n + pad_rows, ENV[0]), np.float32)
    x_e[:n, : SMALL[0]] = x
    y_e = _pad_rows(y, n + pad_rows)
    mask = _pad_rows(np.ones(n, np.float32), n + pad_rows)
    cmask = np.zeros(ENV[2], np.float32)
    cmask[: SMALL[2]] = 1.0

    out_e = fnn.forward(jnp.asarray(w_e), jnp.asarray(x_e), ENV)
    out_m = jnp.where(jnp.asarray(cmask) > 0, out_e, -1e9)
    got = likelihood.classification_eval_from_logp(
        jax.nn.log_softmax(out_m, axis=-1),
        out_m,
        jnp.asarray(y_e),
        jnp.asarray(mask),
    )
    np.testing.assert_allclose(float(got.loglik), float(ref.loglik), rtol=1e-5)
    np.testing.assert_allclose(float(got.rmse), float(ref.rmse), rtol=1e-5)
    np.testing.assert_allclose(float(got.acc), float(ref.acc), rtol=1e-6)
    # prior with the traced real-dimension count matches the small prior
    wm = sweeps.envelope_w_mask(SMALL, ENV)
    p_ref = likelihood.classification_log_prior_dim(
        jnp.asarray(w), fnn.w_size(SMALL)
    )
    p_got = likelihood.classification_log_prior_dim(
        jnp.asarray(w_e), jnp.sum(jnp.asarray(wm))
    )
    np.testing.assert_allclose(float(p_got), float(p_ref), rtol=1e-6)


@pytest.mark.parametrize("mode", ["sequential", "batch"])
def test_envelope_drift_exact(rng, mode):
    n, pad_rows = 24, 9
    x = rng.standard_normal((n, SMALL[0])).astype(np.float32)
    y = rng.integers(0, SMALL[2], n)
    t = np.eye(SMALL[2], dtype=np.float32)[y]
    w = rng.standard_normal(fnn.w_size(SMALL)).astype(np.float32)
    fn = (
        drift.sgd_epoch_sequential if mode == "sequential" else drift.sgd_epoch_batch
    )
    ref = fn(jnp.asarray(w), jnp.asarray(x), jnp.asarray(t), SMALL, 0.05)

    w_e = embed_w(w, SMALL, ENV)
    x_e = np.zeros((n + pad_rows, ENV[0]), np.float32)
    x_e[:n, : SMALL[0]] = x
    t_e = np.zeros((n + pad_rows, ENV[2]), np.float32)
    t_e[:n, : SMALL[2]] = t
    mask = _pad_rows(np.ones(n, np.float32), n + pad_rows)
    wm = sweeps.envelope_w_mask(SMALL, ENV)
    got = fn(
        jnp.asarray(w_e),
        jnp.asarray(x_e),
        jnp.asarray(t_e),
        ENV,
        0.05,
        mask=jnp.asarray(mask),
        w_mask=jnp.asarray(wm),
    )
    # real coordinates move exactly like the unpadded epoch; masked stay 0
    np.testing.assert_allclose(
        np.asarray(got), embed_w(np.asarray(ref), SMALL, ENV),
        rtol=1e-5, atol=1e-6,
    )
    assert np.all(np.asarray(got)[wm == 0] == 0.0)


def _cls_cfg(topology, **kw):
    cfg = ptnn.classification_preset(topology, num_samples=10 * 240)
    base = dict(
        num_chains=6, swap_interval=20, maxtemp=5.0, chunk_steps=120,
        record_w=False,
    )
    base.update(kw)
    return dataclasses.replace(cfg, **base).validate()


def test_full_masks_are_identity():
    """All-ones masks (row, class, parameter) must be a draw-for-draw no-op:
    same shapes, same RNG stream, same accept pattern."""
    prob = load_classification("iris", seed=0)
    cfg = _cls_cfg(prob.topology)
    data = make_dataset(cfg, prob.train, prob.test)
    from ptnn.ops import ladder

    temps = jnp.asarray(
        ladder.assign_temperatures(cfg.num_chains, cfg.maxtemp), jnp.float32
    )
    key = jax.random.PRNGKey(3)
    k_init, k_run = jax.random.split(key)
    n = cfg.n_steps

    def run(data_c):
        state = kernel.init_state(k_init, cfg, data_c)
        step = kernel.make_step_fn(cfg, data_c, temps)
        switch = cfg.temper_switch_step
        for a, b in [(0, switch), (switch, n)]:
            if a > 0:
                state = step.recompute_ll(state)
            idx = a + jnp.arange(b - a)
            state, _ = jax.lax.scan(
                step, state, (idx, _step_keys(k_run, jnp.asarray(a), b - a))
            )
        return state

    plain = jax.jit(lambda: run(data))()
    full = kernel.Dataset(
        x_train=data.x_train,
        y_train=data.y_train,
        t_train=data.t_train,
        x_test=data.x_test,
        y_test=data.y_test,
        mask_train=jnp.ones(data.x_train.shape[0], jnp.float32),
        mask_test=jnp.ones(data.x_test.shape[0], jnp.float32),
        class_mask=jnp.ones(cfg.topology[2], jnp.float32),
        w_mask=jnp.ones(fnn.w_size(cfg.topology), jnp.float32),
    )
    masked = jax.jit(lambda: run(full))()
    np.testing.assert_array_equal(
        np.asarray(plain.n_accept), np.asarray(masked.n_accept)
    )
    np.testing.assert_allclose(
        np.asarray(plain.w), np.asarray(masked.w), rtol=2e-4, atol=2e-5
    )


def test_classification_grid_smoke_and_serial_agreement():
    names = ["iris", "Cancer"]
    probs = {n: load_classification(n, seed=0) for n in names}
    env = (9, 12, 3)  # iris (4,12,3) + Cancer (9,12,2)
    cfg = _cls_cfg(env)
    out = sweeps.classification_grid(cfg, names, seeds=[0, 1])
    assert out["cells"] == [("iris", 0), ("iris", 1), ("Cancer", 0), ("Cancer", 1)]
    assert out["test_mean"].shape == (4,)
    assert np.isfinite(out["test_mean"]).all()
    assert (out["test_best"] >= out["test_mean"] - 1e-6).all()
    assert (out["test_best"] <= 100.0 + 1e-6).all()
    # each dataset's grid cells statistically match its serial seed-sweep
    # (same budget, own topology); accuracy is coarse at this budget, so the
    # gate is loose but catches sign errors in masking
    for name in names:
        p = probs[name]
        serial = sweeps.seed_sweep(
            _cls_cfg(p.topology), [0, 1], p.train, p.test
        )
        g = np.mean(
            [
                out["test_mean"][i]
                for i, (n_, _s) in enumerate(out["cells"])
                if n_ == name
            ]
        )
        s = np.mean(serial["test_mean"])
        assert abs(g - s) < 25.0, (name, g, s)


def test_classification_grid_rejects_precond():
    cfg = dataclasses.replace(
        _cls_cfg((9, 12, 3)), proposal="precond_rw"
    ).validate()
    with pytest.raises(ValueError, match="reference proposal"):
        sweeps.classification_grid(cfg, ["iris", "Cancer"], seeds=[0])
