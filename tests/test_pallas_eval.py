"""Pallas fused-eval kernel tests (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from ptnn.models import fnn
from ptnn.ops import likelihood, pallas_eval


def test_regression_eval_matches_xla(rng):
    topo = (4, 10, 1)
    c, n = 8, 29
    w = jnp.asarray(rng.standard_normal((c, fnn.w_size(topo))), jnp.float32)
    x = jnp.asarray(rng.random((n, 4)), jnp.float32)
    y = jnp.asarray(rng.random(n), jnp.float32)
    tau = jnp.asarray(rng.random(c) + 0.1, jnp.float32)
    ll, rm, _ = pallas_eval.fnn_eval_pallas(
        w, x, y, y.reshape(-1, 1), tau, topo, "regression", interpret=True
    )
    ref = jax.vmap(likelihood.regression_eval, in_axes=(0, None, None, 0, None))(
        w, x, y, tau, topo
    )
    np.testing.assert_allclose(np.asarray(ll), np.asarray(ref.loglik), rtol=2e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(rm), np.asarray(ref.rmse), rtol=1e-5, atol=1e-6)


def test_classification_eval_matches_xla(rng):
    topo = (4, 12, 3)
    c, n = 8, 23
    w = jnp.asarray(rng.standard_normal((c, fnn.w_size(topo))), jnp.float32)
    x = jnp.asarray(rng.standard_normal((n, 4)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 3, n), jnp.float32)
    t = jax.nn.one_hot(y.astype(jnp.int32), 3)
    tau = jnp.ones((c,), jnp.float32)
    ll, rm, ac = pallas_eval.fnn_eval_pallas(
        w, x, y, t, tau, topo, "classification", interpret=True
    )
    ref = jax.vmap(likelihood.classification_eval, in_axes=(0, None, None, None))(
        w, x, y, topo
    )
    np.testing.assert_allclose(np.asarray(ll), np.asarray(ref.loglik), rtol=2e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(rm), np.asarray(ref.rmse), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ac), np.asarray(ref.acc), atol=1e-4)


def test_fits_vmem_gate():
    assert pallas_eval.fits_vmem(500, (4, 10, 1))
    assert not pallas_eval.fits_vmem(30000, (6, 25, 18))
