"""Tests for the replica-exchange sweep permutation (parallel/swap.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from ptnn.parallel import swap

import oracle


def test_sweep_matches_oracle_bubbling():
    """The lax.scan sweep must reproduce the sequential bubbling semantics
    (values travel with the swap, so one config can climb several rungs)."""
    rng = np.random.default_rng(42)
    for trial in range(20):
        c = int(rng.integers(2, 12))
        ll = rng.normal(0, 5, c)
        key = jax.random.PRNGKey(trial)
        us = np.asarray(jax.random.uniform(key, (c - 1,), jnp.float32))
        res = swap.sweep_permutation(jnp.asarray(ll, jnp.float32), key)
        perm_ref, n_ref = oracle.bubbling_sweep(ll.astype(np.float32), us)
        np.testing.assert_array_equal(np.asarray(res.perm), perm_ref)
        assert int(res.n_accepted) == n_ref
        assert int(res.n_proposed) == c - 1


def test_sweep_always_accepts_uphill():
    """lhood2 >> lhood1 gives accept prob min(1, 0.5*e^large) = 1."""
    ll = jnp.asarray([-100.0, 100.0])
    res = swap.sweep_permutation(ll, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(res.perm), [1, 0])
    assert int(res.n_accepted) == 1


def test_sweep_half_prefactor():
    """Equal likelihoods accept with prob exactly 0.5 (the reference's
    nonstandard 0.5 factor, pt_classification.py:683)."""
    ll = jnp.zeros((2,))
    trials = 4000
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(trials))
    accs = jax.jit(jax.vmap(lambda k: swap.sweep_permutation(ll, k).n_accepted))(keys)
    rate = float(jnp.mean(accs.astype(jnp.float32)))
    assert 0.47 < rate < 0.53, rate


def test_overflow_clamp():
    """Huge likelihood gaps must not produce NaN/inf issues (709 clamp)."""
    ll = jnp.asarray([-1e30, 1e30, -1e30], jnp.float32)
    res = swap.sweep_permutation(ll, jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(res.n_accepted)).all()
    perm = np.asarray(res.perm)
    assert sorted(perm.tolist()) == [0, 1, 2]


def test_apply_permutation_bubbles_payloads():
    w = jnp.arange(12.0).reshape(4, 3)
    eta = jnp.asarray([0.0, 1.0, 2.0, 3.0])
    perm = jnp.asarray([2, 0, 3, 1], jnp.int32)
    w2, eta2 = swap.apply_permutation(perm, w, eta)
    np.testing.assert_array_equal(np.asarray(eta2), [2.0, 0.0, 3.0, 1.0])
    np.testing.assert_array_equal(np.asarray(w2)[0], np.asarray(w)[2])
