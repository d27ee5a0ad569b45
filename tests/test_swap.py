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


def test_disjoint_pair_even_odd_structure():
    """Even/odd sweeps touch only pairs of the requested parity, move every
    row at most one rung, and alternate coverage across parities."""
    rng = np.random.default_rng(7)
    c = 10
    ll = jnp.asarray(rng.normal(0, 5, c), jnp.float32)
    betas = jnp.asarray(np.linspace(1.0, 0.2, c), jnp.float32)
    for parity, n_pairs in ((0, 5), (1, 4)):
        res = swap.disjoint_pair_permutation(
            ll, jax.random.PRNGKey(3), rule="metropolis", betas=betas,
            parity=parity,
        )
        perm = np.asarray(res.perm)
        assert int(res.n_proposed) == n_pairs
        # a valid permutation, distance <= 1
        assert sorted(perm.tolist()) == list(range(c))
        assert np.all(np.abs(perm - np.arange(c)) <= 1)
        # only pairs of this parity may have moved
        moved = np.where(perm != np.arange(c))[0]
        for k in moved[::2]:
            assert k % 2 == parity


def test_disjoint_pair_always_accepts_uphill_metropolis():
    """beta1 > beta2 and lh2 >> lh1 -> certain swap under metropolis."""
    ll = jnp.asarray([-100.0, 100.0])
    betas = jnp.asarray([1.0, 0.5])
    res = swap.disjoint_pair_permutation(
        ll, jax.random.PRNGKey(0), rule="metropolis", betas=betas, parity=0
    )
    np.testing.assert_array_equal(np.asarray(res.perm), [1, 0])
    assert int(res.n_accepted) == 1


def test_disjoint_pair_matches_independent_oracle():
    """Each active pair's decision must equal the scalar rule applied to the
    SAME uniforms (vectorization must not change any decision)."""
    rng = np.random.default_rng(11)
    for trial in range(10):
        c = int(rng.integers(3, 12))
        ll = rng.normal(0, 3, c).astype(np.float32)
        key = jax.random.PRNGKey(trial)
        us = np.asarray(jax.random.uniform(key, (c - 1,), jnp.float32))
        parity = trial % 2
        res = swap.disjoint_pair_permutation(
            jnp.asarray(ll), key, rule="half_exp", parity=parity
        )
        perm = np.arange(c)
        n_acc = 0
        for k in range(parity, c - 1, 2):
            a = min(1.0, 0.5 * np.exp(min(709.0, ll[k + 1] - ll[k])))
            if us[k] < a:
                perm[[k, k + 1]] = perm[[k + 1, k]]
                n_acc += 1
        np.testing.assert_array_equal(np.asarray(res.perm), perm)
        assert int(res.n_accepted) == n_acc
