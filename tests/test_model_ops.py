"""Unit tests: model forward, likelihoods, priors, drift, ladder vs oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ptnn.models import fnn
from ptnn.ops import drift, ladder, likelihood

import oracle

TOPO_C = (4, 12, 3)  # iris-like
TOPO_R = (4, 10, 1)  # regression


def _rand_w(rng, topo):
    return rng.standard_normal(fnn.w_size(topo)).astype(np.float32)


def test_pack_unpack_roundtrip(rng):
    w = _rand_w(rng, TOPO_C)
    p = fnn.unpack(jnp.asarray(w), TOPO_C)
    w2 = np.asarray(fnn.pack(p))
    np.testing.assert_allclose(w, w2)
    assert p.w1.shape == (4, 12) and p.b1.shape == (12,)
    assert p.w2.shape == (12, 3) and p.b2.shape == (3,)


def test_forward_matches_oracle(rng):
    w = _rand_w(rng, TOPO_C)
    X = rng.standard_normal((17, 4)).astype(np.float32)
    ours = np.asarray(fnn.forward(jnp.asarray(w), jnp.asarray(X), TOPO_C))
    ref = oracle.forward(w.astype(float), X.astype(float), TOPO_C)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_classification_eval_matches_oracle(rng):
    w = _rand_w(rng, TOPO_C)
    X = rng.standard_normal((23, 4)).astype(np.float32)
    y = rng.integers(0, 3, 23).astype(np.float32)
    ev = likelihood.classification_eval(jnp.asarray(w), jnp.asarray(X), jnp.asarray(y), TOPO_C)
    ref_ll = oracle.class_loglik(w.astype(float), X.astype(float), y, TOPO_C)
    assert np.isclose(float(ev.loglik), ref_ll, rtol=1e-5)
    # metrics vs direct computation
    out = oracle.forward(w.astype(float), X.astype(float), TOPO_C)
    pred = np.argmax(out, axis=1)
    assert np.isclose(float(ev.acc), 100.0 * np.mean(pred == y), atol=1e-4)
    assert np.isclose(
        float(ev.rmse), np.sqrt(np.mean((pred - y) ** 2)), rtol=1e-5, atol=1e-6
    )


def test_regression_eval_matches_oracle(rng):
    w = _rand_w(rng, TOPO_R)
    X = rng.random((31, 4)).astype(np.float32)
    y = rng.random(31).astype(np.float32)
    tau_sq = 0.37
    ev = likelihood.regression_eval(
        jnp.asarray(w), jnp.asarray(X), jnp.asarray(y), jnp.asarray(tau_sq), TOPO_R
    )
    ref = oracle.reg_loglik(w.astype(float), X.astype(float), y.astype(float), tau_sq, TOPO_R)
    assert np.isclose(float(ev.loglik), ref, rtol=1e-4)


def test_priors_match_oracle(rng):
    w = _rand_w(rng, TOPO_C)
    ours = float(likelihood.classification_log_prior(jnp.asarray(w), TOPO_C))
    assert np.isclose(ours, oracle.class_prior(w.astype(float), TOPO_C), rtol=1e-4)

    wr = _rand_w(rng, TOPO_R)
    tau = 0.9
    ours_r = float(
        likelihood.regression_log_prior(jnp.asarray(wr), jnp.asarray(tau), TOPO_R)
    )
    assert np.isclose(ours_r, oracle.reg_prior(wr.astype(float), tau, TOPO_R), rtol=1e-4)


@pytest.mark.parametrize("task,topo", [("classification", TOPO_C), ("regression", TOPO_R)])
def test_sequential_drift_matches_oracle(rng, task, topo):
    """The Langevin drift epoch must match per-sample SGD exactly (order
    matters — this is SURVEY.md §7 hard-part 1)."""
    n = 19
    w = _rand_w(rng, topo)
    X = rng.standard_normal((n, topo[0])).astype(np.float32)
    if task == "classification":
        y = rng.integers(0, topo[2], n).astype(np.float32)
    else:
        y = rng.random(n).astype(np.float32)
    t = np.asarray(drift.make_targets(jnp.asarray(y), topo[2], task))
    ours = np.asarray(
        drift.sgd_epoch_sequential(
            jnp.asarray(w), jnp.asarray(X), jnp.asarray(t), topo, 0.1, unroll=4
        )
    )
    ref = oracle.sgd_epoch(w.astype(float), X.astype(float), t.astype(float), topo, 0.1)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_batch_drift_close_to_sequential_for_tiny_lr(rng):
    """At lr -> 0 the order dependence vanishes; batch and sequential drift
    must converge to the same epoch movement."""
    topo = TOPO_R
    n = 16
    w = _rand_w(rng, topo)
    X = rng.random((n, 4)).astype(np.float32)
    t = rng.random((n, 1)).astype(np.float32)
    lr = 1e-4
    seq = np.asarray(drift.sgd_epoch_sequential(jnp.asarray(w), jnp.asarray(X), jnp.asarray(t), topo, lr))
    bat = np.asarray(drift.sgd_epoch_batch(jnp.asarray(w), jnp.asarray(X), jnp.asarray(t), topo, lr))
    np.testing.assert_allclose(seq - w, bat - w, rtol=5e-2, atol=1e-6)


def test_beta_ladder_closed_form():
    for ntemps, tmax in [(10, 10), (10, 2), (8, 5), (64, 10)]:
        got = ladder.default_beta_ladder(2, ntemps, tmax)
        np.testing.assert_allclose(got, oracle.beta_ladder_expected(ntemps, tmax), rtol=1e-12)


def test_assign_temperatures_cold_chain_first():
    t = ladder.assign_temperatures(10, 10.0)
    assert np.isclose(t[0], 1.0)
    assert np.isclose(t[-1], 10.0)
    assert np.all(np.diff(t) > 0)
    # geometric spacing: constant ratio
    r = t[1:] / t[:-1]
    np.testing.assert_allclose(r, r[0], rtol=1e-10)


def test_beta_ladder_validation_errors():
    with pytest.raises(ValueError):
        ladder.default_beta_ladder(0, 10, 10)
    with pytest.raises(ValueError):
        ladder.default_beta_ladder(2, None, None)
    with pytest.raises(ValueError):
        ladder.default_beta_ladder(2, 10, 1.0)


def test_beta_ladder_aux_paths():
    """ntemps-only / Tmax-only / Tmax=inf paths work (the reference's own
    code crashes on these; we implement the documented ptemcee semantics)."""
    b1 = ladder.default_beta_ladder(2, ntemps=5, Tmax=None)
    assert len(b1) == 5 and b1[0] == 1.0 and np.all(np.diff(b1) < 0)
    b2 = ladder.default_beta_ladder(2, ntemps=5, Tmax=np.inf)
    assert len(b2) == 5 and b2[-1] == 0.0
    b3 = ladder.default_beta_ladder(2, ntemps=None, Tmax=10.0)
    assert len(b3) >= 2 and np.isclose(b3[-1], 0.1)
