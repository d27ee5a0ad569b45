"""Bit-level validation against the reference's own Network class.

Imports the reference implementation read-only (skipped when the reference
checkout is absent) and checks our forward pass, likelihood, and sequential
Langevin drift against it on random inputs — stronger than the NumPy oracle
because it exercises the reference's actual code paths.
"""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from ptnn.ops import drift, likelihood

REF = "/root/reference/multicore-pt-classification"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


@pytest.fixture(scope="module")
def ref_network():
    sys.path.insert(0, REF)
    np.random.seed(0)
    from pt_classification import Network  # noqa: E402

    yield Network
    sys.path.remove(REF)


def _setup(rng, topo):
    w = rng.standard_normal(
        topo[0] * topo[1] + topo[1] * topo[2] + topo[1] + topo[2]
    )
    X = rng.standard_normal((20, topo[0]))
    y = rng.integers(0, topo[2], 20).astype(float)
    data = np.hstack([X, y[:, None]])
    return w, X, y, data


def test_forward_and_likelihood_match_reference(ref_network):
    topo = [4, 12, 3]
    rng = np.random.default_rng(0)
    w, X, y, data = _setup(rng, topo)
    net = ref_network(topo, data, data, 0.01)
    fx, prob = net.evaluate_proposal(data, w.copy())
    lh = 0.0
    for i in range(len(y)):
        for j in range(topo[2]):
            if j == y[i]:
                lh += np.log(prob[i, j])
    ev = likelihood.classification_eval(
        jnp.asarray(w, jnp.float32),
        jnp.asarray(X, jnp.float32),
        jnp.asarray(y, jnp.float32),
        tuple(topo),
    )
    assert np.isclose(float(ev.loglik), lh, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(ev.fx), fx)


def test_sequential_drift_matches_reference(ref_network):
    topo = [4, 12, 3]
    rng = np.random.default_rng(1)
    w, X, y, data = _setup(rng, topo)
    net = ref_network(topo, data, data, 0.01)
    w_ref = net.langevin_gradient(data, w.copy(), 1)
    t = np.asarray(drift.make_targets(jnp.asarray(y), topo[2], "classification"))
    w_ours = np.asarray(
        drift.sgd_epoch_sequential(
            jnp.asarray(w, jnp.float32),
            jnp.asarray(X, jnp.float32),
            jnp.asarray(t, jnp.float32),
            tuple(topo),
            0.01,
        )
    )
    np.testing.assert_allclose(w_ours, w_ref, rtol=1e-4, atol=1e-5)


def test_ladder_matches_reference():
    sys.path.insert(0, REF)
    try:
        np.random.seed(0)
        from pt_classification import ParallelTempering

        from ptnn.ops import ladder

        pt = ParallelTempering.__new__(ParallelTempering)
        for chains, mt in ((10, 10), (10, 2), (8, 5)):
            ref = pt.default_beta_ladder(2, ntemps=chains, Tmax=mt)
            ours = ladder.default_beta_ladder(2, ntemps=chains, Tmax=mt)
            np.testing.assert_allclose(ours, ref, rtol=1e-12)
    finally:
        sys.path.remove(REF)
