"""Tests for ladder evidence estimation (ptnn/ops/evidence.py).

The estimators are pinned two ways: against closed-form values on synthetic
Gaussian log-likelihood draws (where both the stepping-stone ratios and the
TI integrand are analytic), and end-to-end on a real PT run (trace plumbing,
window selection, and the exact state-likelihood invariant)."""

import dataclasses

import numpy as np
import pytest

import ptnn
from ptnn.data import load_classification
from ptnn.ops import evidence


def test_stepping_stone_matches_analytic_gaussian(rng):
    # rung-k draws: ll ~ N(mu_k, s2). E[exp(db*ll)] = exp(db*mu + db^2 s2/2)
    betas = np.array([0.2, 0.45, 0.7, 1.0])
    temps = 1.0 / betas
    mu = 10.0 * betas - 3.0  # E_beta[ll] increasing in beta
    s2 = 0.25
    n = 200_000
    ll = mu[None, :] + np.sqrt(s2) * rng.standard_normal((n, len(betas)))
    est = evidence.from_samples(ll, temps)
    db = np.diff(betas)
    ss_exact = float(np.sum(db * mu[:-1] + 0.5 * db**2 * s2))
    assert abs(est.log_z_ss - ss_exact) < 0.01
    # mu is linear in beta -> trapezoid is exact up to MC noise in the means
    ti_exact = float(np.trapz(mu, betas))
    assert abs(est.log_z_ti - ti_exact) < 0.01
    np.testing.assert_allclose(est.mean_ll, mu, atol=0.01)


def test_rung_order_invariance(rng):
    betas = np.array([1.0, 0.5, 0.25])  # ladder order: cold first (ptnn's)
    ll = rng.standard_normal((500, 3)) + np.array([5.0, 2.0, 1.0])
    a = evidence.from_samples(ll, 1.0 / betas)
    perm = [2, 0, 1]
    b = evidence.from_samples(ll[:, perm], 1.0 / betas[perm])
    assert a.log_z_ti == pytest.approx(b.log_z_ti)
    assert a.log_z_ss == pytest.approx(b.log_z_ss)
    assert np.all(np.diff(a.betas) > 0)


def test_end_to_end_evidence_from_pt_run():
    prob = load_classification("iris", seed=0)
    cfg = dataclasses.replace(
        ptnn.classification_preset(
            prob.topology, num_samples=8 * 400, canonical=True
        ),
        num_chains=8, maxtemp=20.0, swap_interval=40, chunk_steps=200,
        record_w=False, record_ll_state=True,
    ).validate()
    res = ptnn.sample(cfg, prob.train, prob.test, seed=0)
    assert "ll_cur" in res.traces
    # the trace's last row IS the final state likelihood (post-MH post-swap)
    np.testing.assert_allclose(
        res.traces["ll_cur"][-1], np.asarray(res.final_state.ll), rtol=1e-6
    )
    est = evidence.from_result(res)
    assert np.isfinite(est.log_z_ti) and np.isfinite(est.log_z_ss)
    # E_beta[log L] is exactly nondecreasing in beta; allow sampling noise
    scale = max(1.0, np.abs(est.mean_ll).max() * 0.05)
    assert np.all(np.diff(est.mean_ll) > -scale)
    # the two estimators target the same integral; TI carries quadrature
    # bias on a 8-rung ladder, so the gate is loose but catches sign or
    # tempering errors (both are large negative on iris: ~N*log(1/3) scale)
    assert est.log_z_ti < 0 and est.log_z_ss < 0
    assert abs(est.log_z_ti - est.log_z_ss) < 0.25 * abs(est.log_z_ti) + 10.0


def test_window_validation():
    with pytest.raises(ValueError, match="at least 2 rungs"):
        evidence.from_samples(np.zeros((10, 1)), np.array([1.0]))
    with pytest.raises(ValueError, match="record_ll_state"):
        evidence.from_traces({}, np.array([1.0, 2.0]), None)
