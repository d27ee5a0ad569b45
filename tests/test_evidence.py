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


def test_corrected_path_matches_analytic_gaussian(rng):
    """Corrected-path (VR) evidence with the analytic beta=0 anchor, pinned
    end to end on a fully Gaussian setting where every rung of the path

        pi_beta ∝ exp(prior + beta*LL + (1-beta)*corr)

    is a diagonal Gaussian and the absolute log Z(1) is closed form. Draws
    are EXACT per rung, so any disagreement is estimator/anchor math."""
    from ptnn.ops import vref

    d = 3
    sigma_sq = 25.0
    mu_q = rng.normal(size=d)
    v_q = rng.uniform(0.5, 2.0, size=d)
    m = rng.normal(size=d)  # likelihood center / scale
    s2 = rng.uniform(0.3, 1.5, size=d)
    betas = np.linspace(0.0, 1.0, 21)
    n = 40_000

    # per-rung exact Gaussian: precision/linear terms from the quadratic
    # exponent -(w^2/sigma_sq)/2 + (1-b)*corr + b*LL with
    # corr = -(w-mu_q)^2/(2 v_q) + w^2/(2 sigma_sq)
    lam = betas[:, None] / sigma_sq + (1 - betas[:, None]) / v_q + betas[
        :, None
    ] / s2  # (R, d)
    h = (1 - betas[:, None]) * mu_q / v_q + betas[:, None] * m / s2

    def log_z_abs(k):
        return float(
            -0.5 * d * np.log(sigma_sq)
            + np.sum(
                0.5 * np.log(2 * np.pi / lam[k])
                + h[k] ** 2 / (2 * lam[k])
                - 0.5 * (1 - betas[k]) * mu_q**2 / v_q
                - 0.5 * betas[k] * m**2 / s2
            )
        )

    w = h[None, :, :] / lam[None, :, :] + rng.standard_normal(
        (n, len(betas), d)
    ) / np.sqrt(lam[None, :, :])  # (n, R, d) exact rung draws
    ll = -0.5 * np.sum((w - m) ** 2 / s2, axis=-1)
    corr = -0.5 * np.sum((w - mu_q) ** 2 / v_q, axis=-1) + 0.5 * np.sum(
        w**2, axis=-1
    ) / sigma_sq
    anchor = vref.log_z0(v_q, d, sigma_sq)
    # the anchor IS the analytic beta=0 normalizer
    assert anchor == pytest.approx(log_z_abs(0), abs=1e-9)
    est = evidence.from_samples(
        ll - corr, 1.0 / np.maximum(betas, 1e-300), log_z0=anchor
    )
    assert est.anchored
    want = log_z_abs(len(betas) - 1)
    assert est.log_z_abs_ss == pytest.approx(want, abs=0.05)
    assert est.log_z_abs_ti == pytest.approx(want, abs=0.15)


def test_end_to_end_vr_evidence():
    """Sunspot VR run with the beta=0 reference leg: the corr trace is
    recorded, the window floors at the VR freeze step, the anchor is
    finite, and TI/SS agree within stepping-stone tolerance.

    Setup follows the VR transport test (results/vref_transport.md): a
    13-parameter net whose posterior the fitted Gaussian can describe, and
    the barrier-tuned 16-rung ladder packed toward beta=0 — on the
    61-parameter topology with a geometric 8-rung ladder the beta=0 stone
    spans the measured ~10^4-nat family gap and BOTH estimators carry
    huge MC/quadrature error (that scope limit is documented, not gated)."""
    import ptnn
    from ptnn.data import load_regression
    from ptnn.ops import vref

    prob = load_regression("Sunspot")
    tuned = (1.0, 1.099, 1.22, 1.374, 1.575, 1.846, 2.205, 2.588,
             3.156, 4.055, 5.377, 7.375, 10.287, 16.666, 33.333,
             float("inf"))
    cfg = dataclasses.replace(
        ptnn.PTConfig(
            task="regression",
            topology=(4, 2, 1),
            num_samples=16 * 1600,
            num_chains=16,
            maxtemp=20.0,
            custom_ladder=tuned,
            swap_interval=4,
            swap_offset=0,
            swap_style="even_odd",
            swap_payload="untempered",
            swap_rule="metropolis",
            pt_phase_frac=2.0,
            variational_reference=True,
            vr_hot_infinite=True,
            record_w=False,
            record_ll_state=True,
            chunk_steps=200,
        )
    ).validate()
    res = ptnn.sample(cfg, prob.train, prob.test, seed=4)
    assert "vr_corr_cur" in res.traces
    est = evidence.from_result(res)
    assert est.anchored and np.isfinite(est.log_z0)
    assert est.betas[0] == 0.0  # the beta=0 reference rung is in the path
    _, _, freeze = vref.schedule(
        cfg.samples_per_chain, cfg.vr_start_frac, cfg.burn_in,
        cfg.warmstart_frac,
    )
    assert est.window[0] >= freeze  # fixed-path window
    assert np.isfinite(est.log_z_abs_ti) and np.isfinite(est.log_z_abs_ss)
    # both estimators target the same integral; TI carries quadrature bias
    # over 16 rungs, SS per-stone MC noise
    rel = abs(est.log_z_abs_ti - est.log_z_abs_ss)
    assert rel < 0.1 * abs(est.log_z_abs_ti) + 25.0
    # cross-seed stability of the absolute estimate
    res2 = ptnn.sample(cfg, prob.train, prob.test, seed=14)
    est2 = evidence.from_result(res2)
    assert est2.log_z_abs_ss == pytest.approx(
        est.log_z_abs_ss, rel=0.1, abs=50.0
    )


def test_window_validation():
    with pytest.raises(ValueError, match="at least 2 rungs"):
        evidence.from_samples(np.zeros((10, 1)), np.array([1.0]))
    with pytest.raises(ValueError, match="record_ll_state"):
        evidence.from_traces({}, np.array([1.0, 2.0]), None)


def test_from_samples_pools_duplicate_betas():
    """Replicated ladders hand from_samples a tiled temperature array; the
    duplicate-beta columns must pool into one rung with R x the draws —
    identical to stacking the replicas' draw rows on a single ladder."""
    rng = np.random.default_rng(7)
    k, n = 4, 50
    temps = np.array([1.0, 2.0, 4.0, 8.0])
    ll_a = rng.normal(-10.0, 1.0, size=(n, k))
    ll_b = rng.normal(-10.0, 1.0, size=(n, k))
    tiled = evidence.from_samples(
        np.concatenate([ll_a, ll_b], axis=1), np.tile(temps, 2)
    )
    stacked = evidence.from_samples(
        np.concatenate([ll_a, ll_b], axis=0), temps
    )
    assert tiled.log_z_ti == pytest.approx(stacked.log_z_ti)
    assert tiled.log_z_ss == pytest.approx(stacked.log_z_ss)
    assert tiled.n_samples == 2 * n
    np.testing.assert_allclose(tiled.betas, stacked.betas)
