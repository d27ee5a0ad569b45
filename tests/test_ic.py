"""Tests for ptnn/ops/ic.py — WAIC, PSIS-LOO, the GPD tail fit, and the
pointwise log-likelihood builder (incl. the exact Rao-Blackwellized
Student-t handling of the regression noise variance)."""

import numpy as np
import pytest

import ptnn
from ptnn.ops import ic


def _np_logsumexp(a, axis=None):
    m = np.max(a, axis=axis, keepdims=True)
    return np.squeeze(
        np.log(np.sum(np.exp(a - m), axis=axis, keepdims=True)) + m,
        axis=axis if axis is not None else None,
    )


def test_gpdfit_recovers_shape_parameter():
    rng = np.random.default_rng(7)
    for k_true in (0.1, 0.4):
        u = rng.uniform(size=4000)
        z = 1.0 / k_true * (np.power(1.0 - u, -k_true) - 1.0)  # sigma=1 GPD
        k_hat, sigma = ic.gpdfit(z)
        assert abs(k_hat - k_true) < 0.1
        assert abs(sigma - 1.0) < 0.15


def test_waic_hand_formulas():
    rng = np.random.default_rng(3)
    ll = rng.normal(-1.0, 0.3, size=(200, 7))
    out = ic.waic(ll)
    lppd_i = _np_logsumexp(ll, axis=0) - np.log(200)
    p_i = np.var(ll, axis=0, ddof=1)
    np.testing.assert_allclose(out["lppd"], lppd_i.sum(), rtol=1e-12)
    np.testing.assert_allclose(out["p_waic"], p_i.sum(), rtol=1e-12)
    np.testing.assert_allclose(
        out["elpd_waic"], (lppd_i - p_i).sum(), rtol=1e-12
    )
    np.testing.assert_allclose(out["waic"], -2.0 * out["elpd_waic"])
    assert out["pointwise"].shape == (7,)


def test_psis_loo_matches_exact_loo_on_conjugate_normal():
    # y_i ~ N(mu, 1), mu ~ N(0, v0): exact LOO predictive is closed-form,
    # and exact posterior draws are available — the IS estimator must land
    # on the analytic answer and report healthy Pareto k everywhere.
    rng = np.random.default_rng(11)
    n, m, v0 = 25, 30000, 100.0
    y = rng.normal(0.7, 1.0, size=n)
    v_n = 1.0 / (1.0 / v0 + n)
    mu_n = v_n * y.sum()
    mu_draws = rng.normal(mu_n, np.sqrt(v_n), size=m)
    ll = -0.5 * np.log(2 * np.pi) - 0.5 * np.square(
        y[None, :] - mu_draws[:, None]
    )
    out = ic.psis_loo(ll)
    # analytic LOO
    exact = np.empty(n)
    for i in range(n):
        v_i = 1.0 / (1.0 / v0 + (n - 1))
        mu_i = v_i * (y.sum() - y[i])
        s2 = 1.0 + v_i
        exact[i] = -0.5 * np.log(2 * np.pi * s2) - 0.5 * (y[i] - mu_i) ** 2 / s2
    assert np.max(np.abs(out["pointwise"] - exact)) < 0.05
    np.testing.assert_allclose(out["elpd_loo"], exact.sum(), atol=0.25)
    assert np.all(out["pareto_k"] < 0.7)
    assert out["p_loo"] == pytest.approx(1.0, abs=0.3)  # one parameter
    # WAIC agrees with LOO on this well-behaved posterior
    w = ic.waic(ll)
    np.testing.assert_allclose(w["elpd_waic"], out["elpd_loo"], atol=0.3)


def _cls_cfg():
    return ptnn.PTConfig(
        task="classification", topology=(4, 6, 3), num_samples=400,
        num_chains=4, maxtemp=2.0, swap_interval=10, swap_offset=0,
    ).validate()


def test_classification_pointwise_matches_direct_eval():
    import jax.numpy as jnp
    from ptnn import kernel

    cfg = _cls_cfg()
    spec = kernel.default_spec(cfg)
    rng = np.random.default_rng(5)
    draws = rng.normal(0, 0.5, size=(9, spec.w_size)).astype(np.float32)
    x = rng.normal(size=(11, 4)).astype(np.float32)
    yl = rng.integers(0, 3, size=11)
    ll = ic.pointwise_log_lik(cfg, draws, x, yl, batch=4)
    assert ll.shape == (9, 11)
    for mi in (0, 8):
        lp = np.asarray(spec.log_probs(spec.forward(jnp.asarray(draws[mi]), jnp.asarray(x))))
        np.testing.assert_allclose(ll[mi], lp[np.arange(11), yl], atol=1e-6)
    assert np.all(ll <= 0.0)  # log probabilities


def _reg_cfg():
    return ptnn.PTConfig(
        task="regression", topology=(4, 5, 1), num_samples=400,
        num_chains=4, maxtemp=2.0, swap_interval=10, swap_offset=0,
    ).validate()


def test_regression_conditional_and_sampled_eta_agree():
    cfg = _reg_cfg()
    from ptnn import kernel

    spec = kernel.default_spec(cfg)
    rng = np.random.default_rng(9)
    draws = rng.normal(0, 0.3, size=(400, spec.w_size)).astype(np.float32)
    x = rng.uniform(size=(30, 4)).astype(np.float32)
    y = rng.uniform(size=30).astype(np.float32)
    ll_c = ic.pointwise_log_lik(cfg, draws, x, y, eta="conditional")
    ll_s = ic.pointwise_log_lik(cfg, draws, x, y, eta="sample", seed=2)
    assert ll_c.shape == ll_s.shape == (400, 30)
    assert np.all(np.isfinite(ll_c)) and np.all(np.isfinite(ll_s))
    # the Student-t is the exact tau^2-marginal of the sampled-eta Gaussian:
    # per-point lppds agree to Monte-Carlo error of the eta draw
    lppd_c = _np_logsumexp(ll_c, axis=0) - np.log(400)
    lppd_s = _np_logsumexp(ll_s, axis=0) - np.log(400)
    np.testing.assert_allclose(lppd_c, lppd_s, atol=0.15)
    # explicit eta array path
    eta = np.full(400, np.log(0.04), np.float32)
    ll_e = ic.pointwise_log_lik(cfg, draws, x, y, eta=eta)
    f = np.asarray(
        [np.asarray(spec.forward(d, x))[:, 0] for d in draws[:3]]
    )
    expect = -0.5 * np.log(2 * np.pi * 0.04) - 0.5 * (y[None] - f) ** 2 / 0.04
    np.testing.assert_allclose(ll_e[:3], expect, atol=1e-4)


def test_conditional_uses_train_split_when_given():
    cfg = _reg_cfg()
    rng = np.random.default_rng(4)
    draws = rng.normal(0, 0.3, size=(50, 31)).astype(np.float32)
    x_tr = rng.uniform(size=(40, 4)).astype(np.float32)
    y_tr = rng.uniform(size=40).astype(np.float32)
    x_te = rng.uniform(size=(8, 4)).astype(np.float32)
    y_te = rng.uniform(size=8).astype(np.float32)
    ll_cond_self = ic.pointwise_log_lik(cfg, draws, x_te, y_te)
    ll_cond_train = ic.pointwise_log_lik(
        cfg, draws, x_te, y_te, cond=(x_tr, y_tr)
    )
    # different conditioning data -> different (a, b) -> different densities
    assert not np.allclose(ll_cond_self, ll_cond_train)
    assert np.all(np.isfinite(ll_cond_train))


def test_compare_table_ranks_by_elpd():
    rng = np.random.default_rng(1)
    ll_good = rng.normal(-0.5, 0.1, size=(300, 20))
    ll_bad = ll_good - 0.4
    table = ic.compare(
        {"bad": ic.psis_loo(ll_bad), "good": ic.psis_loo(ll_good)}
    )
    lines = table.splitlines()
    assert lines[1].startswith("good")
    assert lines[2].startswith("bad")
    # the best row's own difference is zero
    assert float(lines[1].split()[2]) == 0.0


def test_ic_end_to_end_from_artifacts(tmp_path):
    from ptnn import predict as predict_mod
    from ptnn.data import load_regression
    from ptnn.experiments import regression as reg_cli

    out = str(tmp_path / "reg")
    reg_cli.main(
        [
            "--problem", "Sunspot", "--samples", "3000", "--chains", "4",
            "--maxtemp", "5", "--no-langevin", "--no-plots", "--out", out,
        ]
    )
    run = f"{out}/Sunspot_0"
    draws, cfg = predict_mod.load_posterior(run, thin=2)
    prob = load_regression("Sunspot")
    x, y = prob.train[:, :4], prob.train[:, 4]
    ll = ic.pointwise_log_lik(cfg, draws, x, y)
    w = ic.waic(ll)
    lo = ic.psis_loo(ll)
    assert np.isfinite(w["elpd_waic"]) and np.isfinite(lo["elpd_loo"])
    assert w["p_waic"] > 0.0 and lo["p_loo"] > -0.5
    assert w["elpd_waic"] >= lo["elpd_loo"] - 5.0  # same quantity, close
    assert np.median(lo["pareto_k"]) < 0.7
    # CLI smoke
    predict_mod.main(["--run", run, "--problem", "Sunspot", "--ic"])
