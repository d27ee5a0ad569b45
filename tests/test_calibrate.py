"""Tests for ptnn/ops/calibrate.py and the full posterior-predictive band
(predict.posterior_predict(noise="conditional"))."""

import numpy as np
import pytest

import ptnn
from ptnn import predict as predict_mod
from ptnn.ops import calibrate


def test_crps_matches_brute_force():
    rng = np.random.default_rng(2)
    s = rng.normal(size=(40, 6))
    y = rng.normal(size=6)
    out = calibrate.crps(s, y)
    for i in range(6):
        t1 = np.mean(np.abs(s[:, i] - y[i]))
        t2 = 0.5 * np.mean(np.abs(s[:, i][:, None] - s[:, i][None, :]))
        assert out["pointwise"][i] == pytest.approx(t1 - t2, rel=1e-10)


def test_crps_gaussian_analytic():
    # CRPS(N(0, s^2), 0) = s (sqrt(2) - 1) / sqrt(pi)
    rng = np.random.default_rng(3)
    for s in (1.0, 0.2):
        samples = rng.normal(0.0, s, size=(40000, 1))
        out = calibrate.crps(samples, np.zeros(1))
        expect = s * (np.sqrt(2.0) - 1.0) / np.sqrt(np.pi)
        assert out["mean"] == pytest.approx(expect, rel=0.03)


def test_crps_point_forecast_is_mae():
    y = np.array([1.0, -2.0])
    s = np.tile(np.array([[0.5, -1.0]]), (10, 1))  # degenerate forecast
    out = calibrate.crps(s, y)
    np.testing.assert_allclose(out["pointwise"], [0.5, 1.0], atol=1e-12)


def test_coverage():
    y = np.array([0.0, 1.0, 2.0, 3.0])
    assert calibrate.coverage(y, y - 1, y + 1) == 1.0
    assert calibrate.coverage(y, y + 0.1, y + 1) == 0.0
    assert calibrate.coverage(y, [-1, 2, 1, 4], [1, 3, 3, 5]) == 0.5


def test_ece_calibrated_vs_overconfident():
    rng = np.random.default_rng(5)
    n = 20000
    # calibrated: predict class 1 with prob p, correct with prob p
    p1 = rng.uniform(0.5, 1.0, size=n)
    probs = np.stack([1.0 - p1, p1], axis=1)
    labels = (rng.uniform(size=n) < p1).astype(np.int64)
    cal = calibrate.ece(probs, labels)
    assert cal["ece"] < 0.02
    # overconfident: same predictions claimed at 0.99
    probs_oc = np.stack([np.full(n, 0.01), np.full(n, 0.99)], axis=1)
    oc = calibrate.ece(probs_oc, labels)
    assert oc["ece"] > 0.15
    assert cal["bin_count"].sum() == n


def test_brier_hand_value():
    probs = np.array([[0.8, 0.2], [0.3, 0.7]])
    labels = np.array([0, 0])
    # (0.04+0.04 + 0.49+0.49)/2
    assert calibrate.brier(probs, labels) == pytest.approx(0.53)


def _reg_cfg():
    return ptnn.PTConfig(
        task="regression", topology=(4, 5, 1), num_samples=400,
        num_chains=4, maxtemp=2.0, swap_interval=10, swap_offset=0,
    ).validate()


def test_full_predictive_band_analytic_collapse():
    # all draws identical -> the predictive mixture collapses to a single
    # Student-t_{2a}(f(w0), sqrt(b/a)) whose variance is b/(a-1); the
    # sampled band must reproduce it, and the epistemic band must be
    # degenerate (zero width) in the same situation
    cfg = _reg_cfg()
    from ptnn import kernel

    spec = kernel.default_spec(cfg)
    rng = np.random.default_rng(8)
    w0 = rng.normal(0, 0.3, size=spec.w_size).astype(np.float32)
    draws = np.tile(w0, (20000, 1))
    x_tr = rng.uniform(size=(50, 4)).astype(np.float32)
    y_tr = rng.uniform(size=50).astype(np.float32)
    x = rng.uniform(size=(4, 4)).astype(np.float32)

    epi = predict_mod.posterior_predict(cfg, draws[:16], x)
    np.testing.assert_allclose(epi["high"] - epi["low"], 0.0, atol=1e-7)

    full = predict_mod.posterior_predict(
        cfg, draws, x, noise="conditional", cond=(x_tr, y_tr),
        return_samples=True, batch=4096,
    )
    f0 = np.asarray(spec.forward(w0, x_tr))[:, 0]
    sse = float(np.sum((y_tr - f0) ** 2))
    a = cfg.nu_1 + 25.0
    b = cfg.nu_2 + 0.5 * sse
    var_expect = b / (a - 1.0)
    np.testing.assert_allclose(full["mean"], epi["mean"], atol=1e-3)
    np.testing.assert_allclose(
        np.square(full["std"]), var_expect, rtol=0.08
    )
    assert full["samples"].shape == (20000, 4)
    assert np.all(full["high"] > full["low"])
    # band is symmetric about the (common) mean for the symmetric t
    mid = 0.5 * (full["high"] + full["low"])
    np.testing.assert_allclose(mid, full["mean"], atol=0.02)


def test_noise_requires_cond_and_validates():
    cfg = _reg_cfg()
    draws = np.zeros((8, 31), np.float32)
    x = np.zeros((3, 4), np.float32)
    with pytest.raises(ValueError, match="cond"):
        predict_mod.posterior_predict(cfg, draws, x, noise="conditional")
    with pytest.raises(ValueError, match="noise"):
        predict_mod.posterior_predict(cfg, draws, x, noise="bogus")


def test_calibrate_cli_end_to_end(tmp_path, capsys):
    from ptnn.experiments import regression as reg_cli

    out = str(tmp_path / "reg")
    reg_cli.main(
        [
            "--problem", "Sunspot", "--samples", "3000", "--chains", "4",
            "--maxtemp", "5", "--no-langevin", "--no-plots", "--out", out,
        ]
    )
    predict_mod.main(
        ["--run", f"{out}/Sunspot_0", "--problem", "Sunspot", "--calibrate"]
    )
    got = capsys.readouterr().out
    assert "calibration (test): 5-95 band coverage" in got
    assert "CRPS" in got
    # the full band must cover more than the epistemic-only band
    import re

    m = re.search(
        r"coverage (\d+\.\d)% \(target 90; epistemic-only band: (\d+\.\d)%",
        got,
    )
    assert m is not None, got
    assert float(m.group(1)) > float(m.group(2))
    assert float(m.group(1)) > 50.0  # full band is a real predictive band


def test_ppc_pvalues_well_specified_vs_misfit():
    rng = np.random.default_rng(11)
    y = rng.normal(0.0, 1.0, size=400)
    # well-specified replicates: same generative law -> all p in mid-range
    rep_ok = rng.normal(0.0, 1.0, size=(500, 400))
    p = calibrate.ppc(rep_ok, y)
    for k, v in p.items():
        assert 0.02 < v < 0.98, (k, v)
    # variance-misfit replicates: too narrow -> p_std ~ 0, p_min ~ 1 (reps
    # never reach the observed min), p_max ~ 0
    rep_bad = rng.normal(0.0, 0.3, size=(500, 400))
    p_bad = calibrate.ppc(rep_bad, y)
    assert p_bad["p_std"] < 0.01
    assert p_bad["p_min"] > 0.99
    assert p_bad["p_max"] < 0.01
    # autocorrelation misfit: observed series is AR(1)-correlated, iid reps
    # cannot reproduce it
    ar = np.empty(400)
    ar[0] = rng.normal()
    for i in range(1, 400):
        ar[i] = 0.8 * ar[i - 1] + 0.6 * rng.normal()
    p_ar = calibrate.ppc(rep_ok, ar)
    assert p_ar["p_acf1"] < 0.01
