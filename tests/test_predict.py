"""Tests for posterior-predictive serving (ptnn/predict.py) and the
self-describing config.json artifact (results.write_artifacts +
config.to_json_dict/from_json_dict round trip)."""

import json
import os

import numpy as np
import pytest

import ptnn
from ptnn import predict as predict_mod
from ptnn.config import from_json_dict, to_json_dict
from ptnn.data import load_classification, load_regression
from ptnn.experiments import classification as cls_cli
from ptnn.experiments import regression as reg_cli


def test_config_json_roundtrip():
    cfg = ptnn.PTConfig(
        task="regression",
        topology=(4, 10, 1),
        num_samples=1600,
        num_chains=8,
        maxtemp=5.0,
        swap_interval=20,
        swap_offset=0,
        custom_ladder=(1.0, 1.5, 2.2, 3.3, 5.0, 9.0, 20.0, float("inf")),
        swap_payload="untempered",
        swap_rule="metropolis",
        pt_phase_frac=2.0,
        variational_reference=True,
        vr_hot_infinite=True,
    ).validate()
    d = json.loads(json.dumps(to_json_dict(cfg)))  # through real JSON text
    cfg2 = from_json_dict(d)
    assert cfg2 == cfg
    assert cfg2.custom_ladder[-1] == float("inf")  # Infinity survives
    # unknown keys from a future version are ignored
    d["some_future_flag"] = 7
    assert from_json_dict(d) == cfg


def test_regression_serving_roundtrip(tmp_path):
    out = str(tmp_path / "reg")
    reg_cli.main(
        [
            "--problem", "Sunspot", "--samples", "4000", "--chains", "8",
            "--maxtemp", "5", "--no-langevin", "--no-plots", "--out", out,
        ]
    )
    run = os.path.join(out, "Sunspot_0")
    assert os.path.exists(os.path.join(run, "config.json"))
    draws, cfg = predict_mod.load_posterior(run)
    assert cfg is not None and cfg.task == "regression"
    spc = cfg.samples_per_chain
    assert draws.shape == (spc - int(spc * cfg.burn_in), 61)
    # pooled across all rungs: 8x the cold-chain draw count
    draws_all, _ = predict_mod.load_posterior(run, chains="all")
    assert draws_all.shape[0] == 8 * draws.shape[0]
    # thinning
    draws_t, _ = predict_mod.load_posterior(run, thin=5)
    assert abs(draws_t.shape[0] - draws.shape[0] / 5) <= 1

    prob = load_regression("Sunspot")
    x = prob.test[:, :4]
    y = prob.test[:, 4]
    pred = predict_mod.posterior_predict(cfg, draws, x, batch=64)
    assert pred["mean"].shape == y.shape
    assert np.all(pred["low"] <= pred["high"])
    rmse = float(np.sqrt(np.mean((pred["mean"] - y) ** 2)))
    assert rmse < 0.15  # predictive mean beats the data scale (~0.25 std)
    # the band is EPISTEMIC-only (fx percentiles, ldmcmc.py:463-476 — no
    # observation-noise term), so y-coverage is not a calibration gate;
    # just pin that the band is real and ordered
    assert np.mean(pred["high"] - pred["low"]) > 1e-4
    assert np.all(pred["std"] >= 0.0)

    # CLI end to end
    out_file = str(tmp_path / "pred.txt")
    predict_mod.main(
        ["--run", run, "--problem", "Sunspot", "--out", out_file]
    )
    cols = np.loadtxt(out_file)
    assert cols.shape == (y.shape[0], 4)  # mean, low, high, std
    np.testing.assert_allclose(cols[:, 0], pred["mean"], atol=1e-5)


def test_classification_serving(tmp_path):
    out = str(tmp_path / "cls")
    cls_cli.main(
        [
            "--problem", "iris", "--samples", "4000", "--chains", "4",
            "--no-plots", "--out", out,
        ]
    )
    run = os.path.join(out, "iris_0")
    draws, cfg = predict_mod.load_posterior(run)
    assert cfg is not None and cfg.task == "classification"
    prob = load_classification("iris")
    x = prob.test[:, : cfg.topology[0]]
    y = prob.test[:, cfg.topology[0]].astype(int)
    pred = predict_mod.posterior_predict(cfg, draws, x)
    assert pred["probs"].shape == (x.shape[0], cfg.topology[2])
    np.testing.assert_allclose(pred["probs"].sum(axis=-1), 1.0, atol=1e-5)
    assert pred["entropy"].min() >= 0.0
    acc = np.mean(pred["label"] == y)
    assert acc > 0.5  # far above the 1/3 chance floor at this tiny budget


def test_predict_validates_draw_shape():
    cfg = ptnn.PTConfig(
        task="regression", topology=(4, 10, 1), num_samples=800,
        num_chains=8, maxtemp=5.0, swap_interval=20, swap_offset=0,
    ).validate()
    with pytest.raises(ValueError, match=r"\(M, 61\)"):
        predict_mod.posterior_predict(
            cfg, np.zeros((10, 13)), np.zeros((5, 4))
        )


def test_load_posterior_missing_dir(tmp_path):
    with pytest.raises(FileNotFoundError, match="record_w=True"):
        predict_mod.load_posterior(str(tmp_path))


def test_prior_draws_and_prior_predictive_cli(capsys):
    cfg = ptnn.PTConfig(
        task="regression", topology=(4, 10, 1), num_samples=800,
        num_chains=8, maxtemp=5.0, swap_interval=20, swap_offset=0,
    ).validate()
    d = predict_mod.prior_draws(cfg, 4000, seed=3)
    assert d.shape == (4000, 61)
    # N(0, sigma_sq) moments
    assert abs(float(d.mean())) < 0.1
    assert abs(float(d.var()) / cfg.sigma_sq - 1.0) < 0.05
    # distinct seeds -> distinct draws; same seed -> identical
    assert not np.allclose(d, predict_mod.prior_draws(cfg, 4000, seed=4))
    np.testing.assert_array_equal(d, predict_mod.prior_draws(cfg, 4000, seed=3))


def test_prior_predictive_cli(tmp_path, capsys):
    from ptnn.experiments import regression as reg_cli

    out = str(tmp_path / "reg")
    reg_cli.main(
        [
            "--problem", "Sunspot", "--samples", "1600", "--chains", "4",
            "--maxtemp", "5", "--no-langevin", "--no-plots", "--out", out,
        ]
    )
    capsys.readouterr()
    predict_mod.main(
        ["--run", f"{out}/Sunspot_0", "--problem", "Sunspot", "--prior", "64"]
    )
    got = capsys.readouterr().out
    assert "64 draws -> " in got  # served from prior draws, not the trace
