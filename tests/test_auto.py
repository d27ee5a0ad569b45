"""ptnn.auto — one-call auto-configured PT (pilot -> barrier -> ensemble ->
flagship proposal -> replication gate).

The reference hardcodes every hyperparameter per dataset in main()
(pt_classification.py:1036-1045); auto derives them from measurements. These
tests pin the decision policy (deterministic given the pilot measurements)
and the end-to-end report on tiny budgets.
"""

import numpy as np
import pytest

from ptnn import auto
from ptnn.data import load_regression
from ptnn.ops import ladder


# ---------------------------------------------------------------------------
# unit: ladder re-spacing onto a different rung count (the auto-sizing piece)


def test_respace_to_more_rungs_monotone_endpoints():
    temps = ladder.assign_temperatures(5, 8.0)
    rej = np.array([0.4, 0.1, 0.1, 0.4])
    out = ladder.barrier_tuned_temperatures(temps, rej, n_out=9)
    assert out.shape == (9,)
    assert out[0] == 1.0 and out[-1] == pytest.approx(8.0)
    assert (np.diff(out) > 0).all()


def test_respace_to_fewer_rungs():
    temps = ladder.assign_temperatures(8, 10.0)
    out = ladder.barrier_tuned_temperatures(temps, np.full(7, 0.3), n_out=3)
    assert out.shape == (3,)
    assert out[0] == 1.0 and out[-1] == pytest.approx(10.0)
    assert (np.diff(out) > 0).all()


def test_respace_same_count_matches_original_signature():
    temps = ladder.assign_temperatures(6, 5.0)
    rej = np.array([0.5, 0.2, 0.1, 0.2, 0.5])
    np.testing.assert_allclose(
        ladder.barrier_tuned_temperatures(temps, rej, n_out=6),
        ladder.barrier_tuned_temperatures(temps, rej),
    )


def test_respace_zero_barrier_resizes_geometrically():
    temps = ladder.assign_temperatures(4, 9.0)
    out = ladder.barrier_tuned_temperatures(temps, np.zeros(3), n_out=7)
    assert out.shape == (7,)
    assert out[0] == 1.0 and out[-1] == pytest.approx(9.0)
    assert (np.diff(out) > 0).all()


def test_respace_rejects_degenerate_count():
    temps = ladder.assign_temperatures(4, 9.0)
    with pytest.raises(ValueError):
        ladder.barrier_tuned_temperatures(temps, np.zeros(3), n_out=1)


# ---------------------------------------------------------------------------
# unit: topology inference from the reference row format


def test_infer_topology_regression_and_classification():
    tr = np.zeros((10, 5))
    te = np.zeros((4, 5))
    assert auto.infer_topology(tr, te, "regression", None) == (4, 10, 1)
    assert auto.infer_topology(tr, te, "regression", 7) == (4, 7, 1)
    tr_c = np.concatenate([np.zeros((10, 5)), np.zeros((10, 1))], axis=1)
    tr_c[:, 5] = np.arange(10) % 3
    assert auto.infer_topology(tr_c, tr_c, "classification", None) == (5, 10, 3)
    bad = tr_c.copy()
    bad[:, 5] = 0.5
    with pytest.raises(ValueError):
        auto.infer_topology(bad, bad, "classification", None)


# ---------------------------------------------------------------------------
# end-to-end on tiny budgets (CPU tier)


def _tiny_kw():
    return dict(
        chain_budget=8,
        steps_per_chain=240,
        pilot_steps_per_chain=120,
        tune_rounds=1,
    )


def test_auto_config_decisions_regression():
    prob = load_regression("Sunspot")
    cfg, tune, dec = auto.auto_config(
        prob.train, prob.test, "regression", **_tiny_kw()
    )
    # budget respected and factored into whole ladders
    assert cfg.num_chains <= 8
    assert cfg.num_chains == cfg.n_ladders * cfg.rungs_per_ladder
    assert len(cfg.custom_ladder) == cfg.rungs_per_ladder
    assert cfg.custom_ladder[0] == 1.0
    assert cfg.custom_ladder[-1] == pytest.approx(5.0)  # regression endpoint
    assert tune.barrier >= 0.0
    # quality target on >=2 replicas -> ChEES HMC; audit trail populated
    if cfg.n_ladders >= 2:
        assert cfg.proposal == "hmc" and cfg.hmc_adapt_traj
    for k in ("topology", "maxtemp", "pilot", "ladder", "ensemble",
              "proposal", "execution"):
        assert k in dec and dec[k]
    assert cfg.topology == (4, 10, 1)
    # canonical PT: the tuned schedule keeps its temperatures all run
    assert cfg.pt_phase_frac == 2.0


def test_auto_config_speed_target_picks_mala():
    prob = load_regression("Lazer")
    cfg, _, dec = auto.auto_config(
        prob.train, prob.test, "regression", target="speed", **_tiny_kw()
    )
    assert cfg.proposal == "precond_mala" and not cfg.hmc_adapt_traj
    assert "MALA" in dec["proposal"]


def test_auto_sample_report_regression():
    # speed target: the MALA scan compiles in seconds; the ChEES-HMC quality
    # path (minutes of XLA compile for the unrolled leapfrog bodies) is the
    # slow-tier test below
    prob = load_regression("Sunspot")
    rep = auto.auto_sample(
        prob.train, prob.test, "regression", replicate=2, target="speed",
        **_tiny_kw()
    )
    assert np.isfinite(rep.test_cold_mean) and rep.test_cold_mean > 0
    assert rep.rhat_cold_max is not None and rep.rhat_cold_max >= 1.0
    assert rep.verdict in ("mixed", "marginal", "metastable")
    assert rep.pooled_cold_ess_per_sec > 0
    assert rep.chain_steps_per_sec > 0
    assert len(rep.per_seed_cold) == 2
    assert 0 <= rep.swap_percent <= 100
    # serving-quality scoring (session 9): LOO + calibration in the report
    assert rep.elpd_loo is not None and np.isfinite(rep.elpd_loo)
    assert 0.0 <= rep.loo_bad_k_frac <= 1.0
    assert 0.0 <= rep.coverage_90 <= 1.0 and rep.crps > 0.0
    assert rep.ece is None  # classification-only metric
    # the report renders (the user-facing surface)
    text = rep.describe()
    assert "decisions" in text and "cold test RMSE" in text
    assert "predictive score: elpd_loo" in text and "CRPS" in text


def test_auto_sample_budget_escalation():
    """escalate=K acts on the convergence gate: a tiny metastable budget
    must trigger doublings (recorded in the decision trail, with
    record_thin keeping trace rows flat) and a still-failing gate after
    the cap must report budget-capped — never blendable with
    converged."""
    prob = load_regression("Sunspot")
    rep = auto.auto_sample(
        prob.train, prob.test, "regression", replicate=2, target="speed",
        escalate=2, **_tiny_kw()
    )
    esc = [k for k in rep.decisions if k.startswith("escalation_")]
    if rep.rhat_cold_max is not None and rep.rhat_cold_max >= 1.01:
        # gate failed at the final budget: the cap must be visible
        assert "budget-capped" in rep.verdict
        assert len(esc) == 2
    if esc:
        # escalated config doubled per escalation; thin kept rows flat
        assert rep.config.samples_per_chain == 240 * 2 ** len(esc)
        assert rep.config.record_thin == 2 ** len(esc)
        assert "R-hat" in rep.decisions["escalation_1"]
        # escalated runs drop replica tracking; base-run trips reported
        assert not rep.config.track_replicas
    assert np.isfinite(rep.test_cold_mean)
    assert rep.pooled_cold_ess_per_sec > 0


@pytest.mark.slow
def test_auto_sample_quality_chees_end_to_end():
    prob = load_regression("Sunspot")
    rep = auto.auto_sample(
        prob.train, prob.test, "regression", replicate=2, target="quality",
        **_tiny_kw()
    )
    cfg = rep.config
    if cfg.n_ladders >= 2:
        assert cfg.proposal == "hmc" and cfg.hmc_adapt_traj
    assert np.isfinite(rep.test_cold_mean) and rep.test_cold_mean > 0
    assert rep.pooled_cold_ess_per_sec > 0
    assert rep.verdict in ("mixed", "marginal", "metastable")


def test_auto_config_posterior_trace_budget():
    # 61 params x ladders x 3M steps/chain blows the 256 MiB fetch budget:
    # auto must skip the pos_w trace (scalar metrics only) and say so
    prob = load_regression("Sunspot")
    cfg, _, dec = auto.auto_config(
        prob.train, prob.test, "regression",
        chain_budget=8, steps_per_chain=3_000_000,
        pilot_steps_per_chain=120, tune_rounds=1,
    )
    assert not cfg.record_w and cfg.record_w_chains == 0
    assert "SKIPPED" in dec["posterior_trace"]


def test_auto_config_model_spec_cnn():
    from ptnn.data import load_digits
    from ptnn.models import cnn

    prob = load_digits()
    tr, te = prob.train[:120], prob.test[:60]
    spec = cnn.digits_spec()
    cfg, _, dec = auto.auto_config(
        tr, te, "classification", model_spec=spec, target="speed",
        **_tiny_kw()
    )
    assert cfg.topology[0] == 64 and cfg.topology[2] == 10
    assert spec.name in dec["topology"]
    # fused blocks cover the reference FNN spec only -> per-step fallback
    assert "per-step" in dec["execution"]
    assert cfg.proposal == "precond_mala"


def test_auto_config_model_spec_mlp():
    from ptnn.models import mlp

    prob = load_regression("Lazer")
    spec = mlp.spec((4, 8, 4, 1), task="regression")
    cfg, _, dec = auto.auto_config(
        prob.train, prob.test, "regression", model_spec=spec,
        target="speed", **_tiny_kw()
    )
    assert spec.name in dec["topology"]
    assert "per-step" in dec["execution"]  # fused kernels are FNN-only


def test_auto_sample_classification_and_out(tmp_path):
    # synthetic 3-class separable set in the reference row format
    rng = np.random.default_rng(0)
    n, f = 120, 4
    x = rng.normal(size=(n, f)).astype(np.float64)
    y = (x[:, 0] > 0).astype(float) + (x[:, 1] > 0)
    rows = np.concatenate([x, y[:, None]], axis=1)
    tr, te = rows[:90], rows[90:]
    rep = auto.auto_sample(
        tr, te, "classification", replicate=1, out=str(tmp_path), **_tiny_kw()
    )
    assert rep.config.task == "classification"
    assert rep.config.topology == (4, 10, 3)
    assert rep.rhat_cold_max is None and rep.verdict == "unreplicated"
    assert 0.0 <= rep.test_cold_mean <= 100.0
    assert rep.elpd_loo is not None and rep.elpd_loo < 0.0  # log probs
    assert 0.0 <= rep.ece <= 1.0 and 0.0 <= rep.brier <= 2.0
    assert rep.coverage_90 is None  # regression-only metric
    assert "ECE" in rep.describe()
    report_file = tmp_path / "auto_report.txt"
    assert report_file.exists()
    assert "decisions" in report_file.read_text()
    # serving-ready artifacts: cold-rung pos_w only (record_w_chains) +
    # config.json, loadable through the predict path
    from ptnn import predict

    run_dir = tmp_path / "auto_0"
    pos = run_dir / "posterior" / "pos_w"
    assert (run_dir / "config.json").exists()
    assert len(list(pos.glob("chain_*.txt"))) == rep.config.n_ladders
    draws, cfg2 = predict.load_posterior(str(run_dir), chains="cold")
    assert cfg2 is not None and cfg2.num_chains == rep.config.num_chains
    assert draws.shape[1] == rep.config.topology[0] * rep.config.topology[1] \
        + rep.config.topology[1] * rep.config.topology[2] \
        + sum(rep.config.topology[1:])
