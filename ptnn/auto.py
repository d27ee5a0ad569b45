"""One-call auto-configured parallel tempering: ``ptnn.auto.auto_sample``.

The reference makes its user pick ~10 coupled hyperparameters by hand —
chain count, maxtemp, swap interval, proposal family, step sizes, sample
budget — with per-dataset constants baked into ``main()``
(pt_classification.py:1036-1045, pt_timeseries_regression.py:915-955) and no
instrument to tell whether the choices were any good. This module closes
that loop with the framework's own measurements:

1. **Pilot → communication barrier.** A short replicated-ladder pilot
   measures the per-pair expected swap rejection (Rao-Blackwellized inside
   the compiled sweep); ``tuning.tune_ladder`` re-spaces the rungs at equal
   barrier increments (Syed et al. 2021).
2. **Barrier → ladder size.** ``tuning.suggest_num_chains`` converts the
   measured barrier total into the rung count the posterior actually needs;
   the pilot profile is interpolated onto that count
   (``ops/ladder.barrier_tuned_temperatures(n_out=...)``).
3. **Chain budget → replicated ensemble.** Chains are latency-free on a TPU
   chip up to ~400 (fnn_roofline.md), so the remaining budget becomes R
   independent tuned ladders (``PTConfig.n_ladders``) — R cold chains whose
   ESS adds (results/ladder_ensembles.md: 19x quality-per-second at equal
   wall-clock).
4. **Objective → proposal.** ``target="quality"`` picks ChEES-adapted HMC
   (the measured quality flagship, results/chees_study.md — nobody chooses
   a trajectory length); ``target="speed"`` picks preconditioned MALA (the
   measured ESS/s flagship). Both ride the fused Pallas block kernels when
   the config qualifies (ptnn/fused.py gates, transparent fallback).
5. **Replication gate.** The final run is S independently-seeded executions
   of one compiled program; the report carries cross-seed split-R-hat on the
   cold posterior — the honest convergence lever (results/convergence.md) —
   plus pooled cold ESS/s and the replica round-trip rate.

Every decision lands in ``AutoReport.decisions`` with the measurement that
drove it, so the choices are auditable rather than folklore.

Usage::

    import ptnn
    from ptnn.data import load
    prob = load("Sunspot")
    report = ptnn.auto.auto_sample(prob.train, prob.test, task="regression")
    print(report.describe())

CLI: ``python -m ptnn.auto Sunspot --target quality --out results/auto``.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ptnn import tuning
from ptnn.config import PTConfig
from ptnn.ops import ess as ess_mod
from ptnn.ops import ladder as ladder_mod
from ptnn.ops import roundtrip as rt_mod


@dataclasses.dataclass
class AutoReport:
    """Everything ``auto_sample`` decided and measured."""

    config: PTConfig  # the production config actually run
    tune: tuning.TuneResult  # pilot history (per-round rejection profiles)
    decisions: Dict[str, str]  # choice -> the measurement/reason behind it
    # Cross-seed replication gate (None when replicate < 2). For the
    # default FNN this is the FUNCTION-SPACE R-hat (predictions at 16 test
    # inputs across seeds) — w-space R-hat conflates weight symmetry with
    # predictive disagreement (results/convergence_definitive.md); custom
    # model specs fall back to the parameter-space statistic:
    rhat_cold_max: Optional[float]
    verdict: str  # "mixed" | "marginal" | "metastable" (convergence.md bands)
    # Quality (reference metric semantics, results.summarize):
    test_pooled_mean: float  # pooled across ALL chains, mean over seeds
    test_pooled_std: float  # spread over seeds
    test_cold_mean: float  # cold rungs only (the true posterior), over seeds
    test_cold_std: float
    # Throughput / effective-sample economics:
    chain_steps_per_sec: float  # median over seeds
    # ESS of R pooled cold chains x per-chain draw rate; None when the
    # posterior trace was skipped (w_size x ladders x steps over the host
    # fetch budget — see decisions["posterior_trace"])
    pooled_cold_ess_per_sec: Optional[float]
    ess_draws: int  # post-burn-in draws behind the ESS estimate (per seed)
    roundtrips_per_kstep: float  # replica transport, mean over seeds
    swap_percent: float
    accept_percent: float
    elapsed_s: float  # total sampling wall-clock (pilot excluded)
    seeds: Tuple[int, ...]
    per_seed_cold: Tuple[float, ...]  # cold test metric per seed
    # Serving-quality scoring from the last seed's pooled cold draws
    # (ops/ic.py + ops/calibrate.py; None when the posterior trace was
    # skipped or a custom model_spec is in play — see decisions):
    elpd_loo: Optional[float] = None
    loo_bad_k_frac: Optional[float] = None  # fraction of points with k>0.7
    coverage_90: Optional[float] = None  # regression: 5-95 full-band coverage
    crps: Optional[float] = None  # regression
    ece: Optional[float] = None  # classification
    brier: Optional[float] = None  # classification

    def describe(self) -> str:
        cfg = self.config
        is_reg = cfg.task == "regression"
        metric = "test RMSE" if is_reg else "test acc %"
        lines = [
            f"auto-configured PT: {cfg.num_chains} chains = "
            f"{cfg.n_ladders} ladder(s) x {cfg.rungs_per_ladder} rungs, "
            f"proposal={cfg.proposal}"
            + (" +ChEES" if cfg.hmc_adapt_traj else "")
            + (", fused blocks" if cfg.fused_step else ""),
            f"  cold {metric}: {self.test_cold_mean:.4f} "
            f"+- {self.test_cold_std:.4f} over {len(self.seeds)} seeds "
            f"(pooled: {self.test_pooled_mean:.4f})",
            (
                f"  cross-seed split-R-hat {self.rhat_cold_max:.3f} "
                f"({self.verdict})"
                + (
                    " — point estimates replicable, weight-space posterior "
                    "not mixed at this budget; the per-seed bands above are "
                    "the honest uncertainty (results/convergence.md)"
                    if self.verdict == "metastable"
                    else ""
                )
            )
            if self.rhat_cold_max is not None
            else "  (single seed: no replication gate)",
            f"  {self.chain_steps_per_sec:,.0f} chain-steps/s"
            + (
                f", {self.pooled_cold_ess_per_sec:,.0f} pooled cold ESS/s "
                f"({self.ess_draws} draws x {cfg.n_ladders} cold chains)"
                if self.pooled_cold_ess_per_sec is not None
                else " (posterior trace skipped: see decisions)"
            ),
            f"  transport: {self.roundtrips_per_kstep:.1f} round trips/1k "
            f"steps, swap {self.swap_percent:.1f}%, accept "
            f"{self.accept_percent:.1f}%",
        ]
        if self.elpd_loo is not None:
            score = (
                f"  predictive score: elpd_loo {self.elpd_loo:.1f} "
                f"(Pareto k>0.7 on {self.loo_bad_k_frac * 100:.0f}% of "
                "points)"
            )
            if self.coverage_90 is not None:
                score += (
                    f", 5-95 band coverage {self.coverage_90 * 100:.1f}%, "
                    f"CRPS {self.crps:.4f}"
                )
            if self.ece is not None:
                score += f", ECE {self.ece:.3f}, Brier {self.brier:.3f}"
            lines.append(score)
        lines.append("  decisions:")
        lines += [f"    {k}: {v}" for k, v in self.decisions.items()]
        return "\n".join(lines)


def infer_topology(
    train: np.ndarray, test: np.ndarray, task: str, hidden: Optional[int]
) -> Tuple[int, int, int]:
    """(n_in, hidden, n_out) from the data's reference row format
    ``[features..., label]``. ``hidden`` defaults to max(10, n_in) — the
    envelope of the reference's per-dataset blocks (iris 12 @ 4 in,
    Ionosphere 50 @ 34 in, regression 10 @ 4 in)."""
    n_in = train.shape[1] - 1
    if n_in < 1:
        raise ValueError("need at least one feature column + a label column")
    if task == "regression":
        n_out = 1
    else:
        labels = np.concatenate([train[:, n_in], test[:, n_in]])
        if not np.allclose(labels, np.round(labels)):
            raise ValueError("classification labels must be integral")
        n_out = int(np.max(labels)) + 1
        if n_out < 2:
            raise ValueError("classification needs at least 2 classes")
    return (n_in, hidden if hidden is not None else max(10, n_in), n_out)


def _flagship_knobs(cfg: PTConfig, proposal: str, chees: bool) -> PTConfig:
    """The measured flagship sampler settings (bench.py variants mala /
    chees16_16x4): DEO even/odd swaps every 10 steps under the
    detailed-balance rule, Welford preconditioner frozen at burn-in,
    normalized-gradient warm start."""
    extra = {}
    if proposal == "hmc":
        extra = dict(hmc_leapfrog=16 if chees else 8, hmc_adapt_traj=chees,
                     step_w=0.01)
    return dataclasses.replace(
        cfg,
        proposal=proposal,
        adapt_rate=0.1,
        swap_style="even_odd",
        swap_interval=10,
        swap_rule="metropolis",
        swap_payload="untempered",
        warmstart_frac=0.1,
        precond_start_frac=0.3,
        **extra,
    )


def auto_config(
    train: np.ndarray,
    test: np.ndarray,
    task: str,
    *,
    hidden: Optional[int] = None,
    chain_budget: int = 64,
    steps_per_chain: int = 8000,
    target: str = "quality",
    maxtemp: Optional[float] = None,
    pilot_steps_per_chain: int = 2000,
    tune_rounds: int = 2,
    seed: int = 0,
    mesh=None,
    model_spec=None,
) -> Tuple[PTConfig, tuning.TuneResult, Dict[str, str]]:
    """Measure, then decide: returns the production config, the pilot's
    tuning history, and the decision audit trail. See the module docstring
    for the policy; every branch records its reason in the returned dict."""
    if task not in ("regression", "classification"):
        raise ValueError("task must be 'regression' or 'classification'")
    if target not in ("quality", "speed"):
        raise ValueError("target must be 'quality' or 'speed'")
    if chain_budget < 4:
        raise ValueError("auto needs a chain budget of at least 4")
    decisions: Dict[str, str] = {}

    topology = infer_topology(train, test, task, hidden)
    decisions["topology"] = (
        f"{topology} (n_in/n_out from data columns; hidden "
        + ("user-specified)" if hidden is not None else "= max(10, n_in))")
    )
    if model_spec is not None:
        decisions["topology"] = (
            f"model_spec '{model_spec.name}' ({model_spec.w_size} params); "
            f"data columns {topology[0]}/{topology[2]}"
        )

    # endpoint: the reference's committed sweeps concentrate at maxtemp 5
    # (regression, Res_*) / 10 (classification, PT_Eval*); the tuner moves
    # every interior rung, so only the endpoint matters here
    mt = maxtemp if maxtemp is not None else (5.0 if task == "regression" else 10.0)
    decisions["maxtemp"] = (
        f"{mt} (user-specified endpoint)"
        if maxtemp is not None
        else f"{mt} (reference sweep convention for {task}; interior rungs "
        "are re-spaced by the measured barrier anyway)"
    )

    # pilot: K0 rungs, the rest of the budget as replicas — every replica
    # measures the same (K0-1)-pair profile, pooling cuts the estimator
    # variance ~R-fold at no extra wall-clock (tuning.tune_ladder)
    k0 = min(8, chain_budget)
    r0 = max(1, chain_budget // k0)
    pilot = _flagship_knobs(
        PTConfig(
            task=task,
            topology=topology,
            num_samples=k0 * r0 * pilot_steps_per_chain,
            num_chains=k0 * r0,
            n_ladders=r0,
            maxtemp=mt,
            swap_offset=0,
            record_w=False,
        ),
        proposal="precond_mala",
        chees=False,
    ).validate()
    tune = tuning.tune_ladder(
        pilot, train, test, rounds=tune_rounds,
        seeds=(seed,), mesh=mesh, model_spec=model_spec,
    )
    decisions["pilot"] = (
        f"{r0} x {k0}-rung ladders, {pilot_steps_per_chain} steps/chain, "
        f"{tune_rounds} feedback round(s); measured barrier "
        f"Lambda = {tune.barrier:.3f}"
    )

    # barrier -> rungs per ladder; budget -> independent replicas
    k_star = int(np.clip(tune.suggested_num_chains, 2, chain_budget))
    n_ladders = max(1, chain_budget // k_star)
    num_chains = n_ladders * k_star
    last = tune.history[-1]
    tuned = ladder_mod.barrier_tuned_temperatures(
        last.temperatures, last.pair_reject, n_out=k_star
    )
    decisions["ladder"] = (
        f"{k_star} rungs/ladder (barrier {tune.barrier:.3f} / 0.5 target "
        f"rejection per link, Syed et al. 2021), re-spaced at equal "
        f"barrier increments from the pilot profile"
    )
    decisions["ensemble"] = (
        f"{n_ladders} independent ladder(s) = {num_chains} chains from the "
        f"budget of {chain_budget} (chains are latency-free on-chip, "
        f"fnn_roofline.md; R cold chains' ESS adds, ladder_ensembles.md)"
    )

    chees = target == "quality" and n_ladders >= 2
    proposal = "hmc" if target == "quality" else "precond_mala"
    decisions["proposal"] = (
        "ChEES-adapted HMC (quality flagship, chees_study.md: beats every "
        "fixed trajectory length on RMSE and ESS/s at once)"
        if chees
        else (
            "preconditioned HMC, fixed L=8 (quality target but <2 replicas: "
            "ChEES needs cross-replica expectations)"
            if proposal == "hmc"
            else "preconditioned MALA (ESS/s flagship, BENCH: 8.6x RW at "
            "better RMSE)"
        )
    )

    # posterior-trace budget: pos_w is (steps, R_cold, w_size) float32 on
    # the host; past ~256 MB the tunnel fetch dominates (verify SKILL.md
    # "multi-GB device_get wedges") — skip it and report scalar metrics only
    w_size = (
        model_spec.w_size
        if model_spec is not None
        else int(np.prod(topology[:2]) + topology[1] * topology[2]
                 + topology[1] + topology[2])
    )
    w_bytes = 4 * w_size * n_ladders * steps_per_chain
    record_w = w_bytes <= 256 * 2**20
    decisions["posterior_trace"] = (
        f"cold-rung pos_w recorded ({w_bytes / 2**20:.0f} MiB host fetch)"
        if record_w
        else (
            f"SKIPPED: {w_size} params x {n_ladders} cold chains x "
            f"{steps_per_chain} steps = {w_bytes / 2**20:.0f} MiB exceeds "
            "the 256 MiB fetch budget; ESS/R-hat unavailable (scalar "
            "metrics only). Shorten steps_per_chain or reduce ladders to "
            "re-enable."
        )
    )

    cfg = _flagship_knobs(
        PTConfig(
            task=task,
            topology=topology,
            num_samples=num_chains * steps_per_chain,
            num_chains=num_chains,
            n_ladders=n_ladders,
            maxtemp=mt,
            custom_ladder=tuple(float(t) for t in tuned),
            swap_offset=0,
            # canonical PT: tempering held for the whole run — the tuned
            # ladder's profile assumes its rungs keep their temperatures
            # (the reference's 60% switch collapses every rung to T=1,
            # which is a different algorithm; classification_preset
            # canonical=True documents the same choice)
            pt_phase_frac=2.0,
            record_w=record_w,
            # cold rungs only: the posterior at any chain count without
            # hauling hot-rung traces to host
            record_w_chains=n_ladders if record_w else 0,
            track_replicas=True,
        ),
        proposal=proposal,
        chees=chees,
    ).validate()

    # fused Pallas blocks when the config qualifies (ptnn/fused.py:
    # RW/MALA both tasks, HMC/ChEES regression within one 128-lane block);
    # dispatch re-checks shapes at runtime and falls back transparently
    from ptnn import fused as fused_mod

    try:  # validate() pre-rejects statically-unsupported fused configs
        reason = fused_mod.fused_reason(
            dataclasses.replace(cfg, fused_step=True).validate(),
            mesh=mesh,
            model_spec=model_spec,
        )
    except ValueError as e:
        reason = str(e)
    if reason is None:
        cfg = dataclasses.replace(cfg, fused_step=True).validate()
        decisions["execution"] = (
            "fused Pallas blocks (one kernel per DEO interval amortizes the "
            "per-step dispatch floor; ~1.5-2.4x steps/s, fnn_roofline.md)"
        )
    else:
        decisions["execution"] = f"per-step sampler ({reason})"
    return cfg, tune, decisions


def auto_sample(
    train: np.ndarray,
    test: np.ndarray,
    task: str,
    *,
    replicate: int = 3,
    seed: int = 0,
    mesh=None,
    model_spec=None,
    out: Optional[str] = None,
    name: str = "auto",
    escalate: int = 0,
    **config_kw,
) -> AutoReport:
    """Auto-configure (``auto_config``), then run ``replicate`` independently
    seeded executions of the one compiled program and report quality,
    effective-sample economics, transport, and the cross-seed convergence
    gate. ``out`` additionally writes ``auto_report.txt`` plus the full
    reference artifact tree for the LAST seed's run (cold-rung pos_w +
    ``config.json``, so ``python -m ptnn.predict --run <out>/<name>_0``
    serves the posterior directly).

    ``escalate=K`` makes the pipeline ACT on its own convergence gate
    (VERDICT r4 item 3): when the cross-seed function-space R-hat fails
    the 1.01 bar, the step budget doubles (``record_thin`` doubles with
    it, so recorded trace rows — and the host fetch — stay flat) and the
    replications re-run, up to K doublings. Every escalation lands in the
    decision trail with the R-hat that drove it, and a still-failing gate
    after K doublings is reported as ``budget-capped`` rather than
    blendable with a converged verdict. Escalated configs drop
    ``track_replicas`` (``record_thin`` strides below swap resolution);
    round trips are reported from the base-budget runs."""
    from ptnn import results as results_mod
    from ptnn import sampler as sampler_mod

    cfg, tune, decisions = auto_config(
        train, test, task, seed=seed, mesh=mesh, model_spec=model_spec,
        **config_kw
    )
    is_reg = task == "regression"
    key = "rmse_test" if is_reg else "acc_test"
    seeds = tuple(range(seed, seed + max(1, replicate)))

    def _replications(cfg):
        cold_idx = np.arange(0, cfg.num_chains, cfg.rungs_per_ladder)
        colds, pooled, cold_m, sps, trips = [], [], [], [], []
        swap_pct, acc_pct, elapsed = [], [], 0.0
        res = None
        for s in seeds:
            res = sampler_mod.sample(
                cfg, train, test, seed=s, mesh=mesh, model_spec=model_spec
            )
            # burn-in from the RECORDED rows (record_thin strides them)
            b = int(res.traces[key].shape[0] * cfg.burn_in)
            if cfg.record_w:
                # traces["w"] carries exactly the R cold rungs
                # (record_w_chains)
                colds.append(np.asarray(res.traces["w"][b:, :, :]))
            pooled.append(float(np.mean(res.traces[key][b:, :])))
            cold_m.append(float(np.mean(res.traces[key][b:, cold_idx])))
            sps.append(res.chain_steps_per_sec)
            if cfg.track_replicas:
                trips.append(
                    rt_mod.roundtrip_stats(
                        res.traces["replica"], n_ladders=cfg.n_ladders
                    ).rate_per_kstep
                )
            swap_pct.append(res.swap_percent)
            acc_pct.append(
                float(np.mean(res.accept_ratio_per_chain))
            )
            elapsed += res.elapsed_s
        return dict(
            colds=colds, pooled=pooled, cold_m=cold_m, sps=sps,
            trips=trips, swap_pct=swap_pct, acc_pct=acc_pct,
            elapsed=elapsed, res=res,
        )

    def _gate(colds, cfg):
        # THE gate is function-space AND pooled: forward every recorded
        # cold draw (ALL R cold replicas per seed, time-major so split
        # halves = early-vs-late) at 16 test inputs and R-hat the
        # predictions across seeds — the POOLED cold posterior is what
        # auto serves, and w-space R-hat conflates weight-symmetry
        # multimodality with predictive disagreement
        # (results/convergence_definitive.md: w 1.4-2.5 vs function-space
        # 1.004 on converged runs). Custom model specs (CNN/MLP) ride the
        # same gate via spec.forward (r5 — the CNN's parameter-space 2.85
        # was the same weight-symmetry pessimism).
        return ess_mod.function_space_rhat(
            colds, test, cfg, spec=model_spec
        )

    m = _replications(cfg)
    rhat = None
    if m["colds"] and len(seeds) >= 2:
        rhat = _gate(m["colds"], cfg)
    base_trips = list(m["trips"])
    attempts = 0
    capped = False
    while (
        rhat is not None
        and rhat >= 1.01
        and attempts < max(0, escalate)
    ):
        attempts += 1
        new_cfg = dataclasses.replace(
            cfg,
            num_samples=cfg.num_samples * 2,
            record_thin=cfg.record_thin * 2,
            track_replicas=False,
        ).validate()
        decisions[f"escalation_{attempts}"] = (
            f"fn-space R-hat {rhat:.3f} >= 1.01 at "
            f"{cfg.samples_per_chain} steps/chain -> doubling to "
            f"{new_cfg.samples_per_chain} (record_thin="
            f"{new_cfg.record_thin} keeps trace rows and the host fetch "
            "flat)"
        )
        cfg = new_cfg
        m = _replications(cfg)
        rhat = _gate(m["colds"], cfg) if m["colds"] else None
    if rhat is not None and rhat >= 1.01 and escalate > 0:
        capped = True
    colds, pooled, cold_m = m["colds"], m["pooled"], m["cold_m"]
    sps, swap_pct, acc_pct = m["sps"], m["swap_pct"], m["acc_pct"]
    trips = base_trips if base_trips else m["trips"]
    elapsed, res = m["elapsed"], m["res"]

    # pooled cold ESS x per-chain STEP rate -> effective samples per second
    # (bench.py convention; record_thin>1 means each recorded draw spent
    # `thin` chain steps, so the denominator scales by it)
    sps_med = float(np.median(sps))
    ess_s = None
    draws = 0
    verdict = "unreplicated"
    if colds:
        ess = float(np.median([
            ess_mod.pooled_multi_ess(c, max_params=16) for c in colds
        ]))
        draws = colds[0].shape[0]
        ess_s = (ess / (draws * cfg.record_thin)) * (
            sps_med / cfg.num_chains
        )
        if len(seeds) >= 2:
            verdict = (
                "mixed" if rhat < 1.01
                else ("marginal" if rhat < 1.1 else "metastable")
            )
            if capped:
                verdict += (
                    f" (budget-capped: gate still failing after "
                    f"{attempts} escalation(s) to "
                    f"{cfg.samples_per_chain} steps/chain)"
                )
            elif attempts:
                verdict += f" (after {attempts} budget escalation(s))"
    elif len(seeds) >= 2:
        verdict = "unavailable (posterior trace skipped)"

    # serving-quality scoring on the last seed's pooled cold draws
    elpd = badk = cov = crps_v = ece_v = brier_v = None
    if colds and model_spec is None:
        from ptnn import predict as predict_mod
        from ptnn.ops import calibrate as cal_mod
        from ptnn.ops import ic as ic_mod

        nx = cfg.topology[0]
        x_tr, y_tr = train[:, :nx], train[:, nx]
        x_te, y_te = test[:, :nx], test[:, nx]
        dr = colds[-1].reshape(-1, colds[-1].shape[-1])
        dr = dr[:: max(dr.shape[0] // 1000, 1)]
        lo = ic_mod.psis_loo(ic_mod.pointwise_log_lik(cfg, dr, x_tr, y_tr))
        elpd = float(lo["elpd_loo"])
        badk = float(np.mean(lo["pareto_k"] > 0.7))
        if is_reg:
            full = predict_mod.posterior_predict(
                cfg, dr, x_te, noise="conditional", cond=(x_tr, y_tr),
                return_samples=True,
            )
            cov = cal_mod.coverage(y_te, full["low"], full["high"])
            crps_v = cal_mod.crps(full["samples"], y_te)["mean"]
        else:
            pr = predict_mod.posterior_predict(cfg, dr, x_te)
            yl = y_te.astype(np.int64)
            ece_v = cal_mod.ece(pr["probs"], yl)["ece"]
            brier_v = cal_mod.brier(pr["probs"], yl)
        decisions["predictive_score"] = (
            f"PSIS-LOO + calibration on {dr.shape[0]} pooled cold draws "
            "(last seed; ops/ic.py, ops/calibrate.py)"
        )
    elif colds:
        decisions["predictive_score"] = (
            "skipped: custom model_spec (pointwise log-lik builder covers "
            "the reference FNN family)"
        )

    report = AutoReport(
        config=cfg,
        tune=tune,
        decisions=decisions,
        rhat_cold_max=rhat,
        verdict=verdict,
        test_pooled_mean=float(np.mean(pooled)),
        test_pooled_std=float(np.std(pooled)),
        test_cold_mean=float(np.mean(cold_m)),
        test_cold_std=float(np.std(cold_m)),
        chain_steps_per_sec=sps_med,
        pooled_cold_ess_per_sec=None if ess_s is None else float(ess_s),
        ess_draws=draws,
        roundtrips_per_kstep=float(np.mean(trips)) if trips else 0.0,
        swap_percent=float(np.mean(swap_pct)),
        accept_percent=float(np.mean(acc_pct)),
        elapsed_s=elapsed,
        seeds=seeds,
        per_seed_cold=tuple(cold_m),
        elpd_loo=elpd,
        loo_bad_k_frac=badk,
        coverage_90=cov,
        crps=crps_v,
        ece=ece_v,
        brier=brier_v,
    )
    if out:
        os.makedirs(out, exist_ok=True)
        # serving-ready artifacts for the last seed: cold-rung pos_w +
        # config.json -> ptnn.predict loads/serves it with no re-specification
        run_dir = results_mod.versioned_dir(out, name)
        results_mod.write_artifacts(res, run_dir, name, plots=False)
        with open(os.path.join(out, "auto_report.txt"), "w") as f:
            f.write(report.describe() + "\n")
            f.write(
                "# per-seed cold test metric: "
                + " ".join(f"{v:.5f}" for v in report.per_seed_cold)
                + "\n# tuned ladder: "
                + " ".join(f"{t:.4f}" for t in cfg.custom_ladder)
                + f"\n# artifacts (last seed): {run_dir}\n"
            )
    return report


def main(argv: Optional[Sequence[str]] = None) -> None:
    import argparse

    from ptnn import data as data_mod

    p = argparse.ArgumentParser(
        description="Auto-configured PT sampling of a bundled dataset"
    )
    p.add_argument("dataset", help="bundled set, e.g. Sunspot or iris")
    p.add_argument("--target", choices=("quality", "speed"), default="quality")
    p.add_argument("--chains", type=int, default=64, help="chain budget")
    p.add_argument("--steps", type=int, default=8000, help="steps per chain")
    p.add_argument("--replicate", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--hidden", type=int, default=None)
    p.add_argument(
        "--model", choices=("fnn", "cnn", "mlp"), default="fnn",
        help="cnn: the Bayesian CNN spec (digits/mnist data); mlp: a deep "
        "MLP stack (--mlp-hidden, conventional formulation — not the "
        "reference's quirk-faithful FNN)",
    )
    p.add_argument(
        "--mlp-hidden", type=int, nargs="+", default=[32, 16],
        help="hidden-layer sizes for --model mlp",
    )
    p.add_argument(
        "--escalate", type=int, default=0, metavar="K",
        help="act on the convergence gate: when the cross-seed "
        "function-space R-hat fails 1.01, double the step budget "
        "(record_thin keeps trace rows flat) and re-run, up to K "
        "doublings; a still-failing gate reports budget-capped",
    )
    p.add_argument("--out", default=None)
    a = p.parse_args(argv)

    prob = data_mod.load(a.dataset, seed=a.seed)
    spec = None
    if a.model == "cnn":
        from ptnn.models import cnn

        spec = cnn.mnist_spec() if prob.topology[0] == 784 else cnn.digits_spec()
    elif a.model == "mlp":
        from ptnn.models import mlp

        n_in, _, n_out = infer_topology(
            prob.train, prob.test, prob.task, None
        )
        spec = mlp.spec(
            (n_in, *a.mlp_hidden, n_out if prob.task == "classification" else 1),
            task=prob.task,
        )
    t0 = time.time()
    report = auto_sample(
        prob.train,
        prob.test,
        prob.task,
        chain_budget=a.chains,
        steps_per_chain=a.steps,
        target=a.target,
        replicate=a.replicate,
        seed=a.seed,
        hidden=a.hidden,
        model_spec=spec,
        out=a.out,
        name=prob.name,
        escalate=a.escalate,
    )
    print(report.describe())
    print(f"total wall-clock (pilot + {a.replicate} runs): "
          f"{time.time() - t0:.1f} s")


if __name__ == "__main__":
    main()
