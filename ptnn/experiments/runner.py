"""Shared experiment runner: dataset -> config -> sample -> artifacts."""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional

from ptnn import sample
from ptnn.config import PTConfig
from ptnn.data import Problem, load
from ptnn.parallel import mesh as mesh_mod
from ptnn import results as results_mod


def _function_space_rhat(colds, prob, cfg, n_points: int = 16) -> float:
    """Back-compat shim: the replication gate lives at
    ``ptnn.ops.ess.function_space_rhat`` (takes the test matrix directly,
    gates ALL output dimensions)."""
    from ptnn.ops import ess as ess_mod

    return ess_mod.function_space_rhat(colds, prob.test, cfg, n_points)


def run_problem(
    prob: Problem,
    cfg: PTConfig,
    outdir: str,
    seed: int = 0,
    plots: bool = True,
    use_mesh: bool = False,
    master_fmt: str = "%1.4f",
    truepos: bool = False,
    evidence: bool = False,
    roundtrip: bool = False,
    replicate: int = 0,
    vr_rounds: int = 0,
) -> results_mod.Summary:
    """One full experiment: sample, write the artifact tree into an
    auto-versioned ``<outdir>/<name>_<n>`` directory, append the master row.

    ``evidence=True`` additionally records the per-rung state likelihood and
    writes ladder marginal-likelihood estimates (ops/evidence.py) to
    ``<path>/evidence.txt``.  ``roundtrip=True`` tracks replica identities
    through swaps and writes transport diagnostics (round-trip rate +
    Katzgraber up-flow per rung, ops/roundtrip.py) to
    ``<path>/roundtrip.txt``.  ``replicate=S`` (S >= 2) additionally runs S
    independently-seeded replications (one compile, S executions) and
    writes cross-seed convergence diagnostics to ``<path>/replication.txt``
    — the honest mixing gate: within-run ESS cannot see metastability, S
    independent runs can (results/convergence.md)."""
    os.makedirs(outdir, exist_ok=True)
    mesh = None
    if use_mesh:
        import jax

        if jax.device_count() > 1:
            mesh = mesh_mod.make_mesh()
    if evidence:
        cfg = dataclasses.replace(cfg, record_ll_state=True).validate()
    if roundtrip:
        cfg = dataclasses.replace(cfg, track_replicas=True).validate()
    t0 = time.time()
    rr = None
    if vr_rounds > 0 and replicate >= 2:
        raise ValueError(
            "--replicate with --vr-rounds is not wired: the replication "
            "loop re-samples without the adapted reference. Run S rounds "
            "invocations with different --seed instead."
        )
    if vr_rounds > 0:
        # round-based reference-and-schedule adaptation (ptnn/rounds.py):
        # the returned result is the final round, exactly Markov under its
        # constant (static) reference; history goes to rounds_history.md
        from ptnn import rounds as rounds_mod

        rr = rounds_mod.run_rounds(
            cfg, prob.train, prob.test, seed=seed, n_rounds=vr_rounds,
            mesh=mesh, verbose=True,
        )
        res, cfg = rr.result, rr.config
    else:
        res = sample(cfg, prob.train, prob.test, seed=seed, mesh=mesh)
    path = results_mod.versioned_dir(outdir, prob.name)
    if rr is not None:
        from ptnn import rounds as rounds_mod

        with open(os.path.join(path, "rounds_history.md"), "w") as f:
            f.write(rounds_mod.format_history(rr.history) + "\n")
    summary = results_mod.write_artifacts(res, path, prob.name, plots=plots)
    if truepos:
        # "true posterior" reporting: cold chain only
        # (Misc_code/pt_classifier_truepos.py semantics)
        summary = results_mod.summarize(res, prob.name, cold_only=True)
    # wall time includes artifact IO, like the reference's timer bracket
    summary.time_min = (time.time() - t0) / 60.0
    run_name = os.path.basename(path)
    results_mod.append_master_row(
        os.path.join(outdir, "master_result_file.txt"), summary, run_name, master_fmt
    )
    if evidence:
        from ptnn.ops import evidence as ev_mod

        est = ev_mod.from_result(res)
        with open(os.path.join(path, "evidence.txt"), "w") as f:
            f.write(
                "# ladder evidence difference log Z(beta_max) - log Z(beta_min)\n"
                f"ti {est.log_z_ti:.6f}\nss {est.log_z_ss:.6f}\n"
                + (
                    # corrected-path run anchored at the analytic beta=0
                    # normalizer: absolute log marginal likelihood
                    f"log_z0 {est.log_z0:.6f}\n"
                    f"abs_ti {est.log_z_abs_ti:.6f}\n"
                    f"abs_ss {est.log_z_abs_ss:.6f}\n"
                    if est.anchored
                    else ""
                )
                + f"window {est.window[0]} {est.window[1]}\n"
                "# beta  mean_integrand\n"
                + "".join(
                    f"{b:.6f} {m:.6f}\n"
                    for b, m in zip(est.betas, est.mean_ll)
                )
            )
        if est.anchored:
            print(
                f"[{prob.name}] ABSOLUTE log-evidence (corrected path, "
                f"analytic beta=0 anchor {est.log_z0:.2f}): "
                f"TI {est.log_z_abs_ti:.2f} SS {est.log_z_abs_ss:.2f} "
                f"({est.n_samples} frozen-path draws/rung)"
            )
        else:
            print(
                f"[{prob.name}] ladder log-evidence diff: TI {est.log_z_ti:.2f} "
                f"SS {est.log_z_ss:.2f} over beta [{est.betas[0]:.3f}, "
                f"{est.betas[-1]:.3f}] ({est.n_samples} tempered draws/rung)"
            )
    if roundtrip:
        from ptnn.ops import roundtrip as rt_mod

        stats = rt_mod.roundtrip_stats(
            res.traces["replica"], n_ladders=cfg.n_ladders
        )
        with open(os.path.join(path, "roundtrip.txt"), "w") as f:
            f.write(rt_mod.format_report(stats, temps=res.temperatures) + "\n")
        print(
            f"[{prob.name}] replica transport: "
            f"{int(stats.round_trips.sum())} round trips "
            f"({stats.rate_per_kstep:.2f}/1k steps), swap% alone would say "
            f"{summary.swap_perc:.1f}"
        )
    if res.vr_regen_accept_pct is not None:
        print(
            f"[{prob.name}] variational reference: hot-rung regen "
            f"{res.vr_regen_accept_pct:.1f}% accepted "
            f"({res.vr_regen_proposed} proposed)"
        )
    if replicate >= 2:
        import numpy as np

        from ptnn.ops import ess as ess_mod

        # cold-chains-only pos_w traces keep the host fetch small at any
        # chain count (ALL cold rungs under replicated ladders — the gate
        # below scores the POOLED cold posterior the run serves);
        # everything else inherits the experiment config
        rep_cfg = dataclasses.replace(
            cfg, record_w=True,
            record_w_chains=max(1, cfg.n_ladders), record_fx=False,
        ).validate()
        b = int(rep_cfg.samples_per_chain * rep_cfg.burn_in)
        colds, pooled, cold_m = [], [], []
        for s in range(replicate):
            r = sample(rep_cfg, prob.train, prob.test, seed=seed + s, mesh=mesh)
            colds.append(np.asarray(r.traces["w"][b:, :, :]))
            pooled.append(float(np.mean(r.traces["rmse_test"][b:, :])))
            cold_m.append(float(np.mean(r.traces["rmse_test"][b:, 0])))
        # worst rank-normalized split R-hat over sampled parameters, the S
        # seed runs stacked as chains of the same cold posterior
        pidx = np.linspace(0, colds[0].shape[-1] - 1, 8).astype(int)
        rhat_w = max(
            ess_mod.split_rhat(
                np.stack(
                    [c.reshape(-1, c.shape[-1])[:, j] for c in colds], axis=1
                )
            )
            for j in pidx
        )
        # THE gate is function-space: forward every cold draw at 16 spread
        # test inputs and R-hat the predictions. w-space R-hat conflates
        # weight-symmetry multimodality with predictive disagreement —
        # results/convergence_definitive.md measured w-space 1.4-2.5 on
        # runs whose predictive posterior agrees to R-hat 1.004
        rhat = _function_space_rhat(colds, prob, cfg)
        with open(os.path.join(path, "replication.txt"), "w") as f:
            f.write(
                f"# {replicate} independent replications, seeds "
                f"{seed}..{seed + replicate - 1}; post-burn-in rows {b}..\n"
                "# rhat_cold_max is the FUNCTION-SPACE gate (predictions at "
                "16 test inputs);\n# rhat_w_max is the raw-parameter R-hat, "
                "kept as a symmetry/metastability diagnostic\n"
                f"rhat_cold_max {rhat:.4f}\n"
                f"rhat_fn_max {rhat:.4f}\n"
                f"rhat_w_max {rhat_w:.4f}\n"
                f"test_pooled_mean {np.mean(pooled):.6f}\n"
                f"test_pooled_std {np.std(pooled):.6f}\n"
                f"test_cold_mean {np.mean(cold_m):.6f}\n"
                f"test_cold_std {np.std(cold_m):.6f}\n"
                "# per-seed: seed pooled cold\n"
                + "".join(
                    f"{seed + s} {pooled[s]:.6f} {cold_m[s]:.6f}\n"
                    for s in range(replicate)
                )
            )
        verdict = (
            "mixed"
            if rhat < 1.01
            else ("marginal" if rhat < 1.1 else "metastable")
        )
        print(
            f"[{prob.name}] replication x{replicate}: cross-seed "
            f"split-R-hat {rhat:.3f} ({verdict}; <1.01 = mixed, "
            f"results/convergence.md), test {np.mean(pooled):.4f} "
            f"+- {np.std(pooled):.4f}"
        )
    print(
        f"[{prob.name}] test_mean={summary.test_mean:.4f} "
        f"test_best={summary.test_best:.4f} swap%={summary.swap_perc:.2f} "
        f"accept%={summary.accept_per:.2f} "
        f"({res.chain_steps_per_sec:,.0f} chain-steps/s) -> {path}"
    )
    return summary
