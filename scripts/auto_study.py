"""Regenerate results/auto_study.md's measurement rows in one command.

    python scripts/auto_study.py [--quick]

Runs the four auto-configured cases of the study (Sunspot/Lazer quality,
iris speed, digits-CNN speed) serially on the current backend and prints
the two markdown tables. ``--quick`` shrinks budgets ~10x for a smoke pass
(numbers then are NOT comparable to the committed study). Keep TPU runs
serial — do not launch anything else against the tunneled chip while this
runs (verify SKILL.md).
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--quick", action="store_true")
    p.add_argument("--replicate", type=int, default=3)
    p.add_argument(
        "--escalate", type=int, default=0,
        help="auto_sample budget-escalation cap (doublings when the "
        "fn-space gate fails; VERDICT r4 item 3)",
    )
    p.add_argument(
        "--only", nargs="+", default=None,
        help="subset of case names (Sunspot Lazer iris digits)",
    )
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcomp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from ptnn import auto
    from ptnn.data import load
    from ptnn.models import cnn

    steps = 800 if args.quick else 8000
    cnn_steps = 400 if args.quick else 2000
    pilot = 400 if args.quick else 2000
    cases = [
        ("Sunspot", "quality", None, steps),
        ("Lazer", "quality", None, steps),
        ("iris", "speed", None, steps),
        ("digits", "speed", cnn.digits_spec(), cnn_steps),
    ]
    rows = []
    for name, target, spec, n in cases:
        if args.only and name not in args.only:
            continue
        prob = load(name)
        t0 = time.time()
        rep = auto.auto_sample(
            prob.train,
            prob.test,
            prob.task,
            target=target,
            chain_budget=64,
            steps_per_chain=n,
            pilot_steps_per_chain=pilot,
            replicate=args.replicate,
            model_spec=spec,
            name=prob.name,
            escalate=args.escalate,
        )
        wall = time.time() - t0
        cfg = rep.config
        shape = (
            f"{cfg.n_ladders} ladders x {cfg.rungs_per_ladder} rungs, "
            f"{cfg.proposal}"
            + (" +ChEES" if cfg.hmc_adapt_traj else "")
            + (", fused" if cfg.fused_step else ", per-step")
        )
        metric = (
            f"RMSE {rep.test_cold_mean:.4f} ± {rep.test_cold_std:.4f}"
            if prob.task == "regression"
            else f"acc {rep.test_cold_mean:.2f} ± {rep.test_cold_std:.2f} %"
        )
        rows.append((name, target, shape, metric, wall, rep))
        print(f"[{name}] {shape} -> {metric} ({wall:.1f} s)", file=sys.stderr)
        for k in sorted(rep.decisions):
            if k.startswith("escalation_"):
                print(f"  {k}: {rep.decisions[k]}", file=sys.stderr)

    print("| dataset (target) | auto-chosen shape | cold test metric "
          f"({args.replicate} seeds) | wall |")
    print("|---|---|---|---|")
    for name, target, shape, metric, wall, _ in rows:
        print(f"| {name} ({target}) | {shape} | **{metric}** | {wall:.1f} s |")
    print()
    print("| dataset | barrier Λ | steps/s | pooled cold ESS/s | "
          "round trips/1k | swap% | R-hat |")
    print("|---|---|---|---|---|---|---|")
    for name, _, _, _, _, rep in rows:
        ess = (
            f"{rep.pooled_cold_ess_per_sec:,.0f}"
            if rep.pooled_cold_ess_per_sec is not None
            else "—"
        )
        rhat = (
            f"{rep.rhat_cold_max:.3f} ({rep.verdict})"
            if rep.rhat_cold_max is not None
            else rep.verdict
        )
        print(
            f"| {name} | {rep.tune.barrier:.3f} | "
            f"{rep.chain_steps_per_sec:,.0f} | {ess} | "
            f"{rep.roundtrips_per_kstep:.1f} | {rep.swap_percent:.1f} | "
            f"{rhat} |"
        )


if __name__ == "__main__":
    main()
