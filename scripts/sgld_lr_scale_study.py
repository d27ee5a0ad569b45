"""Measure what per-rung step scaling buys reSGLD (PTConfig.sg_lr_scale).

The reSGLD line (Deng et al. 2020; PAPERS.md arxiv 2301.01898) runs the
high-temperature chain at a larger learning rate than the cold one —
exploration where discretization bias is cheap, small exact-minded steps on
the rung that feeds the posterior. ``sg_lr_scale="temperature"`` generalizes
that to the whole ladder (eps_k = sg_step * T_k). This script quantifies the
effect on Sunspot under the corrected+SVRG swap test: swap acceptance,
actual replica transport (round trips), and cold-rung quality, 3 seeds per
arm, writing results/sgld_lr_scale.md.

Usage: python scripts/sgld_lr_scale_study.py [--steps 4000] [--seeds 3]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np

import ptnn
from ptnn.data import load_regression
from ptnn.ops.roundtrip import roundtrip_stats


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=4000)
    p.add_argument("--seeds", type=int, default=3)
    p.add_argument("--out", default="results/sgld_lr_scale.md")
    args = p.parse_args()

    prob = load_regression("Sunspot")
    base = dict(
        task="regression", topology=(4, 10, 1),
        num_samples=8 * args.steps, num_chains=8, maxtemp=5.0,
        swap_interval=10, swap_offset=0, swap_payload="untempered",
        swap_rule="metropolis", swap_style="even_odd", pt_phase_frac=2.0,
        proposal="sgld", sg_batch=32, sg_step=2e-5, sg_swap="corrected",
        sg_vr=True, sg_anchor_interval=20, track_replicas=True,
        chunk_steps=500,
    )
    lines = [
        "# reSGLD per-rung step scaling (sg_lr_scale) — Sunspot",
        "",
        f"8 chains, maxtemp 5, B=32, corrected+SVRG swaps every 10 steps, "
        f"{args.steps} steps/chain, {args.seeds} seeds per arm. Generated "
        "by scripts/sgld_lr_scale_study.py.",
        "",
        "| arm | swap % | round trips/kstep | cold RMSE |",
        "|---|---|---|---|",
    ]
    for mode in ("none", "temperature"):
        rows = []
        for seed in range(args.seeds):
            cfg = ptnn.PTConfig(**base, sg_lr_scale=mode).validate()
            res = ptnn.sample(cfg, prob.train, prob.test, seed=seed)
            b = cfg.samples_per_chain // 2
            rows.append((
                res.swap_percent,
                roundtrip_stats(res.traces["replica"]).rate_per_kstep,
                float(np.mean(res.traces["rmse_test"][b:, 0])),
            ))
            print(mode, seed, rows[-1], flush=True)
        a = np.asarray(rows)
        lines.append(
            "| {} | {:.1f} ± {:.1f} | {:.2f} ± {:.2f} | {:.4f} ± {:.4f} |"
            .format(
                mode,
                a[:, 0].mean(), a[:, 0].std(),
                a[:, 1].mean(), a[:, 1].std(),
                a[:, 2].mean(), a[:, 2].std(),
            )
        )
    lines.append("")
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
