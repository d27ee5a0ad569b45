"""Time-to-convergence: worst-parameter split-R-hat vs sampling budget.

bench.py's new ``rhat_cold_max`` gate showed that at the REFERENCE budget
(8k steps/chain) no proposal mode reaches the R-hat < 1.01 convergence bar
(rw 2.07, mala 1.53) — the reference-scale budget itself leaves per-
parameter posteriors unconverged, something the reference (with no
diagnostic beyond eyeballed trace plots, SURVEY.md §4) could never see.
This script answers the follow-up a practitioner needs: how many seconds
of TPU time until the bar IS met?

For each budget it runs 3 independent seeds of the Sunspot 64-chain
config (same variants as bench.py), fetches the cold chain's weight trace
(``record_w_chains=1`` — the (steps, 61) cold trace stays MB-scale on the
tunneled link), and reports the worst rank-normalized split-R-hat across
sampled parameters + the cold-chain multi-ESS and median wall time.

    python scripts/convergence_curve.py [--budgets 8000,32000,128000]
                                        [--modes rw,mala]

Writes a markdown table to stdout (committed as results/convergence.md).
"""

from __future__ import annotations

import dataclasses
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main() -> None:
    import ptnn
    from ptnn.data import load_regression
    from ptnn.ops import ess as ess_mod

    sys.path.insert(0, ".")
    from bench import _variants

    budgets = [
        int(x)
        for x in next(
            (a.split("=")[1] for a in sys.argv if a.startswith("--budgets=")),
            "8000,32000,128000",
        ).split(",")
    ]
    modes = next(
        (a.split("=")[1] for a in sys.argv if a.startswith("--modes=")),
        "rw,mala",
    ).split(",")
    prob = load_regression("Sunspot")
    chains = 64

    print("| mode | steps/chain | wall s/seed (med) | worst R-hat "
          "| cold ESS | ESS/s |")
    print("|---|---|---|---|---|---|")
    for steps in budgets:
        variants = _variants(chains, steps_per_chain=steps)
        for mode in modes:
            cfg = dataclasses.replace(
                variants[mode],
                num_samples=chains * steps,
                record_w=True,
                record_w_chains=1,
                chunk_steps=1000,
            ).validate()
            colds, walls = [], []
            for seed in (1, 2, 3):
                t0 = time.time()
                res = ptnn.sample(cfg, prob.train, prob.test, seed=seed)
                walls.append(time.time() - t0)
                colds.append(np.asarray(res.traces["w"][steps // 2:, 0, :]))
            pidx = np.linspace(0, colds[0].shape[1] - 1, 8).astype(int)
            rhat = max(
                ess_mod.split_rhat(
                    np.stack([c[:, j] for c in colds], axis=1)
                )
                for j in pidx
            )
            e = float(np.mean([ess_mod.multi_ess(c, max_params=16) for c in colds]))
            wall = float(np.median(walls))
            print(
                f"| {mode} | {steps:,} | {wall:.1f} | {rhat:.3f} "
                f"| {e:.0f} | {e / wall:.0f} |",
                flush=True,
            )


if __name__ == "__main__":
    main()
