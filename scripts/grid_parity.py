"""Regenerate the Compare_Benchmark regression tables from ONE vmapped grid.

BASELINE.json config 4 delivered literally: all 7 bundled one-step-ahead
series x {RW, LG-0.01, LG-0.1} at the reference's full budget (100k samples,
10 chains, maxtemp 5, swap 100) as a single compiled program
(ptnn.sweeps.dataset_grid). Prints the three PARITY.md regression tables
with the committed reference columns (multicore-pt-regression/
Res_{RW,LG001,LG01}/master_result_file.txt via BASELINE.md) and the single
grid wall-clock.

    python scripts/grid_parity.py [--samples 100000] [--seed 0]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import ptnn
from ptnn import sweeps

# BASELINE.md committed rows: name -> (test_mean, test_best, swap%, accept%)
REF_RW = {
    "Lazer": (0.0565, 0.0270, 42.26, 35.32),
    "Sunspot": (0.0239, 0.0161, 44.46, 18.31),
    "Mackey": (0.0061, 0.0051, 42.11, 8.20),
    "Lorenz": (0.0171, 0.0094, 39.49, 14.48),
    "Rossler": (0.0175, 0.0148, 48.12, 12.53),
    "Henon": (0.1198, 0.0161, 48.59, 38.09),
    "ACFinance": (0.0144, 0.0130, 49.04, 17.58),
}
REF_LG001 = {
    "Lazer": 0.0414, "Sunspot": 0.0204, "Mackey": 0.0065, "Lorenz": 0.0147,
    "Rossler": 0.0173, "Henon": 0.0963, "ACFinance": 0.0146,
}
REF_LG01 = {
    "Lazer": 0.0353, "Sunspot": 0.0192, "Mackey": 0.0062, "Lorenz": 0.0157,
    "Rossler": 0.0175, "Henon": 0.0190, "ACFinance": 0.0146,
}
NAMES = list(REF_RW)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--samples", type=int, default=100_000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--chunk-steps", type=int, default=1000)
    args = p.parse_args(argv)

    cfg = ptnn.regression_preset(
        num_samples=args.samples, maxtemp=5.0, num_chains=10, swap_ratio=0.01
    )
    cfg = __import__("dataclasses").replace(cfg, chunk_steps=args.chunk_steps)
    t0 = time.time()
    out = sweeps.dataset_grid(cfg, NAMES, modes=("rw", "lg001", "lg01"),
                              seed=args.seed)
    wall = time.time() - t0
    cell = {c: i for i, c in enumerate(out["cells"])}

    print(f"\n# one vmapped launch, 21 cells, wall {wall/60:.2f} min\n")
    print("## Regression — RW (maxtemp 5, swap 100)\n")
    print("| dataset | test RMSE ours/ref | best ours/ref | swap% ours/ref | accept% ours/ref |")
    print("|---|---|---|---|---|")
    for n in NAMES:
        i = cell[(n, "rw")]
        r = REF_RW[n]
        print(
            f"| {n} | {out['test_mean'][i]:.4f} / {r[0]:.4f} | "
            f"{out['test_best'][i]:.4f} / {r[1]:.4f} | "
            f"{out['swap_pct'][i]:.1f} / {r[2]:.1f} | "
            f"{out['accept_pct'][i]:.1f} / {r[3]:.1f} |"
        )
    for mode, refs, lr in (("lg001", REF_LG001, 0.01), ("lg01", REF_LG01, 0.1)):
        print(f"\n## Regression — Langevin LG lr={lr} (maxtemp 5, swap 100, l_prob 0.5)\n")
        print("| dataset | test RMSE ours/ref | std | accept% |")
        print("|---|---|---|---|")
        for n in NAMES:
            i = cell[(n, mode)]
            print(
                f"| {n} | {out['test_mean'][i]:.4f} / {refs[n]:.4f} | "
                f"{out['test_std'][i]:.4f} | {out['accept_pct'][i]:.1f} |"
            )


if __name__ == "__main__":
    main()
