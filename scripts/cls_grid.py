"""Classification parity tables as vmapped envelope grids (BASELINE.json
config 4, classification half — sweeps.classification_grid).

Where `scripts/cls_bands.py` launched one vmapped 5-seed program PER
(dataset, mode) cell, this pads the datasets to a topology envelope
(features x hidden x classes + row masks + parameter masks) so a whole
parity table runs as ONE compiled program:

  RW table  : all 6 committed datasets x 5 seeds = 30 cells, one launch.
  LG table  : two launches split by drift mode, matching cls_bands'
              documented modes — the small sets (iris/Ionosphere/Cancer)
              keep the reference's literal per-sample sequential epoch;
              the big sets (bank/PenDigit/chess) use the fused batch drift
              (the sequential scan would be a multi-hour serial chain; the
              deviation is footnoted in PARITY.md).

Reference tables being reproduced:
  multicore-pt-classification/PT_EvalSwapRW/master_result_file.txt
  multicore-pt-classification/PT_EvalSwapLG/master_result_file.txt

    python scripts/cls_grid.py [--mode rw|lg] [--bucket small|big|all]
                               [--seeds N] [--samples N] [--chunk N]
"""

from __future__ import annotations

import dataclasses
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import ptnn
from ptnn import sweeps
from ptnn.data import load_classification

SMALL = ["iris", "Ionosphere", "Cancer"]
BIG = ["bank-additional", "PenDigit", "chess"]

# PT_EvalSwapRW / PT_EvalSwapLG committed rows: name -> (test mean, test max)
REF = {
    "rw": {
        "iris": (50.18, 100.0), "Ionosphere": (51.29, 91.74),
        "Cancer": (83.55, 99.52), "bank-additional": (77.49, 79.45),
        "PenDigit": (71.93, 90.62), "chess": (90.06, 100.0),
    },
    "lg": {
        "iris": (96.76, 99.10), "Ionosphere": (92.19, 98.17),
        "Cancer": (98.77, 99.52), "bank-additional": (79.96, 82.61),
        "PenDigit": (81.24, 91.25), "chess": (100.0, 100.0),
    },
}


def arg(flag: str, default: str) -> str:
    return next(
        (sys.argv[i + 1] for i, a in enumerate(sys.argv) if a == flag),
        default,
    )


def run_bucket(names, mode: str, seeds, samples: int, chunk: int, drift: str):
    cfg = dataclasses.replace(
        ptnn.classification_preset(
            (1, 1, 1), num_samples=samples, legacy_lg=(mode == "lg")
        ),
        chunk_steps=chunk,
        drift_mode=drift,
    )
    t0 = time.time()
    out = sweeps.classification_grid(cfg, names, seeds=seeds)
    wall = (time.time() - t0) / 60.0
    rows = []
    for name in names:
        idx = [i for i, (n, _s) in enumerate(out["cells"]) if n == name]
        mean = out["test_mean"][idx]
        best = out["test_best"][idx]
        ref_m, ref_b = REF[mode][name]
        mm, ms = float(np.mean(mean)), float(np.std(mean))
        bm, bs = float(np.mean(best)), float(np.std(best))
        flag_m = "" if abs(ref_m - mm) <= 2 * max(ms, 1e-9) else " **ref outside ±2σ**"
        flag_b = "" if abs(ref_b - bm) <= 2 * max(bs, 1e-9) else " **ref outside ±2σ**"
        rows.append(
            f"| {name} | {mm:.2f}±{ms:.2f} / {ref_m:.2f}{flag_m} | "
            f"{bm:.2f}±{bs:.2f} / {ref_b:.2f}{flag_b} | "
            f"{np.mean(out['swap_pct'][idx]):.1f} | "
            f"{np.mean(out['accept_pct'][idx]):.1f} | {drift} |"
        )
    return rows, wall, len(out["cells"])


def main() -> None:
    mode = arg("--mode", "rw")
    bucket = arg("--bucket", "all")
    seeds = list(range(int(arg("--seeds", "5"))))
    samples = int(arg("--samples", "50000"))
    chunk = int(arg("--chunk", "500"))
    print(f"# classification grid mode={mode} bucket={bucket} "
          f"seeds={len(seeds)} samples={samples}")
    print("| dataset | test acc mean ours±σ / ref | max ours±σ / ref "
          "| swap% | accept% | drift |")
    print("|---|---|---|---|---|---|")
    total = 0.0
    if mode == "rw":
        names = {"small": SMALL, "big": BIG, "all": SMALL + BIG}[bucket]
        rows, wall, n = run_bucket(names, mode, seeds, samples, chunk, "sequential")
        for r in rows:
            print(r)
        total += wall
        print(f"# {n} cells in one launch, {wall:.2f} min", file=sys.stderr)
    else:
        buckets = {"small": [(SMALL, "sequential")], "big": [(BIG, "batch")],
                   "all": [(SMALL, "sequential"), (BIG, "batch")]}[bucket]
        for names, drift in buckets:
            rows, wall, n = run_bucket(names, mode, seeds, samples, chunk, drift)
            for r in rows:
                print(r)
            total += wall
            print(f"# {n} cells in one launch, {wall:.2f} min", file=sys.stderr)
    print(f"# total {total:.2f} min", file=sys.stderr)


if __name__ == "__main__":
    main()
