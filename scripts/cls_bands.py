"""Seed bands for the classification parity tables (VERDICT r2 item 3).

Each (dataset, mode) cell runs 5 seeds as ONE vmapped program
(ptnn.sweeps.seed_sweep) at the reference budget (50k samples, 10 chains),
printing mean±std bands next to the committed single-seed reference row and
flagging cells where the reference falls outside ±2σ.

    python scripts/cls_bands.py [datasets...] [--mode rw|lg]
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

# PT_EvalSwapRW / PT_EvalSwapLG committed rows: name -> (test mean, test max)
REF_RW = {
    "iris": (50.18, 100.0), "Ionosphere": (51.29, 91.74),
    "Cancer": (83.55, 99.52), "bank-additional": (77.49, 79.45),
    "PenDigit": (71.93, 90.62), "chess": (90.06, 100.0),
}
REF_LG = {
    "iris": (96.76, 99.10), "Ionosphere": (92.19, 98.17),
    "Cancer": (98.77, 99.52), "bank-additional": (79.96, 82.61),
    "PenDigit": (81.24, 91.25), "chess": (100.0, 100.0),
}
SEEDS = [0, 1, 2, 3, 4]


BIG = ("Cancer", "bank-additional", "PenDigit", "chess")


def band(name: str, legacy: bool) -> str:
    prob = load_classification(name, seed=0)
    # Big sets + LG: the literal per-sample epoch as a lax.scan is a
    # multi-10M-iteration serial scan (hours: per-iteration dispatch
    # dominates), and r3's bands substituted batch drift (PARITY.md +).
    # The Pallas drift kernel (ops/pallas_drift.py) runs the SAME
    # sequential delta-rule epoch VMEM-resident — the strict-parity
    # sampler at ~10-30x the scan — so the full-budget bands now use the
    # reference's actual drift. Seeds run as separate chunked launches
    # (not one vmapped sweep) to keep every XLA execution under the
    # tunneled worker's 60-90 s cap.
    pallas_cell = legacy and name in BIG
    cfg = dataclasses.replace(
        ptnn.classification_preset(
            prob.topology, num_samples=50_000, legacy_lg=legacy
        ),
        record_w=False,
        # fewer chunk executables: each compile is ~35 s of 1-core host
        # lowering; 3000-step chunks split the run at just the temper switch
        chunk_steps=int(next(
            (a.split("=")[1] for a in sys.argv if a.startswith("--chunk=")),
            250 if pallas_cell else 3000,
        )),
        drift_mode="pallas" if pallas_cell else "sequential",
    )
    t0 = time.time()
    if pallas_cell:
        import numpy as _np

        # seed_sweep's accumulator keeps rows with i >= burnin - 1
        cold = int(cfg.samples_per_chain * cfg.burn_in) - 1
        accs_m, accs_b, swaps, accepts = [], [], [], []
        for seed in SEEDS:
            res = ptnn.sample(cfg, prob.train, prob.test, seed=seed)
            post = res.traces["acc_test"][cold:, :]
            accs_m.append(float(_np.mean(post)))
            accs_b.append(float(_np.max(post)))
            swaps.append(res.swap_percent)
            accepts.append(float(_np.mean(res.accept_ratio_per_chain)))
        out = dict(
            test_mean=_np.asarray(accs_m), test_best=_np.asarray(accs_b),
            swap_pct=_np.asarray(swaps), accept_pct=_np.asarray(accepts),
        )
    else:
        out = sweeps.seed_sweep(cfg, SEEDS, prob.train, prob.test)
    wall = (time.time() - t0) / 60.0
    ref_m, ref_b = (REF_LG if legacy else REF_RW)[name]
    mm, ms = float(np.mean(out["test_mean"])), float(np.std(out["test_mean"]))
    bm, bs = float(np.mean(out["test_best"])), float(np.std(out["test_best"]))
    flag_m = "" if abs(ref_m - mm) <= 2 * max(ms, 1e-9) else " **ref outside ±2σ**"
    flag_b = "" if abs(ref_b - bm) <= 2 * max(bs, 1e-9) else " **ref outside ±2σ**"
    return (
        f"| {name} | {mm:.2f}±{ms:.2f} / {ref_m:.2f}{flag_m} | "
        f"{bm:.2f}±{bs:.2f} / {ref_b:.2f}{flag_b} | "
        f"{np.mean(out['swap_pct']):.1f} | {np.mean(out['accept_pct']):.1f} | "
        f"{wall:.2f} |"
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    mode = "lg" if "--mode" in sys.argv and "lg" in sys.argv else (
        "lg" if any(a == "lg" for a in sys.argv[1:]) else "rw"
    )
    legacy = mode == "lg"
    names = [a for a in args if a in REF_RW] or list(REF_RW)
    print(f"## mode={mode} (5 seeds vmapped per cell)")
    print("| dataset | test acc mean ours±σ / ref | max ours±σ / ref | swap% | accept% | wall min |")
    print("|---|---|---|---|---|---|")
    for n in names:
        print(band(n, legacy), flush=True)


if __name__ == "__main__":
    main()
