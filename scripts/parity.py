"""Full-budget parity suite vs the reference's committed baselines.

Runs every table in BASELINE.md at the reference's own budgets (100k samples
regression / 50k classification, 10 chains) on the available accelerator and
writes PARITY.md with side-by-side numbers.

    python scripts/parity.py [--quick] [--out PARITY.md]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import ptnn
from ptnn import results as results_mod
from ptnn.data import load_classification, load_regression

# BASELINE.md reference rows: name -> (test_mean, test_best, swap%, accept%)
REF_REG_RW = {
    "Lazer": (0.0565, 0.0270, 42.26, 35.32),
    "Sunspot": (0.0239, 0.0161, 44.46, 18.31),
    "Mackey": (0.0061, 0.0051, 42.11, 8.20),
    "Lorenz": (0.0171, 0.0094, 39.49, 14.48),
    "Rossler": (0.0175, 0.0148, 48.12, 12.53),
    "Henon": (0.1198, 0.0161, 48.59, 38.09),
    "ACFinance": (0.0144, 0.0130, 49.04, 17.58),
}
REF_REG_LG001 = {
    "Lazer": 0.0414, "Sunspot": 0.0204, "Mackey": 0.0065, "Lorenz": 0.0147,
    "Rossler": 0.0173, "Henon": 0.0963, "ACFinance": 0.0146,
}
REF_REG_LG01 = {
    "Lazer": 0.0353, "Sunspot": 0.0192, "Mackey": 0.0062, "Lorenz": 0.0157,
    "Rossler": 0.0175, "Henon": 0.0190, "ACFinance": 0.0146,
}
REF_CLS_RW = {  # test acc mean / max
    "iris": (50.18, 100.0), "Ionosphere": (51.29, 91.74), "Cancer": (83.55, 99.52),
    "bank-additional": (77.49, 79.45), "PenDigit": (71.93, 90.62),
    "chess": (90.06, 100.0),
}
REF_CLS_LG = {
    "iris": (96.76, 99.10), "Ionosphere": (92.19, 98.17), "Cancer": (98.77, 99.52),
    "bank-additional": (79.96, 82.61), "PenDigit": (81.24, 91.25),
    "chess": (100.0, 100.0),
}


def run_reg(name, lg, lr, lprob=0.5, maxtemp=5.0, samples=100_000, swap_int=None):
    prob = load_regression(name)
    cfg = ptnn.regression_preset(
        num_samples=samples,
        maxtemp=maxtemp,
        use_langevin_gradients=lg,
        langevin_prob=lprob,
        learn_rate=lr,
    )
    if swap_int is not None:
        cfg = dataclasses.replace(cfg, swap_interval=swap_int)
    cfg = dataclasses.replace(cfg, record_w=False)
    t0 = time.time()
    res = ptnn.sample(cfg, prob.train, prob.test, seed=0)
    s = results_mod.summarize(res, name)
    s.time_min = (time.time() - t0) / 60.0
    return s, res


def run_cls(name, lg, lr=0.01, samples=50_000, legacy=False):
    prob = load_classification(name, seed=0)
    cfg = dataclasses.replace(
        ptnn.classification_preset(
            prob.topology,
            num_samples=samples,
            use_langevin_gradients=lg,
            learn_rate=lr,
            legacy_lg=legacy,
        ),
        record_w=False,
        # chess: a 19.6k-iteration sequential-drift scan crashed the tunneled
        # TPU worker; the fused batch drift (documented deviation, still an
        # exact sampler via the MH q-ratio) is used for this one config
        drift_mode="batch" if (lg and name == "chess") else "sequential",
    )
    t0 = time.time()
    res = ptnn.sample(cfg, prob.train, prob.test, seed=0)
    s = results_mod.summarize(res, name)
    s.time_min = (time.time() - t0) / 60.0
    return s, res


def _flush(path, lines):
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def safe(fn, *a, **kw):
    try:
        return fn(*a, **kw)
    except Exception as e:  # keep the suite alive across backend faults
        print("FAILED:", a, kw, repr(e)[:200], flush=True)
        return None, None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="1/5 sample budgets")
    ap.add_argument("--out", default="PARITY.md")
    ap.add_argument("--sections", default="reg,cls,sweeps")
    args = ap.parse_args()
    sections = set(args.sections.split(","))
    div = 5 if args.quick else 1
    reg_samples = 100_000 // div
    cls_samples = 50_000 // div

    lines = [
        "# PARITY — ptnn vs reference committed baselines",
        "",
        f"Full-budget runs ({reg_samples} regression / {cls_samples} "
        "classification samples, 10 chains) on "
        f"{len(__import__('jax').devices())}x {__import__('jax').devices()[0].device_kind}. "
        "Reference numbers from BASELINE.md (multi-core CPU, 10 processes). "
        "Parity is distributional (seeds differ; SURVEY.md §7 hard-part 4).",
        "",
    ]
    if "reg" in sections:
        lines += [
            "## Regression — RW (maxtemp 5, swap 100)",
            "",
            "| dataset | test RMSE ours/ref | best ours/ref | swap% ours/ref | "
            "accept% ours/ref | time min ours/ref |",
            "|---|---|---|---|---|---|",
        ]

    ref_times_rw = {"Lazer": 4.54, "Sunspot": 4.83, "Mackey": 4.60, "Lorenz": 4.45,
                    "Rossler": 4.22, "Henon": 4.21, "ACFinance": 3.60}
    for name, (rm, rb, rs, ra) in (REF_REG_RW.items() if "reg" in sections else []):
        s, _ = safe(run_reg, name, lg=False, lr=0.1, samples=reg_samples)
        if s is None:
            lines.append(f"| {name} | run failed | | | | |")
            continue
        lines.append(
            f"| {name} | {s.test_mean:.4f} / {rm:.4f} | {s.test_best:.4f} / {rb:.4f} "
            f"| {s.swap_perc:.1f} / {rs:.1f} | {s.accept_per:.1f} / {ra:.1f} "
            f"| {s.time_min:.2f} / {ref_times_rw[name]:.2f} |"
        )
        print("done reg RW", name, flush=True)
        _flush(args.out, lines)

    for tag, lr, ref in (
        (("LG lr=0.01", 0.01, REF_REG_LG001), ("LG lr=0.1", 0.1, REF_REG_LG01))
        if "reg" in sections
        else ()
    ):
        lines += [
            "",
            f"## Regression — Langevin {tag} (maxtemp 5, swap 100, l_prob 0.5)",
            "",
            "| dataset | test RMSE ours/ref | accept% | time min |",
            "|---|---|---|---|",
        ]
        for name, rm in ref.items():
            s, _ = safe(run_reg, name, lg=True, lr=lr, samples=reg_samples)
            if s is None:
                lines.append(f"| {name} | run failed | | |")
                continue
            lines.append(
                f"| {name} | {s.test_mean:.4f} / {rm:.4f} | {s.accept_per:.1f} "
                f"| {s.time_min:.2f} |"
            )
            print("done reg", tag, name, flush=True)
            _flush(args.out, lines)

    if "cls" in sections:
        lines += [
            "",
            f"## Classification — RW ({cls_samples} samples, maxtemp 10, swap 100, lr 0.01)",
            "",
            "| dataset | test acc mean ours/ref | max ours/ref | swap% | accept% | time min |",
            "|---|---|---|---|---|---|",
        ]
    for name, (rm, rb) in (REF_CLS_RW.items() if "cls" in sections else []):
        s, _ = safe(run_cls, name, lg=False, samples=cls_samples)
        if s is None:
            lines.append(f"| {name} | run failed | | | | |")
            continue
        lines.append(
            f"| {name} | {s.test_mean:.2f} / {rm:.2f} | {s.test_best:.2f} / {rb:.2f} "
            f"| {s.swap_perc:.1f} | {s.accept_per:.1f} | {s.time_min:.2f} |"
        )
        print("done cls RW", name, flush=True)
        _flush(args.out, lines)

    if "cls" in sections:
        lines += [
        "",
        "## Classification — Langevin (lr 0.01, legacy mode)",
        "",
        "The committed PT_EvalSwapLG* tables were generated by the older",
        "every-step-Langevin variants whose MH q-ratio has a misplaced",
        "parenthesis (Misc_code/ldpt_classifier_multi.py:244 — ",
        "``log(pdf1 - log(pdf2))``), making them effectively always-accept",
        "noisy SGD. ptnn reproduces them with",
        "``classification_preset(legacy_lg=True)``; the current entry-point",
        "math (correct MALA ratio) is the default and gives ~50% acceptance",
        "with the cold chain at the same max accuracy.",
        "",
        "| dataset | test acc mean ours/ref | max ours/ref | swap% | accept% | time min |",
        "|---|---|---|---|---|---|",
        ]
    for name, (rm, rb) in (REF_CLS_LG.items() if "cls" in sections else []):
        s, _ = safe(run_cls, name, lg=True, samples=cls_samples, legacy=True)
        if s is None:
            lines.append(f"| {name} | run failed | | | | |")
            continue
        lines.append(
            f"| {name} | {s.test_mean:.2f} / {rm:.2f} | {s.test_best:.2f} / {rb:.2f} "
            f"| {s.swap_perc:.1f} | {s.accept_per:.1f} | {s.time_min:.2f} |"
        )
        print("done cls LG", name, flush=True)
        _flush(args.out, lines)

    # Sweeps
    if "sweeps" in sections:
        lines += [
        "",
        "## Sweeps",
        "",
        "Maxtemp sweep (Lazer, RW; reference best 0.0523 @ maxtemp 4, swap% 32->44):",
        "",
        "| maxtemp | test RMSE | swap% | accept% |",
        "|---|---|---|---|",
        ]
    for mt in ((2, 4, 6, 8, 10) if "sweeps" in sections else ()):
        s, _ = safe(run_reg, "Lazer", lg=False, lr=0.1, maxtemp=float(mt), samples=reg_samples)
        if s is None:
            lines.append(f"| {mt} | run failed | | |")
            continue
        lines.append(f"| {mt} | {s.test_mean:.4f} | {s.swap_perc:.1f} | {s.accept_per:.1f} |")
        print("done maxtemp", mt, flush=True)

    if "sweeps" in sections:
        lines += [
            "",
            "Swap-interval sweep (Sunspot, RW, maxtemp 4; reference RMSE flat "
            "0.0224-0.0238, swap% 38-51):",
            "",
            "| swap interval | test RMSE | swap% |",
            "|---|---|---|",
        ]
    for si in ((100, 200, 400, 800) if "sweeps" in sections else ()):
        s, _ = safe(run_reg, "Sunspot", lg=False, lr=0.1, maxtemp=4.0, samples=reg_samples, swap_int=si)
        if s is None:
            lines.append(f"| {si} | run failed | |")
            continue
        lines.append(f"| {si} | {s.test_mean:.4f} | {s.swap_perc:.1f} |")
        print("done swapint", si, flush=True)

    if "sweeps" in sections:
        lines += [
            "",
            "Langevin-probability sweep (Lazer, maxtemp 5, lr 0.1; reference RMSE "
            "0.0500 -> 0.0331 over l_prob 0.1 -> 0.8, best 0.0318 @ 0.3):",
            "",
            "| l_prob | test RMSE | accept% | time min |",
            "|---|---|---|---|",
        ]
    for lp in ((0.1, 0.3, 0.5, 0.8) if "sweeps" in sections else ()):
        s, _ = safe(run_reg, "Lazer", lg=True, lr=0.1, lprob=lp, samples=reg_samples)
        if s is None:
            lines.append(f"| {lp} | run failed | | |")
            continue
        lines.append(f"| {lp} | {s.test_mean:.4f} | {s.accept_per:.1f} | {s.time_min:.2f} |")
        print("done lprob", lp, flush=True)

    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", args.out)


if __name__ == "__main__":
    main()
