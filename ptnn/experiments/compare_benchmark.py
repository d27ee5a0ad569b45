"""Gradient-descent baselines for quality comparison (sklearn).

Equivalent of the reference's Compare_Benchmark harness
(multicore-pt-classification/Compare_Benchmark/nn.py:1-152 — 30 restarts of
MLPClassifier with Adam and SGD per dataset; multicore-pt-regression/
Compare_benchmark/nn.py:1-63 — MLPRegressor Adam/SGD + RandomForestRegressor
with the reference's *sum-form* RMSE, nn.py:47-48). Same hidden sizes as the
PT topologies; results to ``result_comparison.txt`` rows
``name mean std max`` per optimizer.

    python -m ptnn.experiments.compare_benchmark --task classification
    python -m ptnn.experiments.compare_benchmark --task regression
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ptnn.data import (
    CLASSIFICATION_TOPOLOGIES,
    REGRESSION_SETS,
    load_classification,
    load_regression,
)


def _split(prob):
    i = prob.topology[0]
    return (
        prob.train[:, :i],
        prob.train[:, i],
        prob.test[:, :i],
        prob.test[:, i],
    )


def run_classification(problems, restarts, out, reference_settings=False):
    """30-restart MLPClassifier sweep per dataset.

    ``reference_settings=True`` reproduces Compare_Benchmark/nn.py:120-137
    exactly: ``alpha=0.1, max_iter=100000, tol=0`` (the reference seeds
    nothing; we keep ``random_state=r`` so restarts are reproducible) and
    emits the reference's four summary rows (net train/test mean std max,
    nn.py:147-150) so rows are directly comparable with the committed
    ``result_comparison.txt``/``nn.txt``. The default (fast) mode keeps
    sklearn defaults with ``max_iter=500``.
    """
    from sklearn.neural_network import MLPClassifier

    kw = (
        dict(alpha=0.1, max_iter=100000, tol=0)
        if reference_settings
        else dict(max_iter=500)
    )
    rows = []
    for name in problems:
        prob = load_classification(name, seed=0)
        xtr, ytr, xte, yte = _split(prob)
        hidden = prob.topology[1]
        for solver in ("adam", "sgd"):
            tr_accs, te_accs = [], []
            for r in range(restarts):
                clf = MLPClassifier(
                    hidden_layer_sizes=(hidden,),
                    activation="relu",
                    solver=solver,
                    random_state=r,
                    **kw,
                )
                clf.fit(xtr, ytr)
                tr_accs.append(clf.score(xtr, ytr))
                te_accs.append(clf.score(xte, yte))
            tr, te = np.asarray(tr_accs), np.asarray(te_accs)
            if reference_settings:
                rows.append(
                    f"{solver.upper()} net train {name} "
                    f"{tr.mean():.6f} {tr.std():.6f} {tr.max():.6f}"
                )
                print(rows[-1], flush=True)
                rows.append(
                    f"{solver.upper()} net test {name} "
                    f"{te.mean():.6f} {te.std():.6f} {te.max():.6f}"
                )
            else:
                rows.append(
                    f"{name} {solver} {te.mean():.4f} {te.std():.4f} {te.max():.4f}"
                )
            print(rows[-1], flush=True)
        # flush after every dataset: reference-settings restarts take hours
        # on big sets and an end-only write loses all rows on interruption
        _write(out, rows)
        rows = []


def run_regression(problems, restarts, out, reference_settings=False):
    """MLPRegressor Adam/SGD + RandomForest, reference *sum-form* RMSE.

    ``reference_settings=True`` reproduces Compare_benchmark/nn.py:45-61
    exactly, including its quirks: ``hidden=(5,), alpha=0.1,
    max_iter=100000, tol=0``, default-parameter RandomForest, and — the big
    one — **only 3 of the 4 lag inputs** (``x = data[:, 0:3]`` with target
    ``data[:, 4]``, nn.py:40-43, silently dropping lag column 3). Train and
    test sum-form RMSE both reported, one row per restart like the committed
    ``nn.txt``. The default (fast) mode uses all 4 lags and hidden=(10,)
    matching the PT topology.
    """
    from sklearn.ensemble import RandomForestRegressor
    from sklearn.neural_network import MLPRegressor

    mlp_kw = (
        dict(hidden_layer_sizes=(5,), alpha=0.1, max_iter=100000, tol=0)
        if reference_settings
        else dict(hidden_layer_sizes=(10,), max_iter=500)
    )
    rows = []
    for name in problems:
        prob = load_regression(name)
        xtr, ytr, xte, yte = _split(prob)
        if reference_settings:
            xtr, xte = xtr[:, 0:3], xte[:, 0:3]
        for tag, mk in (
            ("adam", lambda r: MLPRegressor(activation="relu", solver="adam", random_state=r, **mlp_kw)),
            ("sgd", lambda r: MLPRegressor(activation="relu", solver="sgd", random_state=r, **mlp_kw)),
            ("rf", lambda r: RandomForestRegressor(random_state=r)),
        ):
            tr_rmses, te_rmses = [], []
            for r in range(restarts):
                m = mk(r)
                m.fit(xtr, ytr)
                # reference's sum-form "RMSE" (Compare_benchmark/nn.py:47-48):
                # sqrt of the SUM of squared errors, not the mean
                tr_rmses.append(float(np.sqrt(np.sum((m.predict(xtr) - ytr) ** 2))))
                te_rmses.append(float(np.sqrt(np.sum((m.predict(xte) - yte) ** 2))))
            tr, te = np.asarray(tr_rmses), np.asarray(te_rmses)
            if reference_settings:
                rows.append(
                    f"{tag.upper()} {name} train {tr.mean():.6f} {tr.std():.6f} "
                    f"test {te.mean():.6f} {te.std():.6f}"
                )
            else:
                rows.append(
                    f"{name} {tag} {te.mean():.4f} {te.std():.4f} {te.min():.4f}"
                )
            print(rows[-1], flush=True)
        _write(out, rows)
        rows = []


def _write(out, rows):
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "a+") as f:
        f.write("\n".join(rows) + "\n")


def _write_run_header(out) -> None:
    """Stamp each run before its first flush: per-dataset appends are
    routine, so without a delimiter a re-run (or a --reference-settings run
    into a fast-mode file) silently concatenates rows of mixed provenance."""
    import datetime
    import sys as _sys

    _write(
        out,
        [
            "# run "
            + datetime.datetime.now().isoformat(timespec="seconds")
            + " :: "
            + " ".join(_sys.argv)
        ],
    )


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--task", choices=("classification", "regression"), required=True)
    p.add_argument("--problem", default="all")
    p.add_argument("--restarts", type=int, default=30)
    p.add_argument("--out", default="results/result_comparison.txt")
    p.add_argument(
        "--reference-settings",
        action="store_true",
        help="reproduce the reference's exact sklearn hyperparameters "
        "(alpha=0.1, max_iter=100000, tol=0; regression: hidden=(5,), "
        "3-lag input quirk) so rows are comparable with the committed "
        "Compare_Benchmark outputs",
    )
    args = p.parse_args(argv)
    _write_run_header(args.out)
    if args.task == "classification":
        probs = (
            list(CLASSIFICATION_TOPOLOGIES) if args.problem == "all" else [args.problem]
        )
        run_classification(probs, args.restarts, args.out, args.reference_settings)
    else:
        probs = list(REGRESSION_SETS) if args.problem == "all" else [args.problem]
        run_regression(probs, args.restarts, args.out, args.reference_settings)


if __name__ == "__main__":
    main()
