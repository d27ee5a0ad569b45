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


def run_classification(problems, restarts, out):
    from sklearn.neural_network import MLPClassifier

    rows = []
    for name in problems:
        prob = load_classification(name, seed=0)
        xtr, ytr, xte, yte = _split(prob)
        hidden = prob.topology[1]
        for solver in ("adam", "sgd"):
            accs = []
            for r in range(restarts):
                clf = MLPClassifier(
                    hidden_layer_sizes=(hidden,),
                    activation="relu",
                    solver=solver,
                    max_iter=500,
                    random_state=r,
                )
                clf.fit(xtr, ytr)
                accs.append(clf.score(xte, yte))
            accs = np.asarray(accs)
            rows.append(
                f"{name} {solver} {accs.mean():.4f} {accs.std():.4f} {accs.max():.4f}"
            )
            print(rows[-1], flush=True)
    _write(out, rows)


def run_regression(problems, restarts, out):
    from sklearn.ensemble import RandomForestRegressor
    from sklearn.neural_network import MLPRegressor

    rows = []
    for name in problems:
        prob = load_regression(name)
        xtr, ytr, xte, yte = _split(prob)
        for tag, mk in (
            ("adam", lambda r: MLPRegressor(hidden_layer_sizes=(10,), solver="adam", max_iter=500, random_state=r)),
            ("sgd", lambda r: MLPRegressor(hidden_layer_sizes=(10,), solver="sgd", max_iter=500, random_state=r)),
            ("rf", lambda r: RandomForestRegressor(n_estimators=100, random_state=r)),
        ):
            rmses = []
            for r in range(restarts):
                m = mk(r)
                m.fit(xtr, ytr)
                pred = m.predict(xte)
                # reference's sum-form "RMSE" (Compare_benchmark/nn.py:47-48):
                # sqrt of the SUM of squared errors, not the mean
                rmses.append(float(np.sqrt(np.sum((pred - yte) ** 2))))
            rmses = np.asarray(rmses)
            rows.append(
                f"{name} {tag} {rmses.mean():.4f} {rmses.std():.4f} {rmses.min():.4f}"
            )
            print(rows[-1], flush=True)
    _write(out, rows)


def _write(out, rows):
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "a+") as f:
        f.write("\n".join(rows) + "\n")


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--task", choices=("classification", "regression"), required=True)
    p.add_argument("--problem", default="all")
    p.add_argument("--restarts", type=int, default=30)
    p.add_argument("--out", default="results/result_comparison.txt")
    args = p.parse_args(argv)
    if args.task == "classification":
        probs = (
            list(CLASSIFICATION_TOPOLOGIES) if args.problem == "all" else [args.problem]
        )
        run_classification(probs, args.restarts, args.out)
    else:
        probs = list(REGRESSION_SETS) if args.problem == "all" else [args.problem]
        run_regression(probs, args.restarts, args.out)


if __name__ == "__main__":
    main()
