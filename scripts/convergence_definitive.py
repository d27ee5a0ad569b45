"""The definitive Sunspot d=61 convergence study (VERDICT r4 task 4).

No run in this repo's history has ever converged the flagship posterior:
cross-seed split-R-hat >= 1.37 everywhere but iris (results/auto_study.md,
results/convergence.md stopped at 16x budget with R-hat >= 1.01). This
study escalates the budget 64x beyond that stopping point on the best
sampler the framework has (ChEES-HMC on 64 replicated 4-rung ladders,
256 chains) and gates on FUNCTION-SPACE statistics — w-space R-hat is
structurally doomed by weight-symmetry multimodality
(results/mala_basins.md finds replica R-hat ~1.4 in w-space even between
replicas whose predictions agree), but the posterior that matters for
"matched posterior quality" (BASELINE.json) is the predictive one.

Protocol per budget in {16k, 64k, 256k, 1M} steps/chain, seeds {1,2,3}:
  * per-step ChEES sampler (record_thin strides the traces so a 1M-step
    run ships ~8k retained rows), 64 cold replicas recorded per seed
  * function-space draws: forward pass of every retained post-burn cold
    draw at 48 fixed test inputs (on-device, batched)
  * gate: rank-normalized split-R-hat treating every (seed, replica) as
    one chain — 192 chains — per test point; report max and median
  * structure: per-replica posterior-mean-prediction RMSE distribution +
    greedy function-space clustering of the 192 replica prediction means
    (threshold = 3x the median within-replica prediction sd)

Writes results/convergence_definitive.md.
Run: python scripts/convergence_definitive.py [--budgets 16000 64000 ...]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, ".")

import numpy as np


def fx_draws(w, x, topo):
    """(n, d) draws -> (n, n_points) predictions via the reference forward."""
    import jax
    import jax.numpy as jnp

    from ptnn.models import fnn

    fwd = jax.jit(
        jax.vmap(lambda wi: fnn.forward(wi, x, topo)[:, 0])
    )
    out = []
    for lo in range(0, w.shape[0], 4096):
        out.append(np.asarray(fwd(jnp.asarray(w[lo : lo + 4096]))))
    return np.concatenate(out, axis=0)


def greedy_clusters(means: np.ndarray, tol: float):
    """Greedy RMS-distance clustering of replica prediction means."""
    labels = -np.ones(means.shape[0], int)
    centers = []
    for i in range(means.shape[0]):
        for ci, c in enumerate(centers):
            if np.sqrt(np.mean((means[i] - c) ** 2)) < tol:
                labels[i] = ci
                break
        if labels[i] < 0:
            centers.append(means[i])
            labels[i] = len(centers) - 1
    return labels, len(centers)


def main() -> None:
    import jax

    # persistent XLA-executable cache: the campaign re-invokes identical
    # HLO across seeds/budgets/processes; without this every ptnn.sample
    # call recompiles its scan variants (minutes each on the 1-core host)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcomp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import ptnn
    from bench import _variants
    from ptnn.data import load_regression
    from ptnn.ops import ess as ess_mod

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--budgets", type=int, nargs="+",
        default=[16_000, 64_000, 256_000, 1_000_000],
    )
    ap.add_argument("--seeds", type=int, nargs="+", default=[1, 2, 3])
    ap.add_argument("--out", default="results/convergence_definitive.md")
    ap.add_argument(
        "--config", choices=("64x4", "256x4"), default="64x4",
        help="256x4 = the crowned bench flagship chees16_fused_256x4 "
        "(1024 chains, 256 cold replicas) through the same protocol",
    )
    ap.add_argument(
        "--fused", action="store_true",
        help="fused Pallas execution (record_thin rides the chunk-level "
        "device stride since r5; same sampler distributionally, ~2-3x "
        "the per-step rate — the enabler for the 16M/50M strict-gate "
        "budgets)",
    )
    ap.add_argument(
        "--append", action="store_true",
        help="append rows to an existing report instead of rewriting",
    )
    ap.add_argument(
        "--fx-dir", default=None,
        help="cache per-seed prediction chains as .npz here; finished "
        "seeds reload instead of resampling (wedged-tunnel resilience)",
    )
    args = ap.parse_args()
    if args.fx_dir:
        os.makedirs(args.fx_dir, exist_ok=True)

    prob = load_regression("Sunspot")
    topo = (4, 10, 1)
    # 48 fixed test inputs, evenly spread through the test set
    xi = np.linspace(0, prob.test.shape[0] - 1, 48).astype(int)
    x_pts = prob.test[xi, :4].astype(np.float32)
    y_pts = prob.test[xi, 4].astype(np.float32)
    x_all = prob.test[:, :4].astype(np.float32)
    y_all = prob.test[:, 4].astype(np.float32)

    tag = (
        "chees16_fused_64x4" if args.config == "64x4"
        else "chees16_fused_256x4"
    )
    base = _variants(64, steps_per_chain=5000)[tag]
    n_rep = base.n_ladders
    rows = []
    for steps in args.budgets:
        thin = max(1, steps // 8000)
        cfg = dataclasses.replace(
            base,
            fused_step=args.fused,
            num_samples=base.num_chains * steps,
            record_w=True,
            record_w_chains=n_rep,
            record_thin=thin,
            # fused: bounded chunks — single executions >60-90 s crash the
            # tunneled worker, and very large scan groups are fresh
            # multi-minute XLA compiles (16k-step chunks are the measured
            # sweet spot: ~2.2M steps/s steady at 256 chains with the
            # persistent compile cache warm)
            chunk_steps=min(30_000_000 // base.num_chains, 16_000,
                            max(1000, thin * 100))
            if args.fused
            else min(4000, max(1000, thin * 100)),
        ).validate()
        n_rows = None
        chains_fx = []  # (seed, replica) prediction chains
        rep_rmse = []  # per-replica posterior-mean RMSE (full test set)
        pooled_rmse = []
        for seed in args.seeds:
            fx_path = (
                os.path.join(
                    args.fx_dir, f"{args.config}_{steps}_{seed}.npz"
                )
                if args.fx_dir
                else None
            )
            if fx_path and os.path.exists(fx_path):
                # resumable campaign: a wedged tunnel loses at most one
                # seed — finished seeds reload their prediction chains
                z = np.load(fx_path)
                fx, fx_full = z["fx"], z["fx_full"]
                n_rows = fx.shape[0]
            else:
                res = ptnn.sample(cfg, prob.train, prob.test, seed=seed)
                w = np.asarray(res.traces["w"])  # (rows+1, R, d)
                b = (w.shape[0] - 1) // 2 + 1  # post-burn retained rows
                w = w[b:]
                n_rows = w.shape[0]
                flat = w.reshape(-1, w.shape[-1])
                fx = fx_draws(flat, x_pts, topo).reshape(
                    w.shape[0], w.shape[1], -1
                )
                fx_full = fx_draws(flat, x_all, topo).reshape(
                    w.shape[0], w.shape[1], -1
                )
                if fx_path:
                    np.savez_compressed(fx_path, fx=fx, fx_full=fx_full)
            for r in range(fx.shape[1]):
                chains_fx.append(fx[:, r, :])
                mu = fx_full[:, r, :].mean(axis=0)
                rep_rmse.append(
                    float(np.sqrt(np.mean((mu - y_all) ** 2)))
                )
            pooled_mu = fx_full.mean(axis=(0, 1))
            pooled_rmse.append(
                float(np.sqrt(np.mean((pooled_mu - y_all) ** 2)))
            )
            print(
                f"budget {steps} seed {seed}: {n_rows} retained rows, "
                f"pooled-mean RMSE {pooled_rmse[-1]:.4f}",
                flush=True,
            )
        stack = np.stack(chains_fx, axis=1)  # (rows, 192, points)
        rhats = [
            ess_mod.split_rhat(stack[:, :, j]) for j in range(stack.shape[2])
        ]
        # cross-SEED-only R-hat: pool each seed's replicas into one chain —
        # distinguishes "replicas disagree" from "seeds disagree"
        n_rep = stack.shape[1] // len(args.seeds)
        seed_chains = np.stack(
            [
                stack[:, s * n_rep : (s + 1) * n_rep, :]
                .transpose(0, 1, 2)
                .reshape(-1, stack.shape[2])
                for s in range(len(args.seeds))
            ],
            axis=1,
        )
        rhats_seed = [
            ess_mod.split_rhat(seed_chains[:, :, j])
            for j in range(seed_chains.shape[2])
        ]
        # function-space clustering of replica means
        means = stack.mean(axis=0).reshape(stack.shape[1], -1)
        within_sd = float(np.median(stack.std(axis=0)))
        labels, n_cl = greedy_clusters(means, 3.0 * within_sd)
        sizes = np.sort(np.bincount(labels))[::-1]
        rep_rmse = np.asarray(rep_rmse)
        rows.append(
            dict(
                steps=steps, thin=thin, rows=n_rows,
                rhat_max=float(np.max(rhats)),
                rhat_med=float(np.median(rhats)),
                rhat_seed_max=float(np.max(rhats_seed)),
                rmse_pooled=float(np.median(pooled_rmse)),
                rep_min=float(rep_rmse.min()),
                rep_med=float(np.median(rep_rmse)),
                rep_max=float(rep_rmse.max()),
                clusters=n_cl,
                top=sizes[:5].tolist(),
                within_sd=within_sd,
            )
        )
        print(rows[-1], flush=True)
        # incremental receipt: a crashed later budget must not lose this one
        with open(args.out + ".partial", "a") as f:
            f.write(repr(rows[-1]) + "\n")

    mode = "fused" if args.fused else "per-step"
    lines = [
        "# Definitive Sunspot d=61 convergence study",
        "",
        f"ChEES-HMC, {n_rep} replicated 4-rung ladders "
        f"({base.num_chains} chains), seeds "
        f"{args.seeds}; function-space gate at 48 test points over "
        f"{n_rep * len(args.seeds)} (seed, replica) chains. Generated by "
        "`python scripts/convergence_definitive.py`.",
        "",
        "| config | steps/chain | retained rows | fs R-hat max |"
        " fs R-hat median |"
        " seed-only R-hat max | pooled-mean RMSE | replica RMSE min/med/max |"
        " fn clusters (top sizes) |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    if args.append:
        # r5 extension rows land as their own block under the r4 table
        lines = [
            "",
            f"## {args.config} {mode}, seeds {args.seeds} (r5 extension)",
            "",
            lines[-2],
            lines[-1],
        ]
    for r in rows:
        lines.append(
            f"| {args.config} {mode} x{len(args.seeds)} seeds | "
            f"{r['steps']:,} (thin {r['thin']}) | {r['rows']} | "
            f"{r['rhat_max']:.3f} | {r['rhat_med']:.3f} | "
            f"{r['rhat_seed_max']:.3f} | {r['rmse_pooled']:.4f} | "
            f"{r['rep_min']:.4f}/{r['rep_med']:.4f}/{r['rep_max']:.4f} | "
            f"{r['clusters']} ({r['top']}) |"
        )
    with open(args.out, "a" if args.append else "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out} (append verdict)")


if __name__ == "__main__":
    main()
