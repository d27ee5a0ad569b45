"""CNN posterior convergence in FUNCTION SPACE (VERDICT r4 item 4).

The digits Bayesian CNN is the one new-capability model family without a
convergence story: auto's parameter-space gate read R-hat 2.85 — but the
definitive FNN study showed w-space R-hat measures weight-symmetry
multimodality, not predictive disagreement. This study points the
function-space machinery at the CNN posterior: ChEES-HMC replicated
tempering ensembles (the family that fixed basin selection for the FNN,
results/mala_basins.md), multi-seed, gated on predictive CLASS
PROBABILITIES at fixed test points (ops/ess.function_space_rhat with the
CNN ModelSpec — predictions, not weights), plus cold-pooled accuracy on
both axes the repo reports everywhere: per-draw trace mean AND served
posterior-predictive (mean probs) accuracy.

Protocol per (sampler, budget): seeds from --seeds; 128 chains = 32
replicated 4-rung ladders; per-step sampler (the fused kernels cover the
FNN family only); record_thin keeps ~512 retained rows of 16 recorded
cold replicas per seed. Writes results/cnn_convergence.md.

Run: python scripts/cnn_convergence.py [--budgets 2000 8000]
     [--samplers chees mala] [--seeds 1 2]
Ref: BASELINE.json config 5; ptnn/experiments/cnn_digits.py.
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcomp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import ptnn
    from ptnn import predict as predict_mod
    from ptnn.data import load_digits
    from ptnn.models import cnn
    from ptnn.ops import ess as ess_mod

    ap = argparse.ArgumentParser()
    ap.add_argument("--budgets", type=int, nargs="+", default=[2000, 8000])
    ap.add_argument("--seeds", type=int, nargs="+", default=[1, 2])
    ap.add_argument(
        "--samplers", nargs="+", default=["chees", "mala"],
        choices=["chees", "mala"],
    )
    ap.add_argument("--chains", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=150)
    ap.add_argument("--rungs", type=int, default=4)
    ap.add_argument("--out", default="results/cnn_convergence.md")
    ap.add_argument("--append", action="store_true")
    args = ap.parse_args()

    prob = load_digits(0)
    spec = cnn.digits_spec()
    n_lad = args.chains // args.rungs
    rec = min(16, n_lad)  # recorded cold replicas (3.7k params each)

    def mk(sampler: str, steps: int):
        base = ptnn.classification_preset(
            prob.topology,
            num_samples=args.chains * steps,
            num_chains=args.chains,
            maxtemp=5.0,
        )
        extra = (
            dict(hmc_leapfrog=8, hmc_adapt_traj=True)
            if sampler == "chees"
            else {}
        )
        return dataclasses.replace(
            base,
            proposal="hmc" if sampler == "chees" else "precond_mala",
            n_ladders=n_lad,
            adapt_rate=0.1,
            swap_style="even_odd",
            swap_interval=10,
            swap_rule="metropolis",
            swap_payload="untempered",
            warmstart_frac=0.1,
            precond_start_frac=0.3,
            step_w=0.01,
            record_w=True,
            record_w_chains=rec,
            record_thin=max(1, steps // 512),
            chunk_steps=args.chunk,  # ~20 s device per ChEES chunk (60-90 s crashes the worker)
            **extra,
        ).validate()

    rows = []
    for sampler in args.samplers:
        for steps in args.budgets:
            cfg = mk(sampler, steps)
            cold_idx = np.arange(0, args.chains, args.rungs)
            colds, acc_draw, acc_post, ess_s, sps = [], [], [], [], []
            for seed in args.seeds:
                t0 = time.time()
                res = ptnn.sample(
                    cfg, prob.train, prob.test, seed=seed, model_spec=spec
                )
                r = res.traces["acc_test"].shape[0]
                b = int(r * cfg.burn_in)
                cold = np.asarray(res.traces["w"][b:, :, :])
                colds.append(cold)
                acc_draw.append(
                    float(np.mean(res.traces["acc_test"][b:, cold_idx]))
                )
                pool = cold.reshape(-1, cold.shape[-1])
                pool = pool[:: max(1, pool.shape[0] // 1000)]
                nx = cfg.topology[0]
                pred = predict_mod.posterior_predict(
                    cfg, pool, prob.test[:, :nx], spec=spec
                )
                y = prob.test[:, nx].astype(np.int64)
                acc_post.append(
                    float(np.mean(pred["label"] == y)) * 100.0
                )
                e = ess_mod.pooled_multi_ess(cold, max_params=16)
                sps.append(res.chain_steps_per_sec)
                ess_s.append(
                    (e / (cold.shape[0] * cfg.record_thin))
                    * (res.chain_steps_per_sec / cfg.num_chains)
                )
                print(
                    f"{sampler} {steps} seed {seed}: "
                    f"{time.time() - t0:.0f} s, "
                    f"{res.chain_steps_per_sec:,.0f} steps/s, acc(draw) "
                    f"{acc_draw[-1]:.2f}, acc(mean probs) "
                    f"{acc_post[-1]:.2f}",
                    flush=True,
                )
            rhat = ess_mod.function_space_rhat(
                colds, prob.test, cfg, spec=spec
            )
            # strict per-replica gate: every (seed, replica) its own chain
            per_rep = [c[:, r_, :] for c in colds for r_ in range(rec)]
            rhat_strict = ess_mod.function_space_rhat(
                per_rep, prob.test, cfg, spec=spec
            )
            rows.append(
                f"| {sampler} | {steps:,} | "
                f"{float(np.median(sps)):,.0f} | "
                f"{rhat:.3f} | {rhat_strict:.3f} | "
                f"{float(np.median(acc_draw)):.2f} | "
                f"{float(np.median(acc_post)):.2f} | "
                f"{float(np.median(ess_s)):.1f} |"
            )
            print(rows[-1], flush=True)
            with open(args.out + ".partial", "a") as f:
                f.write(rows[-1] + "\n")

    header = (
        "# Digits Bayesian-CNN convergence in function space\n\n"
        f"{args.chains} chains = {n_lad} replicated {args.rungs}-rung "
        f"ladders, seeds {args.seeds}; gate = cross-seed rank-normalized "
        "split R-hat of predictive CLASS PROBABILITIES at 16 fixed test "
        "inputs over the pooled cold replicas (ops/ess.function_space_"
        "rhat with the CNN ModelSpec); strict = every (seed, replica) as "
        "its own chain. acc(draw) = per-draw cold trace mean; acc(served)"
        " = accuracy of posterior-mean class probs (what ptnn.predict "
        "serves). Generated by scripts/cnn_convergence.py.\n\n"
        "| sampler | steps/chain | chain-steps/s | fs R-hat (pooled) | "
        "fs R-hat (strict) | acc(draw) | acc(served) | pooled cold "
        "ESS/s |\n|---|---|---|---|---|---|---|---|\n"
    )
    with open(args.out, "a" if args.append else "w") as f:
        if not args.append:
            f.write(header)
        f.write("\n".join(rows) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
