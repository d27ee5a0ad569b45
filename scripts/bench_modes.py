"""One-off TPU measurement of the opt-in sampler modes.

Compares, at equal step budgets on the real chip:
  * plain PT (control)
  * delayed-acceptance surrogate PT (exact; segments skip dataset+drift)
  * bfloat16 evaluation mode

MEASUREMENT CAVEAT: the tunneled axon chip shows +-30-40% run-to-run
variance for surrogate configs; a single A/B pass (what this script does) is
indicative only. Conclusions in COVERAGE.md use interleaved repeated medians.
At reference problem scales neither DA nor bf16 beats plain wall-clock on
this chip — the per-step conditional/bookkeeping overhead (~0.3-0.6 ms)
exceeds a reference-scale dataset pass; DA's value is exactness.

Run SERIALLY (one process; concurrent TPU jobs wedge the tunneled worker).
Usage: python scripts/bench_modes.py [--chains 64] [--samples-per-chain 2000]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=64)
    ap.add_argument("--samples-per-chain", type=int, default=2000)
    ap.add_argument("--langevin", action="store_true", default=True)
    ap.add_argument("--no-langevin", dest="langevin", action="store_false")
    ap.add_argument(
        "--tile", type=int, default=1,
        help="replicate the dataset rows N times (scales the true-eval cost; "
        "the regime where surrogate segments pay off)",
    )
    ap.add_argument("--hidden", type=int, default=10)
    args = ap.parse_args()

    import ptnn
    from ptnn.data import load

    prob = load("Sunspot")
    train = np.tile(prob.train, (args.tile, 1))
    test = prob.test
    c = args.chains
    base = ptnn.regression_preset(
        topology=(4, args.hidden, 1),
        num_samples=c * args.samples_per_chain,
        num_chains=c,
        use_langevin_gradients=args.langevin,
        maxtemp=5.0,
    )
    base = dataclasses.replace(base, chunk_steps=250, record_w=False)

    def run(tag, cfg, seed=0):
        # warm once (compile), then time a fresh run
        ptnn.sample(cfg, train, test, seed=seed)
        t0 = time.perf_counter()
        r = ptnn.sample(cfg, train, test, seed=seed + 1)
        dt = time.perf_counter() - t0
        out = {
            "mode": tag,
            "chain_steps_per_sec": round(cfg.n_steps * c / dt, 1),
            "elapsed_s": round(dt, 2),
            "rmse_test_cold": round(float(r.traces["rmse_test"][-1, 0]), 4),
            "accept_pct_cold": round(float(r.accept_ratio_per_chain[0]), 1),
            "swap_pct": round(r.swap_percent, 1),
        }
        if r.da_segments:
            out["da_segments"] = r.da_segments
            out["da_seg_accept_cold"] = round(float(r.da_accept_per_chain[0]), 1)
        print(json.dumps(out), flush=True)
        return out

    run("plain", base)
    da = dataclasses.replace(
        base,
        use_surrogate=True,
        surrogate_mode="delayed_acceptance",
        surrogate_prob=0.5,
        surrogate_warmup_frac=0.2,
        surrogate_buffer=4096,
        surrogate_proj=64,
    )
    run("delayed_acceptance_rw", da)
    run("delayed_acceptance_mala", dataclasses.replace(da, surrogate_inner="mala"))
    run("bf16_eval", dataclasses.replace(base, eval_dtype="bfloat16"))
    run(
        "da_mala_bf16",
        dataclasses.replace(da, surrogate_inner="mala", eval_dtype="bfloat16"),
    )


if __name__ == "__main__":
    main()
