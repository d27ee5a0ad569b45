"""Headline benchmark: chain-steps/sec AND ESS/sec on the Sunspot PT config.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Baseline: the reference's 10-process CPU run aggregates ~370 chain-steps/sec
on the regression suite (BASELINE.md "Throughput": ~35-45 steps/s/chain x 10
chains, Res_RW master_result_file.txt). Here the whole 64-chain temperature
ladder is one fused XLA scan on a single TPU chip.

ESS/sec (the BASELINE.json quality-per-second metric) is reported for three
flagship variants in the same JSON object:
  * rw        — the reference's headline random-walk mode
  * lg_pallas — Langevin proposals via the Pallas drift kernel
  * adaptive  — RW with per-chain Robbins-Monro step-size adaptation
                (adapt_rate=0.1; freezes after burn-in, so exact)
Method: ESS-per-draw from a trace-recording run (multi_ess over post-burn-in
cold-chain parameter draws), multiplied by the steady-state per-chain step
rate of the matching fused (trace-free) config — i.e. steady-state ESS/sec
with trace streaming amortized. Each variant carries its final cold-chain
test RMSE so speed is never detached from posterior quality (reference
committed Sunspot RW test RMSE: 0.0239, Res_RW/master_result_file.txt:2).
"""

from __future__ import annotations

import dataclasses
import json
import sys

sys.path.insert(0, ".")


def main() -> None:
    import numpy as np

    import ptnn
    from ptnn.data import load_regression
    from ptnn.ops import ess as ess_mod

    prob = load_regression("Sunspot")

    chains = 64
    steps_per_chain = 5000
    cfg = ptnn.PTConfig(
        task="regression",
        topology=(4, 10, 1),
        num_samples=chains * steps_per_chain,
        num_chains=chains,
        maxtemp=5.0,
        swap_interval=100,
        swap_offset=0,
        swap_payload="tempered_times_T",
        use_langevin_gradients=False,  # RW: the reference's headline mode
        record_w=False,
    ).validate()

    variants = {
        "rw": cfg,
        "lg_pallas": dataclasses.replace(
            cfg, use_langevin_gradients=True, drift_mode="pallas"
        ).validate(),
        "adaptive": dataclasses.replace(
            cfg, adapt_step_size=True, adapt_rate=0.1
        ).validate(),
    }

    headline = None
    ess_per_sec = {}
    quality = {}
    notes = []
    for tag, vcfg in variants.items():
        stats = ptnn.throughput_run(vcfg, prob.train, prob.test, seed=0)
        if tag == "rw":
            headline = stats
        # ESS-per-draw: shorter trace-recording run on the same config
        ess_cfg = dataclasses.replace(
            vcfg, num_samples=vcfg.num_chains * 4000, record_w=True,
            chunk_steps=500,
        ).validate()
        # ESS estimates over 2000 draws are noisy (2-3x seed spread):
        # average ESS-per-draw across 3 seeds for a stable report
        ess_vals, rmses, draws = [], [], 0
        for seed in (1, 2, 3):
            res = ptnn.sample(ess_cfg, prob.train, prob.test, seed=seed)
            b = ess_cfg.samples_per_chain // 2
            cold = np.asarray(res.traces["w"][b:, 0, :])
            draws = cold.shape[0]
            ess_vals.append(ess_mod.multi_ess(cold, max_params=16))
            rmses.append(float(res.traces["rmse_test"][-1, 0]))
        ess_val = float(np.mean(ess_vals))
        steps_per_sec_per_chain = stats["chain_steps_per_sec"] / chains
        ess_per_sec[tag] = round((ess_val / draws) * steps_per_sec_per_chain, 1)
        quality[tag] = round(float(np.mean(rmses)), 4)
        notes.append(
            f"{tag}: {stats['chain_steps_per_sec']:,.0f} steps/s, ESS "
            f"{ess_val:.0f}/{draws} draws (3-seed mean) -> "
            f"{ess_per_sec[tag]} ESS/s, RMSE {quality[tag]}, "
            f"accept {stats['accept_pct']:.1f}%, swap {stats['swap_pct']:.1f}%"
        )

    value = headline["chain_steps_per_sec"]
    baseline = 370.0  # aggregate chain-steps/sec, 10-proc CPU reference
    print(
        json.dumps(
            {
                "metric": "sunspot_rw_pt_chain_steps_per_sec_64chains_1chip",
                "value": round(value, 1),
                "unit": "chain-steps/s",
                "vs_baseline": round(value / baseline, 2),
                "ess_per_sec": ess_per_sec,
                "rmse_test_cold": quality,
                "ref_rmse_test": 0.0239,
            }
        )
    )
    for n in notes:
        print("# " + n, file=sys.stderr)


if __name__ == "__main__":
    main()
