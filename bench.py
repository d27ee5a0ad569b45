"""Headline benchmark: chain-steps/sec on the Sunspot PT config.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference's 10-process CPU run aggregates ~370 chain-steps/sec
on the regression suite (BASELINE.md "Throughput": ~35-45 steps/s/chain x 10
chains, Res_RW master_result_file.txt). Here the whole 64-chain temperature
ladder is one fused XLA scan on a single TPU chip.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    import ptnn
    from ptnn.data import load_regression

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

    stats = ptnn.throughput_run(cfg, prob.train, prob.test, seed=0)
    value = stats["chain_steps_per_sec"]

    # ESS/sec of the cold chain (BASELINE.json metric): quick streamed run
    # with weight traces, ESS over post-burn-in parameter draws.
    import dataclasses

    import numpy as np

    from ptnn.ops import ess as ess_mod

    ess_cfg = dataclasses.replace(cfg, num_samples=cfg.num_chains * 2000, record_w=True)
    res = ptnn.sample(ess_cfg, prob.train, prob.test, seed=1)
    b = ess_cfg.samples_per_chain // 2
    cold = res.traces["w"][b:, 0, :]
    ess_val = ess_mod.multi_ess(cold, max_params=16)
    # steady-state ESS/sec: draws per second at the fused throughput rate
    steps_per_sec_per_chain = value / chains
    ess_per_sec = ess_val / (cold.shape[0] / steps_per_sec_per_chain)
    baseline = 370.0  # aggregate chain-steps/sec, 10-proc CPU reference
    print(
        json.dumps(
            {
                "metric": "sunspot_rw_pt_chain_steps_per_sec_64chains_1chip",
                "value": round(value, 1),
                "unit": "chain-steps/s",
                "vs_baseline": round(value / baseline, 2),
            }
        )
    )
    print(
        f"# elapsed {stats['elapsed_s']:.2f}s for {int(stats['steps'])} steps x "
        f"{chains} chains; accept {stats['accept_pct']:.1f}%, swap "
        f"{stats['swap_pct']:.1f}%, cold-chain final test RMSE "
        f"{stats['final_rmse_test_cold']:.4f}; cold-chain ESS "
        f"{ess_val:.0f} over {cold.shape[0]} draws -> {ess_per_sec:,.0f} ESS/s",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
