"""Feedback-optimized ladder on TPU: measure, retune, and show the payoff.

Demonstrates the full loop the framework enables and the reference could
not (fixed geometric grid, swap%-only observability, SURVEY.md §2.1):

1. ``ptnn.tuning.tune_ladder`` — pilot runs measure the per-pair expected
   swap rejection; rungs are re-spaced at equal increments of the estimated
   communication barrier (Syed et al. 2021).
2. The barrier total converts into a chain-count prescription
   (``suggest_num_chains``), which is the actual fix when the ladder is
   saturated (barrier per link > ~0.5 cannot be tuned away).
3. Geometric vs tuned vs suggested-size ladders are then compared on the
   transport metric that matters — replica round trips per 1k steps
   (ops/roundtrip.py) — plus cold-chain RMSE.

    python scripts/tune_ladder_demo.py [--chains 8] [--samples-per-chain 6000]

Writes a markdown report to stdout (committed as results/ladder_tuning.md).
"""

from __future__ import annotations

import dataclasses
import sys

sys.path.insert(0, ".")

import numpy as np


def flagship_cfg(chains: int, steps: int, maxtemp: float = 10.0):
    import ptnn

    return ptnn.PTConfig(
        task="regression",
        topology=(4, 10, 1),
        num_samples=chains * steps,
        num_chains=chains,
        maxtemp=maxtemp,
        swap_interval=10,
        swap_offset=0,
        swap_style="even_odd",
        swap_rule="metropolis",
        swap_payload="untempered",
        proposal="precond_mala",
        adapt_rate=0.1,
        warmstart_frac=0.1,
        precond_start_frac=0.3,
        pt_phase_frac=2.0,  # tempering for the whole run (canonical PT)
        chunk_steps=1000,
    ).validate()


def evaluate(cfg, prob, seeds=(10, 11, 12)):
    """Transport + quality metrics for one ladder, averaged over seeds."""
    import ptnn
    from ptnn.ops import roundtrip

    cfg = dataclasses.replace(cfg, track_replicas=True).validate()
    trips, rates, rmse, rej = [], [], [], []
    for seed in seeds:
        res = ptnn.sample(cfg, prob.train, prob.test, seed=seed)
        st = roundtrip.roundtrip_stats(res.traces["replica"])
        trips.append(int(st.round_trips.sum()))
        rates.append(st.rate_per_kstep)
        rmse.append(float(np.mean(res.traces["rmse_test"][res.traces["rmse_test"].shape[0] // 2 :, 0])))
        rej.append(1.0 - res.pair_swap_accept)
    return {
        "trips": trips,
        "rate": float(np.mean(rates)),
        "rmse": float(np.mean(rmse)),
        "reject": np.mean(rej, axis=0),
    }


def main() -> None:
    import ptnn
    from ptnn.data import load_regression
    from ptnn import tuning

    chains = int(
        next((a.split("=")[1] for a in sys.argv if a.startswith("--chains=")), "8")
    )
    steps = int(
        next(
            (a.split("=")[1] for a in sys.argv if a.startswith("--samples-per-chain=")),
            "6000",
        )
    )
    prob = load_regression("Sunspot")
    cfg = flagship_cfg(chains, steps)

    print(f"# Feedback-optimized ladder — Sunspot, {chains} chains, "
          f"maxtemp 10, precond_mala\n")
    out = tuning.tune_ladder(cfg, prob.train, prob.test, rounds=3, seeds=(0, 1))
    print("## Tuning rounds (2-seed rejection profiles)\n")
    print("| round | ladder | pair rejection | std | Lambda |")
    print("|---|---|---|---|---|")
    for i, r in enumerate(out.history):
        print(
            f"| {i} | {np.round(r.temperatures, 2).tolist()} "
            f"| {np.round(r.pair_reject, 2).tolist()} "
            f"| {np.std(r.pair_reject):.3f} | {r.barrier:.2f} |",
            flush=True,
        )
    print(
        f"\nBarrier estimate Lambda = {out.barrier:.2f} -> suggested chains "
        f"for <=0.5 rejection/link: **{out.suggested_num_chains}** "
        f"(running {chains}).\n"
    )

    print("## Transport payoff (3 held-out seeds each)\n")
    geo = evaluate(cfg, prob)
    tuned_cfg = dataclasses.replace(
        cfg, custom_ladder=tuple(float(t) for t in out.temperatures)
    ).validate()
    tuned = evaluate(tuned_cfg, prob)
    rows = [("geometric", chains, geo), ("tuned", chains, tuned)]

    c_sug = out.suggested_num_chains
    if c_sug > chains:
        big_cfg = flagship_cfg(c_sug, steps)
        big_out = tuning.tune_ladder(
            big_cfg, prob.train, prob.test, rounds=2, seeds=(0,)
        )
        big_tuned_cfg = dataclasses.replace(
            big_cfg, custom_ladder=tuple(float(t) for t in big_out.temperatures)
        ).validate()
        rows.append(("geometric", c_sug, evaluate(big_cfg, prob)))
        rows.append(("tuned", c_sug, evaluate(big_tuned_cfg, prob)))

    print("| ladder | chains | round trips/seed | trips per 1k steps "
          "| cold test RMSE | max pair reject |")
    print("|---|---|---|---|---|---|")
    for name, c, m in rows:
        print(
            f"| {name} | {c} | {m['trips']} | {m['rate']:.2f} "
            f"| {m['rmse']:.4f} | {m['reject'].max():.2f} |",
            flush=True,
        )


if __name__ == "__main__":
    main()
