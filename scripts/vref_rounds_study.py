"""Round-based VR adaptation vs frozen in-run fits: the d=61 transport study.

results/vref_transport.md ends with a measured scope limit: on the reference
net (4, 10, 1) (d = 61, Sunspot) ANY frozen Gaussian reference goes stale —
the cold chain leaves its support within the run (retained-phase E = LL-corr
+56k +/- 33k against the burn-in fit), so the full-covariance family was not
built as an in-run mode. ptnn/rounds.py is the answer measured here: refit
the reference BETWEEN rounds (Surjanovic et al. 2022's actual schedule), each
round exactly Markov, budgets doubling, ladder re-spaced per round.

Arms (same total post-adaptation budget, same seeds):
  prior    — plain prior-anchored PT (the reference framework's path)
  welford  — in-run diagonal fit frozen at burn-in (vr_mode="welford")
  rounds-diag / rounds-full — R rounds of static refits, diag / full_cov

Metrics: final-round round trips/kstep, swap %, hot-pair acceptance, and the
staleness score — mean E = LL - corr of retained cold states under the
reference that round actually ran with (finite = the reference kept the
chain in support).

Writes results/vref_rounds.md. CPU-safe (the effect is statistical).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ptnn import PTConfig, sample
from ptnn import rounds as rounds_mod
from ptnn.data import load_regression
from ptnn.ops import roundtrip as rt_mod
from ptnn.ops import vref


def base_cfg(samples_per_chain: int, chains: int, maxtemp: float, d61: bool):
    return PTConfig(
        task="regression",
        topology=(4, 10, 1) if d61 else (4, 2, 1),
        num_samples=samples_per_chain * chains,
        num_chains=chains,
        maxtemp=maxtemp,
        swap_interval=2,
        swap_offset=0,
        swap_payload="untempered",
        swap_rule="metropolis",
        swap_style="even_odd",
        pt_phase_frac=2.0,
        proposal="precond_mala",
        step_w=0.01,
        adapt_rate=0.1,
        precond_start_frac=0.3,
        use_langevin_gradients=False,
        record_w=True,
        record_w_chains=1,
        record_eta=True,
        track_replicas=True,
        chunk_steps=500,
    ).validate()


def staleness(res, cfg) -> float:
    """Mean E = LL - corr of retained cold states under the run's own
    reference (vr runs record vr_corr_cur when record_ll_state)."""
    ll = np.asarray(res.traces["ll_cur"], np.float64)[:, 0]
    lo = max(1, int(cfg.burn_in * ll.shape[0]))
    if "vr_corr_cur" in res.traces:
        corr = np.asarray(res.traces["vr_corr_cur"], np.float64)[:, 0]
        return float(np.mean(ll[lo:] - corr[lo:]))
    return float(np.mean(ll[lo:]))


def transport_row(res, cfg):
    rt = rt_mod.roundtrip_stats(np.asarray(res.traces["replica"]), 1)
    pair_acc = np.asarray(res.pair_swap_accept, np.float64)
    return dict(
        rt_per_kstep=float(rt.rate_per_kstep),
        swap_pct=float(res.swap_percent),
        hot_pair_pct=100.0 * float(pair_acc[-1]),
        stale_e=staleness(res, cfg),
        rmse=float(
            np.mean(
                np.asarray(res.traces["rmse_test"], np.float64)[
                    max(1, int(cfg.burn_in * res.traces["rmse_test"].shape[0])):, 0
                ]
            )
        ),
    )


def run_arm(arm: str, cfg: PTConfig, train, test, seed: int, n_rounds: int,
            inflation: float = 1.0):
    if arm == "prior":
        c = dataclasses.replace(cfg, record_ll_state=True).validate()
        res = sample(c, train, test, seed=seed)
        return transport_row(res, c), None
    if arm == "welford":
        c = dataclasses.replace(
            cfg,
            variational_reference=True,
            vr_hot_infinite=True,
            vr_start_frac=0.25,
            record_ll_state=True,
        ).validate()
        res = sample(c, train, test, seed=seed)
        return transport_row(res, c), None
    family = "diag" if arm == "rounds-diag" else "full_cov"
    c = dataclasses.replace(
        cfg,
        variational_reference=True,
        vr_hot_infinite=True,
        vr_mode="static",
        vr_family=family,
        record_ll_state=True,
    ).validate()
    rr = rounds_mod.run_rounds(
        c, train, test, seed=seed, n_rounds=n_rounds, verbose=True,
        inflation=inflation,
    )
    return transport_row(rr.result, rr.config), rr.history


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--samples", type=int, default=4000,
                    help="final-round steps/chain (arms match this budget)")
    ap.add_argument("--chains", type=int, default=16)
    ap.add_argument("--maxtemp", type=float, default=20.0)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--inflation", type=float, default=1.0,
                    help="fit variance inflation for the rounds arms")
    ap.add_argument("--seeds", type=int, nargs="+", default=[4, 14])
    ap.add_argument("--arms", nargs="+",
                    default=["prior", "welford", "rounds-diag",
                             "rounds-full"])
    ap.add_argument("--small", action="store_true",
                    help="d=13 control topology instead of d=61")
    ap.add_argument("--out", default="results/vref_rounds.md")
    args = ap.parse_args(argv)

    p = load_regression("Sunspot")
    cfg = base_cfg(args.samples, args.chains, args.maxtemp, not args.small)
    arms = args.arms
    rows = {a: [] for a in arms}
    hists = {}
    for seed in args.seeds:
        for arm in arms:
            print(f"== arm {arm} seed {seed}", flush=True)
            row, hist = run_arm(arm, cfg, p.train, p.test, seed,
                                args.rounds, inflation=args.inflation)
            rows[arm].append(row)
            if hist is not None:
                hists[(arm, seed)] = hist
            print(f"   {row}", flush=True)

    d = cfg.w_size
    lines = [
        "# Round-based VR adaptation: d=%d Sunspot transport study" % d,
        "",
        f"Setup: topology {cfg.topology} (d={d}), {args.chains} chains, "
        f"maxtemp {args.maxtemp} (hot leg beta=0 for VR arms), DEO every 2 "
        f"steps, precond-MALA, final budget {args.samples} steps/chain, "
        f"{args.rounds} adaptation rounds (doubling), fit inflation "
        f"{args.inflation}, seeds {args.seeds}. "
        "Generated by scripts/vref_rounds_study.py.",
        "",
        "| arm | round trips/kstep | swap % | hot-pair acc % | "
        "retained-E under own ref | cold RMSE |",
        "|---|---|---|---|---|---|",
    ]
    for arm in arms:
        r = rows[arm]
        def band(key, fmt="%.2f"):
            v = [x[key] for x in r]
            return f"{fmt % np.mean(v)} ± {fmt % np.std(v)}"
        lines.append(
            f"| {arm} | {band('rt_per_kstep')} | {band('swap_pct', '%.1f')} "
            f"| {band('hot_pair_pct', '%.1f')} | {band('stale_e', '%.0f')} "
            f"| {band('rmse', '%.4f')} |"
        )
    lines.append("")
    for (arm, seed), hist in sorted(hists.items()):
        lines.append(f"## {arm} seed {seed} adaptation trajectory")
        lines.append("")
        lines.append(rounds_mod.format_history(hist))
        lines.append("")
    txt = "\n".join(lines)
    with open(args.out, "w") as f:
        f.write(txt + "\n")
    print(txt)


if __name__ == "__main__":
    main()
