"""Classification experiment driver.

Equivalent of multicore-pt-classification/pt_classification.py ``main()``
(:899-1224): per-dataset topology blocks (:920-995), z-score + 70/30 split
for the combined sets (in ptnn.data), the reference hyperparameter block
(:1036-1045) as CLI defaults, auto-versioned output dirs, the 15-column
master row (fmt %1.2f, :1140) and diagnostic plots.

Examples:
    python -m ptnn.experiments.classification --problem iris
    python -m ptnn.experiments.classification --problem all --langevin
"""

from __future__ import annotations

import argparse
import dataclasses

from ptnn.config import classification_preset
from ptnn.data import CLASSIFICATION_TOPOLOGIES, load_classification
from ptnn.experiments.runner import run_problem

# reference problem loop order (problems 3..8, pt_classification.py:901)
PROBLEM_ORDER = ["iris", "Ionosphere", "Cancer", "bank-additional", "PenDigit", "chess"]


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--problem", default="iris", help="dataset name or 'all'")
    p.add_argument("--samples", type=int, default=50_000, help="total samples")
    p.add_argument("--chains", type=int, default=10)
    p.add_argument("--maxtemp", type=float, default=10.0)
    p.add_argument("--swap-ratio", type=float, default=0.02)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--langevin", action="store_true", default=False)
    p.add_argument("--drift-mode", choices=("sequential", "batch"), default="sequential")
    p.add_argument(
        "--proposal",
        choices=("reference", "precond_rw", "precond_mala", "hmc", "pcn"),
        default="reference",
        help="proposal family (PTConfig.proposal): 'reference' keeps the "
        "reference RW/Langevin machinery (--langevin & friends); the "
        "precond_*/hmc flagship modes replace it (adapted per-chain scales "
        "+ Welford diagonal preconditioner, DEO swaps every 10 steps)",
    )
    p.add_argument(
        "--leapfrog",
        type=int,
        default=8,
        help="leapfrog steps per hmc proposal (PTConfig.hmc_leapfrog)",
    )
    p.add_argument(
        "--ladders",
        type=int,
        default=1,
        help="replicated tempering ensembles (PTConfig.n_ladders): run R "
        "independent (chains/R)-rung ladders in one program; the R cold "
        "chains' ESS adds (results/ladder_ensembles.md)",
    )
    p.add_argument(
        "--fused",
        action="store_true",
        help="execute inter-swap intervals as fused Pallas blocks "
        "(PTConfig.fused_step): ~2x chain-steps/s for RW/MALA and 1.64x "
        "for HMC/ChEES at reference scales; unsupported configs fall "
        "back to the per-step sampler with a warning (ptnn/fused.py)",
    )
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data-seed", type=int, default=0, help="train/test split seed")
    p.add_argument("--out", default="results/classification")
    p.add_argument("--no-plots", action="store_true")
    p.add_argument("--mesh", action="store_true", help="shard chains over devices")
    p.add_argument(
        "--truepos",
        action="store_true",
        help="aggregate the cold chain only (reference truepos variant)",
    )
    p.add_argument(
        "--evidence",
        action="store_true",
        help="estimate the ladder marginal-likelihood difference "
        "(TI + stepping-stone, ops/evidence.py) and write evidence.txt",
    )
    p.add_argument(
        "--roundtrip",
        action="store_true",
        help="track replica identities and write ladder transport "
        "diagnostics (round-trip rate + up-flow f(k), ops/roundtrip.py)",
    )
    p.add_argument(
        "--vref",
        action="store_true",
        help="variational-reference tempering (stabilized PT, ops/vref.py): "
        "anneal toward a cold-chain-fitted Gaussian with a beta=0 reference "
        "leg refreshed IID at swap events. Implies the exact swap machinery "
        "(metropolis rule, untempered payloads, DEO sweeps) and the "
        "canonical (no temper-switch) schedule; pair with --roundtrip to "
        "see the transport effect (results/vref_transport.md)",
    )
    p.add_argument(
        "--vr-rounds",
        type=int,
        default=0,
        metavar="R",
        help="round-based VR adaptation (ptnn/rounds.py, implies --vref): "
        "R rounds of doubling budgets, each refitting the reference on the "
        "previous round's cold draws and re-spacing the ladder at equal "
        "communication-barrier increments (Surjanovic et al. 2022 + Syed "
        "et al. 2021); the final round carries the full --samples budget "
        "and is exactly Markov under its constant reference",
    )
    p.add_argument(
        "--vr-family",
        choices=("diag", "full_cov"),
        default="full_cov",
        help="reference family for --vr-rounds: mean-field diagonal or "
        "full-covariance Gaussian (fit between rounds on the host)",
    )
    p.add_argument(
        "--replicate",
        type=int,
        default=0,
        metavar="S",
        help="run S independently-seeded replications (one compile, S "
        "executions) and report the cross-seed split-R-hat convergence "
        "gate + test-metric band (replication.txt) -- the honest mixing "
        "check; within-run ESS cannot see metastability "
        "(results/convergence.md)",
    )
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    problems = PROBLEM_ORDER if args.problem == "all" else [args.problem]
    for name in problems:
        prob = load_classification(name, seed=args.data_seed)
        cfg = classification_preset(
            topology=prob.topology,
            num_samples=args.samples,
            num_chains=args.chains,
            maxtemp=args.maxtemp,
            swap_ratio=args.swap_ratio,
            use_langevin_gradients=args.langevin,
            learn_rate=args.lr,
            canonical=args.vref or args.vr_rounds > 0,  # VR: no temper switch
        )
        cfg = dataclasses.replace(
            cfg, drift_mode=args.drift_mode, n_ladders=args.ladders
        ).validate()
        if args.proposal != "reference":
            cfg = dataclasses.replace(
                cfg,
                proposal=args.proposal,
                hmc_leapfrog=args.leapfrog,
                use_langevin_gradients=False,
                swap_style="even_odd",
                swap_interval=10,
                step_w=0.01,
                adapt_rate=0.1,
                precond_start_frac=0.3,
            ).validate()
        if args.vref or args.vr_rounds > 0:
            # --vref --evidence composes: corrected-path estimators with
            # the analytic beta=0 anchor (absolute log marginal likelihood)
            cfg = dataclasses.replace(
                cfg,
                swap_payload="untempered",
                swap_rule="metropolis",
                swap_style="even_odd",
                variational_reference=True,
                vr_hot_infinite=True,
            ).validate()
            if args.vr_rounds > 0:
                cfg = dataclasses.replace(
                    cfg,
                    vr_mode="static",
                    vr_family=args.vr_family,
                ).validate()
        if args.fused:
            # applied last: fused_step validation depends on the final
            # proposal/task configuration
            cfg = dataclasses.replace(cfg, fused_step=True).validate()
        run_problem(
            prob,
            cfg,
            args.out,
            seed=args.seed,
            plots=not args.no_plots,
            use_mesh=args.mesh,
            truepos=args.truepos,
            evidence=args.evidence,
            roundtrip=args.roundtrip,
            replicate=args.replicate,
            vr_rounds=args.vr_rounds,
            master_fmt="%1.2f",
        )


if __name__ == "__main__":
    main()
