"""Feedback-optimized temperature ladders from pilot runs.

The reference's ladder is one fixed geometric formula for every dataset
(pt_classification.py:537-622). This module closes the loop the framework's
measurements enable: run a short pilot, read the per-pair expected swap
acceptance (``SampleResult.pair_swap_accept``, Rao-Blackwellized inside the
compiled sweep), re-space the rungs at equal increments of the estimated
communication barrier (``ops/ladder.py:barrier_tuned_temperatures``, Syed et
al. 2021), and repeat. The tuned ladder feeds back in through
``PTConfig.custom_ladder``.

The barrier total also answers the question the reference's user had no way
to ask: *is this ladder even big enough?* ``suggest_num_chains`` converts
the measured barrier into the chain count needed for a target per-pair
rejection.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Sequence

import numpy as np

from ptnn.config import PTConfig
from ptnn.ops import ladder as ladder_mod


class TuneRound(NamedTuple):
    temperatures: np.ndarray  # (C,) ladder this round measured
    pair_reject: np.ndarray  # (C-1,) mean expected rejection per pair
    barrier: float  # total communication barrier estimate Lambda
    swap_percent: float


class TuneResult(NamedTuple):
    temperatures: np.ndarray  # (C,) the tuned ladder (feed to custom_ladder)
    history: list  # [TuneRound] per feedback round, pilot first
    barrier: float  # final-round barrier estimate
    suggested_num_chains: int  # chains needed for target rejection 0.5


def suggest_num_chains(total_barrier: float, target_reject: float = 0.5) -> int:
    """Chains needed so each of the C-1 links carries <= target_reject of the
    measured barrier (equalized schedule splits Lambda evenly; Syed et al.
    2021 recommend operating DEO near or below ~0.5 rejection per link)."""
    if not (0.0 < target_reject < 1.0):
        raise ValueError("target_reject must be in (0, 1)")
    if total_barrier <= 0.0:
        return 2
    return int(np.ceil(total_barrier / target_reject)) + 1


def tune_ladder(
    cfg: PTConfig,
    train: np.ndarray,
    test: np.ndarray,
    rounds: int = 2,
    seeds: Sequence[int] = (0,),
    pilot_samples: int | None = None,
    mesh=None,
    model_spec=None,
) -> TuneResult:
    """Iteratively equalize per-pair swap rejection over ``rounds`` pilots.

    Each round samples with the current ladder (averaging the rejection
    profile over ``seeds``), then re-spaces the rungs at equal barrier
    increments. Pilots force ``pt_phase_frac=2.0`` (tempering held for the
    whole run): after the reference's 60% temper switch every rung samples
    at T=1 and rejections collapse toward zero, which would dilute the
    profile the tuner needs. Trace recording is disabled for speed.

    Returns the tuned ladder (NOT re-measured after the last adjustment),
    the per-round history, and the chain-count suggestion derived from the
    final barrier estimate.

    Replicated ladders (``cfg.n_ladders > 1``) make the pilot R times
    cheaper per unit of precision: every replica measures the same
    (K-1)-pair rejection profile, so the profiles pool across replicas and
    all returned/record arrays are PER-LADDER (length K / K-1) — the tuned
    schedule feeds straight back into ``custom_ladder``, which tiles.
    ``suggested_num_chains`` is then rungs per ladder.
    """
    from ptnn import sampler as sampler_mod

    if cfg.num_chains < 3:
        raise ValueError("ladder tuning needs at least 3 chains")
    pilot = dataclasses.replace(
        cfg,
        num_samples=pilot_samples if pilot_samples is not None else cfg.num_samples,
        pt_phase_frac=2.0,
        record_fx=False,
        record_w=False,
        track_replicas=False,
    ).validate()

    temps = None
    history: list[TuneRound] = []
    for _ in range(max(1, rounds)):
        cur = (
            pilot
            if temps is None
            else dataclasses.replace(
                pilot, custom_ladder=tuple(float(t) for t in temps)
            ).validate()
        )
        rej_acc, swap_acc, temps_used = [], [], None
        k = pilot.rungs_per_ladder
        for seed in seeds:
            res = sampler_mod.sample(
                cur, train, test, seed=seed, mesh=mesh, model_spec=model_spec
            )
            acc = res.pair_swap_accept  # (C-1,)
            if pilot.n_ladders > 1:
                # replicated ladders: every replica measures the SAME
                # (K-1)-pair profile (boundary pairs are masked, never
                # proposed) — pooling the R profiles cuts the estimator
                # variance ~R-fold per pilot
                acc = np.mean(
                    [
                        acc[r * k : r * k + k - 1]
                        for r in range(pilot.n_ladders)
                    ],
                    axis=0,
                )
            rej_acc.append(1.0 - acc)
            swap_acc.append(res.swap_percent)
            temps_used = res.temperatures[:k]
        rej = np.mean(rej_acc, axis=0)
        history.append(
            TuneRound(
                temperatures=np.asarray(temps_used),
                pair_reject=rej,
                barrier=float(rej.sum()),
                swap_percent=float(np.mean(swap_acc)),
            )
        )
        temps = ladder_mod.barrier_tuned_temperatures(temps_used, rej)

    barrier = history[-1].barrier
    return TuneResult(
        temperatures=np.asarray(temps),
        history=history,
        barrier=barrier,
        suggested_num_chains=suggest_num_chains(barrier),
    )
