"""Round-based variational-reference adaptation (stabilized-PT rounds).

The in-run Welford reference (``PTConfig.vr_mode="welford"``) follows the
repo's freeze-at-burn-in exactness convention — but results/vref_transport.md
measured its failure mode on the d=61 reference net: any reference FROZEN
mid-run goes stale the moment the cold chain migrates past it, and a
mean-field (diagonal) family leaves a ~10^4-nat energy cliff at the hot end
even when perfectly fitted. This module implements the schedule Surjanovic,
Syed, Bouchard-Côté & Campbell (NeurIPS 2022) actually use, composed with the
NRPT ladder adaptation of Syed et al. (2021):

    round 0:  plain prior-anchored PT (a pilot);
    round r:  (a) fit the reference q — diagonal or FULL-COVARIANCE Gaussian
                  (ops/vref.py:fit_gaussian) — on round r-1's post-burn-in
                  cold-chain draws,
              (b) re-space the ladder at equal increments of round r-1's
                  measured communication barrier (ops/ladder.py,
                  barrier_tuned_temperatures),
              (c) run PT with that reference held CONSTANT
                  (``vr_mode="static"``, correction active from step 0) —
                  so every round is exactly Markov under a fixed path;
    budgets double each round (the NRPT doubling schedule), the final round
    carrying the caller's full ``cfg.num_samples``.

Configurations warm-start across rounds (kernel.init_state ``init_w`` /
``init_eta``): round r+1 begins where round r's replicas stood, with every
cached quantity (ll, g_like, fx) recomputed fresh at those coordinates.

The reference framework has no counterpart — its tempering path is pinned to
the prior (multicore-pt-regression/pt_timeseries_regression.py:300-330), which
is exactly the transport failure ops/roundtrip.py measures. Per-round
transport (round trips / kstep), barrier, swap %% and hot-rung regeneration
acceptance are recorded in the returned history so the adaptation's progress
is observable, in the spirit of the NRPT diagnostics.
"""

from __future__ import annotations

import dataclasses
import warnings
from typing import Any, List, NamedTuple, Optional, Sequence

import jax
import numpy as np

from ptnn import kernel
from ptnn.config import PTConfig
from ptnn.ops import ladder as ladder_mod
from ptnn.ops import roundtrip as rt_mod
from ptnn.ops import vref


class RoundRecord(NamedTuple):
    """Diagnostics of one adaptation round."""

    round_index: int
    samples_per_chain: int
    temperatures: np.ndarray  # (C,) ladder this round ran on
    swap_percent: float
    pair_reject: np.ndarray  # (C-1,) mean expected rejection per pair
    barrier: float  # Lambda estimate = sum of pair rejections
    round_trips_per_kstep: float
    regen_accept_percent: float  # hot-rung IID regeneration acceptance
    #                              (nan for the prior-anchored round 0)
    test_metric: float  # post-burn-in cold-chain mean test RMSE
    #                     (regression) or accuracy (classification)
    fit_draws: int  # cold draws the NEXT round's reference was fit on
    #                 (0 for the final round — nothing is fit after it)


class RoundsResult(NamedTuple):
    result: Any  # sampler.SampleResult of the FINAL round
    config: PTConfig  # the final round's config (static reference + ladder)
    mu: np.ndarray  # (Z,) fitted reference mean the final round used
    var: np.ndarray  # (Z,) fitted marginal variances
    chol: Optional[np.ndarray]  # (Z, Z) lower Cholesky (full_cov) or None
    history: List[RoundRecord]


def _z_draws(res, cfg: PTConfig) -> np.ndarray:
    """(n, Z) post-burn-in cold-chain reference coordinates of one round."""
    w = np.asarray(res.traces["w"], np.float64)  # (S, k, W)
    s = w.shape[0]
    lo = max(1, int(cfg.burn_in * s))  # row 0 is the untouched init row
    w = w[lo:, 0, :]
    if cfg.task == "regression":
        eta = np.asarray(res.traces["eta"], np.float64)[lo:, 0]
        return np.concatenate([w, eta[:, None]], axis=1)
    return w


def _round_record(
    r: int, res, cfg: PTConfig, fit_draws: int
) -> RoundRecord:
    pair_acc = np.asarray(res.pair_swap_accept, np.float64)
    rej = np.clip(1.0 - pair_acc, 0.0, 1.0)
    rt = rt_mod.roundtrip_stats(
        np.asarray(res.traces["replica"]), cfg.n_ladders
    )
    st = res.final_state
    if st.n_regen_proposed is not None and int(st.n_regen_proposed) > 0:
        regen = 100.0 * float(st.n_regen_accepted) / float(
            st.n_regen_proposed
        )
    else:
        regen = float("nan")
    key = "rmse_test" if cfg.task == "regression" else "acc_test"
    m = np.asarray(res.traces[key], np.float64)
    lo = max(1, int(cfg.burn_in * m.shape[0]))
    return RoundRecord(
        round_index=r,
        samples_per_chain=cfg.samples_per_chain,
        temperatures=np.asarray(res.temperatures, np.float64),
        swap_percent=float(res.swap_percent),
        pair_reject=rej,
        barrier=float(np.sum(rej)),
        round_trips_per_kstep=float(rt.rate_per_kstep),
        regen_accept_percent=regen,
        test_metric=float(np.mean(m[lo:, 0])),
        fit_draws=fit_draws,
    )


def round_budgets(
    final_samples_per_chain: int, n_rounds: int, min_samples: int = 256
) -> List[int]:
    """NRPT doubling schedule: the final round carries the full budget,
    each earlier round half the next one's, floored at ``min_samples``."""
    if n_rounds < 1:
        raise ValueError("n_rounds must be >= 1")
    out = []
    for r in range(n_rounds):
        s = final_samples_per_chain >> (n_rounds - 1 - r)
        out.append(max(min(min_samples, final_samples_per_chain), s))
    return out


def run_rounds(
    cfg: PTConfig,
    train: np.ndarray,
    test: np.ndarray,
    seed: int = 0,
    n_rounds: int = 4,
    min_round_samples: int = 256,
    shrinkage: float = 0.1,
    inflation: float = 1.0,
    retune_ladder: bool = True,
    warm_start: bool = True,
    mesh=None,
    model_spec=None,
    verbose: bool = False,
) -> RoundsResult:
    """Run ``n_rounds`` of reference-and-schedule adaptation; return the
    final round (exactly Markov under its constant reference) plus the
    per-round transport history.

    ``cfg`` describes the FINAL round: ``variational_reference=True``,
    ``vr_mode="static"``, ``vr_family`` in {"diag", "full_cov"}, and the full
    ``num_samples`` budget. Earlier rounds are derived from it (doubling
    budgets; round 0 drops the VR block entirely — the prior IS its
    reference). ``shrinkage``/``inflation`` feed ops/vref.py:fit_gaussian.
    Ladder re-spacing uses each round's Rao-Blackwellized rejection profile;
    the beta=0 hot leg (``vr_hot_infinite``) is preserved as an inversion
    endpoint. ``seed`` seeds round r as ``seed + r`` (per-step keys inside a
    round already derive from absolute step indices).
    """
    from ptnn import sampler as sampler_mod

    cfg.validate()
    if not (cfg.variational_reference and cfg.vr_mode == "static"):
        raise ValueError(
            "run_rounds drives the static-reference path: pass a final-round "
            "config with variational_reference=True, vr_mode='static'"
        )
    if cfg.fused_step:
        raise ValueError(
            "fused_step does not support the VR path (fused.runtime_reason)"
        )
    if cfg.w_size >= 40:
        # Measured scope limit, not a guess: on the reference d=61 net the
        # Gaussian families transport ZERO cold<->hot round trips at 16,
        # 32 AND 64 rungs while retained cold states sit ~10^5 log-units
        # outside every refit reference (results/vref_rounds.md, round-4
        # extension) — the family cannot cover the weight posterior's mode
        # structure, and adding rungs subdivides a path that is infeasible
        # at its endpoint. Plain prior-anchored PT transports better on
        # every ladder size tried.
        warnings.warn(
            f"rounds-VR with a Gaussian reference at w_size={cfg.w_size}: "
            "measured transport value is NEGATIVE on d>=40 neural "
            "posteriors (zero round trips, huge reference staleness — "
            "results/vref_rounds.md); prefer plain prior-anchored PT here"
        )
    budgets = round_budgets(
        cfg.samples_per_chain, n_rounds, min_round_samples
    )

    # round 0: prior-anchored pilot — the same sampler with the VR block off
    base = dataclasses.replace(
        cfg,
        variational_reference=False,
        vr_hot_infinite=False,
        vr_mode="welford",
        vr_family="diag",
        record_w=True,
        record_w_chains=max(1, cfg.record_w_chains),
        record_eta=cfg.task == "regression",
        track_replicas=True,
        record_fx=False,
    )

    history: List[RoundRecord] = []
    mu = var = chol = None
    temps: Optional[np.ndarray] = None
    prev_w = prev_eta = None
    res = None
    cur = None
    for r in range(n_rounds):
        last = r == n_rounds - 1
        cur = base if r == 0 else dataclasses.replace(
            cfg,
            record_w=True,
            record_w_chains=max(1, cfg.record_w_chains),
            record_eta=cfg.task == "regression" and (not last or cfg.record_eta),
            track_replicas=True,
            record_fx=cfg.record_fx if last else False,
        )
        cur = dataclasses.replace(
            cur, num_samples=budgets[r] * cfg.num_chains
        )
        if temps is not None:
            # feed the re-spaced ladder back in; build_temperatures re-pins
            # the hot rung to inf when vr_hot_infinite (a no-op here: the
            # inversion preserved the beta=0 endpoint)
            cur = dataclasses.replace(
                cur, custom_ladder=tuple(float(t) for t in temps)
            )
        cur = cur.validate()

        # init (fresh or warm-started), with the fitted reference injected
        data = sampler_mod.make_dataset(cur, train, test)
        spec = (
            model_spec
            if model_spec is not None
            else kernel.default_spec(cur)
        )
        k_init, _ = jax.random.split(jax.random.PRNGKey(seed + r))
        state = jax.jit(
            lambda k: kernel.init_state(
                k, cur, data, spec, init_w=prev_w, init_eta=prev_eta
            )
        )(k_init)
        if r > 0:
            state = kernel.set_static_reference(state, cur, mu, var, chol)

        res = sampler_mod.sample(
            cur,
            train,
            test,
            seed=seed + r,
            mesh=mesh,
            init_state=state,
            model_spec=model_spec,
        )

        fit_draws = 0
        if not last:
            draws = _z_draws(res, cur)
            fit_draws = draws.shape[0]
            mu, var, chol = vref.fit_gaussian(
                draws,
                family=cfg.vr_family,
                shrinkage=shrinkage,
                inflation=inflation,
            )
            if retune_ladder:
                rec_rej = np.clip(
                    1.0 - np.asarray(res.pair_swap_accept, np.float64),
                    0.0,
                    1.0,
                )
                temps = ladder_mod.barrier_tuned_temperatures(
                    np.asarray(res.temperatures, np.float64), rec_rej
                )
            if warm_start:
                prev_w = np.asarray(res.final_state.w, np.float32)
                prev_eta = (
                    np.asarray(res.final_state.eta, np.float32)
                    if cfg.task == "regression"
                    else None
                )
        history.append(_round_record(r, res, cur, fit_draws))
        if verbose:
            h = history[-1]
            print(
                f"[rounds] r={r} S={h.samples_per_chain} "
                f"swap%={h.swap_percent:.1f} barrier={h.barrier:.2f} "
                f"rt/kstep={h.round_trips_per_kstep:.1f} "
                f"regen%={h.regen_accept_percent:.1f} "
                f"metric={h.test_metric:.4f}"
            )

    return RoundsResult(
        result=res,
        config=cur,
        mu=np.asarray(mu) if mu is not None else None,
        var=np.asarray(var) if var is not None else None,
        chol=np.asarray(chol) if chol is not None else None,
        history=history,
    )


def format_history(history: Sequence[RoundRecord]) -> str:
    """Markdown table of the adaptation trajectory."""
    lines = [
        "| round | samples/chain | swap % | barrier | round trips/kstep "
        "| regen % | test metric | fit draws |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for h in history:
        regen = (
            "—"
            if np.isnan(h.regen_accept_percent)
            else f"{h.regen_accept_percent:.1f}"
        )
        lines.append(
            f"| {h.round_index} | {h.samples_per_chain} | "
            f"{h.swap_percent:.1f} | {h.barrier:.2f} | "
            f"{h.round_trips_per_kstep:.1f} | {regen} | "
            f"{h.test_metric:.4f} | {h.fit_draws} |"
        )
    return "\n".join(lines)
