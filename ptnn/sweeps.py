"""Vmapped hyperparameter sweeps: many PT runs as ONE compiled program.

The reference sweeps hyperparameters by editing loop bounds and re-running
the whole process pipeline per cell (SURVEY.md §5 "Config"). On TPU, sweep
points that share shapes (same chains/steps/dataset) differ only in *values*
— e.g. the temperature ladder for a maxtemp sweep — so the entire grid runs
as ``jax.vmap`` over a leading sweep axis: one compile, one launch, every
cell in flight simultaneously (SURVEY.md §7 stage 7).

Scalar traces only (the posterior trace of a whole grid would be large);
returns per-cell summary statistics.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ptnn import kernel
from ptnn.compat import fast_jit
from ptnn.config import PTConfig
from ptnn.ops import ladder
from ptnn.sampler import _step_keys, make_dataset


def seed_sweep(
    cfg: PTConfig,
    seeds: Sequence[int],
    train: np.ndarray,
    test: np.ndarray,
) -> Dict[str, np.ndarray]:
    """N independent replications of one config as a single vmapped program —
    run-to-run spread (mean/std over seeds) for the parity gates, which the
    reference could only estimate by re-running the whole process pipeline."""
    cfg = dataclasses.replace(cfg, record_w=False, record_fx=False).validate()
    temps = jnp.asarray(
        ladder.assign_temperatures(
            cfg.num_chains, cfg.maxtemp, cfg.geometric_ladder
        ),
        jnp.float32,
    )
    temps_batch = jnp.broadcast_to(temps, (len(seeds),) + temps.shape)
    keys = jnp.stack([jax.random.PRNGKey(int(s)) for s in seeds])
    return _run_grid(cfg, temps_batch, keys, train, test)


def maxtemp_sweep(
    cfg: PTConfig,
    maxtemps: Sequence[float],
    train: np.ndarray,
    test: np.ndarray,
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    """Run one PT sampler per maxtemp value, all cells in one vmapped scan.

    Returns per-cell arrays: pooled post-burn-in test metric mean/best,
    accept %, swap %.
    """
    cfg = dataclasses.replace(cfg, record_w=False, record_fx=False).validate()
    temps_batch = jnp.stack(
        [
            jnp.asarray(
                ladder.assign_temperatures(cfg.num_chains, float(mt)), jnp.float32
            )
            for mt in maxtemps
        ]
    )
    keys = jax.random.split(jax.random.PRNGKey(seed), len(maxtemps))
    return _run_grid(cfg, temps_batch, keys, train, test)


def swap_interval_sweep(
    cfg: PTConfig,
    intervals: Sequence[int],
    train: np.ndarray,
    test: np.ndarray,
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    """The reference's Res_SwapInterval sweep (multicore-pt-regression/
    Res_SwapInterval/master_result_file.txt) as ONE vmapped program: swap
    cadence enters the compiled step only as a step-index mask, so the
    interval can be a per-cell traced scalar (kernel.make_step_fn
    ``swap_interval_t``) instead of a recompile axis."""
    cfg = dataclasses.replace(cfg, record_w=False, record_fx=False).validate()
    temps = jnp.asarray(
        ladder.assign_temperatures(
            cfg.num_chains, cfg.maxtemp, cfg.geometric_ladder
        ),
        jnp.float32,
    )
    n = len(intervals)
    temps_batch = jnp.broadcast_to(temps, (n,) + temps.shape)
    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    si = jnp.asarray(list(intervals), jnp.int32)
    return _run_grid(cfg, temps_batch, keys, train, test, si_batch=si)


def lprob_sweep(
    cfg: PTConfig,
    lprobs: Sequence[float],
    train: np.ndarray,
    test: np.ndarray,
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    """The reference's Langevin-probability sweep (the regression driver's
    ``l_prob = i/10`` loop, pt_timeseries_regression.py:991; committed as
    Res_LG-Lprob/master_result_file.txt) as one vmapped program. Every cell
    pays the Langevin drift (the Bernoulli threshold is traced), so the
    l_prob=0 cell costs the same as l_prob=1 — one compile for the grid."""
    cfg = dataclasses.replace(
        cfg, record_w=False, record_fx=False, use_langevin_gradients=True
    ).validate()
    temps = jnp.asarray(
        ladder.assign_temperatures(
            cfg.num_chains, cfg.maxtemp, cfg.geometric_ladder
        ),
        jnp.float32,
    )
    n = len(lprobs)
    temps_batch = jnp.broadcast_to(temps, (n,) + temps.shape)
    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    lp = jnp.asarray(list(lprobs), jnp.float32)
    return _run_grid(cfg, temps_batch, keys, train, test, lp_batch=lp)


def _run_grid(
    cfg,
    temps_batch,
    keys,
    train,
    test,
    si_batch=None,
    lp_batch=None,
) -> Dict[str, np.ndarray]:
    data = make_dataset(cfg, train, test)
    n_steps = cfg.n_steps
    switch = cfg.temper_switch_step
    burnin = int(cfg.samples_per_chain * cfg.burn_in)
    is_reg = cfg.task == "regression"
    metric = "rmse_test" if is_reg else "acc_test"

    def run_one(temps, key, si, lp):
        # make_step_fn closes over `temps` (and optionally the traced swap
        # interval / langevin prob), which are tracers here — the whole
        # sampler vmaps over the sweep axis.
        k_init, k_run = jax.random.split(key)
        state = kernel.init_state(k_init, cfg, data)
        step = kernel.make_step_fn(
            cfg, data, temps, swap_interval_t=si, langevin_prob_t=lp
        )
        bounds = [(0, switch), (switch, n_steps)] if 0 < switch < n_steps else [
            (0, n_steps)
        ]
        traces = []
        for bi, (a, b) in enumerate(bounds):
            if bi > 0:
                state = step.recompute_ll(state)
            idx = a + jnp.arange(b - a)
            state, tr = jax.lax.scan(step, state, (idx, _step_keys(k_run, jnp.asarray(a), b - a)))
            traces.append(tr[metric])
        # scan traces have n_steps rows (no init row 0): trace row r of the
        # assembled samples array is produced by step r-1, so dropping the
        # first `burnin` SAMPLES means dropping steps < burnin-1
        m = jnp.concatenate(traces, axis=0)[max(burnin - 1, 0) :]  # (S-b, C)
        best = jnp.min(m) if is_reg else jnp.max(m)
        accept = jnp.mean(state.n_accept) * 100.0 / cfg.samples_per_chain
        swap_pct = jnp.where(
            state.n_swap_proposed > 0,
            100.0 * state.n_swap_accepted / jnp.maximum(state.n_swap_proposed, 1),
            0.0,
        )
        return {
            "test_mean": jnp.mean(m),
            "test_best": best,
            "accept_pct": accept,
            "swap_pct": swap_pct,
        }

    n_cells = temps_batch.shape[0]
    if si_batch is None:
        si_batch = jnp.full((n_cells,), cfg.swap_interval, jnp.int32)
        run = lambda t, k, si, lp: run_one(t, k, None, lp)
    else:
        run = run_one
    if lp_batch is None:
        lp_batch = jnp.full((n_cells,), cfg.langevin_prob, jnp.float32)
        run2 = lambda t, k, si, lp, _r=run: _r(t, k, si, None)
    else:
        run2 = run
    out = fast_jit(jax.vmap(run2))(temps_batch, keys, si_batch, lp_batch)
    return {k: np.asarray(v) for k, v in out.items()}
