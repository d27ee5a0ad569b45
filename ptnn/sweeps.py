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


def _run_grid(cfg, temps_batch, keys, train, test) -> Dict[str, np.ndarray]:
    data = make_dataset(cfg, train, test)
    n_steps = cfg.n_steps
    switch = cfg.temper_switch_step
    burnin = int(cfg.samples_per_chain * cfg.burn_in)
    is_reg = cfg.task == "regression"
    metric = "rmse_test" if is_reg else "acc_test"

    def run_one(temps, key):
        # make_step_fn closes over `temps`, which is a tracer here — the
        # whole sampler vmaps over the sweep axis.
        k_init, k_run = jax.random.split(key)
        state = kernel.init_state(k_init, cfg, data)
        step = kernel.make_step_fn(cfg, data, temps)
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

    out = fast_jit(jax.vmap(run_one))(temps_batch, keys)
    return {k: np.asarray(v) for k, v in out.items()}
