"""Surrogate-assisted parallel tempering (functional, TPU-native).

The reference carries *dead* surrogate plumbing — per-chain surrogate queues
and ``surrogate_interval``/``surrogate_prob`` knobs threaded through
``ptReplica`` with no surrogate model behind them
(multicore-pt-classification/Misc_code/canonical_pt_classifier.py:462-465,
pt_bettermemoryman.py:148-149; SURVEY.md §2.2). This module implements the
capability those knobs gesture at (cf. Chandra et al.'s surrogate-assisted
PT line of work), designed for the fused TPU sampler:

* one GLOBAL surrogate of the untempered train log-likelihood
  ``ll(w) ~ theta . phi(w)`` shared by all chains, with quadratic features
  ``phi(w) = [1, w, w^2, (P w)^2]`` (elementwise squares capture the
  Gaussian-prior-scale curvature exactly; the fixed Gaussian projection ``P``
  adds cross terms) — ridge-fit by normal equations, a few microseconds on
  the MXU;
* training pairs are the ``(w_proposal, ll_proposal)`` evaluations the
  sampler computes anyway, collected into an on-device ring buffer;
* the surrogate decision is per STEP, not per chain — on a surrogate step
  the true likelihood (the full-dataset eval) is skipped for the whole
  ladder. NOTE: skipping only pays when that eval costs well above the
  ~0.3-0.6 ms/step conditional+bookkeeping overhead measured on TPU; at
  reference problem scales it does NOT (COVERAGE.md "honest on-chip
  picture") — the feature's value there is algorithmic, not wall-clock;
* every chunk boundary refits the surrogate AND re-anchors each chain's
  carried likelihood with a true evaluation (the same recompute the 60%
  temper switch uses), bounding the surrogate bias between anchors.

Two modes (``PTConfig.surrogate_mode``):

* ``"anchored"`` — like the published scheme, surrogate steps make the
  sampler approximate; accuracy is controlled by ``surrogate_prob`` and the
  chunk cadence (each chunk boundary re-anchors with a true evaluation).
* ``"delayed_acceptance"`` — EXACT: consecutive surrogate steps form one
  composite proposal (inner RW-MH against the surrogate target, which is
  reversible w.r.t. it, so the composite's q-ratio telescopes to the
  surrogate ratio), corrected by a single true-likelihood Metropolis test
  when the segment closes (Christen & Fox 2005, generalized to multi-step
  segments). Every segment kernel leaves the exact tempered posterior
  invariant for the surrogate coefficients in effect; refits only happen at
  chunk boundaries, between closed segments (standard adaptive-MCMC regime).
  See kernel.DAState / kernel step_da.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class SurrogateState(NamedTuple):
    buf_w: jax.Array  # (B, W) recent proposals
    buf_ll: jax.Array  # (B,) their untempered log-likelihoods
    count: jax.Array  # () int32 — rows written so far (saturates at B)
    ptr: jax.Array  # () int32 — ring pointer
    theta: jax.Array  # (D,) fitted coefficients
    fitted: jax.Array  # () bool


def feature_dim(w_size: int, n_proj: int) -> int:
    return 1 + 2 * w_size + n_proj


def make_projection(key: jax.Array, w_size: int, n_proj: int) -> jax.Array:
    """Fixed Gaussian projection for the quadratic features."""
    return jax.random.normal(key, (n_proj, w_size), jnp.float32) / jnp.sqrt(
        jnp.asarray(w_size, jnp.float32)
    )


def features(w: jax.Array, proj: jax.Array) -> jax.Array:
    """phi(w) for a batch: (C, W) -> (C, D)."""
    pw = jnp.einsum("kw,cw->ck", proj, w, precision=jax.lax.Precision.HIGHEST)
    ones = jnp.ones((w.shape[0], 1), w.dtype)
    return jnp.concatenate([ones, w, w * w, pw * pw], axis=1)


def init_for(cfg, w_size: int) -> SurrogateState:
    """Surrogate state for a config: buffer rounded to a multiple of the
    chain count (block pushes never wrap mid-write) and features over
    [w, eta] (the regression noise variance is part of the input).

    Re-checks the buffer-vs-feature-dim guard with the REAL ``w_size``:
    PTConfig.validate() can only see the topology-derived size, which
    understates the feature dim when a custom ``model_spec`` (CNN/MLP) is
    passed to ``sample()`` — without this, an undersized buffer would leave
    the ridge fit silently inactive (the failure mode config validation
    exists to reject)."""
    c = cfg.num_chains
    buf = ((cfg.surrogate_buffer + c - 1) // c) * c
    fdim = feature_dim(w_size + 1, cfg.surrogate_proj)
    if buf < fdim:
        raise ValueError(
            f"surrogate_buffer={cfg.surrogate_buffer} (rounded to {buf}) is "
            f"below the surrogate feature dimension {fdim} for the model's "
            f"w_size={w_size}: the ridge fit would never activate. Raise "
            f"surrogate_buffer to >= {fdim} or lower surrogate_proj."
        )
    return init(buf, w_size + 1, cfg.surrogate_proj)


def init(buffer_size: int, w_size: int, n_proj: int) -> SurrogateState:
    d = feature_dim(w_size, n_proj)
    return SurrogateState(
        buf_w=jnp.zeros((buffer_size, w_size), jnp.float32),
        buf_ll=jnp.zeros((buffer_size,), jnp.float32),
        count=jnp.zeros((), jnp.int32),
        ptr=jnp.zeros((), jnp.int32),
        theta=jnp.zeros((d,), jnp.float32),
        fitted=jnp.zeros((), jnp.bool_),
    )


def push(state: SurrogateState, w: jax.Array, ll: jax.Array) -> SurrogateState:
    """Append a (C, W) block of pairs to the ring buffer. Requires the
    buffer size to be a multiple of the chain count (checked at config
    time), so a block never wraps mid-write."""
    c = w.shape[0]
    b = state.buf_w.shape[0]
    start = state.ptr
    buf_w = jax.lax.dynamic_update_slice(state.buf_w, w, (start, 0))
    buf_ll = jax.lax.dynamic_update_slice(state.buf_ll, ll, (start,))
    return state._replace(
        buf_w=buf_w,
        buf_ll=buf_ll,
        ptr=(start + c) % b,
        count=jnp.minimum(state.count + c, b),
    )


def push_masked(
    state: SurrogateState, z: jax.Array, ll: jax.Array, valid: jax.Array
) -> SurrogateState:
    """Conditional-free masked block push: when scalar ``valid`` is False the
    buffer, pointer, and count are all unchanged (the write blends the
    existing rows back). Lets the sampler hoist pushes OUT of lax.switch
    branches — per-step conditionals with large operands are the dominant
    overhead of surrogate bookkeeping on TPU."""
    c = z.shape[0]
    b = state.buf_w.shape[0]
    cur_w = jax.lax.dynamic_slice(state.buf_w, (state.ptr, 0), (c, z.shape[1]))
    cur_ll = jax.lax.dynamic_slice(state.buf_ll, (state.ptr,), (c,))
    buf_w = jax.lax.dynamic_update_slice(
        state.buf_w, jnp.where(valid, z, cur_w), (state.ptr, 0)
    )
    buf_ll = jax.lax.dynamic_update_slice(
        state.buf_ll, jnp.where(valid, ll, cur_ll), (state.ptr,)
    )
    adv = jnp.where(valid, c, 0).astype(jnp.int32)
    return state._replace(
        buf_w=buf_w,
        buf_ll=buf_ll,
        ptr=(state.ptr + adv) % b,
        count=jnp.minimum(state.count + adv, b),
    )


def fit(
    state: SurrogateState,
    proj: jax.Array,
    ridge: float = 1e-3,
    min_r2: float = 0.7,
) -> SurrogateState:
    """Ridge regression over the valid buffer rows (normal equations).

    ``fitted`` is only set while the in-buffer r-squared clears ``min_r2`` —
    a poor fit silently falls back to true evaluations rather than feeding
    the sampler a misleading likelihood.
    """
    b = state.buf_w.shape[0]
    valid = (jnp.arange(b) < state.count).astype(jnp.float32)
    phi = features(state.buf_w, proj) * valid[:, None]
    y = state.buf_ll * valid
    d = phi.shape[1]
    gram = (
        jnp.matmul(phi.T, phi, precision=jax.lax.Precision.HIGHEST)
        + ridge * jnp.eye(d, dtype=jnp.float32)
    )
    rhs = jnp.matmul(phi.T, y, precision=jax.lax.Precision.HIGHEST)
    theta = jax.scipy.linalg.solve(gram, rhs, assume_a="pos")
    # need enough rows to be determined; keep unfitted until buffer has
    # at least d samples
    ok = state.count >= jnp.asarray(d, jnp.int32)
    theta = jnp.where(ok, theta, state.theta)
    cand = state._replace(theta=theta)
    good = jnp.logical_and(ok, r_squared(cand, proj) >= min_r2)
    return cand._replace(fitted=good)


def predict(state: SurrogateState, proj: jax.Array, w: jax.Array) -> jax.Array:
    """Surrogate log-likelihood for a (C, W) block -> (C,)."""
    return features(w, proj) @ state.theta


def grad_predict(
    state: SurrogateState, proj: jax.Array, z: jax.Array
) -> jax.Array:
    """Analytic gradient of the surrogate log-likelihood, (C, Z) -> (C, Z).

    d/dz [theta . phi(z)] with phi(z) = [1, z, z^2, (Pz)^2]:
    ``theta_z + 2 theta_z2 * z + 2 P^T ((Pz) * theta_p)``. A few matvecs —
    this is what makes surrogate-MALA inner moves nearly free (kernel
    step_da with surrogate_inner="mala")."""
    zdim = z.shape[1]
    t_z = state.theta[1 : 1 + zdim]
    t_z2 = state.theta[1 + zdim : 1 + 2 * zdim]
    t_p = state.theta[1 + 2 * zdim :]
    pz = jnp.einsum("kw,cw->ck", proj, z, precision=jax.lax.Precision.HIGHEST)
    cross = jnp.einsum(
        "ck,kw->cw", pz * t_p[None, :], proj,
        precision=jax.lax.Precision.HIGHEST,
    )
    return t_z[None, :] + 2.0 * t_z2[None, :] * z + 2.0 * cross


def r_squared(state: SurrogateState, proj: jax.Array) -> jax.Array:
    """In-buffer goodness of fit (diagnostic)."""
    b = state.buf_w.shape[0]
    valid = (jnp.arange(b) < state.count).astype(jnp.float32)
    pred = predict(state, proj, state.buf_w)
    resid = (pred - state.buf_ll) * valid
    n = jnp.maximum(state.count.astype(jnp.float32), 1.0)
    mean = jnp.sum(state.buf_ll * valid) / n
    tot = jnp.sum(jnp.square((state.buf_ll - mean) * valid))
    return 1.0 - jnp.sum(jnp.square(resid)) / jnp.maximum(tot, 1e-9)
