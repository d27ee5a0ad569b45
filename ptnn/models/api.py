"""Model abstraction for the sampler kernel.

The reference supports exactly one model — the 2-layer sigmoid FNN — baked
into every layer of its code. Here a ``ModelSpec`` carries the pure functions
the MCMC kernel needs, so new families (the Bayesian CNN below, deeper MLPs)
plug into the same tempered sampler. ``fnn_spec`` reproduces the reference
semantics bit-for-bit; other specs are new capabilities.

All functions take the flat weight vector ``w``; batching over chains happens
in the kernel via ``jax.vmap``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ptnn.models import fnn
from ptnn.ops import drift as drift_mod


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    name: str
    w_size: int
    # forward(w, x) -> (N, n_out) raw outputs (sigmoid activations for the
    # reference FNN, logits for the CNN)
    forward: Callable[[jax.Array, jax.Array], jax.Array]
    # log_probs(out) -> (N, n_out) log class probabilities
    log_probs: Callable[[jax.Array], jax.Array]
    # drift(w, x, t, lrate) -> w' : one Langevin drift step (an SGD epoch for
    # the reference FNN; one full-batch gradient step for grad-based models)
    drift: Callable[[jax.Array, jax.Array, jax.Array, float], jax.Array]
    # dimension constants for the reference prior normalization terms
    prior_dim_classification: int
    prior_dim_regression: int
    # optional chain-batched drift: (C, w_size, lrate) -> (C, w_size); takes
    # precedence over vmap(drift) — used by the Pallas kernel
    batched_drift: Optional[Callable] = None
    # optional chain-batched forward: (C, w_size) x (N, I) -> (C, N, O);
    # takes precedence over vmap(forward) in the eval path — used by specs
    # with a Pallas-fused eval stage (e.g. cnn.digits_spec(fused_eval=True)).
    # Drift is unaffected (gradients flow through `forward`).
    batched_forward: Optional[Callable] = None

    def __hash__(self):
        return hash((self.name, self.w_size))


def fnn_spec(
    topo: Tuple[int, int, int],
    drift_mode: str = "sequential",
    drift_unroll: int = 8,
    mm_precision=None,
) -> ModelSpec:
    """The reference 2-layer sigmoid FNN with delta-rule SGD drift
    (exact reference semantics; see models/fnn.py and ops/drift.py).
    ``mm_precision`` overrides the forward matmul precision (bf16 eval mode
    passes DEFAULT; drift is unaffected)."""
    i, h, o = topo

    def forward(w, x):
        return fnn.forward(w, x, topo, precision=mm_precision)

    def log_probs(out):
        # softmax over the *sigmoid* outputs (pt_classification.py:108-110)
        return jax.nn.log_softmax(out, axis=-1)

    if drift_mode == "sequential":
        def drift(w, x, t, lrate, mask=None, w_mask=None):
            return drift_mod.sgd_epoch_sequential(
                w, x, t, topo, lrate, unroll=drift_unroll, mask=mask,
                w_mask=w_mask,
            )
    elif drift_mode == "pallas":
        # chain-batched Pallas kernel (ops/pallas_drift.py); the kernel
        # wants the whole (C, w_size) block, so it is installed by the
        # sampler kernel via `batched_drift` below rather than per-chain
        drift = None
    else:
        def drift(w, x, t, lrate, mask=None, w_mask=None):
            return drift_mod.sgd_epoch_batch(
                w, x, t, topo, lrate, mask=mask, w_mask=w_mask
            )

    batched = None
    if drift_mode == "pallas":
        from ptnn.ops import pallas_drift

        def batched(w, x, t, lrate, interpret=False):
            return pallas_drift.sgd_epoch_sequential_pallas_impl(
                w, x, t, topo, lrate, interpret=interpret
            )

    return ModelSpec(
        name=f"fnn{topo}-{drift_mode}"
        + (f"-mm{mm_precision}" if mm_precision is not None else ""),
        w_size=fnn.w_size(topo),
        forward=forward,
        log_probs=log_probs,
        drift=drift,
        batched_drift=batched,
        # pt_classification.py:227: d*h + h + o + h*o (== w_size)
        prior_dim_classification=i * h + h + o + h * o,
        # pt_timeseries_regression.py:218: d*h + h + 2
        prior_dim_regression=i * h + h + 2,
    )


def grad_drift(loss_fn: Callable, lrate_scale: float = 1.0):
    """Langevin drift for arbitrary differentiable models: one full-batch
    gradient-descent step on ``loss_fn(w, x, t)``. The MH q-ratio correction
    in the kernel keeps the sampler exact for any deterministic drift."""

    def drift(w, x, t, lrate, mask=None, w_mask=None):
        if mask is not None or w_mask is not None:
            raise ValueError(
                "grad_drift has no row/parameter-mask support (dataset "
                "grids are FNN-only; mask the loss_fn to extend it)"
            )
        g = jax.grad(loss_fn)(w, x, t)
        return w - lrate * lrate_scale * g

    return drift
