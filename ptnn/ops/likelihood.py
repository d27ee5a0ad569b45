"""Log-likelihoods, priors, and per-step metrics for the tempered sampler.

Reference math reproduced exactly (all *untempered* here — the sampler divides
by the per-chain adaptive temperature where the reference does):

* multinomial classification log-likelihood: sum of ``log softmax(out)[i, y_i]``
  (reference: multicore-pt-classification/pt_classification.py:209-222);
* Gaussian regression log-likelihood with sampled noise variance ``tau_sq``
  (reference: multicore-pt-regression/pt_timeseries_regression.py:200-205);
* Gaussian weight prior with sigma^2 = 25
  (classification: pt_classification.py:224-230; regression adds the
  inverse-gamma-style terms on tau_sq: pt_timeseries_regression.py:215-221);
* RMSE on the *predicted class index* for classification — a quirk of the
  reference (pt_classification.py:196-198 applied to argmax outputs) kept for
  artifact parity — and on the scalar outputs for regression;
* accuracy as a percentage (pt_classification.py:200-207).

Everything is batched over the data axis and vmappable over a chain axis.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ptnn.models import fnn

_LOG_2PI = math.log(2.0 * math.pi)


class ClassEval(NamedTuple):
    loglik: jax.Array  # scalar, untempered
    rmse: jax.Array  # scalar — RMSE of argmax class index vs label (quirk)
    acc: jax.Array  # scalar, percent
    fx: jax.Array  # (N,) predicted class indices (reference fx)


class RegEval(NamedTuple):
    loglik: jax.Array  # scalar, untempered
    rmse: jax.Array  # scalar
    fx: jax.Array  # (N,) scalar predictions


def rmse(pred: jax.Array, actual: jax.Array) -> jax.Array:
    """Root mean squared error (reference: pt_classification.py:196-198)."""
    return jnp.sqrt(jnp.mean(jnp.square(pred - actual)))


def accuracy(pred: jax.Array, actual: jax.Array) -> jax.Array:
    """Percentage of exact matches (reference: pt_classification.py:200-207)."""
    return 100.0 * jnp.mean(jnp.asarray(pred == actual, pred.dtype))


def classification_eval_from_logp(
    logp: jax.Array, out: jax.Array, y: jax.Array, mask: jax.Array = None
) -> ClassEval:
    """Multinomial log-likelihood + metrics from precomputed outputs.

    ``logp``: (N, O) log class probabilities, ``out``: raw outputs for the
    argmax prediction, ``y``: (N,) integer labels. The likelihood is
    ``sum_i logp[i, y_i]`` (pt_classification.py:213-219); the reference
    computes it per-sample with an explicit one-hot loop, which collapses to
    a batched gather here.

    ``mask``: optional (N,) {0,1} row-validity mask — padded rows contribute
    nothing to the likelihood and the metric denominators use ``mask.sum()``,
    so datasets of different lengths share one compiled program
    (sweeps.classification_grid), exactly like the regression path.
    """
    yi = y.astype(jnp.int32)
    gathered = jnp.take_along_axis(logp, yi[:, None], axis=-1)[:, 0]
    pred = jnp.argmax(out, axis=-1).astype(logp.dtype)
    yf = y.astype(logp.dtype)
    if mask is None:
        return ClassEval(
            loglik=jnp.sum(gathered),
            rmse=rmse(pred, yf),
            acc=accuracy(pred, yf),
            fx=pred,
        )
    n = jnp.sum(mask)
    return ClassEval(
        loglik=jnp.sum(mask * gathered),
        rmse=jnp.sqrt(jnp.sum(mask * jnp.square(pred - yf)) / n),
        acc=100.0 * jnp.sum(mask * jnp.asarray(pred == yf, pred.dtype)) / n,
        fx=pred,
    )


def classification_eval(
    w: jax.Array, x: jax.Array, y: jax.Array, topo: fnn.Topology
) -> ClassEval:
    """Reference-FNN fused forward + eval (softmax over sigmoid outputs,
    pt_classification.py:108-110)."""
    out = fnn.forward(w, x, topo)
    return classification_eval_from_logp(jax.nn.log_softmax(out, axis=-1), out, y)


def regression_eval_from_fx(
    fx: jax.Array, y: jax.Array, tau_sq: jax.Array, mask: jax.Array = None
) -> RegEval:
    """Gaussian log-likelihood from precomputed predictions
    (pt_timeseries_regression.py:200-205):
    ``sum_i [-0.5 log(2 pi tau^2) - 0.5 (y_i - fx_i)^2 / tau^2]``.

    ``mask``: optional (N,) {0,1} row-validity mask — padded rows contribute
    nothing and the effective N is ``mask.sum()``. This is what lets datasets
    of different lengths share one compiled program (sweeps.dataset_grid):
    the masked computation on the padded shape equals the unmasked one on
    the true rows exactly.
    """
    if mask is None:
        n = fx.shape[0]
        sse = jnp.sum(jnp.square(y - fx))
        r = rmse(fx, y)
    else:
        n = jnp.sum(mask)
        sse = jnp.sum(mask * jnp.square(y - fx))
        r = jnp.sqrt(sse / n)
    loglik = -0.5 * n * (_LOG_2PI + jnp.log(tau_sq)) - 0.5 * sse / tau_sq
    return RegEval(loglik=loglik, rmse=r, fx=fx)


def regression_eval(
    w: jax.Array, x: jax.Array, y: jax.Array, tau_sq: jax.Array, topo: fnn.Topology
) -> RegEval:
    """Reference-FNN fused forward + Gaussian eval."""
    return regression_eval_from_fx(fnn.forward(w, x, topo)[:, 0], y, tau_sq)


def classification_log_prior_dim(
    w: jax.Array, dim: int, sigma_sq: float = 25.0
) -> jax.Array:
    """Gaussian weight prior with an explicit dimension constant."""
    part1 = -0.5 * dim * jnp.log(sigma_sq)
    part2 = jnp.sum(jnp.square(w)) / (2.0 * sigma_sq)
    return part1 - part2


def classification_log_prior(
    w: jax.Array, topo: fnn.Topology, sigma_sq: float = 25.0
) -> jax.Array:
    """Gaussian weight prior (pt_classification.py:224-230):
    ``-(w_size/2) log(sigma^2) - sum(w^2) / (2 sigma^2)``.

    The reference's dimension term ``d*h + h + o + h*o`` equals ``w_size``.
    """
    i, h, o = topo
    return classification_log_prior_dim(w, i * h + h + o + h * o, sigma_sq)


def regression_log_prior_dim(
    w: jax.Array,
    tau_sq: jax.Array,
    dim: int,
    sigma_sq: float = 25.0,
    nu_1: float = 0.0,
    nu_2: float = 0.0,
) -> jax.Array:
    """Regression prior with an explicit dimension constant."""
    part1 = -0.5 * dim * jnp.log(sigma_sq)
    part2 = jnp.sum(jnp.square(w)) / (2.0 * sigma_sq)
    return part1 - part2 - (1.0 + nu_1) * jnp.log(tau_sq) - nu_2 / tau_sq


def regression_log_prior(
    w: jax.Array,
    tau_sq: jax.Array,
    topo: fnn.Topology,
    sigma_sq: float = 25.0,
    nu_1: float = 0.0,
    nu_2: float = 0.0,
) -> jax.Array:
    """Regression prior (pt_timeseries_regression.py:215-221).

    Note the reference's dimension term here is ``(d*h + h + 2)/2`` — NOT the
    full parameter count — plus inverse-gamma-style terms on tau^2. Kept
    verbatim for parity.
    """
    i, h, _o = topo
    part1 = -0.5 * (i * h + h + 2) * jnp.log(sigma_sq)
    part2 = jnp.sum(jnp.square(w)) / (2.0 * sigma_sq)
    return part1 - part2 - (1.0 + nu_1) * jnp.log(tau_sq) - nu_2 / tau_sq
