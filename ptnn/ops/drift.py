"""Langevin-gradient drift: one epoch of delta-rule SGD over the dataset.

The reference's Langevin proposal drifts the weights by one epoch of
*per-sample* SGD with hand-coded backprop (``Network.langevin_gradient``,
multicore-pt-classification/pt_classification.py:114-132 with the delta rule
at :72-82; multicore-pt-regression/pt_timeseries_regression.py:99-118 with
per-neuron loops at :57-78). The update for one sample ``(x, t)`` — where
``t`` is the one-hot label (classification) or the scalar target
(regression) — is in both entry points:

    out_delta = (t - out) * out * (1 - out)
    hid_delta = (out_delta @ W2.T) * hid * (1 - hid)
    W2 += lr * outer(hid, out_delta);   B2 -= lr * out_delta
    W1 += lr * outer(x,  hid_delta);    B1 -= lr * hid_delta

(The bias sign is the reference's: biases are *subtracted* in the forward
pass and updated with ``-lr * delta``.)

Two modes:

* ``sequential`` — strict parity: a ``lax.scan`` over samples in dataset
  order, each step updating the weights before the next sample sees them.
  Order-dependent exactly like the reference. Unrolled to amortize scan
  overhead; vmaps over the chain axis so every scan step is a batched
  (chains, .) computation.
* ``batch`` — fast path: all per-sample updates evaluated at the *initial*
  weights and summed — one epoch's total movement without the sequential
  dependence, i.e. two MXU matmuls for the entire epoch. This changes the
  proposal distribution (documented deviation, SURVEY.md §7 hard-part 1) but
  the MH q-ratio correction keeps the sampler exact for *any* deterministic
  drift, so posterior correctness is preserved; only mixing differs.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ptnn.models import fnn
from ptnn.models.fnn import mm


def _delta_updates(
    p: fnn.FnnParams, x: jax.Array, t: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Per-sample delta-rule update directions at params ``p``.

    ``x``: (I,), ``t``: (O,) target vector. Returns (dW1, dB1, dW2, dB2)
    *already scaled* by nothing — caller applies the learning rate.
    """
    hid = jax.nn.sigmoid(mm(x, p.w1) - p.b1)
    out = jax.nn.sigmoid(mm(hid, p.w2) - p.b2)
    out_delta = (t - out) * out * (1.0 - out)
    hid_delta = mm(p.w2, out_delta) * hid * (1.0 - hid)
    dw2 = jnp.outer(hid, out_delta)
    db2 = -out_delta
    dw1 = jnp.outer(x, hid_delta)
    db1 = -hid_delta
    return dw1, db1, dw2, db2


def sgd_epoch_sequential(
    w: jax.Array,
    x: jax.Array,
    t: jax.Array,
    topo: fnn.Topology,
    lrate: float,
    unroll: int = 8,
    mask: jax.Array = None,
    w_mask: jax.Array = None,
) -> jax.Array:
    """One epoch of per-sample SGD in dataset order (strict reference parity).

    ``x``: (N, I) inputs, ``t``: (N, O) target vectors. ``mask``: optional
    (N,) {0,1} row-validity mask — a zero row's update is scaled to exactly
    nothing, so a padded dataset's epoch equals the unpadded one
    (sweeps.dataset_grid).

    ``w_mask``: optional (w_size,) {0,1} parameter-validity mask
    (sweeps.classification_grid envelope padding). Masked parameters are
    pinned at zero EVERY update — not just at epoch end — which matters for
    this sequential mode: if a padded hidden unit's outgoing weight drifted
    away from zero mid-epoch, later samples in the epoch would see its
    (sigmoid ≠ 0) activation leak into real outputs. With per-update masking
    the real-parameter trajectory is exactly the unpadded epoch's.
    """
    p = fnn.unpack(w, topo)
    m = jnp.ones(x.shape[0], x.dtype) if mask is None else mask
    mp = None if w_mask is None else fnn.unpack(w_mask, topo)

    def step(carry, xt):
        xi, ti, mi = xt
        dw1, db1, dw2, db2 = _delta_updates(carry, xi, ti)
        if mp is not None:
            dw1, db1 = dw1 * mp.w1, db1 * mp.b1
            dw2, db2 = dw2 * mp.w2, db2 * mp.b2
        lm = lrate * mi
        nxt = fnn.FnnParams(
            w1=carry.w1 + lm * dw1,
            b1=carry.b1 + lm * db1,
            w2=carry.w2 + lm * dw2,
            b2=carry.b2 + lm * db2,
        )
        return nxt, None

    p, _ = jax.lax.scan(step, p, (x, t, m), unroll=unroll)
    return fnn.pack(p)


def sgd_epoch_batch(
    w: jax.Array,
    x: jax.Array,
    t: jax.Array,
    topo: fnn.Topology,
    lrate: float,
    mask: jax.Array = None,
    w_mask: jax.Array = None,
) -> jax.Array:
    """Fast drift: sum of all per-sample updates evaluated at ``w``.

    Batched forward over the dataset, deltas for every sample at once, summed
    — the whole epoch is two matmuls each way. See module docstring for the
    (MH-corrected) deviation from the sequential reference drift.
    ``mask`` zeroes padded rows' contributions (hid_delta inherits the mask
    through out_delta).
    """
    p = fnn.unpack(w, topo)
    hid = jax.nn.sigmoid(mm(x, p.w1) - p.b1)  # (N, H)
    out = jax.nn.sigmoid(mm(hid, p.w2) - p.b2)  # (N, O)
    out_delta = (t - out) * out * (1.0 - out)  # (N, O)
    if mask is not None:
        # every update term below is linear in out_delta (hid_delta inherits
        # the zero), so masking it alone zeroes a padded row's contribution
        out_delta = out_delta * mask[:, None]

    hid_delta = mm(out_delta, p.w2.T) * hid * (1.0 - hid)  # (N, H)
    nxt = fnn.FnnParams(
        w1=p.w1 + lrate * mm(x.T, hid_delta),
        b1=p.b1 - lrate * jnp.sum(hid_delta, axis=0),
        w2=p.w2 + lrate * mm(hid.T, out_delta),
        b2=p.b2 - lrate * jnp.sum(out_delta, axis=0),
    )
    if w_mask is not None:
        # Masked parameters (envelope padding, sweeps.classification_grid)
        # stay pinned at zero. All updates here are evaluated at the INITIAL
        # weights, where padded hidden units contribute nothing to real
        # outputs (their outgoing weights are zero), so masking the final
        # update suffices — the real-parameter result equals the unpadded
        # epoch's exactly (unlike the sequential mode, which must mask every
        # per-sample update).
        return fnn.pack(nxt) * w_mask
    return fnn.pack(nxt)


def make_targets(y: jax.Array, n_out: int, task: str) -> jax.Array:
    """Per-sample target vectors for the delta rule.

    Classification: one-hot of the integer label
    (pt_classification.py:72-75); regression: the raw target column(s)
    (pt_timeseries_regression.py:57-58).
    """
    if task == "classification":
        return jax.nn.one_hot(y.astype(jnp.int32), n_out, dtype=jnp.float32)
    return y.reshape(-1, 1).astype(jnp.float32)


@partial(jax.jit, static_argnames=("topo", "lrate", "mode", "unroll"))
def langevin_drift(
    w: jax.Array,
    x: jax.Array,
    t: jax.Array,
    topo: fnn.Topology,
    lrate: float,
    mode: str = "sequential",
    unroll: int = 8,
) -> jax.Array:
    """Dispatch on drift mode. ``depth`` is always 1 in the reference
    (pt_classification.py:188 ``self.sgd_depth = 1``)."""
    if mode == "sequential":
        return sgd_epoch_sequential(w, x, t, topo, lrate, unroll=unroll)
    if mode == "batch":
        return sgd_epoch_batch(w, x, t, topo, lrate)
    raise ValueError(f"unknown drift mode: {mode}")
