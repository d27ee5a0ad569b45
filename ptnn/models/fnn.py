"""Two-layer sigmoid feed-forward network as pure, batched JAX functions.

TPU-native re-design of the reference ``Network`` class
(reference: multicore-pt-classification/pt_classification.py:26-153 and
multicore-pt-regression/pt_timeseries_regression.py:27-134).

Behavioral contract reproduced exactly:

* weights live in one flat vector ``w`` with layout
  ``[W1.ravel(), W2.ravel(), B1, B2]`` (reference ``encode``,
  pt_classification.py:99-106 / pt_timeseries_regression.py:93-97);
* the forward pass **subtracts** the biases: ``z = x @ W - B``
  (pt_classification.py:50-53);
* both layers apply the logistic sigmoid (pt_classification.py:41-42);
* classification class probabilities are a softmax over the *sigmoid*
  outputs (pt_classification.py:108-110), and the predicted class is the
  argmax of the sigmoid outputs (pt_classification.py:55).

Unlike the reference — which runs the forward pass one sample at a time in a
Python loop (pt_classification.py:144-148) — every function here is batched
over the data axis so the whole dataset is two matmuls, and is designed to be
``jax.vmap``-ed over a leading chain axis so the entire temperature ladder
becomes one XLA computation feeding the MXU.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

Topology = Tuple[int, int, int]  # (n_in, n_hidden, n_out)

# Full-f32 MXU passes: at these layer sizes the matmuls are bandwidth-bound,
# so the default bf16x3 lowering buys nothing and costs likelihood precision.
MM_PRECISION = jax.lax.Precision.HIGHEST


def mm(a: jax.Array, b: jax.Array, precision=None) -> jax.Array:
    return jnp.matmul(a, b, precision=precision or MM_PRECISION)


class FnnParams(NamedTuple):
    """Structured view of the flat weight vector."""

    w1: jax.Array  # (n_in, n_hidden)
    b1: jax.Array  # (n_hidden,)
    w2: jax.Array  # (n_hidden, n_out)
    b2: jax.Array  # (n_out,)


def w_size(topo: Topology) -> int:
    """Number of parameters (reference: pt_classification.py:247)."""
    i, h, o = topo
    return i * h + h * o + h + o


def unpack(w: jax.Array, topo: Topology) -> FnnParams:
    """Split the flat vector into layer weights (reference ``decode``,
    pt_classification.py:85-95)."""
    i, h, o = topo
    s1 = i * h
    s2 = s1 + h * o
    return FnnParams(
        w1=w[:s1].reshape(i, h),
        w2=w[s1:s2].reshape(h, o),
        b1=w[s2 : s2 + h],
        b2=w[s2 + h : s2 + h + o],
    )


def pack(p: FnnParams) -> jax.Array:
    """Flatten layer weights back into the reference layout (``encode``,
    pt_classification.py:99-106)."""
    return jnp.concatenate(
        [p.w1.reshape(-1), p.w2.reshape(-1), p.b1.reshape(-1), p.b2.reshape(-1)]
    )


def init(key: jax.Array, topo: Topology, dtype=jnp.float32) -> jax.Array:
    """Standard-normal flat init used for each chain's starting point
    (reference: pt_classification.py:658 ``w = np.random.randn(num_param)``)."""
    return jax.random.normal(key, (w_size(topo),), dtype=dtype)


def forward(
    w: jax.Array, x: jax.Array, topo: Topology, precision=None
) -> jax.Array:
    """Batched forward pass.

    ``x``: (N, n_in) -> returns sigmoid outputs (N, n_out).

    Matches the reference per-sample ``ForwardPass`` math
    (pt_classification.py:49-53): ``sigmoid(sigmoid(x@W1 - B1) @ W2 - B2)``.
    ``precision`` overrides the full-f32 default (bf16 eval mode passes
    DEFAULT so bf16 operands stay single-pass on the MXU).
    """
    p = unpack(w, topo)
    hid = jax.nn.sigmoid(mm(x, p.w1, precision) - p.b1)
    return jax.nn.sigmoid(mm(hid, p.w2, precision) - p.b2)


def forward_with_hidden(
    w: jax.Array, x: jax.Array, topo: Topology
) -> Tuple[jax.Array, jax.Array]:
    """Forward pass that also returns the hidden activations (needed by the
    Langevin drift's delta rule)."""
    p = unpack(w, topo)
    hid = jax.nn.sigmoid(mm(x, p.w1) - p.b1)
    out = jax.nn.sigmoid(mm(hid, p.w2) - p.b2)
    return hid, out


def class_probs(out: jax.Array) -> jax.Array:
    """Softmax over the sigmoid outputs (reference ``softmax``,
    pt_classification.py:108-110)."""
    return jax.nn.softmax(out, axis=-1)


def predict_class(out: jax.Array) -> jax.Array:
    """Predicted class index = argmax of the sigmoid outputs
    (pt_classification.py:55)."""
    return jnp.argmax(out, axis=-1)
