"""Deep MLP model family (arbitrary hidden stack) for the tempered sampler.

New capability beyond the reference's fixed 2-layer topology: any hidden-layer
stack with selectable activation, flat weight vector, gradient-based Langevin
drift (``api.grad_drift``). The 2-layer sigmoid configuration of this family
is NOT the reference model — the reference subtracts biases and softmaxes
sigmoid outputs (use ``api.fnn_spec`` for parity); this family is the
conventional formulation for when fidelity to the reference quirks is not
wanted.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ptnn.models import api

_ACTS = {
    "sigmoid": jax.nn.sigmoid,
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "gelu": jax.nn.gelu,
}


def _shapes(sizes: Sequence[int]):
    out = []
    for a, b in zip(sizes[:-1], sizes[1:]):
        out.append((a, b))
        out.append((b,))
    return out


def w_size(sizes: Sequence[int]) -> int:
    return sum(a * b + b for a, b in zip(sizes[:-1], sizes[1:]))


def unpack(w: jax.Array, sizes: Sequence[int]):
    params = []
    idx = 0
    for shape in _shapes(sizes):
        n = 1
        for d in shape:
            n *= d
        params.append(w[idx : idx + n].reshape(shape))
        idx += n
    return params


def forward(w: jax.Array, x: jax.Array, sizes: Tuple[int, ...], act: str) -> jax.Array:
    p = unpack(w, sizes)
    h = x
    n_layers = len(sizes) - 1
    f = _ACTS[act]
    for li in range(n_layers):
        wi, bi = p[2 * li], p[2 * li + 1]
        h = jnp.matmul(h, wi, precision=jax.lax.Precision.HIGHEST) + bi
        if li < n_layers - 1:
            h = f(h)
    return h  # raw logits / regression outputs


def spec(
    sizes: Sequence[int], task: str = "classification", act: str = "relu"
) -> api.ModelSpec:
    sizes = tuple(sizes)
    ws = w_size(sizes)

    def fwd(w, x):
        return forward(w, x, sizes, act)

    def log_probs(out):
        return jax.nn.log_softmax(out, axis=-1)

    if task == "classification":

        def loss(w, x, t):
            return -jnp.sum(t * jax.nn.log_softmax(forward(w, x, sizes, act), axis=-1))

    else:

        def loss(w, x, t):
            return 0.5 * jnp.sum(jnp.square(forward(w, x, sizes, act) - t))

    return api.ModelSpec(
        name=f"mlp{sizes}-{act}",
        w_size=ws,
        forward=fwd,
        log_probs=log_probs,
        drift=api.grad_drift(loss),
        prior_dim_classification=ws,
        prior_dim_regression=ws,
    )
