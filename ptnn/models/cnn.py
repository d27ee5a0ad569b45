"""Bayesian convolutional network for image classification.

New capability beyond the reference (BASELINE.json config 5: "Bayesian CNN
with tempered chains"): a small conv-pool-conv-pool-dense classifier whose
flat weight vector plugs into the same parallel-tempering kernel as the FNN.
Designed TPU-first: the forward pass is expressed so that under
``vmap(chains)`` XLA sees one big batched conv per layer — chains fold into
the batch dimension and the MXU sees (chains*N, ...) matmuls.

Langevin drift is one full-batch gradient step of the cross-entropy loss via
``jax.grad`` (api.grad_drift) — the MH q-ratio keeps the sampler exact.

Works with any square images; ``digits_spec`` targets the bundled
8x8 sklearn digits set, ``mnist_spec`` the 28x28 MNIST layout (dataset files
required locally — this environment has no egress).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ptnn.models import api


@dataclasses.dataclass(frozen=True)
class CnnConfig:
    image_hw: int  # square image side
    n_classes: int
    channels: Tuple[int, ...] = (8, 16)  # conv channels per stage
    kernel: int = 3
    hidden: int = 32  # dense layer before logits


def _shapes(cfg: CnnConfig):
    """Per-layer parameter shapes in flat-vector order."""
    shapes = []
    c_in = 1
    for c_out in cfg.channels:
        shapes.append(("conv_w", (cfg.kernel, cfg.kernel, c_in, c_out)))
        shapes.append(("conv_b", (c_out,)))
        c_in = c_out
    hw = cfg.image_hw
    for _ in cfg.channels:
        hw = (hw + 1) // 2  # stride-2 avg pool per stage
    flat = hw * hw * c_in
    shapes.append(("dense_w", (flat, cfg.hidden)))
    shapes.append(("dense_b", (cfg.hidden,)))
    shapes.append(("out_w", (cfg.hidden, cfg.n_classes)))
    shapes.append(("out_b", (cfg.n_classes,)))
    return shapes


def w_size(cfg: CnnConfig) -> int:
    return sum(int(jnp.prod(jnp.asarray(s))) for _, s in _shapes(cfg))


def unpack(w: jax.Array, cfg: CnnConfig):
    out = []
    idx = 0
    for _, shape in _shapes(cfg):
        n = 1
        for d in shape:
            n *= d
        out.append(w[idx : idx + n].reshape(shape))
        idx += n
    return out


def _conv_stage(h: jax.Array, cw: jax.Array, cb: jax.Array) -> jax.Array:
    """conv(SAME) + bias + relu + 2x2 avg-pool (one stage of the stack)."""
    h = jax.lax.conv_general_dilated(
        h,
        cw,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    h = jax.nn.relu(h + cb)
    return jax.lax.reduce_window(
        h, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "SAME"
    ) / 4.0


def _tail(params, h: jax.Array, cfg: CnnConfig, stage: int) -> jax.Array:
    """Stages ``stage``.. plus the dense head; ``h``: (N, hw', hw', C_in)."""
    n = h.shape[0]
    pi = 2 * stage
    for _ in cfg.channels[stage:]:
        h = _conv_stage(h, params[pi], params[pi + 1])
        pi += 2
    h = h.reshape(n, -1)
    dw, db, ow, ob = params[pi], params[pi + 1], params[pi + 2], params[pi + 3]
    h = jax.nn.relu(jnp.matmul(h, dw, precision=jax.lax.Precision.HIGHEST) + db)
    return jnp.matmul(h, ow, precision=jax.lax.Precision.HIGHEST) + ob


def forward(w: jax.Array, x: jax.Array, cfg: CnnConfig) -> jax.Array:
    """``x``: (N, H*W) flat pixels -> (N, n_classes) logits."""
    params = unpack(w, cfg)
    n = x.shape[0]
    h = x.reshape(n, cfg.image_hw, cfg.image_hw, 1)
    return _tail(params, h, cfg, stage=0)


def batched_forward_fused(
    ws: jax.Array, x: jax.Array, cfg: CnnConfig, interpret: bool = False
) -> jax.Array:
    """(C, w_size) x (N, hw*hw) -> (C, N, n_classes) with the Pallas stage-1.

    Stage 1's input is chain-independent, so the fused kernel
    (ops/pallas_conv.py) computes conv1+bias+relu+pool for all chains with
    chains on lanes and never materializes the 2.6 GB pre-pool tensor; the
    chain-dependent stages stay on the XLA conv path (cnn_conv_decision.md).
    """
    from ptnn.ops import pallas_conv

    params = jax.vmap(lambda w: unpack(w, cfg))(ws)
    h = pallas_conv.conv1_relu_pool(
        x, params[0], params[1], hw=cfg.image_hw, in_ch=1,
        out_ch=cfg.channels[0], interpret=interpret,
    )  # (C, N, hw/2, hw/2, c1)
    return jax.vmap(lambda p, hi: _tail(p, hi, cfg, stage=1))(params, h)


def spec(cfg: CnnConfig, fused_eval: bool = False) -> api.ModelSpec:
    ws = w_size(cfg)

    def fwd(w, x):
        return forward(w, x, cfg)

    def log_probs(out):
        return jax.nn.log_softmax(out, axis=-1)

    def xent(w, x, t):
        # t: (N, n_classes) one-hot targets
        logp = jax.nn.log_softmax(forward(w, x, cfg), axis=-1)
        return -jnp.sum(t * logp)

    bf = None
    if fused_eval:
        def bf(ws_batch, x):
            return batched_forward_fused(ws_batch, x, cfg)

    return api.ModelSpec(
        name=f"cnn{cfg.image_hw}x{cfg.image_hw}c{cfg.channels}"
        + ("-fused" if fused_eval else ""),
        w_size=ws,
        forward=fwd,
        log_probs=log_probs,
        drift=api.grad_drift(xent),
        prior_dim_classification=ws,
        prior_dim_regression=ws,
        batched_forward=bf,
    )


def digits_spec(channels=(8, 16), hidden=32, fused_eval=False) -> api.ModelSpec:
    """CNN for the bundled sklearn 8x8 digits set."""
    return spec(
        CnnConfig(image_hw=8, n_classes=10, channels=channels, hidden=hidden),
        fused_eval=fused_eval,
    )


def mnist_spec(channels=(8, 16), hidden=64, fused_eval=False) -> api.ModelSpec:
    """28x28 MNIST layout — the regime where the fused conv1 stage is
    expected to pay off (cnn_conv_decision.md §3)."""
    return spec(
        CnnConfig(image_hw=28, n_classes=10, channels=channels, hidden=hidden),
        fused_eval=fused_eval,
    )
