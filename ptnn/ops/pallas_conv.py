"""Pallas TPU kernel: fused first conv stage for the chain-batched CNN.

BASELINE.json config 5 names a "Pallas-fused per-chain conv likelihood"; the
on-chip profile (scripts/profile_cnn_conv.py, cnn_conv_decision.md) shows the
eval is dominated by stage 1 — conv1 + bias + relu + 2x2 avg-pool — because
XLA materializes the pre-pool activation tensor, (chains, N, 8, 8, 8) f32 =
2.6 GB at 1024 chains x 1258 images, and the op runs output-bandwidth-bound
at ~300 GB/s. This kernel keeps that tensor in VMEM tiles and writes only
the pooled result (4x smaller), with the chain axis on the 128 lanes:

    patches: (n_pad*hw*hw, K)      shared across chains (conv1's input is
                                   chain-independent — the one conv in the
                                   net where lanes can be chains)
    w1:      (K, OC, C)            per-chain taps, K = kh*kw*in_ch
    b1:      (OC, C)
    out:     (OC, n_pad*q, C)      q = (hw/2)^2 pooled pixels per image

Grid (chain_blocks, img_tiles); per block, each output channel is a
K-tap FMA accumulation over (tile_rows, 128) planes (VPU; K and OC are far
below the 128 MXU tile so lane-on-chains FMAs beat a <10% utilized matmul),
then bias+relu+pool entirely in VMEM. Only conv1 is fused: conv2's input is
chain-dependent, so its lanes cannot be shared — it stays on the XLA conv
path where (chains*N) batching gives the MXU real work (the measured
decision is in cnn_conv_decision.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _kernel(n_t, hw, k_taps, oc_dim, pat_ref, w1_ref, b1_ref, out_ref):
    hw2 = hw // 2
    q = hw2 * hw2
    for oc in range(oc_dim):
        z = jnp.broadcast_to(b1_ref[oc : oc + 1, :], (n_t * hw * hw, LANES))
        for t in range(k_taps):
            z = z + pat_ref[:, t : t + 1] * w1_ref[t, oc : oc + 1, :]
        z = jnp.maximum(z, 0.0)
        zp = (
            z.reshape(n_t, hw2, 2, hw2, 2, LANES).sum(axis=(2, 4)) / 4.0
        ).reshape(n_t * q, LANES)
        out_ref[oc] = zp


@functools.partial(
    jax.jit, static_argnames=("hw", "in_ch", "out_ch", "n_t", "interpret")
)
def conv1_relu_pool(
    x: jax.Array,  # (N, hw*hw*in_ch) flat images, shared across chains
    w1: jax.Array,  # (C, kh, kw, in_ch, out_ch) per-chain conv taps
    b1: jax.Array,  # (C, out_ch)
    hw: int,
    in_ch: int = 1,
    out_ch: int = 8,
    # images per tile: the out block is (out_ch, n_t*q, 128) f32 and Mosaic
    # double-buffers it, so n_t=8 keeps the scoped VMEM well under 16 MB
    n_t: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Fused conv1(SAME, 3x3)+bias+relu+avgpool2 -> (C, N, hw/2, hw/2, out_ch)."""
    # fused-eval constraints: the kernel unrolls exactly 3x3 taps (k_taps
    # below) and the in-VMEM pool reshape (n_t, hw/2, 2, hw/2, 2, LANES)
    # only decomposes an EVEN image side; anything else must stay on the
    # vmapped XLA path (cnn.spec(fused_eval=False))
    if w1.shape[1:3] != (3, 3):
        raise ValueError(
            f"conv1_relu_pool supports 3x3 kernels only, got {w1.shape[1:3]}"
        )
    if hw % 2 != 0:
        raise ValueError(f"conv1_relu_pool needs an even image side, got {hw}")
    c = w1.shape[0]
    n = x.shape[0]
    hw2 = hw // 2
    q = hw2 * hw2
    img = x.reshape(n, hw, hw, in_ch)
    k_taps = 9 * in_ch
    patches = jax.lax.conv_general_dilated_patches(
        img, (3, 3), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).reshape(n, hw * hw, k_taps)

    n_pad = ((n + n_t - 1) // n_t) * n_t
    c_pad = ((c + LANES - 1) // LANES) * LANES
    patches = jnp.pad(patches, ((0, n_pad - n), (0, 0), (0, 0))).reshape(
        n_pad * hw * hw, k_taps
    )
    # (K, OC, C): taps-major so the kernel reads (1, C) rows per (t, oc).
    # conv_general_dilated_patches emits the patch features CHANNEL-major
    # (ic, kh, kw) — see its docstring — so the (kh, kw, in_ch, out_ch)
    # weights must be transposed to (in_ch, kh, kw) tap order to match.
    w1p = jnp.pad(
        w1.transpose(0, 3, 1, 2, 4).reshape(c, k_taps, out_ch),
        ((0, c_pad - c), (0, 0), (0, 0)),
    ).transpose(1, 2, 0)
    b1p = jnp.pad(b1, ((0, c_pad - c), (0, 0))).T

    kernel = functools.partial(_kernel, n_t, hw, k_taps, out_ch)
    out = pl.pallas_call(
        kernel,
        grid=(c_pad // LANES, n_pad // n_t),
        in_specs=[
            pl.BlockSpec(
                (n_t * hw * hw, k_taps),
                lambda cb, it: (it, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (k_taps, out_ch, LANES),
                lambda cb, it: (0, 0, cb),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (out_ch, LANES), lambda cb, it: (0, cb), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (out_ch, n_t * q, LANES),
            lambda cb, it: (0, it, cb),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((out_ch, n_pad * q, c_pad), jnp.float32),
        interpret=interpret,
    )(patches, w1p, b1p)
    # (OC, n_pad*q, Cp) -> (C, n, hw2, hw2, OC)
    z = out.reshape(out_ch, n_pad, hw2, hw2, c_pad)[:, :n, :, :, :c]
    return jnp.transpose(z, (4, 1, 2, 3, 0))
