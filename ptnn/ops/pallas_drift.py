"""Pallas TPU kernel: fused sequential-SGD Langevin drift epoch.

The strict-parity Langevin drift is one epoch of *per-sample* SGD in dataset
order (ops/drift.sgd_epoch_sequential; reference
multicore-pt-classification/pt_classification.py:114-132). The sequential
dependence forbids batching over samples, so under XLA it is a ``lax.scan``
whose per-iteration scheduling overhead dominates the tiny per-sample math.

This kernel runs the ENTIRE epoch for a block of chains inside one Pallas
program: weights stay resident in VMEM across all samples, the chain axis
sits on the 128-wide lane dimension, per-sample inputs are scalars read from
SMEM, and every delta-rule update is a small (hidden x chains) /
(out x chains) VPU plane op. Layout:

    W1: (I, H, C)   B1: (H, C)   W2: (O, H, C)   B2: (O, C)

(W2 leads with the output dim so every slice taken in the inner loop is a
contiguous leading-dim plane — middle-dim slices would force sublane
relayouts on every sample.)

with C = chains padded to 128 lanes (grid over 128-chain blocks beyond
that). The wrapper converts from/to the reference flat-vector layout.

Falls back to interpret mode off-TPU so tests run anywhere.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ptnn.models import fnn

LANES = 128


def _drift_kernel(i_dim, h_dim, o_dim, n_samples, lrate, depth,
                  x_ref, t_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                  o_w1, o_b1, o_w2, o_b2):
    """One epoch (x ``depth``) of delta-rule SGD for one 128-chain block.

    x_ref: (N, I) SMEM; t_ref: (N, O) SMEM; weight refs in VMEM with the
    layouts in the module docstring; o_* are the updated weights.
    """
    o_w1[:] = w1_ref[:]
    o_b1[:] = b1_ref[:]
    o_w2[:] = w2_ref[:]
    o_b2[:] = b2_ref[:]

    def sample_step(n, c):
        # static-index slice reads/writes on the output refs — weights stay
        # VMEM-resident across the whole epoch, no host round-trips, and
        # every access is a contiguous leading-dim plane

        # hidden pre-activation: -B1 + sum_i x[n,i] * W1[i]
        hid = -o_b1[:]
        for i in range(i_dim):
            hid = hid + x_ref[n, i] * o_w1[i]
        hid = jax.nn.sigmoid(hid)  # (H, C)

        w2_rows = [o_w2[o] for o in range(o_dim)]  # (H, C) each
        # output: -B2 + sum_h hid[h] * W2[o,h]; per-o sublane reduction
        outs = [
            jnp.sum(w2_rows[o] * hid, axis=0, keepdims=True)
            for o in range(o_dim)
        ]
        out = (outs[0] if o_dim == 1 else jnp.concatenate(outs, axis=0)) - o_b2[:]
        out = jax.nn.sigmoid(out)  # (O, C)

        # delta rule (pt_classification.py:72-82)
        t_rows = [
            jnp.full((1, out.shape[1]), t_ref[n, o], out.dtype)
            for o in range(o_dim)
        ]
        t_plane = t_rows[0] if o_dim == 1 else jnp.concatenate(t_rows, axis=0)
        od = (t_plane - out) * out * (1.0 - out)  # (O, C)

        hd = jnp.zeros_like(hid)
        for o in range(o_dim):
            hd = hd + w2_rows[o] * od[o : o + 1]
        hd = hd * hid * (1.0 - hid)  # (H, C)

        # updates (biases subtracted in the forward pass -> -lr * delta)
        for o in range(o_dim):
            o_w2[o] = w2_rows[o] + lrate * (od[o : o + 1] * hid)
        o_b2[:] = o_b2[:] - lrate * od
        for i in range(i_dim):
            o_w1[i] = o_w1[i] + lrate * (hd * x_ref[n, i])
        o_b1[:] = o_b1[:] - lrate * hd
        return c

    # Unroll pairs of samples per fori iteration to amortize loop overhead;
    # handle an odd trailing sample after the loop.
    total = n_samples * depth
    pairs = total // 2

    def two(k, c):
        return sample_step((2 * k + 1) % n_samples, sample_step((2 * k) % n_samples, c))

    jax.lax.fori_loop(0, pairs, two, 0)
    if total % 2:
        sample_step((total - 1) % n_samples, 0)


def _to_planes(w: jax.Array, topo: Tuple[int, int, int]):
    """(C, W) flat -> lane-major planes (I,H,C), (H,C), (H,O,C), (O,C)."""
    i, h, o = topo
    c = w.shape[0]
    s1, s2 = i * h, i * h + h * o
    w1 = w[:, :s1].reshape(c, i, h).transpose(1, 2, 0)
    w2 = w[:, s1:s2].reshape(c, h, o).transpose(2, 1, 0)  # (O, H, C)
    b1 = w[:, s2 : s2 + h].T
    b2 = w[:, s2 + h :].T
    return w1, b1, w2, b2


def _from_planes(w1, b1, w2, b2, topo: Tuple[int, int, int]):
    i, h, o = topo
    c = w1.shape[-1]
    return jnp.concatenate(
        [
            w1.transpose(2, 0, 1).reshape(c, i * h),
            w2.transpose(2, 1, 0).reshape(c, h * o),
            b1.T,
            b2.T,
        ],
        axis=1,
    )


# Per-call SMEM budget for the (N, I) inputs + (N, O) targets. Mosaic
# rejects kernels whose scalar-memory operands exceed ~128-192 KB (measured
# on v5e: PenDigit's 7494x16 inputs crash the compile helper; <=1000 rows
# compile fine), so epochs over larger datasets split into row blocks at
# the wrapper level — the sequential delta-rule semantics are unchanged
# because the blocks run in dataset order with the weights threaded
# through (one lax.scan over equal-size blocks + one remainder call, so
# only two kernel shapes compile per dataset).
_MAX_SMEM_ROW_BYTES = 96 * 1024


def sgd_epoch_sequential_pallas_impl(
    w: jax.Array,
    x: jax.Array,
    t: jax.Array,
    topo: Tuple[int, int, int],
    lrate: float,
    depth: int = 1,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in chain-batched replacement for
    ``vmap(drift.sgd_epoch_sequential)``: ``w`` (C, w_size) -> (C, w_size).

    Epochs over datasets whose row inputs exceed the SMEM budget run as a
    sequence of row-block kernel calls in dataset order (see
    _MAX_SMEM_ROW_BYTES); ``depth`` repeats the full-epoch sequence.
    """
    n_rows = x.shape[0]
    row_bytes = 4 * (x.shape[1] + t.shape[1])
    # Empirical Mosaic limits (v5e): the byte budget binds for wide rows
    # (bank's 51-feature rows fail past ~460), and a row-count cliff near
    # ~1020 binds for narrow rows regardless of bytes ((6,25,10) compiles
    # at 1016 rows and crashes at 1020 with only 65 KB of SMEM operands).
    # 768 keeps a wide margin under both; per-call overhead (~20-50 us)
    # stays <10% of a 768-row block's work.
    max_rows = max(64, min(768, _MAX_SMEM_ROW_BYTES // row_bytes))
    if n_rows > max_rows:
        q, r = divmod(n_rows, max_rows)
        one = functools.partial(
            _pallas_epoch_call, topo=topo, lrate=lrate, interpret=interpret
        )
        for _ in range(depth):
            if q >= 2:
                xb = x[: q * max_rows].reshape(q, max_rows, x.shape[1])
                tb = t[: q * max_rows].reshape(q, max_rows, t.shape[1])
                w = jax.lax.scan(
                    lambda wc, blk: (one(wc, blk[0], blk[1]), None),
                    w, (xb, tb),
                )[0]
            else:
                for b in range(q):
                    w = one(
                        w,
                        x[b * max_rows : (b + 1) * max_rows],
                        t[b * max_rows : (b + 1) * max_rows],
                    )
            if r:
                w = one(w, x[q * max_rows :], t[q * max_rows :])
        return w
    return _pallas_epoch_call(
        w, x, t, topo=topo, lrate=lrate, depth=depth, interpret=interpret
    )


def _pallas_epoch_call(
    w: jax.Array,
    x: jax.Array,
    t: jax.Array,
    topo: Tuple[int, int, int],
    lrate: float,
    depth: int = 1,
    interpret: bool = False,
) -> jax.Array:
    i, h, o = topo
    c = w.shape[0]
    n = x.shape[0]
    c_pad = ((c + LANES - 1) // LANES) * LANES
    if c_pad != c:
        w = jnp.pad(w, ((0, c_pad - c), (0, 0)))
    w1, b1, w2, b2 = _to_planes(w, topo)
    n_blocks = c_pad // LANES

    kernel = functools.partial(_drift_kernel, i, h, o, n, lrate, depth)
    block = lambda *shape: pl.BlockSpec(
        shape + (LANES,), lambda b: (0,) * len(shape) + (b,), memory_space=pltpu.VMEM
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shapes = [
        jax.ShapeDtypeStruct(w1.shape, w1.dtype),
        jax.ShapeDtypeStruct(b1.shape, b1.dtype),
        jax.ShapeDtypeStruct(w2.shape, w2.dtype),
        jax.ShapeDtypeStruct(b2.shape, b2.dtype),
    ]
    r_w1, r_b1, r_w2, r_b2 = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[smem, smem, block(i, h), block(h), block(o, h), block(o)],
        out_specs=(block(i, h), block(h), block(o, h), block(o)),
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )(x, t, w1, b1, w2, b2)
    out = _from_planes(r_w1, r_b1, r_w2, r_b2, topo)
    return out[:c]


# jitted convenience wrapper for direct calls; inside larger jitted programs
# (the sampler kernel) use the _impl to avoid nested-jit lowering issues
sgd_epoch_sequential_pallas = functools.partial(
    jax.jit, static_argnames=("topo", "lrate", "depth", "interpret")
)(sgd_epoch_sequential_pallas_impl)
