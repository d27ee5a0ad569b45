"""Pallas TPU kernel: fused FNN forward + likelihood + metrics for all chains.

The random-walk hot path evaluates the proposal on train and test data every
step: two tiny matmuls per chain whose contraction dim (4-34 inputs, 10-50
hidden) is far below the MXU's 128x128 tile, so XLA's dot tiling runs at a
few percent utilization. This kernel computes the same thing as VPU
broadcast-FMAs instead: the data axis sits on sublanes, the chain axis on
the 128-wide lanes, and each (input x hidden) weight scalar contributes one
(N, C) fused multiply-add. The likelihood/metric reductions happen in-kernel,
so the only HBM traffic is the weights in and three (C,) scalars out.

Layouts (C = chains padded to 128, grid over chain blocks):

    x: (I, N, 1)  y: (N, 1)  t: (O, N, 1)  mask: (N, 1)
    W1: (I, H, C)  B1: (H, C)  W2: (O, H, C)  B2: (O, C)  tau: (1, C)

Outputs: loglik, rmse, acc — each (1, C) per block.

VMEM working set is (O + 3) * N * 128 floats; `fits_vmem` gates
applicability for large datasets.

Measured on TPU v5e (64 chains): ~140 us/eval for both this kernel and the
XLA path at (4,10,1)/N=298 and (34,50,2)/N=245 — XLA's whole-step fusion
already saturates the VPU at these shapes, so the kernel is NOT wired into
the default hot path (the Pallas win in this framework is the sequential
drift, ops/pallas_drift.py, 3.3x). Kept as the building block for larger
topologies where the MXU tiling penalty of small-K matmuls dominates.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_LOG_2PI = math.log(2.0 * math.pi)
_VMEM_BUDGET = 10 * 2**20  # bytes of (N, C) planes per block


def fits_vmem(n_samples: int, topo: Tuple[int, int, int]) -> bool:
    _i, _h, o = topo
    n_pad = ((n_samples + 7) // 8) * 8
    return (o + 4) * n_pad * LANES * 4 <= _VMEM_BUDGET


def _eval_kernel(i_dim, h_dim, o_dim, n_true, task,
                 x_ref, y_ref, t_ref, mask_ref, tau_ref,
                 w1_ref, b1_ref, w2_ref, b2_ref,
                 ll_ref, rmse_ref, acc_ref):
    n_pad = x_ref.shape[1]
    c = w1_ref.shape[-1]
    mask = mask_ref[:]  # (N, 1)

    # output-unit accumulators, built while streaming over hidden units so
    # only O+1 (N, C) planes are ever live
    outs = [jnp.zeros((n_pad, c), jnp.float32) for _ in range(o_dim)]
    for h in range(h_dim):
        z = jnp.zeros((n_pad, c), jnp.float32) - b1_ref[h : h + 1, :]
        for i in range(i_dim):
            z = z + x_ref[i] * w1_ref[i, h : h + 1, :]
        hid = jax.nn.sigmoid(z)
        for o in range(o_dim):
            outs[o] = outs[o] + hid * w2_ref[o, h : h + 1, :]
    outs = [
        jax.nn.sigmoid(outs[o] - b2_ref[o : o + 1, :]) for o in range(o_dim)
    ]

    if task == "regression":
        resid = (y_ref[:] - outs[0]) * mask
        ss = jnp.sum(resid * resid, axis=0, keepdims=True)  # (1, C)
        tau = tau_ref[:]
        ll_ref[:] = -0.5 * n_true * (_LOG_2PI + jnp.log(tau)) - 0.5 * ss / tau
        rmse_ref[:] = jnp.sqrt(ss / n_true)
        acc_ref[:] = jnp.zeros_like(ss)
        return

    # classification: softmax over the O sigmoid outputs
    m = outs[0]
    for o in range(1, o_dim):
        m = jnp.maximum(m, outs[o])
    den = jnp.zeros_like(m)
    for o in range(o_dim):
        den = den + jnp.exp(outs[o] - m)
    lse = jnp.log(den) + m
    sel = jnp.zeros_like(m)
    for o in range(o_dim):
        sel = sel + t_ref[o] * outs[o]
    ll_ref[:] = jnp.sum((sel - lse) * mask, axis=0, keepdims=True)

    # argmax prediction with first-max tie semantics (strict >)
    pred = jnp.zeros_like(m)
    best = outs[0]
    for o in range(1, o_dim):
        gt = outs[o] > best
        pred = jnp.where(gt, float(o), pred)
        best = jnp.maximum(best, outs[o])
    err = (pred - y_ref[:]) * mask
    rmse_ref[:] = jnp.sqrt(jnp.sum(err * err, axis=0, keepdims=True) / n_true)
    correct = jnp.where(jnp.abs(pred - y_ref[:]) < 0.5, 1.0, 0.0) * mask
    acc_ref[:] = 100.0 * jnp.sum(correct, axis=0, keepdims=True) / n_true


def _planes(w, topo):
    i, h, o = topo
    c = w.shape[0]
    s1, s2 = i * h, i * h + h * o
    return (
        w[:, :s1].reshape(c, i, h).transpose(1, 2, 0),
        w[:, s2 : s2 + h].T,
        w[:, s1:s2].reshape(c, h, o).transpose(2, 1, 0),
        w[:, s2 + h :].T,
    )


@functools.partial(
    jax.jit, static_argnames=("topo", "task", "interpret")
)
def fnn_eval_pallas(
    w: jax.Array,  # (C, w_size)
    x: jax.Array,  # (N, I)
    y: jax.Array,  # (N,)
    t: jax.Array,  # (N, O) one-hot / target column
    tau: jax.Array,  # (C,) noise variance (regression; ignored otherwise)
    topo: Tuple[int, int, int],
    task: str,
    interpret: bool = False,
):
    """Chain-batched fused eval: returns (loglik, rmse, acc), each (C,)."""
    return fnn_eval_pallas_impl(w, x, y, t, tau, topo, task, interpret)


def fnn_eval_pallas_impl(w, x, y, t, tau, topo, task, interpret=False):
    i, h, o = topo
    c = w.shape[0]
    n = x.shape[0]
    n_pad = ((n + 7) // 8) * 8
    c_pad = ((c + LANES - 1) // LANES) * LANES
    if c_pad != c:
        w = jnp.pad(w, ((0, c_pad - c), (0, 0)))
        tau = jnp.pad(tau, (0, c_pad - c), constant_values=1.0)
    w1, b1, w2, b2 = _planes(w, topo)

    xp = jnp.pad(x, ((0, n_pad - n), (0, 0))).T.reshape(i, n_pad, 1)
    yp = jnp.pad(y, (0, n_pad - n)).reshape(n_pad, 1)
    tp = jnp.pad(t, ((0, n_pad - n), (0, 0))).T.reshape(o, n_pad, 1)
    mask = jnp.pad(jnp.ones((n, 1), jnp.float32), ((0, n_pad - n), (0, 0)))
    taup = tau.reshape(1, c_pad)

    kernel = functools.partial(_eval_kernel, i, h, o, n, task)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    cblk = lambda *shape: pl.BlockSpec(
        shape + (LANES,), lambda b: (0,) * len(shape) + (b,), memory_space=pltpu.VMEM
    )
    out1c = pl.BlockSpec((1, LANES), lambda b: (0, b), memory_space=pltpu.VMEM)
    n_blocks = c_pad // LANES
    ll, rmse, acc = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[full(), full(), full(), full(), out1c, cblk(i, h), cblk(h), cblk(o, h), cblk(o)],
        out_specs=(out1c, out1c, out1c),
        out_shape=(
            jax.ShapeDtypeStruct((1, c_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, c_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, c_pad), jnp.float32),
        ),
        interpret=interpret,
    )(xp, yp, tp, mask, taup, w1, b1, w2, b2)
    return ll[0, :c], rmse[0, :c], acc[0, :c]
