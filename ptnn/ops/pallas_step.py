"""Pallas TPU kernel: a fused BLOCK of random-walk MCMC steps for all chains.

Why this exists: the sampler's per-step `lax.scan` pays a fixed ~20-40 us of
per-iteration kernel sequencing on TPU (fnn_roofline.md — the step's many
small fused kernels dispatch one iteration at a time; unrolling duplicates
them instead of amortizing, and at w_size ~61 the MXU/VPU are idle by
construction). This kernel runs an ENTIRE inter-swap block of K steps inside
one Pallas program: chain state stays resident in VMEM across all K steps,
proposal noise / MH uniforms stream in as pregenerated arrays, per-step trace
rows stream out, and the only XLA-level work left per block is the replica-
exchange sweep at the boundary (amortized 1/swap_interval). The per-step
dispatch floor drops from ~20 us to ~20/K us.

Semantics are the reference random-walk step, bit-for-bit the math of
kernel.step() with proposal="reference", use_langevin_gradients=False, for
BOTH tasks (multicore-pt-regression/pt_timeseries_regression.py:313-439,
multicore-pt-classification/pt_classification.py:313-448):

* regression: joint (w, eta) proposal w' = w + step_w * N(0,1), eta' = eta +
  step_eta * N(0,1) (pt_timeseries_regression.py:355-356), one tempered MH
  decision; Gaussian likelihood -N/2 (log 2pi + eta') - SSE/(2 tau')
  (:200-205, ops/likelihood.py:regression_eval_from_fx); prior with the
  reference's (i*h+h+2)/2 dimension term and the inverse-gamma tau terms
  (:215-221, ops/likelihood.py:regression_log_prior_dim); trace["ll"] records
  the TEMPERED proposal likelihood (:391);
* classification: w-only proposal (pt_classification.py:328), multinomial
  log-likelihood sum_i log softmax(out)[i, y_i] over the SIGMOID outputs
  (:108-110,213-219), Gaussian weight prior with dim = w_size (:224-230),
  accuracy/argmax-RMSE metrics (:196-207), trace["ll"] records the UNTEMPERED
  proposal likelihood (:404); eta is carried untouched (junk, matching
  kernel.ChainState's convention);
* write-on-accept trace carries for rmse/acc, accept_count records the
  counter BEFORE the step's decision (pt_classification.py:391 convention);
* optional per-chain Robbins-Monro step-size adaptation during burn-in
  (PTConfig.adapt_step_size), frozen at burn_end = samples*burn_in - 1.

Layout: chains on the 128-wide lane axis (grid over 128-chain blocks), the
flat weight codec on sublanes — w rows are indexed STATICALLY inside the
unrolled forward pass (W1[i,h] = row i*H+h, W2[h] = row IH+h, B1[h] = row
IH+HO+h, B2 = row IH+HO+H), so the whole FNN forward is I*H broadcast
FMAs on (N, C) planes (the pallas_eval.py formulation, held in registers/VMEM
across the block). Padded weight rows carry zero noise (the wrapper masks the
pregenerated noise), so the prior's sum(w^2) over all padded rows is exact.

The kernel runs a fixed K_MAX-iteration fori_loop with a dynamic `length`
(steps k >= length are no-ops that re-write the current carries into the
trace rows — the host driver slices them away), so every block in a run
shares ONE compiled kernel regardless of the swap-cadence remainders.

Noise is PREGENERATED with jax.random outside the kernel (not pltpu PRNG):
the kernel is then a deterministic function of its inputs, which is what lets
tests/test_pallas_step.py pin it bitwise-level against a pure-JAX oracle
consuming the same noise on the CPU interpreter.
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


def _pad8(n: int) -> int:
    return ((n + 7) // 8) * 8


def vmem_bytes(k_max: int, w_pad: int, n_tr_pad: int, n_te_pad: int,
               record_w: bool, n_classes: int = 0) -> int:
    """Rough VMEM footprint of one chain block (gates applicability).

    Classification holds O output-accumulator planes live through the
    forward (plus z/sigmoid/softmax temporaries); regression ~4 planes."""
    live = max(4, n_classes + 4)
    planes = live * (n_tr_pad + n_te_pad) * LANES  # live eval planes
    noise = k_max * w_pad * LANES + 2 * k_max * LANES
    traces = 6 * k_max * LANES + (k_max * w_pad * LANES if record_w else 0)
    state = 4 * w_pad * LANES
    return 4 * (planes + noise + traces + state)


def _fwd_cls(w, x_ref, yh_ref, y_ref, m_ref, topo, n):
    """Fused FNN forward + multinomial eval for one weight matrix ``w`` (P, C).

    Classification forward (pt_classification.py:49-55): sigmoid both layers,
    O output planes; class probabilities are a softmax over the sigmoid
    outputs (:108-110), prediction is their argmax (:55). ``yh_ref`` holds O
    one-hot label planes (O, N_pad, 1), ``y_ref`` the float class indices.
    Returns ``(loglik, rmse, acc)`` (1, C) rows — likelihood is the masked
    sum of gathered log-probs (:213-219), rmse is over the predicted class
    index (:196-198), acc the match percentage (:200-207).
    """
    i_dim, h_dim, o_dim = topo
    s1 = i_dim * h_dim  # W2 rows start (h-major: row s1 + h*O + o)
    s2 = s1 + h_dim * o_dim  # B1 rows start
    b2 = s2 + h_dim  # B2 rows start
    n_pad = y_ref.shape[0]
    c = w.shape[-1]
    outs = [
        jnp.zeros((n_pad, c), jnp.float32) - w[b2 + o : b2 + o + 1, :]
        for o in range(o_dim)
    ]
    for h in range(h_dim):
        z = jnp.zeros((n_pad, c), jnp.float32) - w[s2 + h : s2 + h + 1, :]
        for i in range(i_dim):
            z = z + x_ref[i] * w[i * h_dim + h : i * h_dim + h + 1, :]
        s = jax.nn.sigmoid(z)
        for o in range(o_dim):
            outs[o] = outs[o] + s * w[s1 + h * o_dim + o : s1 + h * o_dim + o + 1, :]
    outs = [jax.nn.sigmoid(v) for v in outs]
    # log-softmax over the O planes + one-hot gather + first-argmax
    mx = outs[0]
    for o in range(1, o_dim):
        mx = jnp.maximum(mx, outs[o])
    se = jnp.zeros((n_pad, c), jnp.float32)
    gath = jnp.zeros((n_pad, c), jnp.float32)
    pred = jnp.zeros((n_pad, c), jnp.float32)
    best = outs[0]
    for o in range(o_dim):
        se = se + jnp.exp(outs[o] - mx)
        gath = gath + yh_ref[o] * outs[o]
        if o > 0:
            better = outs[o] > best  # strict: ties keep the FIRST argmax
            pred = jnp.where(better, float(o), pred)
            best = jnp.maximum(best, outs[o])
    lse = mx + jnp.log(se)
    loglik = jnp.sum((gath - lse) * m_ref[:], axis=0, keepdims=True)
    err = pred - y_ref[:]
    rmse = jnp.sqrt(jnp.sum(err * err * m_ref[:], axis=0, keepdims=True) / n)
    acc = (
        100.0
        * jnp.sum(
            jnp.where(pred == y_ref[:], m_ref[:], 0.0), axis=0, keepdims=True
        )
        / n
    )
    return loglik, rmse, acc


def _fwd_grad_cls(w, x_ref, yh_ref, y_ref, m_ref, topo, n, p_pad):
    """Fused FNN forward + multinomial eval + hand-written backprop for one
    weight matrix ``w`` (P, C), classification.

    Same forward and metrics as _fwd_cls; the gradient is d loglik / dw of
    the masked multinomial log-likelihood over the softmax of the sigmoid
    outputs, the value _like_value_and_grad (kernel.py) differentiates with
    autodiff. Chain rule on (N, C) planes: delta2_o = (yh_o - p_o) * mask *
    out_o (1 - out_o); dW2_{h,o} = sum delta2_o s_h, dB2_o = -sum delta2_o,
    delta1_h = (sum_o delta2_o W2_{h,o}) s_h (1 - s_h), dW1_{i,h} =
    sum delta1_h x_i, dB1_h = -sum delta1_h (flat-codec row order
    [W1.ravel, W2.ravel(h-major), B1, B2]). Bitwise-validated against
    jax.value_and_grad in tests/test_pallas_step.py. Returns
    (loglik, rmse, acc, grad rows (P, C) — padded rows exactly zero).
    """
    i_dim, h_dim, o_dim = topo
    s1 = i_dim * h_dim
    s2 = s1 + h_dim * o_dim
    b2 = s2 + h_dim
    n_pad = y_ref.shape[0]
    c = w.shape[-1]
    ss = []
    outs = [
        jnp.zeros((n_pad, c), jnp.float32) - w[b2 + o : b2 + o + 1, :]
        for o in range(o_dim)
    ]
    for h in range(h_dim):
        z = jnp.zeros((n_pad, c), jnp.float32) - w[s2 + h : s2 + h + 1, :]
        for i in range(i_dim):
            z = z + x_ref[i] * w[i * h_dim + h : i * h_dim + h + 1, :]
        s = jax.nn.sigmoid(z)
        ss.append(s)
        for o in range(o_dim):
            outs[o] = outs[o] + s * w[s1 + h * o_dim + o : s1 + h * o_dim + o + 1, :]
    outs = [jax.nn.sigmoid(v) for v in outs]
    # log-softmax + gather + first-argmax (same as _fwd_cls)
    mx = outs[0]
    for o in range(1, o_dim):
        mx = jnp.maximum(mx, outs[o])
    se = jnp.zeros((n_pad, c), jnp.float32)
    gath = jnp.zeros((n_pad, c), jnp.float32)
    pred = jnp.zeros((n_pad, c), jnp.float32)
    best = outs[0]
    for o in range(o_dim):
        se = se + jnp.exp(outs[o] - mx)
        gath = gath + yh_ref[o] * outs[o]
        if o > 0:
            better = outs[o] > best  # strict: ties keep the FIRST argmax
            pred = jnp.where(better, float(o), pred)
            best = jnp.maximum(best, outs[o])
    lse = mx + jnp.log(se)
    loglik = jnp.sum((gath - lse) * m_ref[:], axis=0, keepdims=True)
    err = pred - y_ref[:]
    rmse = jnp.sqrt(jnp.sum(err * err * m_ref[:], axis=0, keepdims=True) / n)
    acc = (
        100.0
        * jnp.sum(
            jnp.where(pred == y_ref[:], m_ref[:], 0.0), axis=0, keepdims=True
        )
        / n
    )
    # backprop
    rows = [None] * (b2 + o_dim)
    d2s = []
    for o in range(o_dim):
        p_o = jnp.exp(outs[o] - lse)
        d2 = (yh_ref[o] - p_o) * m_ref[:] * outs[o] * (1.0 - outs[o])
        d2s.append(d2)
        rows[b2 + o] = -jnp.sum(d2, axis=0, keepdims=True)
    for h in range(h_dim):
        s = ss[h]
        dh = jnp.zeros((n_pad, c), jnp.float32)
        for o in range(o_dim):
            rows[s1 + h * o_dim + o] = jnp.sum(
                d2s[o] * s, axis=0, keepdims=True
            )
            dh = dh + d2s[o] * w[s1 + h * o_dim + o : s1 + h * o_dim + o + 1, :]
        dh = dh * s * (1.0 - s)
        rows[s2 + h] = -jnp.sum(dh, axis=0, keepdims=True)
        for i in range(i_dim):
            rows[i * h_dim + h] = jnp.sum(
                dh * x_ref[i], axis=0, keepdims=True
            )
    g = jnp.concatenate(
        rows + [jnp.zeros((p_pad - len(rows), c), jnp.float32)], axis=0
    )
    return loglik, rmse, acc, g


def _fwd_grad_reg(w, x_ref, y_ref, m_ref, topo, p_pad):
    """Fused FNN forward + masked SSE + hand-written backprop for one weight
    matrix ``w`` (P, C), regression (O = 1).

    The gradient is d(-SSE/2)/dw — the tau- and temperature-independent
    likelihood term kernel._like_value_and_grad computes with autodiff;
    here the two-layer chain rule is written out on (N, C) planes:
    delta = (y - fx) * mask * fx(1-fx), then per hidden unit
    dW2_h = sum delta s_h, dB2 = -sum delta, delta_h = delta W2_h s_h(1-s_h),
    dW1_ih = sum delta_h x_i, dB1_h = -sum delta_h (flat-codec row order).
    Bitwise-validated against jax.value_and_grad in tests/test_pallas_step.py.
    Returns (sse (1,C), grad rows (P,C) — padded rows exactly zero).
    """
    i_dim, h_dim, _o = topo
    s1 = i_dim * h_dim
    s2 = s1 + h_dim
    n_pad = y_ref.shape[0]
    c = w.shape[-1]
    ss = []
    out = jnp.zeros((n_pad, c), jnp.float32)
    for h in range(h_dim):
        z = jnp.zeros((n_pad, c), jnp.float32) - w[s2 + h : s2 + h + 1, :]
        for i in range(i_dim):
            z = z + x_ref[i] * w[i * h_dim + h : i * h_dim + h + 1, :]
        s = jax.nn.sigmoid(z)
        ss.append(s)
        out = out + s * w[s1 + h : s1 + h + 1, :]
    fx = jax.nn.sigmoid(out - w[s2 + h_dim : s2 + h_dim + 1, :])
    resid = (y_ref[:] - fx) * m_ref[:]
    sse = jnp.sum(resid * resid, axis=0, keepdims=True)
    delta = resid * fx * (1.0 - fx)
    rows = [None] * (s2 + h_dim + 1)
    rows[s2 + h_dim] = -jnp.sum(delta, axis=0, keepdims=True)
    for h in range(h_dim):
        s = ss[h]
        rows[s1 + h] = jnp.sum(delta * s, axis=0, keepdims=True)
        dh = delta * w[s1 + h : s1 + h + 1, :] * s * (1.0 - s)
        rows[s2 + h] = -jnp.sum(dh, axis=0, keepdims=True)
        for i in range(i_dim):
            rows[i * h_dim + h] = jnp.sum(
                dh * x_ref[i], axis=0, keepdims=True
            )
    g = jnp.concatenate(
        rows + [jnp.zeros((p_pad - len(rows), c), jnp.float32)], axis=0
    )
    return sse, g


def _fwd_sse(w, x_ref, y_ref, m_ref, topo):
    """Fused FNN forward + masked SSE for one weight matrix ``w`` (P, C).

    Reference forward (biases SUBTRACTED — pt_timeseries_regression.py:44-52):
    sigmoid both layers, scalar output. Returns (1, C) sum of squared
    residuals over the mask's rows.
    """
    i_dim, h_dim, _o = topo
    s1 = i_dim * h_dim  # W2 rows start (O == 1)
    s2 = s1 + h_dim  # B1 rows start
    n_pad = x_ref.shape[1]
    c = w.shape[-1]
    out = jnp.zeros((n_pad, c), jnp.float32)
    for h in range(h_dim):
        z = jnp.zeros((n_pad, c), jnp.float32) - w[s2 + h : s2 + h + 1, :]
        for i in range(i_dim):
            z = z + x_ref[i] * w[i * h_dim + h : i * h_dim + h + 1, :]
        out = out + jax.nn.sigmoid(z) * w[s1 + h : s1 + h + 1, :]
    fx = jax.nn.sigmoid(out - w[s2 + h_dim : s2 + h_dim + 1, :])
    resid = (y_ref[:] - fx) * m_ref[:]
    return jnp.sum(resid * resid, axis=0, keepdims=True)


def _rw_block_kernel(
    topo, task_cls, n_tr, n_te, k_max, step_w, step_eta, sigma_sq, nu_1,
    nu_2, adapt, adapt_rate, adapt_target, burn_end, record_w,
    # refs: SMEM scalars, shared data, per-block state, per-block noise
    sl_ref,  # (2,) SMEM int32: [start, length]
    xtr_ref, ytr_ref, yhtr_ref, mtr_ref,  # (I,Ntr,1),(Ntr,1),(O,Ntr,1),(Ntr,1)
    xte_ref, yte_ref, yhte_ref, mte_ref,
    at_ref,  # (1, C) adapttemp
    w_ref, wl_ref, eta_ref, ll_ref, pr_ref, rtr_ref, rte_ref, atr_ref,
    ate_ref, na_ref,
    lsw_ref,  # (1, C) log step (adapt mode; zeros otherwise)
    nw_ref,  # (K, P, C) w noise (pre-masked rows)
    ne_ref,  # (K, C) eta noise
    u_ref,  # (K, C) MH uniforms
    # outputs
    o_w, o_wl, o_eta, o_ll, o_pr, o_rtr, o_rte, o_atr, o_ate, o_na, o_lsw,
    t_ll, t_rtr, t_rte, t_atr, t_ate, t_na, *maybe_t_w,
):
    t_w = maybe_t_w[0] if record_w else None
    i_dim, h_dim, o_dim = topo
    start = sl_ref[0]
    length = sl_ref[1]
    at = at_ref[:]  # (1, C)
    if task_cls:
        w_size = i_dim * h_dim + h_dim * o_dim + h_dim + o_dim
        prior_const = -0.5 * w_size * math.log(sigma_sq)
    else:
        prior_const = -0.5 * (i_dim * h_dim + h_dim + 2) * math.log(sigma_sq)

    def body(k, carry):
        w, wl, eta, ll, pr, rtr, rte, atr, ate, na, lsw = carry
        live = k < length
        if adapt:
            step = jnp.exp(lsw)  # (1, C)
        else:
            step = step_w
        w_prop = w + step * nw_ref[k]
        ssq = jnp.sum(w_prop * w_prop, axis=0, keepdims=True)
        if task_cls:
            # w-only proposal; Gaussian weight prior (pt_classification.py
            # :224-230,328); eta carried untouched
            eta_prop = eta
            pr_prop = prior_const - ssq / (2.0 * sigma_sq)
            ll_prop, rtr_prop, atr_prop = _fwd_cls(
                w_prop, xtr_ref, yhtr_ref, ytr_ref, mtr_ref, topo, n_tr
            )
            _ll_te, rte_prop, ate_prop = _fwd_cls(
                w_prop, xte_ref, yhte_ref, yte_ref, mte_ref, topo, n_te
            )
        else:
            eta_prop = eta + step_eta * ne_ref[pl.ds(k, 1), :]
            tau_prop = jnp.exp(eta_prop)
            pr_prop = (
                prior_const
                - ssq / (2.0 * sigma_sq)
                - (1.0 + nu_1) * eta_prop
                - nu_2 / tau_prop
            )
            sse_tr = _fwd_sse(w_prop, xtr_ref, ytr_ref, mtr_ref, topo)
            sse_te = _fwd_sse(w_prop, xte_ref, yte_ref, mte_ref, topo)
            ll_prop = (
                -0.5 * n_tr * (_LOG_2PI + eta_prop) - 0.5 * sse_tr / tau_prop
            )
            rtr_prop = jnp.sqrt(sse_tr / n_tr)
            rte_prop = jnp.sqrt(sse_te / n_te)
            atr_prop = atr
            ate_prop = ate
        log_mh = (ll_prop - ll) / at + (pr_prop - pr)
        a = jnp.exp(jnp.minimum(log_mh, 0.0))
        u = u_ref[pl.ds(k, 1), :]
        accept = jnp.logical_and(u < a, live)

        # trace rows (masked steps re-write the carries; host slices them).
        # Regression records the TEMPERED proposal likelihood
        # (pt_timeseries_regression.py:391); classification the UNTEMPERED
        # one (pt_classification.py:404).
        if task_cls:
            t_ll[pl.ds(k, 1), :] = jnp.where(live, ll_prop, ll)
        else:
            t_ll[pl.ds(k, 1), :] = jnp.where(live, ll_prop / at, ll / at)
        rtr = jnp.where(accept, rtr_prop, rtr)
        rte = jnp.where(accept, rte_prop, rte)
        atr = jnp.where(accept, atr_prop, atr)
        ate = jnp.where(accept, ate_prop, ate)
        t_rtr[pl.ds(k, 1), :] = rtr
        t_rte[pl.ds(k, 1), :] = rte
        t_atr[pl.ds(k, 1), :] = atr
        t_ate[pl.ds(k, 1), :] = ate
        t_na[pl.ds(k, 1), :] = na  # count BEFORE this step's decision

        w = jnp.where(accept, w_prop, w)
        wl = jnp.where(accept, w_prop, wl)
        if record_w:
            t_w[pl.ds(k, 1), :, :] = wl.reshape((1,) + wl.shape)
        eta = jnp.where(accept, eta_prop, eta)
        ll = jnp.where(accept, ll_prop, ll)
        pr = jnp.where(accept, pr_prop, pr)
        na = na + accept.astype(jnp.int32)
        if adapt:
            upd = jnp.logical_and(live, start + k < burn_end)
            lsw = jnp.clip(
                lsw + jnp.where(upd, adapt_rate * (a - adapt_target), 0.0),
                math.log(1e-5),
                math.log(10.0),
            )
        return (w, wl, eta, ll, pr, rtr, rte, atr, ate, na, lsw)

    init = (
        w_ref[:], wl_ref[:], eta_ref[:], ll_ref[:], pr_ref[:],
        rtr_ref[:], rte_ref[:], atr_ref[:], ate_ref[:], na_ref[:], lsw_ref[:],
    )
    w, wl, eta, ll, pr, rtr, rte, atr, ate, na, lsw = jax.lax.fori_loop(
        0, k_max, body, init
    )
    o_w[:] = w
    o_wl[:] = wl
    o_eta[:] = eta
    o_ll[:] = ll
    o_pr[:] = pr
    o_rtr[:] = rtr
    o_rte[:] = rte
    o_atr[:] = atr
    o_ate[:] = ate
    o_na[:] = na
    o_lsw[:] = lsw


def _plane(n_pad: int, x: jax.Array) -> jax.Array:
    """(N, I) -> (I, N_pad, 1) input planes (pallas_eval.py layout)."""
    n, i = x.shape
    return jnp.pad(x, ((0, n_pad - n), (0, 0))).T.reshape(i, n_pad, 1)


def prep_data(x_tr, y_tr, x_te, y_te, n_classes: int = 0):
    """Device-ready padded data planes + masks for the block kernel.

    ``n_classes > 0`` (classification) adds one-hot label planes ``yh_*``
    of shape (O, N_pad, 1); regression carries (1, N_pad, 1) zeros so the
    kernel signature is task-independent."""
    ntr, nte = x_tr.shape[0], x_te.shape[0]
    ntr_p, nte_p = _pad8(ntr), _pad8(nte)
    one = lambda n, np_: jnp.pad(
        jnp.ones((n, 1), jnp.float32), ((0, np_ - n), (0, 0))
    )
    col = lambda y, np_: jnp.pad(y, (0, np_ - y.shape[0])).reshape(np_, 1)

    def onehot(y, np_):
        if n_classes <= 0:
            return jnp.zeros((1, np_, 1), jnp.float32)
        oh = jax.nn.one_hot(y.astype(jnp.int32), n_classes, dtype=jnp.float32)
        return jnp.pad(oh, ((0, np_ - y.shape[0]), (0, 0))).T.reshape(
            n_classes, np_, 1
        )

    return dict(
        x_tr=_plane(ntr_p, x_tr), y_tr=col(y_tr, ntr_p),
        yh_tr=onehot(y_tr, ntr_p), m_tr=one(ntr, ntr_p),
        x_te=_plane(nte_p, x_te), y_te=col(y_te, nte_p),
        yh_te=onehot(y_te, nte_p), m_te=one(nte, nte_p),
        n_tr=ntr, n_te=nte,
    )


def fused_rw_block_impl(
    state: dict,  # arrays: w (P,C), w_last (P,C), eta/ll/prior/rmse_tr/
    #               rmse_te (1,C) f32, n_accept (1,C) i32, log_step_w (1,C)
    noise_w: jax.Array,  # (K, P, C) pre-masked
    noise_eta: jax.Array,  # (K, C)
    u_mh: jax.Array,  # (K, C)
    start,  # int32 scalar — absolute step index of local step 0
    length,  # int32 scalar — live steps in this block (<= K)
    data: dict,  # prep_data output
    adapttemp: jax.Array,  # (1, C)
    topo: Tuple[int, int, int],
    cfg_scalars: dict,  # step_w, step_eta, sigma_sq, nu_1, nu_2,
    #                     adapt (bool), adapt_rate, adapt_target, burn_end,
    #                     task_cls (bool)
    record_w: bool = True,
    interpret: bool = False,
):
    """One fused K-step RW block for all chains.

    Shapes must be pre-padded: C a multiple of 128 (lanes), P a multiple
    of 8 (sublanes, padded weight rows zero everywhere). Returns
    (new_state, traces) where traces hold (K, C) rows ("ll", "rmse_train",
    "rmse_test", "acc_train", "acc_test", "accept_count") plus "w"
    (K, P, C) when ``record_w``.
    """
    k_max, p_pad, c_pad = noise_w.shape
    assert c_pad % LANES == 0 and p_pad % 8 == 0
    n_blocks = c_pad // LANES

    kern = functools.partial(
        _rw_block_kernel, topo, bool(cfg_scalars.get("task_cls", False)),
        float(data["n_tr"]), float(data["n_te"]), k_max,
        float(cfg_scalars["step_w"]), float(cfg_scalars["step_eta"]),
        float(cfg_scalars["sigma_sq"]), float(cfg_scalars["nu_1"]),
        float(cfg_scalars["nu_2"]), bool(cfg_scalars["adapt"]),
        float(cfg_scalars["adapt_rate"]), float(cfg_scalars["adapt_target"]),
        int(cfg_scalars["burn_end"]), record_w,
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    blk = lambda *shape: pl.BlockSpec(
        shape + (LANES,),
        lambda b: (0,) * len(shape) + (b,),
        memory_space=pltpu.VMEM,
    )
    st_specs = [blk(p_pad), blk(p_pad)] + [blk(1)] * 9
    out_specs = [blk(p_pad), blk(p_pad)] + [blk(1)] * 9 + [
        blk(k_max), blk(k_max), blk(k_max), blk(k_max), blk(k_max),
        blk(k_max),
    ]
    f32 = jnp.float32
    out_shape = [
        jax.ShapeDtypeStruct((p_pad, c_pad), f32),  # w
        jax.ShapeDtypeStruct((p_pad, c_pad), f32),  # w_last
        jax.ShapeDtypeStruct((1, c_pad), f32),  # eta
        jax.ShapeDtypeStruct((1, c_pad), f32),  # ll
        jax.ShapeDtypeStruct((1, c_pad), f32),  # prior
        jax.ShapeDtypeStruct((1, c_pad), f32),  # rmse_tr
        jax.ShapeDtypeStruct((1, c_pad), f32),  # rmse_te
        jax.ShapeDtypeStruct((1, c_pad), f32),  # acc_tr
        jax.ShapeDtypeStruct((1, c_pad), f32),  # acc_te
        jax.ShapeDtypeStruct((1, c_pad), jnp.int32),  # n_accept
        jax.ShapeDtypeStruct((1, c_pad), f32),  # log_step_w
        jax.ShapeDtypeStruct((k_max, c_pad), f32),  # tr ll
        jax.ShapeDtypeStruct((k_max, c_pad), f32),  # tr rmse_tr
        jax.ShapeDtypeStruct((k_max, c_pad), f32),  # tr rmse_te
        jax.ShapeDtypeStruct((k_max, c_pad), f32),  # tr acc_tr
        jax.ShapeDtypeStruct((k_max, c_pad), f32),  # tr acc_te
        jax.ShapeDtypeStruct((k_max, c_pad), jnp.int32),  # tr accept_count
    ]
    if record_w:
        out_specs.append(blk(k_max, p_pad))
        out_shape.append(jax.ShapeDtypeStruct((k_max, p_pad, c_pad), f32))
    sl = jnp.stack(
        [jnp.asarray(start, jnp.int32), jnp.asarray(length, jnp.int32)]
    )
    res = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[smem] + [full()] * 8 + [blk(1)] + st_specs
        + [blk(k_max, p_pad), blk(k_max), blk(k_max)],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(
        sl,
        data["x_tr"], data["y_tr"], data["yh_tr"], data["m_tr"],
        data["x_te"], data["y_te"], data["yh_te"], data["m_te"],
        adapttemp,
        state["w"], state["w_last"], state["eta"], state["ll"],
        state["prior"], state["rmse_train"], state["rmse_test"],
        state["acc_train"], state["acc_test"],
        state["n_accept"], state["log_step_w"],
        noise_w, noise_eta, u_mh,
    )
    new_state = dict(
        w=res[0], w_last=res[1], eta=res[2], ll=res[3], prior=res[4],
        rmse_train=res[5], rmse_test=res[6], acc_train=res[7],
        acc_test=res[8], n_accept=res[9], log_step_w=res[10],
    )
    traces = dict(
        ll=res[11], rmse_train=res[12], rmse_test=res[13], acc_train=res[14],
        acc_test=res[15], accept_count=res[16],
    )
    if record_w:
        traces["w"] = res[17]
    return new_state, traces


# ---------------------------------------------------------------------------
# Preconditioned-MALA fused block (the ESS/s flagship mode, regression).
#
# Per-step semantics are bit-for-bit kernel.step_precond with
# proposal="precond_mala" (TPU-first flagship, not reference behavior):
# two Metropolis-within-Gibbs blocks per step — (1) the preconditioned MALA
# w-block with exact Gaussian reverse-kernel q-ratio, Welford diagonal
# preconditioner (identity until pc_start, frozen at burn-in), deterministic
# normalized-gradient warm start with forced accept, per-chain Robbins-Monro
# scale adaptation; (2) the dataset-free eta RW block recovering -SSE/2
# algebraically from the carried log-likelihood. The likelihood gradient is
# the hand-written plane backprop above (validated vs autodiff); the cached
# g_like carry crosses blocks/swaps exactly like ChainState.g_like.

ETA_TARGET_ACCEPT = 0.44  # 1-D RW-MH optimum (kernel.py convention)


def _mala_block_kernel(
    topo, n_tr, n_te, k_max, w_size, p_pad, sigma_sq, nu_1, nu_2,
    adapt_rate, mala_target, warmstart_step, precond_power,
    pc_start, warm_end, burn_end_p, record_w,
    sl_ref,  # (2,) SMEM int32: [start, length]
    xtr_ref, ytr_ref, mtr_ref,
    xte_ref, yte_ref, mte_ref,
    at_ref,  # (1, C) adapttemp
    w_ref, wl_ref, eta_ref, ll_ref, pr_ref, rtr_ref, rte_ref, na_ref,
    lsw_ref, lse_ref,  # (1, C) log w-scale / log eta-scale
    gl_ref, pm_ref, p2_ref,  # (P, C) g_like / Welford mean / Welford M2
    nw_ref,  # (K, P, C) w noise (pre-masked rows)
    ne_ref,  # (K, C) eta noise
    u_ref,  # (K, C) w-block MH uniforms
    ue_ref,  # (K, C) eta-block MH uniforms
    o_w, o_wl, o_eta, o_ll, o_pr, o_rtr, o_rte, o_na, o_lsw, o_lse,
    o_gl, o_pm, o_p2,
    t_ll, t_rtr, t_rte, t_na, *maybe_t_w,
):
    t_w = maybe_t_w[0] if record_w else None
    i_dim, h_dim, _o = topo
    start = sl_ref[0]
    length = sl_ref[1]
    at = at_ref[:]  # (1, C)
    prior_const = -0.5 * (i_dim * h_dim + h_dim + 2) * math.log(sigma_sq)
    f32 = jnp.float32

    def body(k, carry):
        (w, wl, eta, ll, pr, rtr, rte, na, lsw, lse, gl, pm, p2) = carry
        i = start + k
        live = k < length
        sig = jnp.exp(lsw)  # (1, C)
        # --- diagonal preconditioner from the Welford buffers -------------
        cnt = jnp.maximum(jnp.minimum(i, burn_end_p) - warm_end, 1).astype(
            f32
        )
        var = p2 / cnt  # (P, C); padded rows stay 0
        mean_var = jnp.sum(var, axis=0, keepdims=True) / float(w_size)
        m = jnp.clip(var / jnp.maximum(mean_var, 1e-30), 1e-4, 1e4)
        if precond_power != 1.0:
            m = jnp.power(m, precond_power)
        m = jnp.where(i >= pc_start, m, jnp.ones_like(m))
        tau = jnp.exp(eta)
        # --- MALA w-block ---------------------------------------------------
        g_cur = gl / (tau * at) - w / sigma_sq
        sig2m = (sig * sig) * m
        mean_fwd = w + 0.5 * sig2m * g_cur
        w_prop = mean_fwd + sig * jnp.sqrt(m) * nw_ref[k]
        # deterministic warm start (forced accept below)
        g_rms = jnp.sqrt(
            jnp.sum(g_cur * g_cur, axis=0, keepdims=True) / float(w_size)
        )
        w_warm = w + warmstart_step * g_cur / jnp.maximum(g_rms, 1e-12)
        w_prop = jnp.where(i < warm_end, w_warm, w_prop)
        ssq = jnp.sum(w_prop * w_prop, axis=0, keepdims=True)
        pr_prop = (
            prior_const
            - ssq / (2.0 * sigma_sq)
            - (1.0 + nu_1) * eta
            - nu_2 / tau
        )
        sse_tr, g_rows = _fwd_grad_reg(
            w_prop, xtr_ref, ytr_ref, mtr_ref, topo, p_pad
        )
        sse_te = _fwd_sse(w_prop, xte_ref, yte_ref, mte_ref, topo)
        ll_prop = -0.5 * n_tr * (_LOG_2PI + eta) - 0.5 * sse_tr / tau
        rtr_prop = jnp.sqrt(sse_tr / n_tr)
        rte_prop = jnp.sqrt(sse_te / n_te)
        g_prop = g_rows / (tau * at) - w_prop / sigma_sq
        mean_rev = w_prop + 0.5 * sig2m * g_prop
        d_fwd = w_prop - mean_fwd
        d_rev = w - mean_rev
        diff = (
            jnp.sum(d_fwd * d_fwd / m, axis=0, keepdims=True)
            - jnp.sum(d_rev * d_rev / m, axis=0, keepdims=True)
        ) / (2.0 * sig * sig)
        log_mh = (ll_prop - ll) / at + (pr_prop - pr) + diff
        a = jnp.exp(jnp.minimum(log_mh, 0.0))
        accept = jnp.logical_or(u_ref[pl.ds(k, 1), :] < a, i < warm_end)
        accept = jnp.logical_and(accept, live)

        t_ll[pl.ds(k, 1), :] = jnp.where(live, ll_prop / at, ll / at)
        rtr = jnp.where(accept, rtr_prop, rtr)
        rte = jnp.where(accept, rte_prop, rte)
        t_rtr[pl.ds(k, 1), :] = rtr
        t_rte[pl.ds(k, 1), :] = rte
        t_na[pl.ds(k, 1), :] = na  # count BEFORE this step's decision

        w = jnp.where(accept, w_prop, w)
        wl = jnp.where(accept, w_prop, wl)
        if record_w:
            t_w[pl.ds(k, 1), :, :] = wl.reshape((1,) + wl.shape)
        ll = jnp.where(accept, ll_prop, ll)
        pr = jnp.where(accept, pr_prop, pr)
        gl = jnp.where(accept, g_rows, gl)
        na = na + accept.astype(jnp.int32)

        # --- eta block (dataset-free; kernel.py step_precond) -------------
        sig_e = jnp.exp(lse)
        eta_prop = eta + sig_e * ne_ref[pl.ds(k, 1), :]
        val_cur = (ll + 0.5 * n_tr * (_LOG_2PI + eta)) * jnp.exp(eta)
        ll_eta = -0.5 * n_tr * (_LOG_2PI + eta_prop) + val_cur * jnp.exp(
            -eta_prop
        )
        dprior = -(1.0 + nu_1) * (eta_prop - eta) - nu_2 * (
            jnp.exp(-eta_prop) - jnp.exp(-eta)
        )
        log_mh_e = (ll_eta - ll) / at + dprior
        mh_e = jnp.exp(jnp.minimum(log_mh_e, 0.0))
        acc_e = jnp.logical_and(ue_ref[pl.ds(k, 1), :] < mh_e, live)
        eta = jnp.where(acc_e, eta_prop, eta)
        ll = jnp.where(acc_e, ll_eta, ll)
        pr = pr + jnp.where(acc_e, dprior, 0.0)
        lse = jnp.clip(
            lse
            + jnp.where(
                jnp.logical_and(live, i < burn_end_p),
                adapt_rate * (mh_e - ETA_TARGET_ACCEPT),
                0.0,
            ),
            math.log(1e-4),
            math.log(10.0),
        )

        # --- Welford accumulation + Robbins-Monro w-scale ------------------
        updf = jnp.where(
            jnp.logical_and(
                live, jnp.logical_and(i >= warm_end, i < burn_end_p)
            ),
            1.0,
            0.0,
        )
        cnt_new = jnp.maximum(
            jnp.minimum(i + 1, burn_end_p) - warm_end, 1
        ).astype(f32)
        delta = w - pm
        pm = pm + updf * delta / cnt_new
        p2 = p2 + updf * delta * (w - pm)
        mh_p = jnp.exp(jnp.minimum(log_mh, 0.0))
        lsw = jnp.clip(
            lsw
            + jnp.where(
                updf > 0.0, adapt_rate * (mh_p - mala_target), 0.0
            ),
            math.log(1e-6),
            math.log(10.0),
        )
        return (w, wl, eta, ll, pr, rtr, rte, na, lsw, lse, gl, pm, p2)

    init = (
        w_ref[:], wl_ref[:], eta_ref[:], ll_ref[:], pr_ref[:],
        rtr_ref[:], rte_ref[:], na_ref[:], lsw_ref[:], lse_ref[:],
        gl_ref[:], pm_ref[:], p2_ref[:],
    )
    (w, wl, eta, ll, pr, rtr, rte, na, lsw, lse, gl, pm, p2) = (
        jax.lax.fori_loop(0, k_max, body, init)
    )
    o_w[:] = w
    o_wl[:] = wl
    o_eta[:] = eta
    o_ll[:] = ll
    o_pr[:] = pr
    o_rtr[:] = rtr
    o_rte[:] = rte
    o_na[:] = na
    o_lsw[:] = lsw
    o_lse[:] = lse
    o_gl[:] = gl
    o_pm[:] = pm
    o_p2[:] = p2


def fused_mala_block_impl(
    state: dict,  # w/w_last/g_like/pc_mean/pc_m2 (P,C); eta/ll/prior/
    #               rmse_tr/rmse_te/log_step_w/log_step_eta (1,C) f32;
    #               n_accept (1,C) i32
    noise_w: jax.Array,  # (K, P, C) pre-masked
    noise_eta: jax.Array,  # (K, C)
    u_mh: jax.Array,  # (K, C) w-block uniforms
    u_eta: jax.Array,  # (K, C) eta-block uniforms
    start,
    length,
    data: dict,  # prep_data output (regression: yh planes unused)
    adapttemp: jax.Array,  # (1, C)
    topo: Tuple[int, int, int],
    cfg_scalars: dict,  # sigma_sq, nu_1, nu_2, adapt_rate, mala_target,
    #                     warmstart_step, precond_power, pc_start, warm_end,
    #                     burn_end
    record_w: bool = True,
    interpret: bool = False,
):
    """One fused K-step preconditioned-MALA block for all chains."""
    k_max, p_pad, c_pad = noise_w.shape
    assert c_pad % LANES == 0 and p_pad % 8 == 0
    n_blocks = c_pad // LANES
    i_dim, h_dim, o_dim = topo
    w_size = i_dim * h_dim + h_dim * o_dim + h_dim + o_dim

    kern = functools.partial(
        _mala_block_kernel, topo, float(data["n_tr"]), float(data["n_te"]),
        k_max, w_size, p_pad,
        float(cfg_scalars["sigma_sq"]), float(cfg_scalars["nu_1"]),
        float(cfg_scalars["nu_2"]), float(cfg_scalars["adapt_rate"]),
        float(cfg_scalars["mala_target"]),
        float(cfg_scalars["warmstart_step"]),
        float(cfg_scalars["precond_power"]), int(cfg_scalars["pc_start"]),
        int(cfg_scalars["warm_end"]), int(cfg_scalars["burn_end"]), record_w,
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    blk = lambda *shape: pl.BlockSpec(
        shape + (LANES,),
        lambda b: (0,) * len(shape) + (b,),
        memory_space=pltpu.VMEM,
    )
    st_specs = (
        [blk(p_pad), blk(p_pad)] + [blk(1)] * 8
        + [blk(p_pad), blk(p_pad), blk(p_pad)]
    )
    out_specs = (
        [blk(p_pad), blk(p_pad)] + [blk(1)] * 8
        + [blk(p_pad), blk(p_pad), blk(p_pad)]
        + [blk(k_max)] * 4
    )
    f32 = jnp.float32
    pc = lambda: jax.ShapeDtypeStruct((p_pad, c_pad), f32)
    c1 = lambda dt=f32: jax.ShapeDtypeStruct((1, c_pad), dt)
    kc = lambda dt=f32: jax.ShapeDtypeStruct((k_max, c_pad), dt)
    out_shape = [
        pc(), pc(),  # w, w_last
        c1(), c1(), c1(), c1(), c1(),  # eta, ll, prior, rmse_tr, rmse_te
        c1(jnp.int32), c1(), c1(),  # n_accept, log_step_w, log_step_eta
        pc(), pc(), pc(),  # g_like, pc_mean, pc_m2
        kc(), kc(), kc(), kc(jnp.int32),  # tr ll/rmse_tr/rmse_te/acc_count
    ]
    if record_w:
        out_specs.append(blk(k_max, p_pad))
        out_shape.append(jax.ShapeDtypeStruct((k_max, p_pad, c_pad), f32))
    sl = jnp.stack(
        [jnp.asarray(start, jnp.int32), jnp.asarray(length, jnp.int32)]
    )
    res = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[smem] + [full()] * 6 + [blk(1)] + st_specs
        + [blk(k_max, p_pad), blk(k_max), blk(k_max), blk(k_max)],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(
        sl,
        data["x_tr"], data["y_tr"], data["m_tr"],
        data["x_te"], data["y_te"], data["m_te"],
        adapttemp,
        state["w"], state["w_last"], state["eta"], state["ll"],
        state["prior"], state["rmse_train"], state["rmse_test"],
        state["n_accept"], state["log_step_w"], state["log_step_eta"],
        state["g_like"], state["pc_mean"], state["pc_m2"],
        noise_w, noise_eta, u_mh, u_eta,
    )
    new_state = dict(
        w=res[0], w_last=res[1], eta=res[2], ll=res[3], prior=res[4],
        rmse_train=res[5], rmse_test=res[6], n_accept=res[7],
        log_step_w=res[8], log_step_eta=res[9], g_like=res[10],
        pc_mean=res[11], pc_m2=res[12],
    )
    traces = dict(
        ll=res[13], rmse_train=res[14], rmse_test=res[15],
        accept_count=res[16],
    )
    if record_w:
        traces["w"] = res[17]
    return new_state, traces


# ---------------------------------------------------------------------------
# Preconditioned-HMC fused block (the quality-flagship mode, regression),
# with optional in-kernel ChEES cross-replica trajectory adaptation.
#
# Per-step semantics mirror kernel.step_precond with proposal="hmc"
# (TPU-first flagship, not reference behavior): a leapfrog trajectory on the
# tempered Hamiltonian with diagonal mass matrix M = diag(1/m) (m the Welford
# position preconditioner), kinetic-energy MH correction, deterministic
# warm-start phase with forced accept, the dataset-free eta RW block, and
# Robbins-Monro scale adaptation toward hmc_target_accept — all state
# resident in VMEM across the block, gradients from the hand-written plane
# backprop (_fwd_grad_reg). The proposal's (SSE, gradient) at the selected
# endpoint REUSE the trajectory carry (the last leapfrog iteration already
# evaluated them; under ChEES the per-lane masking keeps the carry at each
# lane's own selected endpoint) — only live warm-start steps, whose proposal
# w_warm never entered the trajectory, pay a fresh eval via a scalar
# lax.cond. Bitwise-identical to an endpoint re-eval (same arithmetic at
# the same w), worth ~1/(L+1) of the block's gradient FLOPs — the oracle in
# tests/test_pallas_step.py pins exactly these semantics, and equivalence
# with the per-step sampler is distributional (same-seed noise streams differ
# by construction).
#
# ChEES (cfg.hmc_adapt_traj; Hoffman et al. 2021 adapted to tempering as in
# kernel.step_precond): trajectory length tau = u_i * exp(log_traj) with the
# van-der-Corput jitter streamed in, realized leapfrog counts masked inside
# the static hmc_leapfrog bound, and the criterion's per-RUNG expectations
# over the n_ladders replicas computed IN-KERNEL as one matmul with a
# constant rung-sum matrix A (A[j,j'] = 1 iff j,j' are live replicas of the
# same rung) — which is why the ChEES variant requires the whole chain axis
# to fit one 128-lane block (the ensemble flagships 16x4 / 8x8 do).


def _hmc_block_kernel(
    topo, n_tr, n_te, k_max, w_size, p_pad, sigma_sq, nu_1, nu_2,
    adapt_rate, hmc_target, warmstart_step, precond_power,
    pc_start, warm_end, burn_end_p, leapfrog, eps_jitter, chees,
    chees_rate, n_ladders, record_w,
    sl_ref,  # (2,) SMEM int32: [start, length]
    xtr_ref, ytr_ref, mtr_ref,
    xte_ref, yte_ref, mte_ref,
    at_ref,  # (1, C) adapttemp
    w_ref, wl_ref, eta_ref, ll_ref, pr_ref, rtr_ref, rte_ref, na_ref,
    lsw_ref, lse_ref,  # (1, C) log w-scale / log eta-scale
    gl_ref, pm_ref, p2_ref,  # (P, C) g_like / Welford mean / Welford M2
    lt_ref, m1_ref, v2_ref,  # (1, C) log_traj / ChEES Adam m1 / v2
    a_ref,  # (LANES, LANES) per-block rung-sum matrix (zeros when not chees)
    nw_ref,  # (K, P, C) momentum noise (pre-masked rows)
    ne_ref,  # (K, C) eta noise
    u_ref,  # (K, C) w-block MH uniforms
    ue_ref,  # (K, C) eta-block MH uniforms
    uj_ref,  # (K, C) eps-jitter uniforms
    ut_ref,  # (K, C) van-der-Corput trajectory jitter (lane-replicated)
    o_w, o_wl, o_eta, o_ll, o_pr, o_rtr, o_rte, o_na, o_lsw, o_lse,
    o_gl, o_pm, o_p2, o_lt, o_m1, o_v2,
    t_ll, t_rtr, t_rte, t_na, t_tl, *maybe_t_w,
):
    t_w = maybe_t_w[0] if record_w else None
    i_dim, h_dim, _o = topo
    start = sl_ref[0]
    length = sl_ref[1]
    at = at_ref[:]  # (1, C)
    prior_const = -0.5 * (i_dim * h_dim + h_dim + 2) * math.log(sigma_sq)
    f32 = jnp.float32
    log09 = math.log(0.9)
    log0999 = math.log(0.999)

    def body(k, carry):
        (w, wl, eta, ll, pr, rtr, rte, na, lsw, lse, gl, pm, p2,
         lt, m1, v2) = carry
        i = start + k
        live = k < length
        sig = jnp.exp(lsw)  # (1, C)
        # --- diagonal preconditioner from the Welford buffers -------------
        cnt = jnp.maximum(jnp.minimum(i, burn_end_p) - warm_end, 1).astype(
            f32
        )
        var = p2 / cnt  # (P, C); padded rows stay 0
        mean_var = jnp.sum(var, axis=0, keepdims=True) / float(w_size)
        m = jnp.clip(var / jnp.maximum(mean_var, 1e-30), 1e-4, 1e4)
        if precond_power != 1.0:
            m = jnp.power(m, precond_power)
        m = jnp.where(i >= pc_start, m, jnp.ones_like(m))
        tau = jnp.exp(eta)
        g_cur = gl / (tau * at) - w / sigma_sq  # tempered posterior grad
        # --- trajectory schedule -------------------------------------------
        eps = sig
        if eps_jitter > 0.0:
            eps = sig * (
                1.0 + eps_jitter * (2.0 * uj_ref[pl.ds(k, 1), :] - 1.0)
            )
        if chees:
            u_t = ut_ref[pl.ds(k, 1), :]  # (1, C) lane-replicated vdc
            tau_traj = jnp.exp(lt) * u_t
            l_steps = jnp.clip(
                jnp.ceil(tau_traj / eps), 1.0, float(leapfrog)
            )  # (1, C) float
        # --- leapfrog trajectory -------------------------------------------
        p0 = nw_ref[k] / jnp.sqrt(m)  # (P, C); padded rows zero
        k_init = 0.5 * jnp.sum(m * p0 * p0, axis=0, keepdims=True)

        def leap(n, cr):
            w_c, p_c, g_c, sse_c, glr_c = cr
            p_half = p_c + 0.5 * eps * g_c
            w_n = w_c + eps * m * p_half
            sse_n, gl_n = _fwd_grad_reg(
                w_n, xtr_ref, ytr_ref, mtr_ref, topo, p_pad
            )
            g_n = gl_n / (tau * at) - w_n / sigma_sq
            p_n = p_half + 0.5 * eps * g_n
            if chees:
                upd = n.astype(f32) < l_steps  # (1, C)
                w_n = jnp.where(upd, w_n, w_c)
                p_n = jnp.where(upd, p_n, p_c)
                g_n = jnp.where(upd, g_n, g_c)
                # carry (SSE, raw grad rows) at each lane's OWN selected
                # endpoint — the masking keeps them in sync with w_n, so
                # the post-trajectory MH eval can reuse them
                sse_n = jnp.where(upd, sse_n, sse_c)
                gl_n = jnp.where(upd, gl_n, glr_c)
            return (w_n, p_n, g_n, sse_n, gl_n)

        # Dynamic trip count — the dominant cost is the per-leapfrog
        # gradient eval, so don't run iterations whose result is provably
        # discarded: (a) under ChEES every lane masks updates past its own
        # l_steps, so the block only needs max-over-lanes iterations (mean
        # realized L ~ leapfrog/2 under the vdc jitter — this is the ~2x
        # the per-step path cannot recover); (b) during the forced-accept
        # warm start w_prop := w_warm and no adaptation reads the
        # trajectory, so it is skipped outright, as it is for the dead
        # padding steps past `length`. Bitwise-identical outputs to the
        # static-bound loop (pinned in tests/test_pallas_step.py).
        if chees:
            n_leap = jnp.max(l_steps).astype(jnp.int32)
        else:
            n_leap = jnp.int32(leapfrog)
        n_leap = jnp.where(
            jnp.logical_and(live, i >= warm_end), n_leap, 0
        )
        w_end, p_end, _g_end, sse_end, gl_end = jax.lax.fori_loop(
            0, n_leap, leap, (w, p0, g_cur, jnp.zeros_like(at), gl)
        )
        k_end = 0.5 * jnp.sum(m * p_end * p_end, axis=0, keepdims=True)
        # --- warm start (forced accept below) -------------------------------
        g_rms = jnp.sqrt(
            jnp.sum(g_cur * g_cur, axis=0, keepdims=True) / float(w_size)
        )
        w_warm = w + warmstart_step * g_cur / jnp.maximum(g_rms, 1e-12)
        w_prop = jnp.where(i < warm_end, w_warm, w_end)
        # --- endpoint (SSE, gradient): reuse the trajectory carry ----------
        # The last leapfrog iteration already evaluated (SSE, grad) at
        # w_end (per-lane masked under ChEES, so each lane's carry is at
        # its OWN selected endpoint) — the re-eval is only needed on live
        # warm-start steps, where w_prop = w_warm and no trajectory ran.
        # Dead padding steps reuse the (fully masked-out) carry. Worth
        # ~1/(L+1) of the block's gradient FLOPs; bitwise-identical to
        # the former unconditional re-eval (same _fwd_grad_reg arithmetic
        # at the same w — oracle-pinned in tests/test_pallas_step.py).
        ssq = jnp.sum(w_prop * w_prop, axis=0, keepdims=True)
        pr_prop = (
            prior_const
            - ssq / (2.0 * sigma_sq)
            - (1.0 + nu_1) * eta
            - nu_2 / tau
        )
        sse_tr, g_rows = jax.lax.cond(
            jnp.logical_and(live, i < warm_end),
            lambda: _fwd_grad_reg(
                w_prop, xtr_ref, ytr_ref, mtr_ref, topo, p_pad
            ),
            lambda: (sse_end, gl_end),
        )
        sse_te = _fwd_sse(w_prop, xte_ref, yte_ref, mte_ref, topo)
        ll_prop = -0.5 * n_tr * (_LOG_2PI + eta) - 0.5 * sse_tr / tau
        rtr_prop = jnp.sqrt(sse_tr / n_tr)
        rte_prop = jnp.sqrt(sse_te / n_te)
        diff = k_init - k_end  # reversible volume-preserving integrator
        log_mh = (ll_prop - ll) / at + (pr_prop - pr) + diff
        a = jnp.exp(jnp.minimum(log_mh, 0.0))
        accept = jnp.logical_or(u_ref[pl.ds(k, 1), :] < a, i < warm_end)
        accept = jnp.logical_and(accept, live)

        t_ll[pl.ds(k, 1), :] = jnp.where(live, ll_prop / at, ll / at)
        rtr = jnp.where(accept, rtr_prop, rtr)
        rte = jnp.where(accept, rte_prop, rte)
        t_rtr[pl.ds(k, 1), :] = rtr
        t_rte[pl.ds(k, 1), :] = rte
        t_na[pl.ds(k, 1), :] = na  # count BEFORE this step's decision
        if chees:
            t_tl[pl.ds(k, 1), :] = jnp.where(live, l_steps, 0.0)
        else:
            t_tl[pl.ds(k, 1), :] = jnp.where(
                live, jnp.full_like(at, float(leapfrog)), jnp.zeros_like(at)
            )

        w_old = w  # pre-decision position (ChEES uses it)
        w = jnp.where(accept, w_prop, w)
        wl = jnp.where(accept, w_prop, wl)
        if record_w:
            t_w[pl.ds(k, 1), :, :] = wl.reshape((1,) + wl.shape)
        ll = jnp.where(accept, ll_prop, ll)
        pr = jnp.where(accept, pr_prop, pr)
        gl = jnp.where(accept, g_rows, gl)
        na = na + accept.astype(jnp.int32)

        # --- eta block (dataset-free; kernel.py step_precond) -------------
        sig_e = jnp.exp(lse)
        eta_prop = eta + sig_e * ne_ref[pl.ds(k, 1), :]
        val_cur = (ll + 0.5 * n_tr * (_LOG_2PI + eta)) * jnp.exp(eta)
        ll_eta = -0.5 * n_tr * (_LOG_2PI + eta_prop) + val_cur * jnp.exp(
            -eta_prop
        )
        dprior = -(1.0 + nu_1) * (eta_prop - eta) - nu_2 * (
            jnp.exp(-eta_prop) - jnp.exp(-eta)
        )
        log_mh_e = (ll_eta - ll) / at + dprior
        mh_e = jnp.exp(jnp.minimum(log_mh_e, 0.0))
        acc_e = jnp.logical_and(ue_ref[pl.ds(k, 1), :] < mh_e, live)
        eta = jnp.where(acc_e, eta_prop, eta)
        ll = jnp.where(acc_e, ll_eta, ll)
        pr = pr + jnp.where(acc_e, dprior, 0.0)
        lse = jnp.clip(
            lse
            + jnp.where(
                jnp.logical_and(live, i < burn_end_p),
                adapt_rate * (mh_e - ETA_TARGET_ACCEPT),
                0.0,
            ),
            math.log(1e-4),
            math.log(10.0),
        )

        # --- ChEES trajectory-length adaptation (in-kernel rung sums) ------
        if chees:
            rsum_p = lambda x: jnp.dot(
                x, a_ref[:], preferred_element_type=f32
            )
            dxp = w_prop - rsum_p(w_prop) / float(n_ladders)
            dx = w_old - rsum_p(w_old) / float(n_ladders)
            dsq = jnp.sum(m * dxp * dxp, axis=0, keepdims=True) - jnp.sum(
                m * dx * dx, axis=0, keepdims=True
            )
            inner = jnp.sum(dxp * p_end, axis=0, keepdims=True)
            g_c = a * dsq * inner * u_t  # acceptance-weighted estimator
            wsum = jnp.maximum(rsum_p(a), 1e-6)
            g_rung = rsum_p(g_c) / wsum
            g_log = g_rung * tau_traj
            live_tr = jnp.logical_and(
                live, jnp.logical_and(i >= warm_end, i < burn_end_p)
            )
            t_ad = jnp.maximum(
                (jnp.minimum(i, burn_end_p) - warm_end).astype(f32) + 1.0,
                1.0,
            )
            m1 = jnp.where(live_tr, 0.9 * m1 + 0.1 * g_log, m1)
            v2 = jnp.where(live_tr, 0.999 * v2 + 0.001 * g_log * g_log, v2)
            bc1 = 1.0 - jnp.exp(t_ad * log09)
            bc2 = 1.0 - jnp.exp(t_ad * log0999)
            step_ad = (
                chees_rate * (m1 / bc1) / (jnp.sqrt(v2 / bc2) + 1e-8)
            )
            lt = jnp.clip(
                lt + jnp.where(live_tr, step_ad, 0.0),
                math.log(1e-4),
                jnp.log(eps * float(leapfrog)),
            )

        # --- Welford accumulation + Robbins-Monro w-scale ------------------
        updf = jnp.where(
            jnp.logical_and(
                live, jnp.logical_and(i >= warm_end, i < burn_end_p)
            ),
            1.0,
            0.0,
        )
        cnt_new = jnp.maximum(
            jnp.minimum(i + 1, burn_end_p) - warm_end, 1
        ).astype(f32)
        delta = w - pm
        pm = pm + updf * delta / cnt_new
        p2 = p2 + updf * delta * (w - pm)
        lsw = jnp.clip(
            lsw
            + jnp.where(updf > 0.0, adapt_rate * (a - hmc_target), 0.0),
            math.log(1e-6),
            math.log(10.0),
        )
        return (w, wl, eta, ll, pr, rtr, rte, na, lsw, lse, gl, pm, p2,
                lt, m1, v2)

    init = (
        w_ref[:], wl_ref[:], eta_ref[:], ll_ref[:], pr_ref[:],
        rtr_ref[:], rte_ref[:], na_ref[:], lsw_ref[:], lse_ref[:],
        gl_ref[:], pm_ref[:], p2_ref[:], lt_ref[:], m1_ref[:], v2_ref[:],
    )
    (w, wl, eta, ll, pr, rtr, rte, na, lsw, lse, gl, pm, p2, lt, m1, v2) = (
        jax.lax.fori_loop(0, k_max, body, init)
    )
    o_w[:] = w
    o_wl[:] = wl
    o_eta[:] = eta
    o_ll[:] = ll
    o_pr[:] = pr
    o_rtr[:] = rtr
    o_rte[:] = rte
    o_na[:] = na
    o_lsw[:] = lsw
    o_lse[:] = lse
    o_gl[:] = gl
    o_pm[:] = pm
    o_p2[:] = p2
    o_lt[:] = lt
    o_m1[:] = m1
    o_v2[:] = v2


def rung_sum_matrix(
    num_chains: int, rungs_per_ladder: int, c_pad: int
) -> jax.Array:
    """(C_pad, C_pad) constant matrix A with A[j, j'] = 1 iff chains j, j'
    are live replicas of the same rung (chain index = ladder * K + rung, the
    kernel.py ensemble layout) — so ``x @ A`` is the per-rung replica SUM,
    broadcast back to every chain. Padded lanes stay zero."""
    idx = jnp.arange(c_pad)
    rung = idx % max(rungs_per_ladder, 1)
    liv = idx < num_chains
    same = (rung[:, None] == rung[None, :]) & liv[:, None] & liv[None, :]
    return same.astype(jnp.float32)


def fused_hmc_block_impl(
    state: dict,  # MALA state dict + log_traj/chees_m1/chees_v2 (1,C) f32
    noise_w: jax.Array,  # (K, P, C) momentum noise, pre-masked rows
    noise_eta: jax.Array,  # (K, C)
    u_mh: jax.Array,  # (K, C) w-block uniforms
    u_eta: jax.Array,  # (K, C) eta-block uniforms
    u_jit: jax.Array,  # (K, C) eps-jitter uniforms
    u_traj: jax.Array,  # (K, C) van-der-Corput jitter, lane-replicated
    rung_sum: jax.Array,  # (LANES, LANES) per-block rung-sum matrix (zeros when not chees)
    start,
    length,
    data: dict,  # prep_data output (regression planes)
    adapttemp: jax.Array,  # (1, C)
    topo: Tuple[int, int, int],
    cfg_scalars: dict,  # sigma_sq, nu_1, nu_2, adapt_rate, hmc_target,
    #                     warmstart_step, precond_power, pc_start, warm_end,
    #                     burn_end, leapfrog, eps_jitter, chees, chees_rate,
    #                     n_ladders
    record_w: bool = True,
    interpret: bool = False,
):
    """One fused K-step preconditioned-HMC block for all chains."""
    k_max, p_pad, c_pad = noise_w.shape
    assert c_pad % LANES == 0 and p_pad % 8 == 0
    n_blocks = c_pad // LANES
    chees = bool(cfg_scalars["chees"])
    if chees and rung_sum.shape != (LANES, LANES):
        # The rung-sum matmul couples lanes WITHIN a 128-lane block only;
        # multi-block ensembles work when every block holds complete
        # ladders (layout chain = ladder*K + rung with K | 128, checked by
        # fused.fused_reason) — each block then adapts from its own
        # LANES/K replicas and cfg_scalars["n_ladders"] is that per-block
        # replica count. The caller supplies the per-block (128, 128)
        # matrix either way.
        raise ValueError(
            "fused ChEES needs a per-block (%d, %d) rung-sum matrix; got "
            "%s" % (LANES, LANES, rung_sum.shape)
        )
    i_dim, h_dim, o_dim = topo
    w_size = i_dim * h_dim + h_dim * o_dim + h_dim + o_dim

    kern = functools.partial(
        _hmc_block_kernel, topo, float(data["n_tr"]), float(data["n_te"]),
        k_max, w_size, p_pad,
        float(cfg_scalars["sigma_sq"]), float(cfg_scalars["nu_1"]),
        float(cfg_scalars["nu_2"]), float(cfg_scalars["adapt_rate"]),
        float(cfg_scalars["hmc_target"]),
        float(cfg_scalars["warmstart_step"]),
        float(cfg_scalars["precond_power"]), int(cfg_scalars["pc_start"]),
        int(cfg_scalars["warm_end"]), int(cfg_scalars["burn_end"]),
        int(cfg_scalars["leapfrog"]), float(cfg_scalars["eps_jitter"]),
        chees, float(cfg_scalars["chees_rate"]),
        int(cfg_scalars["n_ladders"]), record_w,
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    blk = lambda *shape: pl.BlockSpec(
        shape + (LANES,),
        lambda b: (0,) * len(shape) + (b,),
        memory_space=pltpu.VMEM,
    )
    st_specs = (
        [blk(p_pad), blk(p_pad)] + [blk(1)] * 8
        + [blk(p_pad), blk(p_pad), blk(p_pad)] + [blk(1)] * 3
    )
    out_specs = (
        [blk(p_pad), blk(p_pad)] + [blk(1)] * 8
        + [blk(p_pad), blk(p_pad), blk(p_pad)] + [blk(1)] * 3
        + [blk(k_max)] * 5
    )
    f32 = jnp.float32
    pc = lambda: jax.ShapeDtypeStruct((p_pad, c_pad), f32)
    c1 = lambda dt=f32: jax.ShapeDtypeStruct((1, c_pad), dt)
    kc = lambda dt=f32: jax.ShapeDtypeStruct((k_max, c_pad), dt)
    out_shape = [
        pc(), pc(),  # w, w_last
        c1(), c1(), c1(), c1(), c1(),  # eta, ll, prior, rmse_tr, rmse_te
        c1(jnp.int32), c1(), c1(),  # n_accept, log_step_w, log_step_eta
        pc(), pc(), pc(),  # g_like, pc_mean, pc_m2
        c1(), c1(), c1(),  # log_traj, chees_m1, chees_v2
        kc(), kc(), kc(), kc(jnp.int32), kc(),  # tr ll/rtr/rte/acc_count/tl
    ]
    if record_w:
        out_specs.append(blk(k_max, p_pad))
        out_shape.append(jax.ShapeDtypeStruct((k_max, p_pad, c_pad), f32))
    sl = jnp.stack(
        [jnp.asarray(start, jnp.int32), jnp.asarray(length, jnp.int32)]
    )
    res = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[smem] + [full()] * 6 + [blk(1)] + st_specs + [full()]
        + [blk(k_max, p_pad)] + [blk(k_max)] * 5,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(
        sl,
        data["x_tr"], data["y_tr"], data["m_tr"],
        data["x_te"], data["y_te"], data["m_te"],
        adapttemp,
        state["w"], state["w_last"], state["eta"], state["ll"],
        state["prior"], state["rmse_train"], state["rmse_test"],
        state["n_accept"], state["log_step_w"], state["log_step_eta"],
        state["g_like"], state["pc_mean"], state["pc_m2"],
        state["log_traj"], state["chees_m1"], state["chees_v2"],
        rung_sum,
        noise_w, noise_eta, u_mh, u_eta, u_jit, u_traj,
    )
    new_state = dict(
        w=res[0], w_last=res[1], eta=res[2], ll=res[3], prior=res[4],
        rmse_train=res[5], rmse_test=res[6], n_accept=res[7],
        log_step_w=res[8], log_step_eta=res[9], g_like=res[10],
        pc_mean=res[11], pc_m2=res[12], log_traj=res[13], chees_m1=res[14],
        chees_v2=res[15],
    )
    traces = dict(
        ll=res[16], rmse_train=res[17], rmse_test=res[18],
        accept_count=res[19], traj_len=res[20],
    )
    if record_w:
        traces["w"] = res[21]
    return new_state, traces


# ---------------------------------------------------------------------------
# Preconditioned-MALA fused block, classification task.
#
# Mirrors kernel.step_precond with proposal="precond_mala",
# task="classification": one MH block per step (no eta machinery — the
# multinomial likelihood has no noise parameter), untempered multinomial
# log-likelihood as the carried value AND the recorded trace
# (pt_classification.py:404 convention), Gaussian weight prior with
# dim = w_size (:224-230), accuracy/argmax-RMSE metrics, warm start, Welford
# preconditioner and Robbins-Monro scale exactly as the regression kernel.
# Kept as its own kernel (not a flag on _mala_block_kernel) so the validated
# regression flagship path stays untouched.


def _mala_cls_block_kernel(
    topo, n_tr, n_te, k_max, w_size, p_pad, sigma_sq,
    adapt_rate, mala_target, warmstart_step, precond_power,
    pc_start, warm_end, burn_end_p, record_w,
    sl_ref,  # (2,) SMEM int32: [start, length]
    xtr_ref, ytr_ref, yhtr_ref, mtr_ref,
    xte_ref, yte_ref, yhte_ref, mte_ref,
    at_ref,  # (1, C) adapttemp
    w_ref, wl_ref, eta_ref, ll_ref, pr_ref, rtr_ref, rte_ref, atr_ref,
    ate_ref, na_ref, lsw_ref,
    gl_ref, pm_ref, p2_ref,  # (P, C) g_like / Welford mean / Welford M2
    nw_ref,  # (K, P, C) w noise (pre-masked rows)
    u_ref,  # (K, C) MH uniforms
    o_w, o_wl, o_eta, o_ll, o_pr, o_rtr, o_rte, o_atr, o_ate, o_na, o_lsw,
    o_gl, o_pm, o_p2,
    t_ll, t_rtr, t_rte, t_atr, t_ate, t_na, *maybe_t_w,
):
    t_w = maybe_t_w[0] if record_w else None
    start = sl_ref[0]
    length = sl_ref[1]
    at = at_ref[:]  # (1, C)
    prior_const = -0.5 * w_size * math.log(sigma_sq)
    f32 = jnp.float32

    def body(k, carry):
        (w, wl, eta, ll, pr, rtr, rte, atr, ate, na, lsw, gl, pm, p2) = carry
        i = start + k
        live = k < length
        sig = jnp.exp(lsw)  # (1, C)
        cnt = jnp.maximum(jnp.minimum(i, burn_end_p) - warm_end, 1).astype(
            f32
        )
        var = p2 / cnt
        mean_var = jnp.sum(var, axis=0, keepdims=True) / float(w_size)
        m = jnp.clip(var / jnp.maximum(mean_var, 1e-30), 1e-4, 1e4)
        if precond_power != 1.0:
            m = jnp.power(m, precond_power)
        m = jnp.where(i >= pc_start, m, jnp.ones_like(m))
        # --- MALA w-block (classification: g_post = gl/at - w/sigma^2) ----
        g_cur = gl / at - w / sigma_sq
        sig2m = (sig * sig) * m
        mean_fwd = w + 0.5 * sig2m * g_cur
        w_prop = mean_fwd + sig * jnp.sqrt(m) * nw_ref[k]
        g_rms = jnp.sqrt(
            jnp.sum(g_cur * g_cur, axis=0, keepdims=True) / float(w_size)
        )
        w_warm = w + warmstart_step * g_cur / jnp.maximum(g_rms, 1e-12)
        w_prop = jnp.where(i < warm_end, w_warm, w_prop)
        ssq = jnp.sum(w_prop * w_prop, axis=0, keepdims=True)
        pr_prop = prior_const - ssq / (2.0 * sigma_sq)
        ll_prop, rtr_prop, atr_prop, g_rows = _fwd_grad_cls(
            w_prop, xtr_ref, yhtr_ref, ytr_ref, mtr_ref, topo, n_tr, p_pad
        )
        _ll_te, rte_prop, ate_prop = _fwd_cls(
            w_prop, xte_ref, yhte_ref, yte_ref, mte_ref, topo, n_te
        )
        g_prop = g_rows / at - w_prop / sigma_sq
        mean_rev = w_prop + 0.5 * sig2m * g_prop
        d_fwd = w_prop - mean_fwd
        d_rev = w - mean_rev
        diff = (
            jnp.sum(d_fwd * d_fwd / m, axis=0, keepdims=True)
            - jnp.sum(d_rev * d_rev / m, axis=0, keepdims=True)
        ) / (2.0 * sig * sig)
        log_mh = (ll_prop - ll) / at + (pr_prop - pr) + diff
        a = jnp.exp(jnp.minimum(log_mh, 0.0))
        accept = jnp.logical_or(u_ref[pl.ds(k, 1), :] < a, i < warm_end)
        accept = jnp.logical_and(accept, live)

        # classification records the UNTEMPERED proposal likelihood
        t_ll[pl.ds(k, 1), :] = jnp.where(live, ll_prop, ll)
        rtr = jnp.where(accept, rtr_prop, rtr)
        rte = jnp.where(accept, rte_prop, rte)
        atr = jnp.where(accept, atr_prop, atr)
        ate = jnp.where(accept, ate_prop, ate)
        t_rtr[pl.ds(k, 1), :] = rtr
        t_rte[pl.ds(k, 1), :] = rte
        t_atr[pl.ds(k, 1), :] = atr
        t_ate[pl.ds(k, 1), :] = ate
        t_na[pl.ds(k, 1), :] = na  # count BEFORE this step's decision

        w = jnp.where(accept, w_prop, w)
        wl = jnp.where(accept, w_prop, wl)
        if record_w:
            t_w[pl.ds(k, 1), :, :] = wl.reshape((1,) + wl.shape)
        ll = jnp.where(accept, ll_prop, ll)
        pr = jnp.where(accept, pr_prop, pr)
        gl = jnp.where(accept, g_rows, gl)
        na = na + accept.astype(jnp.int32)

        # --- Welford accumulation + Robbins-Monro w-scale ------------------
        updf = jnp.where(
            jnp.logical_and(
                live, jnp.logical_and(i >= warm_end, i < burn_end_p)
            ),
            1.0,
            0.0,
        )
        cnt_new = jnp.maximum(
            jnp.minimum(i + 1, burn_end_p) - warm_end, 1
        ).astype(f32)
        delta = w - pm
        pm = pm + updf * delta / cnt_new
        p2 = p2 + updf * delta * (w - pm)
        lsw = jnp.clip(
            lsw
            + jnp.where(updf > 0.0, adapt_rate * (a - mala_target), 0.0),
            math.log(1e-6),
            math.log(10.0),
        )
        return (w, wl, eta, ll, pr, rtr, rte, atr, ate, na, lsw, gl, pm, p2)

    init = (
        w_ref[:], wl_ref[:], eta_ref[:], ll_ref[:], pr_ref[:],
        rtr_ref[:], rte_ref[:], atr_ref[:], ate_ref[:], na_ref[:],
        lsw_ref[:], gl_ref[:], pm_ref[:], p2_ref[:],
    )
    (w, wl, eta, ll, pr, rtr, rte, atr, ate, na, lsw, gl, pm, p2) = (
        jax.lax.fori_loop(0, k_max, body, init)
    )
    o_w[:] = w
    o_wl[:] = wl
    o_eta[:] = eta
    o_ll[:] = ll
    o_pr[:] = pr
    o_rtr[:] = rtr
    o_rte[:] = rte
    o_atr[:] = atr
    o_ate[:] = ate
    o_na[:] = na
    o_lsw[:] = lsw
    o_gl[:] = gl
    o_pm[:] = pm
    o_p2[:] = p2


def fused_mala_cls_block_impl(
    state: dict,  # RW-style state (incl. acc_train/acc_test) + g_like/
    #               pc_mean/pc_m2 (P,C)
    noise_w: jax.Array,  # (K, P, C) pre-masked
    u_mh: jax.Array,  # (K, C) MH uniforms
    start,
    length,
    data: dict,  # prep_data output with one-hot planes
    adapttemp: jax.Array,  # (1, C)
    topo: Tuple[int, int, int],
    cfg_scalars: dict,  # sigma_sq, adapt_rate, mala_target, warmstart_step,
    #                     precond_power, pc_start, warm_end, burn_end
    record_w: bool = True,
    interpret: bool = False,
):
    """One fused K-step preconditioned-MALA block, classification."""
    k_max, p_pad, c_pad = noise_w.shape
    assert c_pad % LANES == 0 and p_pad % 8 == 0
    n_blocks = c_pad // LANES
    i_dim, h_dim, o_dim = topo
    w_size = i_dim * h_dim + h_dim * o_dim + h_dim + o_dim

    kern = functools.partial(
        _mala_cls_block_kernel, topo, float(data["n_tr"]),
        float(data["n_te"]), k_max, w_size, p_pad,
        float(cfg_scalars["sigma_sq"]), float(cfg_scalars["adapt_rate"]),
        float(cfg_scalars["mala_target"]),
        float(cfg_scalars["warmstart_step"]),
        float(cfg_scalars["precond_power"]), int(cfg_scalars["pc_start"]),
        int(cfg_scalars["warm_end"]), int(cfg_scalars["burn_end"]), record_w,
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    blk = lambda *shape: pl.BlockSpec(
        shape + (LANES,),
        lambda b: (0,) * len(shape) + (b,),
        memory_space=pltpu.VMEM,
    )
    st_specs = (
        [blk(p_pad), blk(p_pad)] + [blk(1)] * 9
        + [blk(p_pad), blk(p_pad), blk(p_pad)]
    )
    out_specs = (
        [blk(p_pad), blk(p_pad)] + [blk(1)] * 9
        + [blk(p_pad), blk(p_pad), blk(p_pad)]
        + [blk(k_max)] * 6
    )
    f32 = jnp.float32
    pc = lambda: jax.ShapeDtypeStruct((p_pad, c_pad), f32)
    c1 = lambda dt=f32: jax.ShapeDtypeStruct((1, c_pad), dt)
    kc = lambda dt=f32: jax.ShapeDtypeStruct((k_max, c_pad), dt)
    out_shape = [
        pc(), pc(),  # w, w_last
        c1(), c1(), c1(), c1(), c1(), c1(), c1(),  # eta..acc_te
        c1(jnp.int32), c1(),  # n_accept, log_step_w
        pc(), pc(), pc(),  # g_like, pc_mean, pc_m2
        kc(), kc(), kc(), kc(), kc(), kc(jnp.int32),  # traces
    ]
    if record_w:
        out_specs.append(blk(k_max, p_pad))
        out_shape.append(jax.ShapeDtypeStruct((k_max, p_pad, c_pad), f32))
    sl = jnp.stack(
        [jnp.asarray(start, jnp.int32), jnp.asarray(length, jnp.int32)]
    )
    res = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[smem] + [full()] * 8 + [blk(1)] + st_specs
        + [blk(k_max, p_pad), blk(k_max)],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(
        sl,
        data["x_tr"], data["y_tr"], data["yh_tr"], data["m_tr"],
        data["x_te"], data["y_te"], data["yh_te"], data["m_te"],
        adapttemp,
        state["w"], state["w_last"], state["eta"], state["ll"],
        state["prior"], state["rmse_train"], state["rmse_test"],
        state["acc_train"], state["acc_test"],
        state["n_accept"], state["log_step_w"],
        state["g_like"], state["pc_mean"], state["pc_m2"],
        noise_w, u_mh,
    )
    new_state = dict(
        w=res[0], w_last=res[1], eta=res[2], ll=res[3], prior=res[4],
        rmse_train=res[5], rmse_test=res[6], acc_train=res[7],
        acc_test=res[8], n_accept=res[9], log_step_w=res[10],
        g_like=res[11], pc_mean=res[12], pc_m2=res[13],
    )
    traces = dict(
        ll=res[14], rmse_train=res[15], rmse_test=res[16], acc_train=res[17],
        acc_test=res[18], accept_count=res[19],
    )
    if record_w:
        traces["w"] = res[20]
    return new_state, traces


# ---------------------------------------------------------------------------
# Preconditioned-HMC fused block, classification task.
#
# Mirrors kernel.step_precond with proposal="hmc", task="classification"
# (incl. hmc_adapt_traj): leapfrog trajectories on the tempered multinomial
# posterior via the hand-written _fwd_grad_cls backprop, kinetic-energy MH,
# NO eta machinery (the multinomial likelihood has no noise parameter),
# untempered log-likelihood carried AND recorded (pt_classification.py:404
# convention), Gaussian weight prior with dim = w_size (:224-230),
# accuracy/argmax-RMSE metrics, warm start, Welford preconditioner,
# Robbins-Monro scale and the in-kernel ChEES rung-sum adaptation exactly as
# the regression HMC kernel. Kept as its own kernel so the two validated
# flagship paths stay untouched.


def _hmc_cls_block_kernel(
    topo, n_tr, n_te, k_max, w_size, p_pad, sigma_sq,
    adapt_rate, hmc_target, warmstart_step, precond_power,
    pc_start, warm_end, burn_end_p, leapfrog, eps_jitter, chees,
    chees_rate, n_ladders, record_w,
    sl_ref,  # (2,) SMEM int32: [start, length]
    xtr_ref, ytr_ref, yhtr_ref, mtr_ref,
    xte_ref, yte_ref, yhte_ref, mte_ref,
    at_ref,  # (1, C) adapttemp
    w_ref, wl_ref, eta_ref, ll_ref, pr_ref, rtr_ref, rte_ref, atr_ref,
    ate_ref, na_ref, lsw_ref,
    gl_ref, pm_ref, p2_ref,  # (P, C) g_like / Welford mean / Welford M2
    lt_ref, m1_ref, v2_ref,  # (1, C) log_traj / ChEES Adam m1 / v2
    a_ref,  # (LANES, LANES) per-block rung-sum matrix (zeros when not chees)
    nw_ref,  # (K, P, C) momentum noise (pre-masked rows)
    u_ref,  # (K, C) MH uniforms
    uj_ref,  # (K, C) eps-jitter uniforms
    ut_ref,  # (K, C) van-der-Corput trajectory jitter (lane-replicated)
    o_w, o_wl, o_eta, o_ll, o_pr, o_rtr, o_rte, o_atr, o_ate, o_na, o_lsw,
    o_gl, o_pm, o_p2, o_lt, o_m1, o_v2,
    t_ll, t_rtr, t_rte, t_atr, t_ate, t_na, t_tl, *maybe_t_w,
):
    t_w = maybe_t_w[0] if record_w else None
    start = sl_ref[0]
    length = sl_ref[1]
    at = at_ref[:]  # (1, C)
    prior_const = -0.5 * w_size * math.log(sigma_sq)
    f32 = jnp.float32
    log09 = math.log(0.9)
    log0999 = math.log(0.999)

    def body(k, carry):
        (w, wl, eta, ll, pr, rtr, rte, atr, ate, na, lsw, gl, pm, p2,
         lt, m1, v2) = carry
        i = start + k
        live = k < length
        sig = jnp.exp(lsw)  # (1, C)
        # --- diagonal preconditioner from the Welford buffers -------------
        cnt = jnp.maximum(jnp.minimum(i, burn_end_p) - warm_end, 1).astype(
            f32
        )
        var = p2 / cnt  # (P, C); padded rows stay 0
        mean_var = jnp.sum(var, axis=0, keepdims=True) / float(w_size)
        m = jnp.clip(var / jnp.maximum(mean_var, 1e-30), 1e-4, 1e4)
        if precond_power != 1.0:
            m = jnp.power(m, precond_power)
        m = jnp.where(i >= pc_start, m, jnp.ones_like(m))
        g_cur = gl / at - w / sigma_sq  # tempered posterior grad (cls)
        # --- trajectory schedule -------------------------------------------
        eps = sig
        if eps_jitter > 0.0:
            eps = sig * (
                1.0 + eps_jitter * (2.0 * uj_ref[pl.ds(k, 1), :] - 1.0)
            )
        if chees:
            u_t = ut_ref[pl.ds(k, 1), :]  # (1, C) lane-replicated vdc
            tau_traj = jnp.exp(lt) * u_t
            l_steps = jnp.clip(
                jnp.ceil(tau_traj / eps), 1.0, float(leapfrog)
            )  # (1, C) float
        # --- leapfrog trajectory -------------------------------------------
        p0 = nw_ref[k] / jnp.sqrt(m)  # (P, C); padded rows zero
        k_init = 0.5 * jnp.sum(m * p0 * p0, axis=0, keepdims=True)

        def leap(n, cr):
            w_c, p_c, g_c, ll_c, rtr_c, atr_c, glr_c = cr
            p_half = p_c + 0.5 * eps * g_c
            w_n = w_c + eps * m * p_half
            ll_n, rtr_n, atr_n, gl_n = _fwd_grad_cls(
                w_n, xtr_ref, yhtr_ref, ytr_ref, mtr_ref, topo, n_tr, p_pad
            )
            g_n = gl_n / at - w_n / sigma_sq
            p_n = p_half + 0.5 * eps * g_n
            if chees:
                upd = n.astype(f32) < l_steps  # (1, C)
                w_n = jnp.where(upd, w_n, w_c)
                p_n = jnp.where(upd, p_n, p_c)
                g_n = jnp.where(upd, g_n, g_c)
                # carry the endpoint eval per lane (see regression kernel)
                ll_n = jnp.where(upd, ll_n, ll_c)
                rtr_n = jnp.where(upd, rtr_n, rtr_c)
                atr_n = jnp.where(upd, atr_n, atr_c)
                gl_n = jnp.where(upd, gl_n, glr_c)
            return (w_n, p_n, g_n, ll_n, rtr_n, atr_n, gl_n)

        # Dynamic trip count (see the regression kernel): run only to the
        # max-over-lanes realized ChEES length, and skip the trajectory
        # outright on forced-accept warm-start steps and dead padding
        # steps. Bitwise-identical outputs to the static-bound loop.
        if chees:
            n_leap = jnp.max(l_steps).astype(jnp.int32)
        else:
            n_leap = jnp.int32(leapfrog)
        n_leap = jnp.where(
            jnp.logical_and(live, i >= warm_end), n_leap, 0
        )
        (w_end, p_end, _g_end, ll_end, rtr_end, atr_end, gl_end) = (
            jax.lax.fori_loop(
                0, n_leap, leap,
                (
                    w, p0, g_cur, jnp.zeros_like(at), jnp.zeros_like(at),
                    jnp.zeros_like(at), gl,
                ),
            )
        )
        k_end = 0.5 * jnp.sum(m * p_end * p_end, axis=0, keepdims=True)
        # --- warm start (forced accept below) -------------------------------
        g_rms = jnp.sqrt(
            jnp.sum(g_cur * g_cur, axis=0, keepdims=True) / float(w_size)
        )
        w_warm = w + warmstart_step * g_cur / jnp.maximum(g_rms, 1e-12)
        w_prop = jnp.where(i < warm_end, w_warm, w_end)
        # --- endpoint eval: reuse the trajectory carry (see the regression
        # kernel) — re-evaluate only on live warm-start steps --------------
        ssq = jnp.sum(w_prop * w_prop, axis=0, keepdims=True)
        pr_prop = prior_const - ssq / (2.0 * sigma_sq)
        ll_prop, rtr_prop, atr_prop, g_rows = jax.lax.cond(
            jnp.logical_and(live, i < warm_end),
            lambda: _fwd_grad_cls(
                w_prop, xtr_ref, yhtr_ref, ytr_ref, mtr_ref, topo, n_tr,
                p_pad,
            ),
            lambda: (ll_end, rtr_end, atr_end, gl_end),
        )
        _ll_te, rte_prop, ate_prop = _fwd_cls(
            w_prop, xte_ref, yhte_ref, yte_ref, mte_ref, topo, n_te
        )
        diff = k_init - k_end  # reversible volume-preserving integrator
        log_mh = (ll_prop - ll) / at + (pr_prop - pr) + diff
        a = jnp.exp(jnp.minimum(log_mh, 0.0))
        accept = jnp.logical_or(u_ref[pl.ds(k, 1), :] < a, i < warm_end)
        accept = jnp.logical_and(accept, live)

        # classification records the UNTEMPERED proposal likelihood
        t_ll[pl.ds(k, 1), :] = jnp.where(live, ll_prop, ll)
        rtr = jnp.where(accept, rtr_prop, rtr)
        rte = jnp.where(accept, rte_prop, rte)
        atr = jnp.where(accept, atr_prop, atr)
        ate = jnp.where(accept, ate_prop, ate)
        t_rtr[pl.ds(k, 1), :] = rtr
        t_rte[pl.ds(k, 1), :] = rte
        t_atr[pl.ds(k, 1), :] = atr
        t_ate[pl.ds(k, 1), :] = ate
        t_na[pl.ds(k, 1), :] = na  # count BEFORE this step's decision
        if chees:
            t_tl[pl.ds(k, 1), :] = jnp.where(live, l_steps, 0.0)
        else:
            t_tl[pl.ds(k, 1), :] = jnp.where(
                live, jnp.full_like(at, float(leapfrog)), jnp.zeros_like(at)
            )

        w_old = w  # pre-decision position (ChEES uses it)
        w = jnp.where(accept, w_prop, w)
        wl = jnp.where(accept, w_prop, wl)
        if record_w:
            t_w[pl.ds(k, 1), :, :] = wl.reshape((1,) + wl.shape)
        ll = jnp.where(accept, ll_prop, ll)
        pr = jnp.where(accept, pr_prop, pr)
        gl = jnp.where(accept, g_rows, gl)
        na = na + accept.astype(jnp.int32)

        # --- ChEES trajectory-length adaptation (in-kernel rung sums) ------
        if chees:
            rsum_p = lambda x: jnp.dot(
                x, a_ref[:], preferred_element_type=f32
            )
            dxp = w_prop - rsum_p(w_prop) / float(n_ladders)
            dx = w_old - rsum_p(w_old) / float(n_ladders)
            dsq = jnp.sum(m * dxp * dxp, axis=0, keepdims=True) - jnp.sum(
                m * dx * dx, axis=0, keepdims=True
            )
            inner = jnp.sum(dxp * p_end, axis=0, keepdims=True)
            g_c = a * dsq * inner * u_t  # acceptance-weighted estimator
            wsum = jnp.maximum(rsum_p(a), 1e-6)
            g_rung = rsum_p(g_c) / wsum
            g_log = g_rung * tau_traj
            live_tr = jnp.logical_and(
                live, jnp.logical_and(i >= warm_end, i < burn_end_p)
            )
            t_ad = jnp.maximum(
                (jnp.minimum(i, burn_end_p) - warm_end).astype(f32) + 1.0,
                1.0,
            )
            m1 = jnp.where(live_tr, 0.9 * m1 + 0.1 * g_log, m1)
            v2 = jnp.where(live_tr, 0.999 * v2 + 0.001 * g_log * g_log, v2)
            bc1 = 1.0 - jnp.exp(t_ad * log09)
            bc2 = 1.0 - jnp.exp(t_ad * log0999)
            step_ad = (
                chees_rate * (m1 / bc1) / (jnp.sqrt(v2 / bc2) + 1e-8)
            )
            lt = jnp.clip(
                lt + jnp.where(live_tr, step_ad, 0.0),
                math.log(1e-4),
                jnp.log(eps * float(leapfrog)),
            )

        # --- Welford accumulation + Robbins-Monro w-scale ------------------
        updf = jnp.where(
            jnp.logical_and(
                live, jnp.logical_and(i >= warm_end, i < burn_end_p)
            ),
            1.0,
            0.0,
        )
        cnt_new = jnp.maximum(
            jnp.minimum(i + 1, burn_end_p) - warm_end, 1
        ).astype(f32)
        delta = w - pm
        pm = pm + updf * delta / cnt_new
        p2 = p2 + updf * delta * (w - pm)
        lsw = jnp.clip(
            lsw
            + jnp.where(updf > 0.0, adapt_rate * (a - hmc_target), 0.0),
            math.log(1e-6),
            math.log(10.0),
        )
        return (w, wl, eta, ll, pr, rtr, rte, atr, ate, na, lsw, gl, pm, p2,
                lt, m1, v2)

    init = (
        w_ref[:], wl_ref[:], eta_ref[:], ll_ref[:], pr_ref[:],
        rtr_ref[:], rte_ref[:], atr_ref[:], ate_ref[:], na_ref[:],
        lsw_ref[:], gl_ref[:], pm_ref[:], p2_ref[:], lt_ref[:], m1_ref[:],
        v2_ref[:],
    )
    (w, wl, eta, ll, pr, rtr, rte, atr, ate, na, lsw, gl, pm, p2, lt, m1,
     v2) = jax.lax.fori_loop(0, k_max, body, init)
    o_w[:] = w
    o_wl[:] = wl
    o_eta[:] = eta
    o_ll[:] = ll
    o_pr[:] = pr
    o_rtr[:] = rtr
    o_rte[:] = rte
    o_atr[:] = atr
    o_ate[:] = ate
    o_na[:] = na
    o_lsw[:] = lsw
    o_gl[:] = gl
    o_pm[:] = pm
    o_p2[:] = p2
    o_lt[:] = lt
    o_m1[:] = m1
    o_v2[:] = v2


def fused_hmc_cls_block_impl(
    state: dict,  # cls-MALA state dict + log_traj/chees_m1/chees_v2 (1,C)
    noise_w: jax.Array,  # (K, P, C) momentum noise, pre-masked rows
    u_mh: jax.Array,  # (K, C) MH uniforms
    u_jit: jax.Array,  # (K, C) eps-jitter uniforms
    u_traj: jax.Array,  # (K, C) van-der-Corput jitter, lane-replicated
    rung_sum: jax.Array,  # (LANES, LANES) per-block rung-sum matrix (zeros when not chees)
    start,
    length,
    data: dict,  # prep_data output with one-hot planes
    adapttemp: jax.Array,  # (1, C)
    topo: Tuple[int, int, int],
    cfg_scalars: dict,  # sigma_sq, adapt_rate, hmc_target, warmstart_step,
    #                     precond_power, pc_start, warm_end, burn_end,
    #                     leapfrog, eps_jitter, chees, chees_rate, n_ladders
    record_w: bool = True,
    interpret: bool = False,
):
    """One fused K-step preconditioned-HMC block, classification."""
    k_max, p_pad, c_pad = noise_w.shape
    assert c_pad % LANES == 0 and p_pad % 8 == 0
    n_blocks = c_pad // LANES
    chees = bool(cfg_scalars["chees"])
    if chees and rung_sum.shape != (LANES, LANES):
        # Per-block rung sums — see fused_hmc_block_impl.
        raise ValueError(
            "fused ChEES needs a per-block (%d, %d) rung-sum matrix; got "
            "%s" % (LANES, LANES, rung_sum.shape)
        )
    i_dim, h_dim, o_dim = topo
    w_size = i_dim * h_dim + h_dim * o_dim + h_dim + o_dim

    kern = functools.partial(
        _hmc_cls_block_kernel, topo, float(data["n_tr"]),
        float(data["n_te"]), k_max, w_size, p_pad,
        float(cfg_scalars["sigma_sq"]), float(cfg_scalars["adapt_rate"]),
        float(cfg_scalars["hmc_target"]),
        float(cfg_scalars["warmstart_step"]),
        float(cfg_scalars["precond_power"]), int(cfg_scalars["pc_start"]),
        int(cfg_scalars["warm_end"]), int(cfg_scalars["burn_end"]),
        int(cfg_scalars["leapfrog"]), float(cfg_scalars["eps_jitter"]),
        chees, float(cfg_scalars["chees_rate"]),
        int(cfg_scalars["n_ladders"]), record_w,
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    blk = lambda *shape: pl.BlockSpec(
        shape + (LANES,),
        lambda b: (0,) * len(shape) + (b,),
        memory_space=pltpu.VMEM,
    )
    st_specs = (
        [blk(p_pad), blk(p_pad)] + [blk(1)] * 9
        + [blk(p_pad), blk(p_pad), blk(p_pad)] + [blk(1)] * 3
    )
    out_specs = (
        [blk(p_pad), blk(p_pad)] + [blk(1)] * 9
        + [blk(p_pad), blk(p_pad), blk(p_pad)] + [blk(1)] * 3
        + [blk(k_max)] * 7
    )
    f32 = jnp.float32
    pc = lambda: jax.ShapeDtypeStruct((p_pad, c_pad), f32)
    c1 = lambda dt=f32: jax.ShapeDtypeStruct((1, c_pad), dt)
    kc = lambda dt=f32: jax.ShapeDtypeStruct((k_max, c_pad), dt)
    out_shape = [
        pc(), pc(),  # w, w_last
        c1(), c1(), c1(), c1(), c1(), c1(), c1(),  # eta..acc_te
        c1(jnp.int32), c1(),  # n_accept, log_step_w
        pc(), pc(), pc(),  # g_like, pc_mean, pc_m2
        c1(), c1(), c1(),  # log_traj, chees_m1, chees_v2
        kc(), kc(), kc(), kc(), kc(), kc(jnp.int32), kc(),  # traces (+tl)
    ]
    if record_w:
        out_specs.append(blk(k_max, p_pad))
        out_shape.append(jax.ShapeDtypeStruct((k_max, p_pad, c_pad), f32))
    sl = jnp.stack(
        [jnp.asarray(start, jnp.int32), jnp.asarray(length, jnp.int32)]
    )
    res = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[smem] + [full()] * 8 + [blk(1)] + st_specs + [full()]
        + [blk(k_max, p_pad)] + [blk(k_max)] * 3,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(
        sl,
        data["x_tr"], data["y_tr"], data["yh_tr"], data["m_tr"],
        data["x_te"], data["y_te"], data["yh_te"], data["m_te"],
        adapttemp,
        state["w"], state["w_last"], state["eta"], state["ll"],
        state["prior"], state["rmse_train"], state["rmse_test"],
        state["acc_train"], state["acc_test"],
        state["n_accept"], state["log_step_w"],
        state["g_like"], state["pc_mean"], state["pc_m2"],
        state["log_traj"], state["chees_m1"], state["chees_v2"],
        rung_sum,
        noise_w, u_mh, u_jit, u_traj,
    )
    new_state = dict(
        w=res[0], w_last=res[1], eta=res[2], ll=res[3], prior=res[4],
        rmse_train=res[5], rmse_test=res[6], acc_train=res[7],
        acc_test=res[8], n_accept=res[9], log_step_w=res[10],
        g_like=res[11], pc_mean=res[12], pc_m2=res[13], log_traj=res[14],
        chees_m1=res[15], chees_v2=res[16],
    )
    traces = dict(
        ll=res[17], rmse_train=res[18], rmse_test=res[19], acc_train=res[20],
        acc_test=res[21], accept_count=res[22], traj_len=res[23],
    )
    if record_w:
        traces["w"] = res[24]
    return new_state, traces
