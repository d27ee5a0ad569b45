"""Surrogate-assisted parallel tempering (functional, TPU-native).

The reference carries *dead* surrogate plumbing — per-chain surrogate queues
and ``surrogate_interval``/``surrogate_prob`` knobs threaded through
``ptReplica`` with no surrogate model behind them
(multicore-pt-classification/Misc_code/canonical_pt_classifier.py:462-465,
pt_bettermemoryman.py:148-149; SURVEY.md §2.2). This module implements the
capability those knobs gesture at (cf. Chandra et al.'s surrogate-assisted
PT line of work), designed for the fused TPU sampler:

* a surrogate of the untempered train log-likelihood
  ``ll(w) ~ theta . phi(w)``, with quadratic features
  ``phi(w) = [1, w, w^2, (P w)^2]`` (elementwise squares capture the
  Gaussian-prior-scale curvature exactly; the fixed Gaussian projection ``P``
  adds cross terms) — ridge-fit by normal equations, a few microseconds on
  the MXU;
* training pairs are the ``(w_proposal, ll_proposal)`` evaluations the
  sampler computes anyway, collected into an on-device ring buffer;
* the surrogate decision is per STEP, not per chain — on a surrogate step
  the true likelihood (the full-dataset eval) is skipped for the whole
  ladder. NOTE: skipping only pays when that eval costs well above the
  ~0.3-0.6 ms/step conditional+bookkeeping overhead measured on TPU; at
  reference problem scales it does NOT (COVERAGE.md "honest on-chip
  picture") — the feature's value there is algorithmic, not wall-clock;
* every chunk boundary refits the surrogate AND re-anchors each chain's
  carried likelihood with a true evaluation (the same recompute the 60%
  temper switch uses), bounding the surrogate bias between anchors.

Two scopes (``PTConfig.surrogate_scope``):

* ``"global"`` — one ``theta`` shared by the whole ladder, fit on a single
  ring buffer of every chain's evaluations. Cheapest; accurate when the
  ladder is cool enough that all rungs explore one likelihood basin.
* ``"per_chain"`` — one ``theta`` PER TEMPERATURE RUNG, each fit on that
  chain's own ring buffer. The untempered ll is one function, but a
  quadratic fit is local: hot rungs roam a much wider region of w-space
  than the cold ones, and a global fit averages the two regimes. Per-chain
  fits are a vmapped batched ridge solve (chunk boundaries only); buffers
  hold ``surrogate_buffer`` rows PER CHAIN. The surrogate state travels
  with the rung, not the configuration — a swap moves ``w`` between rungs
  and each rung keeps modeling its own locality, which is exactly what the
  fit needs. DA exactness is unaffected (each chain's inner kernel is
  reversible w.r.t. its own rung's surrogate; the closure test already
  corrects per chain).

Two modes (``PTConfig.surrogate_mode``):

* ``"anchored"`` — like the published scheme, surrogate steps make the
  sampler approximate; accuracy is controlled by ``surrogate_prob`` and the
  chunk cadence (each chunk boundary re-anchors with a true evaluation).
* ``"delayed_acceptance"`` — EXACT: consecutive surrogate steps form one
  composite proposal (inner RW-MH against the surrogate target, which is
  reversible w.r.t. it, so the composite's q-ratio telescopes to the
  surrogate ratio), corrected by a single true-likelihood Metropolis test
  when the segment closes (Christen & Fox 2005, generalized to multi-step
  segments). Every segment kernel leaves the exact tempered posterior
  invariant for the surrogate coefficients in effect; refits only happen at
  chunk boundaries, between closed segments (standard adaptive-MCMC regime).
  See kernel.DAState / kernel step_da.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class SurrogateState(NamedTuple):
    """Ring buffer + fitted coefficients. Two layouts, told apart by rank
    (checkpointing stays field-wise and layout-agnostic):

    * global:    buf_w (B, Z),     buf_ll (B,),     theta (D,)
    * per_chain: buf_w (C, B', Z), buf_ll (C, B'),  theta (C, D)

    ``count``/``ptr`` are scalars in both layouts — chains push in lockstep
    (one row per chain per true evaluation), so per-chain rings share one
    pointer."""

    buf_w: jax.Array
    buf_ll: jax.Array
    count: jax.Array  # () int32 — rows written so far (saturates at B)
    ptr: jax.Array  # () int32 — ring pointer
    theta: jax.Array
    fitted: jax.Array  # () bool


def feature_dim(w_size: int, n_proj: int) -> int:
    return 1 + 2 * w_size + n_proj


def make_projection(key: jax.Array, w_size: int, n_proj: int) -> jax.Array:
    """Fixed Gaussian projection for the quadratic features."""
    return jax.random.normal(key, (n_proj, w_size), jnp.float32) / jnp.sqrt(
        jnp.asarray(w_size, jnp.float32)
    )


def features(w: jax.Array, proj: jax.Array) -> jax.Array:
    """phi(w) for a batch: (C, W) -> (C, D)."""
    pw = jnp.einsum("kw,cw->ck", proj, w, precision=jax.lax.Precision.HIGHEST)
    ones = jnp.ones((w.shape[0], 1), w.dtype)
    return jnp.concatenate([ones, w, w * w, pw * pw], axis=1)


def init_for(cfg, w_size: int) -> SurrogateState:
    """Surrogate state for a config. Global scope: buffer rounded to a
    multiple of the chain count (block pushes never wrap mid-write).
    Per-chain scope: ``surrogate_buffer`` rows per chain. Features span
    [w, eta] (the regression noise variance is part of the input).

    Re-checks the buffer-vs-feature-dim guard with the REAL ``w_size``:
    PTConfig.validate() can only see the topology-derived size, which
    understates the feature dim when a custom ``model_spec`` (CNN/MLP) is
    passed to ``sample()`` — without this, an undersized buffer would leave
    the ridge fit silently inactive (the failure mode config validation
    exists to reject)."""
    c = cfg.num_chains
    zdim = w_size + 1
    if cfg.surrogate_family == "mlp":
        fdim = mlp_min_rows(zdim, cfg.surrogate_hidden)
        what = f"MLP activation row count {fdim}"
        knob = "lower surrogate_hidden"
    else:
        fdim = feature_dim(zdim, cfg.surrogate_proj)
        what = f"feature dimension {fdim}"
        knob = "lower surrogate_proj"
    if cfg.surrogate_scope == "per_chain":
        if cfg.surrogate_buffer < fdim:
            raise ValueError(
                f"surrogate_buffer={cfg.surrogate_buffer} (per-chain rows) "
                f"is below the surrogate {what} for the model's "
                f"w_size={w_size}: the per-chain fits would never activate. "
                f"Raise surrogate_buffer to >= {fdim} or {knob}."
            )
        return _init_family(cfg, cfg.surrogate_buffer, zdim, num_chains=c)
    buf = ((cfg.surrogate_buffer + c - 1) // c) * c
    if buf < fdim:
        raise ValueError(
            f"surrogate_buffer={cfg.surrogate_buffer} (rounded to {buf}) is "
            f"below the surrogate {what} for the model's w_size={w_size}: "
            f"the fit would never activate. Raise surrogate_buffer to >= "
            f"{fdim} or {knob}."
        )
    return _init_family(cfg, buf, zdim)


def _init_family(
    cfg, buffer_size: int, zdim: int, num_chains: int | None = None
) -> SurrogateState:
    if cfg.surrogate_family == "mlp":
        # fixed init key, independent of the run seed, so every driver
        # (sample/throughput_run/sweeps) builds the identical state
        theta0 = mlp_init_theta(
            jax.random.PRNGKey(0x5A6B), zdim, cfg.surrogate_hidden
        )
        if num_chains is not None:
            keys = jax.random.split(jax.random.PRNGKey(0x5A6B), num_chains)
            theta0 = jax.vmap(
                lambda k: mlp_init_theta(k, zdim, cfg.surrogate_hidden)
            )(keys)
        st = init(buffer_size, zdim, cfg.surrogate_proj, num_chains=num_chains)
        return st._replace(theta=theta0)
    return init(buffer_size, zdim, cfg.surrogate_proj, num_chains=num_chains)


def init(
    buffer_size: int, w_size: int, n_proj: int, num_chains: int | None = None
) -> SurrogateState:
    """Global layout by default; per-chain layout when ``num_chains`` is
    given (``buffer_size`` rows per chain). Quadratic-family theta sizing;
    ``_init_family`` swaps in the MLP theta."""
    d = feature_dim(w_size, n_proj)
    lead = () if num_chains is None else (num_chains,)
    return SurrogateState(
        buf_w=jnp.zeros(lead + (buffer_size, w_size), jnp.float32),
        buf_ll=jnp.zeros(lead + (buffer_size,), jnp.float32),
        count=jnp.zeros((), jnp.int32),
        ptr=jnp.zeros((), jnp.int32),
        theta=jnp.zeros(lead + (d,), jnp.float32),
        fitted=jnp.zeros((), jnp.bool_),
    )


def push(state: SurrogateState, w: jax.Array, ll: jax.Array) -> SurrogateState:
    """Append a (C, W) block of pairs to the ring buffer(s).

    Global layout: the block lands as C consecutive rows (buffer size is a
    multiple of the chain count — checked at config time — so a block never
    wraps mid-write). Per-chain layout: chain i's pair becomes one row of
    ring i; all rings share the pointer."""
    if state.buf_w.ndim == 3:
        start = state.ptr
        b = state.buf_w.shape[1]
        buf_w = jax.lax.dynamic_update_slice(
            state.buf_w, w[:, None, :], (0, start, 0)
        )
        buf_ll = jax.lax.dynamic_update_slice(
            state.buf_ll, ll[:, None], (0, start)
        )
        return state._replace(
            buf_w=buf_w,
            buf_ll=buf_ll,
            ptr=(start + 1) % b,
            count=jnp.minimum(state.count + 1, b),
        )
    c = w.shape[0]
    b = state.buf_w.shape[0]
    start = state.ptr
    buf_w = jax.lax.dynamic_update_slice(state.buf_w, w, (start, 0))
    buf_ll = jax.lax.dynamic_update_slice(state.buf_ll, ll, (start,))
    return state._replace(
        buf_w=buf_w,
        buf_ll=buf_ll,
        ptr=(start + c) % b,
        count=jnp.minimum(state.count + c, b),
    )


def push_masked(
    state: SurrogateState, z: jax.Array, ll: jax.Array, valid: jax.Array
) -> SurrogateState:
    """Conditional-free masked block push: when scalar ``valid`` is False the
    buffer, pointer, and count are all unchanged (the write blends the
    existing rows back). Lets the sampler hoist pushes OUT of lax.switch
    branches — per-step conditionals with large operands are the dominant
    overhead of surrogate bookkeeping on TPU."""
    c = z.shape[0]
    if state.buf_w.ndim == 3:
        b = state.buf_w.shape[1]
        cur_w = jax.lax.dynamic_slice(
            state.buf_w, (0, state.ptr, 0), (c, 1, z.shape[1])
        )
        cur_ll = jax.lax.dynamic_slice(state.buf_ll, (0, state.ptr), (c, 1))
        buf_w = jax.lax.dynamic_update_slice(
            state.buf_w,
            jnp.where(valid, z[:, None, :], cur_w),
            (0, state.ptr, 0),
        )
        buf_ll = jax.lax.dynamic_update_slice(
            state.buf_ll,
            jnp.where(valid, ll[:, None], cur_ll),
            (0, state.ptr),
        )
        adv = jnp.where(valid, 1, 0).astype(jnp.int32)
    else:
        b = state.buf_w.shape[0]
        cur_w = jax.lax.dynamic_slice(
            state.buf_w, (state.ptr, 0), (c, z.shape[1])
        )
        cur_ll = jax.lax.dynamic_slice(state.buf_ll, (state.ptr,), (c,))
        buf_w = jax.lax.dynamic_update_slice(
            state.buf_w, jnp.where(valid, z, cur_w), (state.ptr, 0)
        )
        buf_ll = jax.lax.dynamic_update_slice(
            state.buf_ll, jnp.where(valid, ll, cur_ll), (state.ptr,)
        )
        adv = jnp.where(valid, c, 0).astype(jnp.int32)
    return state._replace(
        buf_w=buf_w,
        buf_ll=buf_ll,
        ptr=(state.ptr + adv) % b,
        count=jnp.minimum(state.count + adv, b),
    )


def _fit_rows(
    buf_w: jax.Array,
    buf_ll: jax.Array,
    count: jax.Array,
    proj: jax.Array,
    ridge: float,
) -> jax.Array:
    """Ridge normal equations over the valid rows of ONE buffer -> theta.

    The solve runs on STANDARDIZED features (per-feature center/scale over
    the valid rows, ridge scaled to the standardized gram whose diagonal is
    ~n) and the solution is folded back to raw-feature coefficients. This
    is not cosmetic: a single chain's buffer holds heavily autocorrelated
    samples from one small region, and the raw quadratic-feature gram of
    such rows is too ill-conditioned for a float32 Cholesky — the per-chain
    scope produced NaN/garbage thetas without it (the global buffer mixes
    all rungs' rows, which masked the problem). Degenerate (constant)
    feature columns standardize to zero and drop out gracefully."""
    b = buf_w.shape[0]
    valid = (jnp.arange(b) < count).astype(jnp.float32)
    n = jnp.maximum(jnp.sum(valid), 1.0)
    phi = features(buf_w, proj)
    mu = jnp.sum(phi * valid[:, None], axis=0) / n
    var = jnp.sum(jnp.square(phi - mu) * valid[:, None], axis=0) / n
    sig = jnp.sqrt(jnp.maximum(var, 1e-12))
    phi_s = (phi - mu) / sig * valid[:, None]
    y_mean = jnp.sum(buf_ll * valid) / n
    y_c = (buf_ll - y_mean) * valid
    d = phi.shape[1]
    gram = (
        jnp.matmul(phi_s.T, phi_s, precision=jax.lax.Precision.HIGHEST)
        + (ridge * n) * jnp.eye(d, dtype=jnp.float32)
    )
    rhs = jnp.matmul(phi_s.T, y_c, precision=jax.lax.Precision.HIGHEST)
    theta_s = jax.scipy.linalg.solve(gram, rhs, assume_a="pos")
    theta = theta_s / sig
    # feature 0 is the constant 1: its centered column is zero (theta_s[0]
    # lands at 0 via the ridge), so the intercept goes there
    intercept = y_mean - jnp.dot(theta_s, mu / sig)
    return theta.at[0].add(intercept)


def fit(
    state: SurrogateState,
    proj: jax.Array,
    ridge: float = 1e-3,
    min_r2: float = 0.7,
) -> SurrogateState:
    """Ridge regression over the valid buffer rows (normal equations);
    per-chain layout fits every rung's buffer as one vmapped batched solve.

    ``fitted`` is only set while the in-buffer r-squared clears ``min_r2``
    (EVERY rung's, for the per-chain layout — the step decision is
    ladder-global, so one untrustworthy rung falls the whole ladder back to
    true evaluations rather than feeding it a misleading likelihood).
    """
    if state.buf_w.ndim == 3:
        theta = jax.vmap(
            lambda bw, bl: _fit_rows(bw, bl, state.count, proj, ridge)
        )(state.buf_w, state.buf_ll)
    else:
        theta = _fit_rows(state.buf_w, state.buf_ll, state.count, proj, ridge)
    # need enough rows to be determined; keep unfitted until buffer has
    # at least d samples
    d = theta.shape[-1]
    ok = state.count >= jnp.asarray(d, jnp.int32)
    theta = jnp.where(ok, theta, state.theta)
    cand = state._replace(theta=theta)
    good = jnp.logical_and(ok, jnp.min(r_squared(cand, proj)) >= min_r2)
    return cand._replace(fitted=good)


def predict(state: SurrogateState, proj: jax.Array, w: jax.Array) -> jax.Array:
    """Surrogate log-likelihood for a (C, W) block -> (C,). Per-chain
    layout applies rung i's theta to row i."""
    phi = features(w, proj)
    if state.theta.ndim == 2:
        return jnp.einsum(
            "cd,cd->c", phi, state.theta,
            precision=jax.lax.Precision.HIGHEST,
        )
    return phi @ state.theta


def grad_predict(
    state: SurrogateState, proj: jax.Array, z: jax.Array
) -> jax.Array:
    """Analytic gradient of the surrogate log-likelihood, (C, Z) -> (C, Z).

    d/dz [theta . phi(z)] with phi(z) = [1, z, z^2, (Pz)^2]:
    ``theta_z + 2 theta_z2 * z + 2 P^T ((Pz) * theta_p)``. A few matvecs —
    this is what makes surrogate-MALA inner moves nearly free (kernel
    step_da with surrogate_inner="mala")."""
    zdim = z.shape[1]
    # theta is (D,) global or (C, D) per-chain; trailing-axis slices
    # broadcast against the (C, zdim) batch either way
    t_z = state.theta[..., 1 : 1 + zdim]
    t_z2 = state.theta[..., 1 + zdim : 1 + 2 * zdim]
    t_p = state.theta[..., 1 + 2 * zdim :]
    pz = jnp.einsum("kw,cw->ck", proj, z, precision=jax.lax.Precision.HIGHEST)
    cross = jnp.einsum(
        "ck,kw->cw", pz * t_p, proj,
        precision=jax.lax.Precision.HIGHEST,
    )
    return t_z + 2.0 * t_z2 * z + 2.0 * cross


# ---------------------------------------------------------------------------
# MLP surrogate family (surrogate_family="mlp")
#
# ll_hat(z) = y_sig * (v . tanh(A zs + b) + c) + y_mu with zs = (z - mu)/sig —
# one tanh hidden layer trained by warm-started full-batch Adam on the ring
# buffer at chunk boundaries (the "NN surrogate with SGD refits" capability
# of the surrogate-assisted PT literature; the reference's own surrogate
# plumbing is empty, see module docstring). All parameters live flattened in
# ``SurrogateState.theta`` so the state layout, checkpointing, and the
# per-chain scope (leading (C,) axis, vmapped fits) are family-agnostic.
# ---------------------------------------------------------------------------


def mlp_dim(zdim: int, hidden: int) -> int:
    """theta layout: [A (H*Z), b (H), v (H), c (1), mu (Z), sig (Z),
    y_mu (1), y_sig (1)]."""
    return hidden * zdim + 2 * hidden + 2 * zdim + 3


def _mlp_unpack(theta: jax.Array, zdim: int, hidden: int):
    o = 0
    a = theta[o : o + hidden * zdim].reshape(hidden, zdim); o += hidden * zdim
    b = theta[o : o + hidden]; o += hidden
    v = theta[o : o + hidden]; o += hidden
    c = theta[o]; o += 1
    mu = theta[o : o + zdim]; o += zdim
    sig = theta[o : o + zdim]; o += zdim
    y_mu = theta[o]; o += 1
    y_sig = theta[o]
    return a, b, v, c, mu, sig, y_mu, y_sig


def mlp_init_theta(key: jax.Array, zdim: int, hidden: int) -> jax.Array:
    ka, kv = jax.random.split(key)
    a = jax.random.normal(ka, (hidden, zdim), jnp.float32) / jnp.sqrt(
        jnp.asarray(zdim, jnp.float32)
    )
    v = 0.1 * jax.random.normal(kv, (hidden,), jnp.float32) / jnp.sqrt(
        jnp.asarray(hidden, jnp.float32)
    )
    return jnp.concatenate(
        [
            a.ravel(),
            jnp.zeros((hidden,), jnp.float32),
            v,
            jnp.zeros((1,), jnp.float32),
            jnp.zeros((zdim,), jnp.float32),  # mu
            jnp.ones((zdim,), jnp.float32),  # sig
            jnp.zeros((1,), jnp.float32),  # y_mu
            jnp.ones((1,), jnp.float32),  # y_sig
        ]
    )


def _mlp_forward_std(params, zs: jax.Array) -> jax.Array:
    """Standardized-space forward: zs (N, Z) -> (N,)."""
    a, b, v, c = params
    h = jnp.tanh(
        jnp.einsum("hz,nz->nh", a, zs, precision=jax.lax.Precision.HIGHEST)
        + b
    )
    return h @ v + c


def _mlp_predict_one(theta: jax.Array, z: jax.Array, zdim: int, hidden: int):
    """(Z,)-input predict for one theta -> scalar."""
    a, b, v, c, mu, sig, y_mu, y_sig = _mlp_unpack(theta, zdim, hidden)
    zs = (z - mu) / sig
    return y_sig * (jnp.tanh(a @ zs + b) @ v + c) + y_mu


def mlp_predict(theta: jax.Array, z: jax.Array, hidden: int) -> jax.Array:
    """Surrogate ll for a (C, Z) block -> (C,). Per-chain theta (C, D)
    routes rung i's net to row i."""
    zdim = z.shape[1]
    if theta.ndim == 2:
        return jax.vmap(
            lambda th, zr: _mlp_predict_one(th, zr, zdim, hidden)
        )(theta, z)
    a, b, v, c, mu, sig, y_mu, y_sig = _mlp_unpack(theta, zdim, hidden)
    return y_sig * _mlp_forward_std((a, b, v, c), (z - mu) / sig) + y_mu


def mlp_grad(theta: jax.Array, z: jax.Array, hidden: int) -> jax.Array:
    """Analytic d ll_hat / dz for a (C, Z) block -> (C, Z):
    y_sig * A^T (v * (1 - h^2)) / sig."""
    zdim = z.shape[1]

    def one(th, zr):
        a, b, v, c, mu, sig, y_mu, y_sig = _mlp_unpack(th, zdim, hidden)
        h = jnp.tanh(a @ ((zr - mu) / sig) + b)
        return y_sig * (a.T @ (v * (1.0 - h * h))) / sig

    if theta.ndim == 2:
        return jax.vmap(one)(theta, z)
    return jax.vmap(lambda zr: one(theta, zr))(z)


def _mlp_fit_rows(
    buf_w: jax.Array,
    buf_ll: jax.Array,
    count: jax.Array,
    theta0: jax.Array,
    hidden: int,
    steps: int,
    lr: float,
) -> Tuple[jax.Array, jax.Array]:
    """Warm-started full-batch Adam on ONE buffer -> (theta, r2).

    Standardization constants are recomputed from the current valid rows
    each refit (they drift only while the ring is filling); the net warm
    starts from the previous fit's weights and retrains for ``steps``
    iterations, so the brief mismatch after a re-standardization is
    trained away within the same refit."""
    b, zdim = buf_w.shape
    valid = (jnp.arange(b) < count).astype(jnp.float32)
    n = jnp.maximum(jnp.sum(valid), 1.0)
    mu = jnp.sum(buf_w * valid[:, None], axis=0) / n
    var = jnp.sum(jnp.square(buf_w - mu) * valid[:, None], axis=0) / n
    sig = jnp.sqrt(jnp.maximum(var, 1e-12))
    y_mu = jnp.sum(buf_ll * valid) / n
    y_var = jnp.sum(jnp.square(buf_ll - y_mu) * valid) / n
    y_sig = jnp.sqrt(jnp.maximum(y_var, 1e-12))
    zs = (buf_w - mu) / sig
    ys = (buf_ll - y_mu) / y_sig

    a0, b0, v0, c0, *_ = _mlp_unpack(theta0, zdim, hidden)
    params0 = (a0, b0, v0, jnp.asarray(c0))

    def loss(params):
        pred = _mlp_forward_std(params, zs)
        return jnp.sum(jnp.square(pred - ys) * valid) / n

    gloss = jax.grad(loss)
    zeros = jax.tree.map(jnp.zeros_like, params0)
    b1, b2, eps = 0.9, 0.999, 1e-8

    def adam(carry, t):
        params, m, s = carry
        g = gloss(params)
        m = jax.tree.map(lambda mi, gi: b1 * mi + (1 - b1) * gi, m, g)
        s = jax.tree.map(lambda si, gi: b2 * si + (1 - b2) * gi * gi, s, g)
        tf = t.astype(jnp.float32) + 1.0
        corr = jnp.sqrt(1.0 - b2**tf) / (1.0 - b1**tf)
        params = jax.tree.map(
            lambda p, mi, si: p - lr * corr * mi / (jnp.sqrt(si) + eps),
            params, m, s,
        )
        return (params, m, s), None

    (params, _, _), _ = jax.lax.scan(
        adam, (params0, zeros, zeros), jnp.arange(steps)
    )
    pred = _mlp_forward_std(params, zs)
    resid = (pred - ys) * valid
    r2 = 1.0 - jnp.sum(jnp.square(resid)) / jnp.maximum(
        jnp.sum(jnp.square(ys * valid)), 1e-9
    )
    a1, b1_, v1, c1 = params
    theta = jnp.concatenate(
        [a1.ravel(), b1_, v1, c1[None], mu, sig, y_mu[None], y_sig[None]]
    )
    return theta, r2


def mlp_min_rows(zdim: int, hidden: int) -> int:
    """Rows before an MLP fit may activate. NNs generalize below their
    parameter count, so the quadratic family's count>=D gate would be
    needlessly strict; require a few rows per hidden unit plus input dim."""
    return 4 * hidden + 2 * zdim


def mlp_fit(
    state: SurrogateState,
    hidden: int,
    steps: int,
    lr: float,
    min_r2: float,
) -> SurrogateState:
    """Refit the MLP family on the ring buffer(s); per-chain layout trains
    every rung's net in one vmapped Adam loop. Gate as the quadratic
    family: enough rows, and EVERY rung's in-buffer r2 above ``min_r2``."""
    min_rows = mlp_min_rows(state.buf_w.shape[-1], hidden)
    if state.buf_w.ndim == 3:
        theta, r2 = jax.vmap(
            lambda bw, bl, th: _mlp_fit_rows(
                bw, bl, state.count, th, hidden, steps, lr
            )
        )(state.buf_w, state.buf_ll, state.theta)
    else:
        theta, r2 = _mlp_fit_rows(
            state.buf_w, state.buf_ll, state.count, state.theta,
            hidden, steps, lr,
        )
    ok = state.count >= jnp.asarray(min_rows, jnp.int32)
    theta = jnp.where(ok, theta, state.theta)
    good = jnp.logical_and(ok, jnp.min(r2) >= min_r2)
    return state._replace(theta=theta, fitted=good)


class Family(NamedTuple):
    """Resolved surrogate family: uniform call signatures for the kernel
    (predict/grad_predict take (state, proj, z); fit takes (state, proj) —
    the MLP family ignores ``proj``)."""

    predict: Callable
    grad_predict: Callable
    fit: Callable


def family_for(cfg) -> Family:
    """Resolve PTConfig.surrogate_family to its (predict, grad, fit)."""
    if cfg.surrogate_family == "mlp":
        hidden = cfg.surrogate_hidden
        return Family(
            predict=lambda st, proj, z: mlp_predict(st.theta, z, hidden),
            grad_predict=lambda st, proj, z: mlp_grad(st.theta, z, hidden),
            fit=lambda st, proj: mlp_fit(
                st, hidden, cfg.surrogate_fit_steps, cfg.surrogate_fit_lr,
                cfg.surrogate_min_r2,
            ),
        )
    return Family(
        predict=predict,
        grad_predict=grad_predict,
        fit=lambda st, proj: fit(
            st, proj, cfg.surrogate_ridge, cfg.surrogate_min_r2
        ),
    )


def _r2_rows(
    buf_w: jax.Array,
    buf_ll: jax.Array,
    count: jax.Array,
    theta: jax.Array,
    proj: jax.Array,
) -> jax.Array:
    b = buf_w.shape[0]
    valid = (jnp.arange(b) < count).astype(jnp.float32)
    pred = features(buf_w, proj) @ theta
    resid = (pred - buf_ll) * valid
    n = jnp.maximum(count.astype(jnp.float32), 1.0)
    mean = jnp.sum(buf_ll * valid) / n
    tot = jnp.sum(jnp.square((buf_ll - mean) * valid))
    return 1.0 - jnp.sum(jnp.square(resid)) / jnp.maximum(tot, 1e-9)


def r_squared(state: SurrogateState, proj: jax.Array) -> jax.Array:
    """In-buffer goodness of fit (diagnostic). Scalar for the global
    layout; (C,) per rung for the per-chain layout."""
    if state.buf_w.ndim == 3:
        return jax.vmap(
            lambda bw, bl, th: _r2_rows(bw, bl, state.count, th, proj)
        )(state.buf_w, state.buf_ll, state.theta)
    return _r2_rows(state.buf_w, state.buf_ll, state.count, state.theta, proj)
