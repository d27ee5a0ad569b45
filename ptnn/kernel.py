"""The per-step MCMC kernel, batched over the whole temperature ladder.

TPU-native re-design of the reference's per-chain hot loop
(``ptReplica.run``, multicore-pt-classification/pt_classification.py:313-448
and multicore-pt-regression/pt_timeseries_regression.py:313-439). One call to
the step function advances *all* chains by one Metropolis-Hastings step as a
single XLA computation with a leading ``(chains,)`` axis: the reference's
process-per-chain + queue rendezvous architecture disappears entirely
(SURVEY.md §7 design stance).

Semantics reproduced (per chain, per step):

* Bernoulli(l_prob) choice between a Langevin-gradient proposal with MH
  q-ratio correction (pt_classification.py:333-353) and a random-walk
  Gaussian proposal N(w, step_w) (:357-359). The same Gaussian innovation is
  used for both branches, exactly like the reference's single
  ``np.random.normal`` draw centered on either ``w_gd`` or ``w``.
* Regression additionally random-walks the log noise variance ``eta``
  (pt_timeseries_regression.py:355-356).
* Tempered MH accept: the chain carries the *untempered* train log-likelihood
  and divides by the adaptive temperature at decision time — algebraically
  identical to the reference's tempered carry plus its one-time re-tempering
  at the 60% phase switch (pt_classification.py:317-324), but branch-free.
* Trace rows follow the reference's write-on-accept convention: ``pos_w`` and
  the rmse/acc traces copy the previous row on reject (pt_classification.py
  :419-434), so the kernel carries "last accepted" values separately from the
  live chain state (a swap updates the live ``w`` but NOT the trace row —
  matching the reference, where a post-swap reject copies the pre-swap row).
* Replica-exchange: after steps selected by the cadence mask, a sequential
  bubbling sweep permutation over payload likelihoods (parallel/swap.py),
  permuting only (w, eta) — the stale-likelihood semantics of
  pt_classification.py:445-448 (configurable).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ptnn.config import PTConfig
from ptnn.models import api as model_api
from ptnn.models import fnn
from ptnn.ops import drift, likelihood
from ptnn.ops import vref as vref_mod
from ptnn.parallel import swap as swap_mod
from ptnn import surrogate as surrogate_mod


def default_spec(cfg: PTConfig) -> model_api.ModelSpec:
    """The reference FNN spec for this config."""
    prec = (
        jax.lax.Precision.DEFAULT if cfg.eval_dtype == "bfloat16" else None
    )
    return model_api.fnn_spec(
        cfg.topology, cfg.drift_mode, cfg.drift_unroll, mm_precision=prec
    )


class DAState(NamedTuple):
    """Delayed-acceptance segment bookkeeping (surrogate_mode =
    "delayed_acceptance"). A *segment* is a maximal run of consecutive
    surrogate steps: the chain moves by inner RW-MH against the surrogate
    target, and the whole segment is treated as one composite proposal that a
    single true-likelihood Metropolis test accepts or reverts at close. The
    composition of surrogate-reversible inner kernels is surrogate-reversible,
    so the correction ratio is exactly
    ``[pi(w_K) s(w_0)] / [pi(w_0) s(w_K)]`` (Christen & Fox 2005) — the
    sampler stays EXACT w.r.t. the tempered posterior for the surrogate
    coefficients in effect during the segment. The surrogate decision is
    global per step, so ``active`` is a scalar."""

    anchor_w: jax.Array  # (C, W) segment-start weights
    anchor_eta: jax.Array  # (C,)
    anchor_prior: jax.Array  # (C,)
    anchor_llsurr: jax.Array  # (C,) surrogate ll at the anchor
    ll_surr: jax.Array  # (C,) surrogate ll at the CURRENT (w, eta)
    active: jax.Array  # () bool — a segment is open
    n_seg: jax.Array  # () int32 — segments opened
    n_seg_accepted: jax.Array  # (C,) int32 — segment corrections accepted


def init_da_state(num_chains: int, w_size: int) -> DAState:
    c = num_chains
    return DAState(
        anchor_w=jnp.zeros((c, w_size), jnp.float32),
        anchor_eta=jnp.zeros((c,), jnp.float32),
        anchor_prior=jnp.zeros((c,), jnp.float32),
        anchor_llsurr=jnp.zeros((c,), jnp.float32),
        ll_surr=jnp.zeros((c,), jnp.float32),
        active=jnp.zeros((), jnp.bool_),
        n_seg=jnp.zeros((), jnp.int32),
        n_seg_accepted=jnp.zeros((c,), jnp.int32),
    )


class ChainState(NamedTuple):
    """Live sampler state for all chains (leading axis = chains)."""

    w: jax.Array  # (C, W) current weights
    eta: jax.Array  # (C,) log noise variance (junk for classification)
    ll: jax.Array  # (C,) UNTEMPERED train log-likelihood of current w
    prior: jax.Array  # (C,) log prior of current w
    # Trace carries (write-on-accept):
    w_last: jax.Array  # (C, W) last accepted proposal (pos_w row)
    rmse_train: jax.Array  # (C,)
    rmse_test: jax.Array  # (C,)
    acc_train: jax.Array  # (C,)
    acc_test: jax.Array  # (C,)
    # Optional posterior-predictive carries (None unless cfg.record_fx):
    fx_train: Any  # (C, N_train) last accepted predictions, or None
    fx_test: Any  # (C, N_test), or None
    # Optional surrogate state (None unless cfg.use_surrogate):
    surr: Any
    # Optional delayed-acceptance segment state (None unless
    # cfg.surrogate_mode == "delayed_acceptance"):
    da: Any
    # Optional per-chain log step-size (None unless cfg.adapt_step_size or a
    # precond_* proposal):
    log_step_w: Any
    # Optional preconditioned-proposal state (None unless cfg.proposal is
    # "precond_rw"/"precond_mala"):
    g_like: Any  # (C, W) gradient of the tau/temp-independent likelihood
    #            # term at the current w (precond_mala only)
    pc_mean: Any  # (C, W) Welford running mean of w over burn-in
    pc_m2: Any  # (C, W) Welford running sum of squared deviations
    log_step_eta: Any  # (C,) adapted eta RW scale (precond_* regression only)
    # ChEES trajectory-length adaptation state (None unless
    # cfg.hmc_adapt_traj; config.py has the scheme): log mean trajectory
    # length + Adam moments, per chain but rung-tied (NOT permuted on swaps,
    # like log_step_w — trajectory length is a property of the rung's
    # tempered posterior, not of the traveling configuration).
    log_traj: Any  # (C,) float32
    chees_m1: Any  # (C,) float32 Adam first moment
    chees_v2: Any  # (C,) float32 Adam second moment
    # Optional replica identity labels (None unless cfg.track_replicas):
    # replica_id[k] = which of the C initial configurations currently sits
    # at rung k; permuted with (w, eta) on swaps (ops/roundtrip.py)
    replica_id: Any
    # Per adjacent rung pair (k, k+1): running sum of the expected swap
    # acceptance probability and the number of times the pair was proposed.
    # Padded to (C,) (entry C-1 unused) so the arrays shard over the chain
    # mesh axis like everything else. Feeds the communication-barrier ladder
    # tuner (ops/ladder.py:barrier_tuned_temperatures).
    pair_accept_sum: Any  # (C,) float32
    pair_prop_count: Any  # (C,) int32
    # Optional variational-reference state (None unless
    # cfg.variational_reference; ops/vref.py): Welford moments of the COLD
    # chain's reference coordinates z — (w, eta) for regression, w for
    # classification — global (Z,) arrays, replicated on the mesh (their
    # leading axis is the parameter dim, not chains) — plus the hot-rung
    # regeneration counters.
    vr_mean: Any  # (Z,) float32
    vr_m2: Any  # (Z,) float32 — Welford M2 accumulator (vr_mode="welford")
    #           # or the VARIANCE itself (vr_mode="static")
    # Lower Cholesky factor of the static full-covariance reference
    # (None unless cfg.vr_family == "full_cov"; ops/vref.py:fit_gaussian,
    # injected between rounds by ptnn/rounds.py via set_static_reference)
    vr_chol: Any  # (Z, Z) float32, or None
    n_regen_accepted: Any  # () int32, or None
    n_regen_proposed: Any  # () int32, or None
    # Optional SVRG control-variate anchors for the corrected noisy-energy
    # swap test (None unless cfg.proposal == "sgld" and cfg.sg_vr; PAPERS.md
    # arxiv 2010.01084): full-data log-likelihood and coordinates of the
    # last anchor refresh, per chain. Permuted WITH (w, eta) on swaps — the
    # control variate describes the traveling configuration; the estimator
    # is unbiased for any anchor regardless, staleness only costs variance
    # until the next refresh (cfg.sg_anchor_interval).
    sg_anchor_w: Any  # (C, W) float32, or None
    sg_anchor_eta: Any  # (C,) float32, or None
    sg_anchor_full: Any  # (C,) float32 full-data UNTEMPERED ll, or None
    # Counters:
    n_accept: jax.Array  # (C,) int32
    n_langevin: jax.Array  # (C,) int32
    n_swap_accepted: jax.Array  # () int32
    n_swap_proposed: jax.Array  # () int32


class Dataset(NamedTuple):
    """Device-resident problem data (replicated across the mesh — KB scale).

    ``mask_train``/``mask_test`` are optional (N,) {0,1} row-validity masks:
    None for ordinary runs; set by sweeps.dataset_grid, which pads datasets
    of different lengths to one shared shape so the whole Compare_Benchmark
    grid vmaps into a single compiled program (masked likelihood/RMSE/drift
    make padded rows exact no-ops)."""

    x_train: jax.Array  # (N, I)
    y_train: jax.Array  # (N,) labels (class index or regression target)
    t_train: jax.Array  # (N, O) delta-rule targets (one-hot / scalar column)
    x_test: jax.Array
    y_test: jax.Array
    mask_train: Any = None  # (N,) float {0,1} or None
    mask_test: Any = None
    # Classification envelope padding (sweeps.classification_grid): datasets
    # with different (features, hidden, classes) topologies share one
    # compiled program by padding to a topology envelope. ``class_mask``
    # excludes padded class columns from the softmax/argmax; ``w_mask`` pins
    # padded parameters at zero (init, proposal noise, drift updates), which
    # makes padded hidden units exact no-ops (their outgoing weights stay 0).
    class_mask: Any = None  # (O,) float {0,1} or None
    w_mask: Any = None  # (w_size,) float {0,1} or None


def _batched_evals(
    cfg: PTConfig, spec: model_api.ModelSpec, data: "Dataset" = None
):
    """Chain-batched eval + prior closures for a model spec.

    ``data`` supplies the optional envelope masks (Dataset.class_mask /
    w_mask); row masks are passed per call site (train vs test)."""
    class_mask = None if data is None else data.class_mask
    w_mask = None if data is None else data.w_mask
    use_batched_fwd = (
        spec.batched_forward is not None
        # the fused-eval kernels are Mosaic TPU programs; off-TPU (CPU test
        # mesh, GPU) fall back to the vmapped forward rather than crashing —
        # mirrors the batched_drift guard below
        and jax.default_backend() == "tpu"
        # the Pallas out_shape is f32; bf16 eval mode stays on the XLA path
        and cfg.eval_dtype != "bfloat16"
        # written for a single chip (chain axis on lanes): under a multi-
        # device mesh GSPMD cannot partition the pallas_call — fall back to
        # the vmapped forward, which shards cleanly along the chain axis
        and jax.device_count() == 1
    )
    if use_batched_fwd:
        _fwd_raw = spec.batched_forward  # (C, W), (N, I) -> (C, N, O)
    else:
        _fwd_raw = jax.vmap(spec.forward, in_axes=(0, None))
    if cfg.eval_dtype == "bfloat16":
        # bf16 forward pass (half the HBM traffic); outputs return to f32 so
        # every likelihood reduction and the MH decision stay full precision
        def fwd_b(w, x):
            return _fwd_raw(
                w.astype(jnp.bfloat16), x.astype(jnp.bfloat16)
            ).astype(jnp.float32)
    else:
        fwd_b = _fwd_raw
    if cfg.task == "regression":

        def b_eval(w, x, y, tau, mask=None):
            fx = fwd_b(w, x)[:, :, 0]
            return jax.vmap(
                lambda f, t: likelihood.regression_eval_from_fx(f, y, t, mask)
            )(fx, tau)

        b_prior = jax.vmap(
            lambda wi, ti: likelihood.regression_log_prior_dim(
                wi, ti, spec.prior_dim_regression, cfg.sigma_sq, cfg.nu_1, cfg.nu_2
            )
        )
    else:

        def b_eval(w, x, y, mask=None):
            out = fwd_b(w, x)
            if class_mask is not None:
                # padded class columns sit at sigmoid(0)=0.5 and would leak
                # into the softmax normalizer; a large negative (not -inf —
                # avoids 0*inf NaNs in value_and_grad paths) zeroes their
                # probability and keeps them out of the argmax
                out = jnp.where(class_mask > 0, out, -1e9)
            logp = spec.log_probs(out)
            return jax.vmap(
                likelihood.classification_eval_from_logp,
                in_axes=(0, 0, None, None),
            )(logp, out, y, mask)

        # the reference's dimension term equals w_size, so under envelope
        # padding it is the number of REAL parameters — a traced per-cell
        # scalar (masked parameters are pinned at 0 and drop out of sum(w^2))
        prior_dim = (
            spec.prior_dim_classification
            if w_mask is None
            else jnp.sum(w_mask)
        )
        b_prior = jax.vmap(
            lambda wi: likelihood.classification_log_prior_dim(
                wi, prior_dim, cfg.sigma_sq
            )
        )
    return b_eval, b_prior


def _like_value_and_grad(cfg: PTConfig, spec: model_api.ModelSpec, data: Dataset):
    """Chain-batched fused likelihood eval + gradient (precond_mala).

    Returns ``fn(w) -> ((val, aux), g)`` with ``val``: (C,) the temperature-
    and tau-independent likelihood term — the full multinomial log-likelihood
    for classification (pt_classification.py:209-222 semantics), or
    ``-0.5 * SSE`` for regression (the tau-dependent normalizer of
    pt_timeseries_regression.py:200-205 is added by the caller) — ``aux`` the
    raw outputs needed for metrics, and ``g = d val / d w``: (C, W). One
    fused forward+backward per call; the MALA proposal recombines ``g`` with
    the prior gradient and the chain's temperature, so the cache stays valid
    across eta updates, swaps (permuted), and the 60% temper switch.
    """
    if cfg.task == "regression":

        def f(wi):
            fx = spec.forward(wi, data.x_train)[:, 0]
            val = -0.5 * jnp.sum(jnp.square(data.y_train - fx))
            return val, fx
    else:

        def f(wi):
            out = spec.forward(wi, data.x_train)
            logp = spec.log_probs(out)
            yi = data.y_train.astype(jnp.int32)
            val = jnp.sum(jnp.take_along_axis(logp, yi[:, None], axis=-1))
            return val, out

    b = jax.vmap(jax.value_and_grad(f, has_aux=True))
    if cfg.drift_chain_microbatch > 1:
        # bound fwd+bwd activation memory exactly like the drift path
        mb = cfg.drift_chain_microbatch

        def batched(w):
            cc, wd = w.shape
            out = jax.lax.map(b, w.reshape(mb, cc // mb, wd))
            return jax.tree_util.tree_map(
                lambda a: a.reshape((cc,) + a.shape[2:]), out
            )

        return batched
    return b


def init_state(
    key: jax.Array,
    cfg: PTConfig,
    data: Dataset,
    spec: model_api.ModelSpec = None,
    init_w: Any = None,
    init_eta: Any = None,
) -> ChainState:
    """Initial chain state (reference: master-side ``w = randn(num_param)``
    pt_classification.py:658; regression eta init from the residual variance
    of the initial prediction, pt_timeseries_regression.py:270-271).

    ``init_w`` (C, W) / ``init_eta`` (C,) override the random/residual
    initialization — the warm-start interface (ptnn/rounds.py carries the
    previous round's configurations into the next). Every cached quantity
    (ll, prior, g_like, fx) is computed fresh from them, so the state is
    exactly what a cold init at those coordinates would be.
    """
    if spec is None:
        spec = default_spec(cfg)
    c, w_dim = cfg.num_chains, spec.w_size
    kw, _ = jax.random.split(key)
    if init_w is None:
        w = jax.random.normal(kw, (c, w_dim), dtype=jnp.float32)
    else:
        w = jnp.asarray(init_w, jnp.float32)
        if w.shape != (c, w_dim):
            raise ValueError(f"init_w shape {w.shape} != {(c, w_dim)}")
    if data.w_mask is not None:
        w = w * data.w_mask
    b_eval, b_prior = _batched_evals(cfg, spec, data)

    if cfg.task == "regression":
        pred = jax.vmap(spec.forward, in_axes=(0, None))(w, data.x_train)[:, :, 0]
        resid = pred - data.y_train[None, :]
        if data.mask_train is not None:
            m = data.mask_train
            n_valid = jnp.sum(m)
            mu = jnp.sum(m * resid, axis=1) / n_valid
            var = (
                jnp.sum(m * jnp.square(resid - mu[:, None]), axis=1) / n_valid
            )
        else:
            var = jnp.var(resid, axis=1)
        eta = jnp.log(var)
        if init_eta is not None:
            eta = jnp.asarray(init_eta, jnp.float32)
            if eta.shape != (c,):
                raise ValueError(f"init_eta shape {eta.shape} != {(c,)}")
        tau = jnp.exp(eta)
        ev = b_eval(w, data.x_train, data.y_train, tau, data.mask_train)
        ll = ev.loglik
        prior = b_prior(w, tau)
    else:
        eta = jnp.zeros((c,), jnp.float32)
        ev = b_eval(w, data.x_train, data.y_train, data.mask_train)
        ll = ev.loglik
        prior = b_prior(w)

    def zero():
        # fresh buffer per field — donation forbids aliased arguments
        return jnp.zeros((c,), jnp.float32)

    if cfg.record_fx:
        fx_train = jnp.zeros((c, data.x_train.shape[0]), jnp.float32)
        fx_test = jnp.zeros((c, data.x_test.shape[0]), jnp.float32)
    else:
        fx_train = fx_test = None

    is_precond = cfg.proposal in ("precond_rw", "precond_mala", "hmc", "pcn")
    log_step_w = None
    if cfg.adapt_step_size or is_precond:
        log_step_w = jnp.full((c,), jnp.log(cfg.step_w), jnp.float32)

    g_like = pc_mean = pc_m2 = log_step_eta = None
    if is_precond:
        pc_mean = jnp.zeros((c, w_dim), jnp.float32)
        pc_m2 = jnp.zeros((c, w_dim), jnp.float32)
        if cfg.task == "regression":
            log_step_eta = jnp.full((c,), jnp.log(cfg.step_eta), jnp.float32)
        if cfg.proposal in ("precond_mala", "hmc"):
            (_, _), g_like = _like_value_and_grad(cfg, spec, data)(w)

    surr = None
    da = None
    if cfg.use_surrogate:
        surr = surrogate_mod.init_for(cfg, w_dim)
        if cfg.surrogate_mode == "delayed_acceptance":
            da = init_da_state(c, w_dim)

    replica_id = (
        jnp.arange(c, dtype=jnp.int32) if cfg.track_replicas else None
    )

    log_traj = chees_m1 = chees_v2 = None
    if cfg.proposal == "hmc" and cfg.hmc_adapt_traj:
        # init mean trajectory length at half the static bound: with the
        # vdc jitter (mean 1/2) the realized L starts around hmc_leapfrog/4
        # and ChEES moves it from there
        log_traj = jnp.full(
            (c,), float(np.log(0.5 * cfg.hmc_leapfrog * cfg.step_w)),
            jnp.float32,
        )
        chees_m1 = jnp.zeros((c,), jnp.float32)
        chees_v2 = jnp.zeros((c,), jnp.float32)

    vr_mean = vr_m2 = vr_chol = n_regen_acc = n_regen_prop = None
    if cfg.variational_reference:
        # reference coordinates z = (w, eta) for regression (eta is a
        # likelihood-anchored latent and MUST be covered by q — see the
        # make_step_fn VR block), z = w for classification
        zdim = w_dim + 1 if cfg.task == "regression" else w_dim
        vr_mean = jnp.zeros((zdim,), jnp.float32)
        # static mode: vr_m2 IS the variance (default: standard normal q —
        # override via set_static_reference); welford mode: M2 accumulator
        vr_m2 = (
            jnp.ones((zdim,), jnp.float32)
            if cfg.vr_mode == "static"
            else jnp.zeros((zdim,), jnp.float32)
        )
        if cfg.vr_family == "full_cov":
            vr_chol = jnp.eye(zdim, dtype=jnp.float32)
        n_regen_acc = jnp.zeros((), jnp.int32)
        n_regen_prop = jnp.zeros((), jnp.int32)

    return ChainState(
        w=w,
        eta=eta,
        ll=ll,
        prior=prior,
        sg_anchor_w=(
            w if (cfg.proposal == "sgld" and cfg.sg_vr) else None
        ),
        sg_anchor_eta=(
            eta if (cfg.proposal == "sgld" and cfg.sg_vr) else None
        ),
        sg_anchor_full=(
            ll if (cfg.proposal == "sgld" and cfg.sg_vr) else None
        ),
        w_last=jnp.ones_like(w),  # pos_w rows default to 1.0 (np.ones init,
        # pt_classification.py:249) until first accept
        rmse_train=zero(),
        rmse_test=zero(),
        acc_train=zero(),
        acc_test=zero(),
        fx_train=fx_train,
        fx_test=fx_test,
        surr=surr,
        da=da,
        log_step_w=log_step_w,
        g_like=g_like,
        pc_mean=pc_mean,
        pc_m2=pc_m2,
        log_step_eta=log_step_eta,
        log_traj=log_traj,
        chees_m1=chees_m1,
        chees_v2=chees_v2,
        replica_id=replica_id,
        pair_accept_sum=jnp.zeros((c,), jnp.float32),
        pair_prop_count=jnp.zeros((c,), jnp.int32),
        vr_mean=vr_mean,
        vr_m2=vr_m2,
        vr_chol=vr_chol,
        n_regen_accepted=n_regen_acc,
        n_regen_proposed=n_regen_prop,
        n_accept=jnp.zeros((c,), jnp.int32),
        n_langevin=jnp.zeros((c,), jnp.int32),
        n_swap_accepted=jnp.zeros((), jnp.int32),
        n_swap_proposed=jnp.zeros((), jnp.int32),
    )


def set_static_reference(
    state: ChainState, cfg: PTConfig, mu, var, chol=None
) -> ChainState:
    """Inject an externally fitted static reference (vr_mode="static") into
    an initial state: ``mu``/``var`` (Z,), ``chol`` (Z, Z) lower for
    vr_family="full_cov" (ops/vref.py:fit_gaussian output). The rounds
    driver (ptnn/rounds.py) calls this between rounds."""
    if cfg.vr_mode != "static":
        raise ValueError("set_static_reference requires vr_mode='static'")
    mu = jnp.asarray(mu, jnp.float32)
    var = jnp.asarray(var, jnp.float32)
    if mu.shape != state.vr_mean.shape or var.shape != state.vr_m2.shape:
        raise ValueError(
            f"reference shape {mu.shape}/{var.shape} != state z-dim "
            f"{state.vr_mean.shape}"
        )
    out = state._replace(vr_mean=mu, vr_m2=var)
    if cfg.vr_family == "full_cov":
        if chol is None:
            raise ValueError("vr_family='full_cov' needs the chol factor")
        chol = jnp.asarray(chol, jnp.float32)
        if chol.shape != state.vr_chol.shape:
            raise ValueError(
                f"chol shape {chol.shape} != {state.vr_chol.shape}"
            )
        out = out._replace(vr_chol=chol)
    elif chol is not None:
        raise ValueError("chol supplied but vr_family is 'diag'")
    return out


def vdc_u(i) -> jax.Array:
    """Van der Corput base-2 (bit-reversal) low-discrepancy point in (0, 1)
    for step index ``i`` — the quasi-random trajectory jitter ChEES wants
    (Hoffman et al. 2021 §4: consecutive steps cover (0, 1] evenly, so the
    jittered trajectory lengths stratify instead of clumping; the sequence
    is state-independent, which is what keeps the jittered kernel exact)."""
    x = jnp.asarray(i, jnp.uint32) + jnp.uint32(1)
    m5 = jnp.uint32(0x55555555)
    m3 = jnp.uint32(0x33333333)
    m0f = jnp.uint32(0x0F0F0F0F)
    mff = jnp.uint32(0x00FF00FF)
    x = ((x & m5) << 1) | ((x >> 1) & m5)
    x = ((x & m3) << 2) | ((x >> 2) & m3)
    x = ((x & m0f) << 4) | ((x >> 4) & m0f)
    x = ((x & mff) << 8) | ((x >> 8) & mff)
    x = (x << 16) | (x >> 16)
    return x.astype(jnp.float32) / jnp.float32(4294967296.0)


def swap_due(cfg: PTConfig, i: jax.Array) -> jax.Array:
    """Whether a replica-exchange sweep runs after step ``i``.

    Classification: (i+1) % interval == 0 (pt_classification.py:438).
    Regression: i % interval == 0 and i != 0 (pt_timeseries_regression.py:427).
    Encoded via ``swap_offset`` (1 / 0 respectively).
    """
    si = cfg.swap_interval
    if si <= 0 or si > cfg.n_steps:
        return jnp.asarray(False)
    k = i + cfg.swap_offset
    return jnp.logical_and(k % si == 0, k > 0)


def make_step_fn(
    cfg: PTConfig,
    data: Dataset,
    temps: jax.Array,
    spec: model_api.ModelSpec = None,
    surrogate_proj: jax.Array = None,
    swap_interval_t: jax.Array = None,
    langevin_prob_t: jax.Array = None,
    learn_rate_t: jax.Array = None,
):
    """Build the scanned step: ``(state, (i, key)) -> (state, trace_dict)``.

    ``temps``: (C,) ladder temperatures, chain 0 at T=1. ``spec`` selects the
    model family (default: the reference FNN).

    ``swap_interval_t`` / ``langevin_prob_t`` / ``learn_rate_t`` optionally
    override the config values with TRACED scalars, so a hyperparameter
    sweep over swap cadence, Langevin probability, or drift learning rate
    vmaps into one compiled grid (ptnn/sweeps.py) — cadence only enters the
    step as a step-index mask and the others as arithmetic values, so none
    changes the compiled structure.
    """
    cfg.validate()
    if spec is None:
        spec = default_spec(cfg)
    c = cfg.num_chains
    w_dim = spec.w_size
    switch_step = cfg.temper_switch_step
    step_w = cfg.step_w
    sigma_sq_w = step_w * step_w
    is_regression = cfg.task == "regression"
    langevin_prob = (
        cfg.langevin_prob if langevin_prob_t is None else langevin_prob_t
    )
    swap_interval = (
        cfg.swap_interval if swap_interval_t is None else swap_interval_t
    )
    learn_rate = cfg.learn_rate if learn_rate_t is None else learn_rate_t

    def _w_trace(w_last: jax.Array) -> jax.Array:
        # cfg.record_w_chains: trace only the first k chains' pos_w rows.
        # Under replicated ladders (cfg.n_ladders) "first k chains" would be
        # one cold rung plus hot rungs of ladder 0 — record the first k COLD
        # rungs (stride rungs_per_ladder) instead, so k=n_ladders captures
        # exactly the independent posterior samplers.
        k = cfg.record_w_chains
        if k <= 0:
            return w_last
        if cfg.n_ladders > 1:
            return w_last[:: cfg.rungs_per_ladder][:k]
        return w_last[:k]

    def _eta_trace(eta: jax.Array) -> jax.Array:
        # cfg.record_eta: the same chain selection as _w_trace, so the
        # recorded (w, eta) columns pair up (rounds-driver reference fits
        # need the joint z draws)
        k = cfg.record_w_chains
        if k <= 0:
            return eta
        if cfg.n_ladders > 1:
            return eta[:: cfg.rungs_per_ladder][:k]
        return eta[:k]

    def _swap_due(i) -> jax.Array:
        if swap_interval_t is None:
            return swap_due(cfg, i)
        k = i + cfg.swap_offset
        si = jnp.maximum(swap_interval_t, 1)
        live = jnp.logical_and(
            swap_interval_t > 0, swap_interval_t <= cfg.n_steps
        )
        return jnp.logical_and(
            live, jnp.logical_and(k % si == 0, k > 0)
        )

    has_mask = data.mask_train is not None
    has_w_mask = data.w_mask is not None
    if (has_mask or has_w_mask) and (
        cfg.proposal != "reference" or cfg.use_surrogate
    ):
        raise ValueError(
            "masked (padded) datasets support the reference proposal "
            "machinery only (sweeps.dataset_grid / classification_grid scope)"
        )
    if has_w_mask and cfg.task == "regression":
        raise ValueError(
            "parameter masks target the classification envelope grid; the "
            "regression sets share one topology (and the regression prior's "
            "dimension term is not the parameter count, so a traced "
            "mask-sum would be wrong there)"
        )
    if has_w_mask and cfg.record_fx:
        raise ValueError(
            "record_fx with an envelope-padded classification dataset would "
            "trace per-row predictions of padded rows; run grids with "
            "record_fx=False"
        )
    vr_on = cfg.variational_reference
    if vr_on and (has_mask or has_w_mask):
        raise ValueError(
            "variational_reference is not supported under envelope-padded "
            "(masked) datasets: the fitted q would couple padded coordinates"
        )

    _b_eval, b_prior = _batched_evals(cfg, spec, data)
    if is_regression:
        b_eval_tr = lambda w, x, y, tau, _topo=None: _b_eval(
            w, x, y, tau, data.mask_train
        )
        b_eval_te = lambda w, x, y, tau, _topo=None: _b_eval(
            w, x, y, tau, data.mask_test
        )
    else:
        b_eval_tr = lambda w, x, y, _topo=None: _b_eval(
            w, x, y, data.mask_train
        )
        b_eval_te = lambda w, x, y, _topo=None: _b_eval(
            w, x, y, data.mask_test
        )

    # With step-size adaptation, tie the Langevin drift scale to the adapted
    # step per chain (MALA: drift = (sigma^2/2) grad log pi); cfg.learn_rate
    # is ignored in that combination. Requires the vmapped drift path.
    adapt_tied_drift = (
        cfg.adapt_step_size
        and cfg.use_langevin_gradients
        and spec.drift is not None
    )
    _mask_kw = {}
    if has_mask:
        _mask_kw["mask"] = data.mask_train
    if has_w_mask:
        _mask_kw["w_mask"] = data.w_mask
    if cfg.use_langevin_gradients:
        if adapt_tied_drift:
            b_drift_per = jax.vmap(
                lambda wi, lri: spec.drift(
                    wi, data.x_train, data.t_train, lri, **_mask_kw
                )
            )
        if (has_mask or has_w_mask) and spec.batched_drift is not None:
            raise ValueError(
                "the Pallas drift kernel has no row/parameter-mask support; "
                "use drift_mode='sequential' or 'batch' with padded datasets"
            )
        if spec.batched_drift is not None and jax.default_backend() == "tpu":
            b_drift = lambda w: spec.batched_drift(
                w, data.x_train, data.t_train, learn_rate
            )
        elif spec.batched_drift is not None:
            # off-TPU: the Pallas kernel only runs interpreted (slow); fall
            # back to the bit-compatible sequential scan unless tests force
            # the interpreter via PTNN_PALLAS_INTERPRET
            import os

            if os.environ.get("PTNN_PALLAS_INTERPRET"):
                b_drift = lambda w: spec.batched_drift(
                    w, data.x_train, data.t_train, learn_rate, interpret=True
                )
            else:
                from ptnn.ops import drift as drift_mod

                b_drift = jax.vmap(
                    lambda wi: drift_mod.sgd_epoch_sequential(
                        wi, data.x_train, data.t_train, cfg.topology,
                        learn_rate, unroll=cfg.drift_unroll,
                    )
                )
        else:
            b_drift = jax.vmap(
                lambda wi: spec.drift(
                    wi, data.x_train, data.t_train, learn_rate, **_mask_kw
                )
            )
        if cfg.drift_chain_microbatch > 1:
            # Sequential chain chunks bound drift activation memory (the
            # grad-based CNN drift keeps GBs of conv activations alive per
            # vmapped chain; config.drift_chain_microbatch).
            mb = cfg.drift_chain_microbatch
            _inner_drift = b_drift

            def b_drift(w):
                chunks = w.reshape(mb, c // mb, w_dim)
                return jax.lax.map(_inner_drift, chunks).reshape(c, w_dim)

            if adapt_tied_drift:
                _inner_per = b_drift_per

                def b_drift_per(w, lr):
                    out = jax.lax.map(
                        lambda args: _inner_per(*args),
                        (w.reshape(mb, c // mb, w_dim), lr.reshape(mb, c // mb)),
                    )
                    return out.reshape(c, w_dim)

    # ------------------------------------------------------------------
    # Variational reference for the tempering path (stabilized PT —
    # Surjanovic et al. 2022; ops/vref.py has the math and the exactness
    # argument). Path: log pi_beta = log prior + beta*LL + (1-beta)*corr,
    # with corr(z) = log q(z) - log p(z), q a diagonal Gaussian
    # Welford-fitted to the cold chain during burn-in and frozen at the
    # burn-in boundary (same convention as the preconditioner above).
    # CRITICAL: the reference must cover EVERY latent coordinate the
    # likelihood anchors — for regression z = (w, eta), not just w. At
    # beta=0 the likelihood term vanishes, and a coordinate left out of q
    # falls back to its bare prior; eta's prior -(1+nu1)eta - nu2 e^-eta
    # is monotone in eta, so a w-only reference lets the hot rung's eta
    # random-walk to -inf, its energy E = LL - corr diverges, and the top
    # ladder pair never swaps (measured: pair acceptance 0.00) — replica
    # transport dies exactly where the feature is supposed to create it.
    if vr_on:
        vr_static = cfg.vr_mode == "static"
        vr_full_cov = cfg.vr_family == "full_cov"
        if vr_static:
            # externally fitted reference, fixed for the whole run and
            # active from step 0 (the rounds interface — each round is
            # exactly Markov under its own constant reference)
            vr_start = vr_accum_start = vr_burn_end = 0
        else:
            # activation / accumulation / freeze step indices — shared with
            # the host-side consumers through ops/vref.py:schedule
            vr_start, vr_accum_start, vr_burn_end = vref_mod.schedule(
                cfg.samples_per_chain, cfg.vr_start_frac, cfg.burn_in,
                cfg.warmstart_frac,
            )

        def _vr_z(w, eta):
            """Reference coordinates: (..., W) -> (..., W+1) with eta
            appended for regression; classification's eta is junk."""
            if not is_regression:
                return w
            return jnp.concatenate(
                [w, jnp.asarray(eta)[..., None]], axis=-1
            )

        def _vr_stats(state: ChainState, i):
            """(mu, var) of the fitted q as of step ``i`` (frozen post
            burn-in because the accumulators freeze; constant under
            vr_mode="static", where vr_m2 IS the variance)."""
            if vr_static:
                return state.vr_mean, jnp.maximum(
                    state.vr_m2, vref_mod.VAR_FLOOR
                )
            cnt = jnp.maximum(
                (jnp.minimum(i, vr_burn_end) - vr_accum_start).astype(
                    jnp.float32
                ),
                1.0,
            )
            var = vref_mod.welford_variance(
                state.vr_m2, cnt, cfg.vr_var_inflation
            )
            return state.vr_mean, var

        def _vr_logq(state: ChainState, i, z) -> jax.Array:
            """``log q(z)`` under the active family (up to the shared
            normalizer, which cancels in every consumer's difference)."""
            if vr_full_cov:
                return vref_mod.log_q_chol(z, state.vr_mean, state.vr_chol)
            mu, var = _vr_stats(state, i)
            return vref_mod.log_q_quad(z, mu, var)

        def _vr_sample(state: ChainState, i, key) -> jax.Array:
            """One IID reference draw under the active family."""
            if vr_full_cov:
                return vref_mod.sample_q_chol(
                    key, state.vr_mean, state.vr_chol
                )
            mu, var = _vr_stats(state, i)
            return vref_mod.sample_q(key, mu, var)

        def _vr_logp_ref(w, eta):
            """The z-coordinates' own prior terms (the part of log prior
            that corr replaces): the Gaussian w-part plus, for regression,
            the tau terms -(1+nu1) eta - nu2 e^-eta
            (ops/likelihood.py:regression_log_prior_dim; dimension
            constants are state-independent and dropped)."""
            lp = -0.5 * jnp.sum(jnp.square(w), axis=-1) / cfg.sigma_sq
            if is_regression:
                lp = lp - (1.0 + cfg.nu_1) * eta - cfg.nu_2 * jnp.exp(-eta)
            return lp

        def _vr_corr_z(state: ChainState, i, w, eta) -> jax.Array:
            """Path correction corr(z) = log q(z) - log p(z), zero before
            activation."""
            corr = _vr_logq(state, i, _vr_z(w, eta)) - _vr_logp_ref(w, eta)
            if vr_static:
                return corr  # active from step 0
            return jnp.where(i >= vr_start, corr, jnp.zeros_like(corr))

        def _vr_update(
            state: ChainState, new_state: ChainState, i
        ) -> ChainState:
            """Fold the post-step COLD-chain z into the Welford moments
            (between vr_accum_start and burn-in end; frozen afterwards).
            No-op under vr_mode="static" (the reference never adapts
            in-run)."""
            if vr_static:
                return new_state
            live = jnp.logical_and(i >= vr_accum_start, i < vr_burn_end)
            cnt_new = jnp.maximum(
                (jnp.minimum(i + 1, vr_burn_end) - vr_accum_start).astype(
                    jnp.float32
                ),
                1.0,
            )
            z0 = _vr_z(new_state.w[0], new_state.eta[0])
            mean_new, m2_new = vref_mod.welford_update(
                state.vr_mean, state.vr_m2, z0, cnt_new, live
            )
            return new_state._replace(vr_mean=mean_new, vr_m2=m2_new)

        def _single_val(wi):
            """Temperature/tau-independent likelihood term of ONE
            configuration (same convention as _like_value_and_grad)."""
            if is_regression:
                fx = spec.forward(wi, data.x_train)[:, 0]
                return -0.5 * jnp.sum(jnp.square(data.y_train - fx))
            out = spec.forward(wi, data.x_train)
            logp = spec.log_probs(out)
            yi = data.y_train.astype(jnp.int32)
            return jnp.sum(jnp.take_along_axis(logp, yi[:, None], axis=-1))

        _single_vg = jax.value_and_grad(_single_val)

        if is_regression:
            _single_prior = lambda wi, tau: likelihood.regression_log_prior_dim(
                wi, tau, spec.prior_dim_regression, cfg.sigma_sq, cfg.nu_1,
                cfg.nu_2,
            )
        else:
            _single_prior = lambda wi, tau: likelihood.classification_log_prior_dim(
                wi, spec.prior_dim_classification, cfg.sigma_sq
            )

        def _vr_regen(st: ChainState, i, kr) -> ChainState:
            """Hot-rung regeneration: independence proposal z' ~ q at the
            hottest rung — w AND (regression) eta jointly — exact MH at any
            beta. The raw ratio is dprior + beta dLL + (1-beta) dcorr +
            (log q(z) - log q(z')); since the model prior IS p_ref up to a
            state-independent constant (ops/likelihood.py vs _vr_logp_ref),
            it cancels analytically to

                log_r = beta * (dlogp_ref + dLL - dlogq)

            which is computed in THIS form: the naive form differences
            log-q values that the VAR_FLOOR can push to ~1e8 early in
            accumulation (catastrophic float32 cancellation — measured as
            a spurious beta=0 rejection in the tiny-budget multichip
            dryrun), while here every log-q term carries an exact factor
            of beta, making the beta=0 acceptance identically 1 with all
            terms finite. One single-configuration forward pass per swap
            event."""
            kq, ka = jax.random.split(kr)
            z_new = _vr_sample(st, i, kq)
            if is_regression:
                w_new, eta_new = z_new[:w_dim], z_new[w_dim]
            else:
                w_new, eta_new = z_new, st.eta[-1]
            w_cur = st.w[-1]
            eta_cur = st.eta[-1]
            tau_new = jnp.exp(eta_new)
            beta_hot = 1.0 / temps[-1]  # VR forbids the temper switch
            if st.g_like is not None:
                val_new, g_new = _single_vg(w_new)
            else:
                val_new = _single_val(w_new)
                g_new = None
            if is_regression:
                n_rows = data.y_train.shape[0]
                ll_new = (-0.5 * n_rows) * (
                    likelihood._LOG_2PI + eta_new
                ) + val_new * jnp.exp(-eta_new)
            else:
                ll_new = val_new
            prior_new = _single_prior(w_new, tau_new)
            z_cur = _vr_z(w_cur, eta_cur)
            dlogp_ref = _vr_logp_ref(w_new, eta_new) - _vr_logp_ref(
                w_cur, eta_cur
            )
            dlogq = _vr_logq(st, i, z_new) - _vr_logq(st, i, z_cur)
            log_r = beta_hot * (
                dlogp_ref + (ll_new - st.ll[-1]) - dlogq
            )
            active = i >= vr_start
            u = jax.random.uniform(ka, ())
            acc = jnp.logical_and(
                active, u < jnp.exp(jnp.minimum(log_r, 0.0))
            )
            out = st._replace(
                w=st.w.at[-1].set(jnp.where(acc, w_new, w_cur)),
                eta=st.eta.at[-1].set(jnp.where(acc, eta_new, eta_cur)),
                ll=st.ll.at[-1].set(jnp.where(acc, ll_new, st.ll[-1])),
                prior=st.prior.at[-1].set(
                    jnp.where(acc, prior_new, st.prior[-1])
                ),
                w_last=st.w_last.at[-1].set(
                    jnp.where(acc, w_new, st.w_last[-1])
                ),
                n_regen_accepted=st.n_regen_accepted + acc.astype(jnp.int32),
                n_regen_proposed=st.n_regen_proposed
                + active.astype(jnp.int32),
            )
            if st.g_like is not None:
                out = out._replace(
                    g_like=st.g_like.at[-1].set(
                        jnp.where(acc, g_new, st.g_like[-1])
                    )
                )
            return out

    def propose(state: ChainState, i, kp, kl):
        """Weight proposal + q-ratio correction + langevin counter."""
        if cfg.adapt_step_size:
            sw = jnp.exp(state.log_step_w)[:, None]  # (C, 1)
            sq = (sw * sw)[:, 0]  # (C,)
        else:
            sw = step_w
            sq = sigma_sq_w
        noise = jax.random.normal(kp, (c, w_dim), jnp.float32) * sw
        if has_w_mask:
            # masked (envelope-padded) parameters never move: their noise,
            # drift (masked in the epoch), and q-ratio terms are all zero,
            # so the padded chain is exactly the unpadded chain on the real
            # coordinates
            noise = noise * data.w_mask
        adapttemp = jnp.where(i < switch_step, temps, 1.0)
        if not cfg.use_langevin_gradients:
            return state.w + noise, jnp.zeros((c,), jnp.float32), state.n_langevin
        lx = jax.random.uniform(kl, (c,))
        use_l = lx < langevin_prob
        if adapt_tied_drift:
            lr_chain = 0.5 * jnp.exp(2.0 * state.log_step_w)  # sigma^2/2
            drift_fn = lambda w: b_drift_per(w, lr_chain)
        else:
            drift_fn = b_drift
        w_gd = drift_fn(state.w)
        w_prop = jnp.where(use_l[:, None], w_gd + noise, state.w + noise)
        w_prop_gd = drift_fn(w_prop)
        if cfg.qratio == "reference":
            # Simplified log q-ratio (pt_classification.py:340-351).
            first = (
                -0.5 * jnp.sum(jnp.square(state.w - w_prop_gd), axis=-1) / sq
            )
            second = (
                -0.5 * jnp.sum(jnp.square(w_prop - w_gd), axis=-1) / sq
            )
            diff_prop = jnp.where(use_l, (first - second) / adapttemp, 0.0)
        else:
            # "ldpt_legacy": faithful emulation of the misplaced-parenthesis
            # ratio log(pdf1 - log(pdf2)) with COVARIANCE step_w (the older
            # variants' sigma_diagmat holds step_w, not step_w^2 —
            # Misc_code/ldpt_classifier_multi.py:227,244). pdf1 overflows ->
            # accept; pdf1 underflows with log(pdf2) > 0 -> NaN -> reject.
            # under envelope padding the MVN normalizer must count only the
            # REAL dimensions (traced per-cell scalar) — the legacy ratio's
            # log_norm does not cancel between pdf1 and pdf2
            d = jnp.sum(data.w_mask) if has_w_mask else w_dim
            log_norm = -0.5 * d * jnp.log(2.0 * jnp.pi * step_w)
            log_pdf1 = log_norm - 0.5 * jnp.sum(
                jnp.square(state.w - w_prop_gd), axis=-1
            ) / step_w
            log_pdf2 = log_norm - 0.5 * jnp.sum(
                jnp.square(w_prop - w_gd), axis=-1
            ) / step_w
            arg = jnp.exp(jnp.minimum(log_pdf1, 80.0)) - log_pdf2
            legacy = jnp.where(
                arg > 0.0, jnp.log(jnp.maximum(arg, 1e-30)), -jnp.inf
            )
            diff_prop = jnp.where(use_l, legacy / adapttemp, 0.0)
        return w_prop, diff_prop, state.n_langevin + use_l.astype(jnp.int32)

    # Replicated tempering ensembles (PTConfig.n_ladders): adjacent pairs
    # whose members belong to different ladders are never swap candidates.
    # None (not an all-True array) when off, so the single-ladder path
    # compiles exactly as before.
    swap_pair_mask = None
    if cfg.n_ladders > 1:
        swap_pair_mask = jnp.asarray(
            (np.arange(c - 1) + 1) % cfg.rungs_per_ladder != 0, bool
        )

    def do_swap(state: ChainState, i, ks, pair_penalty=None) -> ChainState:
        adapttemp = jnp.where(i < switch_step, temps, 1.0)
        ks_regen = None
        if vr_on and cfg.vr_regen:
            ks, ks_regen = jax.random.split(ks)
        if vr_on:
            # corrected-path swap energy: the pairwise exponent
            # (beta_i - beta_j)(E_j - E_i) with E = LL - corr is exact for
            # the corrected path (log-prior terms cancel; ops/vref.py)
            payload = state.ll - _vr_corr_z(state, i, state.w, state.eta)
        elif cfg.swap_payload == "tempered":
            payload = state.ll / adapttemp
        elif cfg.swap_payload == "tempered_times_T":
            payload = (state.ll / adapttemp) * temps
        else:  # untempered
            payload = state.ll
        if cfg.swap_style == "even_odd":
            res = swap_mod.disjoint_pair_permutation(
                payload,
                ks,
                rule=cfg.swap_rule,
                betas=1.0 / adapttemp,
                parity=(i // swap_interval) % 2,
                pair_penalty=pair_penalty,
                pair_mask=swap_pair_mask,
            )
        else:
            res = swap_mod.sweep_permutation(
                payload, ks, rule=cfg.swap_rule, betas=1.0 / adapttemp,
                pair_penalty=pair_penalty,
                pair_mask=swap_pair_mask,
            )
        w, eta = swap_mod.apply_permutation(res.perm, state.w, state.eta)
        if cfg.stale_likelihood_after_swap:
            ll, prior = state.ll, state.prior
        else:
            (ll, prior) = swap_mod.apply_permutation(res.perm, state.ll, state.prior)
        out = state._replace(
            w=w,
            eta=eta,
            ll=ll,
            prior=prior,
            n_swap_accepted=state.n_swap_accepted + res.n_accepted,
            n_swap_proposed=state.n_swap_proposed + res.n_proposed,
            pair_accept_sum=state.pair_accept_sum
            + jnp.pad(res.pair_accept.astype(jnp.float32), (0, 1)),
            pair_prop_count=state.pair_prop_count
            + jnp.pad(res.pair_active.astype(jnp.int32), (0, 1)),
        )
        if state.g_like is not None:
            # the cached likelihood gradient belongs to the traveling
            # configuration (it is a function of w alone) — permute with w.
            # Preconditioner/step-size state stays with the RUNG (temperature).
            (g_like,) = swap_mod.apply_permutation(res.perm, state.g_like)
            out = out._replace(g_like=g_like)
        if state.replica_id is not None:
            # identity labels travel with the configuration (ops/roundtrip.py)
            (rid,) = swap_mod.apply_permutation(res.perm, state.replica_id)
            out = out._replace(replica_id=rid)
        if state.sg_anchor_w is not None:
            # SVRG anchors describe the traveling CONFIGURATION (the control
            # variate is a function of w alone) — permute with it, or an
            # accepted swap instantly doubles the centered-estimator
            # variance (stale anchor ~ independent of the new w)
            a_w, a_e, a_f = swap_mod.apply_permutation(
                res.perm,
                state.sg_anchor_w,
                state.sg_anchor_eta,
                state.sg_anchor_full,
            )
            out = out._replace(
                sg_anchor_w=a_w, sg_anchor_eta=a_e, sg_anchor_full=a_f
            )
        if ks_regen is not None:
            # regenerate the hot rung AFTER the sweep: the fresh draw starts
            # flowing toward the cold end at the next swap event
            out = _vr_regen(out, i, ks_regen)
        return out

    def recompute_ll(s: ChainState) -> ChainState:
        """Refresh the carried log-likelihood from the CURRENT (w, eta).

        The reference does this exactly once, at the 60% phase switch
        (pt_classification.py:320-324) — and it matters: it clears the
        stale-likelihood debt accumulated by swaps. Without it, a chain that
        swapped a good likelihood value against a worse w rejects every
        subsequent proposal and freezes. The switch index is STATIC, so the
        sampler splits the scan there and calls this once between segments —
        a per-step lax.cond costs ~15x in XLA compile time for the same
        semantics. (Deviation note: the reference's regression recompute uses
        the *last proposed* tau rather than the accepted one — a one-step
        transient we replace with the accepted eta,
        pt_timeseries_regression.py:322.)
        """
        if is_regression:
            ev = b_eval_tr(s.w, data.x_train, data.y_train, jnp.exp(s.eta))
        else:
            ev = b_eval_tr(s.w, data.x_train, data.y_train)
        return s._replace(ll=ev.loglik)

    if cfg.use_surrogate:
        if surrogate_proj is None:
            # fixed random features, independent of the run seed so every
            # driver (sample/throughput_run/sweeps) agrees
            surrogate_proj = surrogate_mod.make_projection(
                jax.random.PRNGKey(0x5A6A), spec.w_size + 1, cfg.surrogate_proj
            )
        surr_warmup_end = int(cfg.n_steps * cfg.surrogate_warmup_frac)
        # family dispatch (quadratic ridge vs MLP with Adam refits) resolved
        # once at build time; uniform (state, proj, z) signatures
        surr_fam = surrogate_mod.family_for(cfg)

    def _eval_bundle(state, w_prop, eta_prop, tau_prop, do_push=True):
        """True proposal evaluation (the expensive full-dataset pass)."""
        if is_regression:
            ev_tr = b_eval_tr(w_prop, data.x_train, data.y_train, tau_prop)
            ev_te = b_eval_te(w_prop, data.x_test, data.y_test, tau_prop)
            acc_tr_prop = jnp.zeros((c,), jnp.float32)
            acc_te_prop = jnp.zeros((c,), jnp.float32)
        else:
            ev_tr = b_eval_tr(w_prop, data.x_train, data.y_train)
            ev_te = b_eval_te(w_prop, data.x_test, data.y_test)
            acc_tr_prop = ev_tr.acc
            acc_te_prop = ev_te.acc
        out = [ev_tr.loglik, ev_tr.rmse, ev_te.rmse, acc_tr_prop, acc_te_prop]
        if cfg.record_fx:
            out += [ev_tr.fx, ev_te.fx]
        surr = state.surr
        if cfg.use_surrogate and do_push:
            z = jnp.concatenate([w_prop, eta_prop[:, None]], axis=1)
            surr = surrogate_mod.push(surr, z, ev_tr.loglik)
        return tuple(out), surr

    def _surr_bundle(state, w_prop, eta_prop, tau_prop):
        """Surrogate proposal evaluation: skip the dataset pass entirely;
        metrics carry the previous values (no predictions were made)."""
        z = jnp.concatenate([w_prop, eta_prop[:, None]], axis=1)
        ll_prop = surr_fam.predict(state.surr, surrogate_proj, z)
        out = [ll_prop, state.rmse_train, state.rmse_test, state.acc_train,
               state.acc_test]
        if cfg.record_fx:
            out += [state.fx_train, state.fx_test]
        return tuple(out), state.surr

    def _surr_ll(surr, w, eta):
        """Surrogate log-likelihood at (w, eta) -> (C,)."""
        z = jnp.concatenate([w, eta[:, None]], axis=1)
        return surr_fam.predict(surr, surrogate_proj, z)

    def _close_core(st: ChainState, i, kseg):
        """Exact delayed-acceptance segment correction: one true-likelihood
        Metropolis test for the composite surrogate proposal. Returns the
        corrected state plus the fresh ``(z, ll_true, valid)`` surrogate
        training row (the caller pushes it — keeping the ring-buffer write
        OUT of conditional branches, see surrogate.push_masked)."""
        da = st.da
        adapttemp = jnp.where(i < switch_step, temps, 1.0)
        if is_regression:
            tau = jnp.exp(st.eta)
            ev_tr = b_eval_tr(st.w, data.x_train, data.y_train, tau)
            ev_te = b_eval_te(st.w, data.x_test, data.y_test, tau)
            acc_tr = jnp.zeros((c,), jnp.float32)
            acc_te = jnp.zeros((c,), jnp.float32)
        else:
            ev_tr = b_eval_tr(st.w, data.x_train, data.y_train)
            ev_te = b_eval_te(st.w, data.x_test, data.y_test)
            acc_tr, acc_te = ev_tr.acc, ev_te.acc
        ll_true = ev_tr.loglik
        # pi(w_K)/pi(w_0) x s(w_0)/s(w_K); priors cancel (tracked exactly
        # during inner steps on both sides of the inner MH ratio)
        log_corr = (
            (ll_true - st.ll) - (da.ll_surr - da.anchor_llsurr)
        ) / adapttemp
        u = jax.random.uniform(kseg, (c,))
        acc = u < jnp.exp(jnp.minimum(log_corr, 0.0))
        accw = acc[:, None]
        # the fresh true pair is surrogate training data either way
        z = jnp.concatenate([st.w, st.eta[:, None]], axis=1)
        new = st._replace(
            w=jnp.where(accw, st.w, da.anchor_w),
            eta=jnp.where(acc, st.eta, da.anchor_eta),
            ll=jnp.where(acc, ll_true, st.ll),
            prior=jnp.where(acc, st.prior, da.anchor_prior),
            w_last=jnp.where(accw, st.w, st.w_last),
            rmse_train=jnp.where(acc, ev_tr.rmse, st.rmse_train),
            rmse_test=jnp.where(acc, ev_te.rmse, st.rmse_test),
            acc_train=jnp.where(acc, acc_tr, st.acc_train),
            acc_test=jnp.where(acc, acc_te, st.acc_test),
            da=da._replace(
                active=jnp.zeros((), jnp.bool_),
                n_seg_accepted=da.n_seg_accepted + acc.astype(jnp.int32),
            ),
        )
        if cfg.record_fx:
            new = new._replace(
                fx_train=jnp.where(accw, ev_tr.fx, st.fx_train),
                fx_test=jnp.where(accw, ev_te.fx, st.fx_test),
            )
        return new, (z, ll_true, jnp.ones((), jnp.bool_))

    def _close_segment(state: ChainState, i, kseg) -> ChainState:
        """Boundary closure for the sampler (chunk refits, run end): no-op
        when no segment is open; otherwise correct and push the true pair."""

        def close(st: ChainState) -> ChainState:
            new, (z, ll, _v) = _close_core(st, i, kseg)
            return new._replace(surr=surrogate_mod.push(new.surr, z, ll))

        return jax.lax.cond(state.da.active, close, lambda st: st, state)

    def step(state: ChainState, xs) -> Tuple[ChainState, Dict[str, jax.Array]]:
        i, key = xs
        kp, kl, ke, ku, ks, ksu = jax.random.split(key, 6)
        adapttemp = jnp.where(i < switch_step, temps, 1.0)  # (C,)

        w_prop, diff_prop, n_langevin = propose(state, i, kp, kl)

        if is_regression:
            eta_prop = state.eta + cfg.step_eta * jax.random.normal(ke, (c,))
            tau_prop = jnp.exp(eta_prop)
            prior_prop = b_prior(w_prop, tau_prop)
        else:
            eta_prop = state.eta
            tau_prop = jnp.exp(eta_prop)
            prior_prop = b_prior(w_prop)

        if cfg.use_surrogate:
            # global per-step decision: the whole ladder evaluates the
            # surrogate together, so the true dataset pass is skipped
            use_surr = jnp.logical_and(
                jnp.logical_and(
                    i >= surr_warmup_end, state.surr.fitted
                ),
                jax.random.uniform(ksu, ()) < cfg.surrogate_prob,
            )
            bundle, surr = jax.lax.cond(
                use_surr,
                lambda: _surr_bundle(state, w_prop, eta_prop, tau_prop),
                lambda: _eval_bundle(state, w_prop, eta_prop, tau_prop),
            )
        else:
            bundle, surr = _eval_bundle(state, w_prop, eta_prop, tau_prop)
        (ll_prop, rmse_tr_prop, rmse_te_prop, acc_tr_prop, acc_te_prop,
         *fx_props) = bundle

        # Regression records the TEMPERED proposal likelihood
        # (pt_timeseries_regression.py:391); classification records
        # likelihood_proposal * adapttemp == the untempered value (:404).
        ll_record = ll_prop / adapttemp if is_regression else ll_prop
        log_mh = (
            (ll_prop - state.ll) / adapttemp
            + (prior_prop - state.prior)
            + diff_prop
        )
        if vr_on:
            # corrected-path term: (1 - beta) * (corr(z') - corr(z)) — the
            # reference step proposes (w, eta) jointly, so both enter
            log_mh = log_mh + (1.0 - 1.0 / adapttemp) * (
                _vr_corr_z(state, i, w_prop, eta_prop)
                - _vr_corr_z(state, i, state.w, state.eta)
            )
        u = jax.random.uniform(ku, (c,))
        accept = u < jnp.exp(jnp.minimum(log_mh, 0.0))  # = min(1, exp(log_mh))

        trace = {
            "ll": ll_record,
            "rmse_train": jnp.where(accept, rmse_tr_prop, state.rmse_train),
            "rmse_test": jnp.where(accept, rmse_te_prop, state.rmse_test),
            "acc_train": jnp.where(accept, acc_tr_prop, state.acc_train),
            "acc_test": jnp.where(accept, acc_te_prop, state.acc_test),
            # accept_list[i+1] = count BEFORE this step's decision
            # (pt_classification.py:391).
            "accept_count": state.n_accept,
        }

        accept_w = accept[:, None]
        new_state = state._replace(
            w=jnp.where(accept_w, w_prop, state.w),
            eta=jnp.where(accept, eta_prop, state.eta),
            ll=jnp.where(accept, ll_prop, state.ll),
            prior=jnp.where(accept, prior_prop, state.prior),
            w_last=jnp.where(accept_w, w_prop, state.w_last),
            rmse_train=trace["rmse_train"],
            rmse_test=trace["rmse_test"],
            acc_train=trace["acc_train"],
            acc_test=trace["acc_test"],
            n_accept=state.n_accept + accept.astype(jnp.int32),
            n_langevin=n_langevin,
            surr=surr,
        )
        if cfg.adapt_step_size:
            # Robbins-Monro toward the target acceptance during burn-in only
            # (frozen afterwards -> the post-burn-in sampler stays exact)
            # freeze at burn_end-1: trace row r is written by step r-1, so
            # the first retained row (r = burnin) must already be frozen
            burn_end = int(cfg.samples_per_chain * cfg.burn_in) - 1
            mh_prob = jnp.exp(jnp.minimum(log_mh, 0.0))
            delta = cfg.adapt_rate * (mh_prob - cfg.adapt_target_accept)
            new_lsw = jnp.clip(
                state.log_step_w + jnp.where(i < burn_end, delta, 0.0),
                jnp.log(1e-5),
                jnp.log(10.0),
            )
            new_state = new_state._replace(log_step_w=new_lsw)
        if cfg.record_fx:
            # posterior-predictive carries (ldmcmc.py fx_train/fx_test
            # samples, Misc/Misc_code/ldmcmc.py:357-366)
            new_state = new_state._replace(
                fx_train=jnp.where(accept_w, fx_props[0], state.fx_train),
                fx_test=jnp.where(accept_w, fx_props[1], state.fx_test),
            )
            trace["fx_train"] = new_state.fx_train
            trace["fx_test"] = new_state.fx_test
        if cfg.record_w:
            trace["w"] = _w_trace(new_state.w_last)
        if cfg.record_eta and is_regression:
            trace["eta"] = _eta_trace(new_state.eta)

        new_state = jax.lax.cond(
            _swap_due(i),
            lambda s: do_swap(s, i, ks),
            lambda s: s,
            new_state,
        )
        if vr_on:
            new_state = _vr_update(state, new_state, i)
        if cfg.record_ll_state:
            # post-MH, post-swap UNTEMPERED state log-likelihood per rung —
            # the quantity thermodynamic integration needs (ops/evidence.py);
            # unlike trace["ll"] (the reference's proposal-likelihood row)
            # this follows the chain through rejects and swaps
            trace["ll_cur"] = new_state.ll
            if vr_on:
                # per-rung path correction of the same state: the corrected
                # path's TI integrand is E_beta[LL - corr]
                # (ops/evidence.py corrected-path mode). Stats as of i+1 =
                # the trace row's step index; frozen within any valid
                # evidence window (row >= vr_burn_end).
                trace["vr_corr_cur"] = _vr_corr_z(
                    new_state, i + 1, new_state.w, new_state.eta
                )
        if cfg.track_replicas:
            trace["replica"] = new_state.replica_id
        return new_state, trace

    def step_da(state: ChainState, xs) -> Tuple[ChainState, Dict[str, jax.Array]]:
        """Delayed-acceptance step (surrogate_mode="delayed_acceptance").

        Surrogate steps extend an open segment with a cheap inner RW-MH move
        against the surrogate target — no dataset pass, no drift, and the
        chain's carried TRUE likelihood stays frozen at the segment anchor.
        Trace rows repeat the anchor values (the chain has not officially
        moved until the segment's composite proposal is accepted, matching the
        write-on-accept convention of rejects). The first true step after a
        segment first applies the exact correction (_close_segment), then
        proceeds as a normal step from the corrected state. Swap steps are
        forced to be true steps so replica exchange always compares
        segment-corrected true likelihoods.
        """
        i, key = xs
        kp, kl, ke, ku, ks, ksu, kseg = jax.random.split(key, 7)
        adapttemp = jnp.where(i < switch_step, temps, 1.0)  # (C,)
        use_surr = jnp.logical_and(
            jnp.logical_and(i >= surr_warmup_end, state.surr.fitted),
            jax.random.uniform(ksu, ()) < cfg.surrogate_prob,
        )
        use_surr = jnp.logical_and(use_surr, jnp.logical_not(_swap_due(i)))
        zdim = w_dim + 1

        def _null_push():
            return (
                jnp.zeros((c, zdim), jnp.float32),
                jnp.zeros((c,), jnp.float32),
                jnp.zeros((), jnp.bool_),
            )

        def surr_branch(st: ChainState):
            da = st.da
            ll_surr_cur = jnp.where(
                da.active, da.ll_surr, _surr_ll(state.surr, st.w, st.eta)
            )
            da = da._replace(
                anchor_w=jnp.where(da.active, da.anchor_w, st.w),
                anchor_eta=jnp.where(da.active, da.anchor_eta, st.eta),
                anchor_prior=jnp.where(da.active, da.anchor_prior, st.prior),
                anchor_llsurr=jnp.where(da.active, da.anchor_llsurr, ll_surr_cur),
                n_seg=da.n_seg + jnp.where(da.active, 0, 1).astype(jnp.int32),
            )
            # inner proposal: no dataset pass either way (this is where the
            # savings come from) — symmetric RW, or MALA on the ANALYTIC
            # surrogate gradient (a few matvecs) with the standard q-ratio
            if cfg.adapt_step_size:
                sw = jnp.exp(st.log_step_w)[:, None]  # (C, 1)
            else:
                sw = jnp.full((c, 1), step_w, jnp.float32)
            noise = jax.random.normal(kp, (c, w_dim), jnp.float32) * sw
            if is_regression:
                eta_prop = st.eta + cfg.step_eta * jax.random.normal(ke, (c,))
            else:
                eta_prop = st.eta
            diff_q = jnp.zeros((c,), jnp.float32)
            if cfg.surrogate_inner == "mala":
                half = 0.5 * sw * sw  # sigma^2/2, (C, 1)
                z_cur = jnp.concatenate([st.w, st.eta[:, None]], axis=1)
                g_cur = surr_fam.grad_predict(
                    state.surr, surrogate_proj, z_cur
                )[:, :w_dim] / adapttemp[:, None]
                mean_fwd = st.w + half * g_cur
                w_prop = mean_fwd + noise
                z_prop = jnp.concatenate([w_prop, eta_prop[:, None]], axis=1)
                g_prop = surr_fam.grad_predict(
                    state.surr, surrogate_proj, z_prop
                )[:, :w_dim] / adapttemp[:, None]
                mean_rev = w_prop + half * g_prop
                diff_q = (
                    jnp.sum(jnp.square(w_prop - mean_fwd), axis=-1)
                    - jnp.sum(jnp.square(st.w - mean_rev), axis=-1)
                ) / (2.0 * sw[:, 0] * sw[:, 0])
            else:
                w_prop = st.w + noise
            if is_regression:
                prior_prop = b_prior(w_prop, jnp.exp(eta_prop))
            else:
                prior_prop = b_prior(w_prop)
            ll_surr_prop = _surr_ll(state.surr, w_prop, eta_prop)
            log_mh = (
                (ll_surr_prop - ll_surr_cur) / adapttemp
                + (prior_prop - st.prior)
                + diff_q
            )
            u = jax.random.uniform(ku, (c,))
            accept = u < jnp.exp(jnp.minimum(log_mh, 0.0))
            ll_record = ll_surr_prop / adapttemp if is_regression else ll_surr_prop
            trace = {
                "ll": ll_record,
                "rmse_train": st.rmse_train,
                "rmse_test": st.rmse_test,
                "acc_train": st.acc_train,
                "acc_test": st.acc_test,
                "accept_count": st.n_accept,
            }
            if cfg.record_fx:
                trace["fx_train"] = st.fx_train
                trace["fx_test"] = st.fx_test
            if cfg.record_w:
                trace["w"] = _w_trace(st.w_last)
            new_state = st._replace(
                w=jnp.where(accept[:, None], w_prop, st.w),
                eta=jnp.where(accept, eta_prop, st.eta),
                prior=jnp.where(accept, prior_prop, st.prior),
                n_accept=st.n_accept + accept.astype(jnp.int32),
                da=da._replace(
                    ll_surr=jnp.where(accept, ll_surr_prop, ll_surr_cur),
                    active=jnp.ones((), jnp.bool_),
                ),
            )
            return new_state, trace, log_mh, _null_push(), _null_push()

        def _true_core(st: ChainState, push2):
            w_prop, diff_prop, n_langevin = propose(st, i, kp, kl)
            if is_regression:
                eta_prop = st.eta + cfg.step_eta * jax.random.normal(ke, (c,))
                tau_prop = jnp.exp(eta_prop)
                prior_prop = b_prior(w_prop, tau_prop)
            else:
                eta_prop = st.eta
                tau_prop = jnp.exp(eta_prop)
                prior_prop = b_prior(w_prop)
            bundle, _ = _eval_bundle(
                st, w_prop, eta_prop, tau_prop, do_push=False
            )
            (ll_prop, rmse_tr_prop, rmse_te_prop, acc_tr_prop, acc_te_prop,
             *fx_props) = bundle
            push1 = (
                jnp.concatenate([w_prop, eta_prop[:, None]], axis=1),
                ll_prop,
                jnp.ones((), jnp.bool_),
            )
            ll_record = ll_prop / adapttemp if is_regression else ll_prop
            log_mh = (
                (ll_prop - st.ll) / adapttemp
                + (prior_prop - st.prior)
                + diff_prop
            )
            u = jax.random.uniform(ku, (c,))
            accept = u < jnp.exp(jnp.minimum(log_mh, 0.0))
            trace = {
                "ll": ll_record,
                "rmse_train": jnp.where(accept, rmse_tr_prop, st.rmse_train),
                "rmse_test": jnp.where(accept, rmse_te_prop, st.rmse_test),
                "acc_train": jnp.where(accept, acc_tr_prop, st.acc_train),
                "acc_test": jnp.where(accept, acc_te_prop, st.acc_test),
                "accept_count": st.n_accept,
            }
            accept_w = accept[:, None]
            new_state = st._replace(
                w=jnp.where(accept_w, w_prop, st.w),
                eta=jnp.where(accept, eta_prop, st.eta),
                ll=jnp.where(accept, ll_prop, st.ll),
                prior=jnp.where(accept, prior_prop, st.prior),
                w_last=jnp.where(accept_w, w_prop, st.w_last),
                rmse_train=trace["rmse_train"],
                rmse_test=trace["rmse_test"],
                acc_train=trace["acc_train"],
                acc_test=trace["acc_test"],
                n_accept=st.n_accept + accept.astype(jnp.int32),
                n_langevin=n_langevin,
            )
            if cfg.record_fx:
                new_state = new_state._replace(
                    fx_train=jnp.where(accept_w, fx_props[0], st.fx_train),
                    fx_test=jnp.where(accept_w, fx_props[1], st.fx_test),
                )
                trace["fx_train"] = new_state.fx_train
                trace["fx_test"] = new_state.fx_test
            if cfg.record_w:
                trace["w"] = _w_trace(new_state.w_last)
            return new_state, trace, log_mh, push1, push2

        def plain_branch(st: ChainState):
            return _true_core(st, _null_push())

        def closure_branch(st: ChainState):
            st2, push2 = _close_core(st, i, kseg)
            return _true_core(st2, push2)

        # one 3-way switch per step (plain true step / segment-closing true
        # step / surrogate inner step) with the ring-buffer pushes hoisted
        # outside as masked writes — nested conditionals and in-branch buffer
        # updates were the dominant bookkeeping overhead on TPU
        case = jnp.where(
            use_surr, 2, jnp.where(state.da.active, 1, 0)
        ).astype(jnp.int32)
        # the ring buffer stays OUT of the switch: branches read only the
        # surrogate coefficients (closure-captured theta); buffer writes are
        # the masked pushes below
        new_state, trace, log_mh, p1, p2 = jax.lax.switch(
            case,
            [plain_branch, closure_branch, surr_branch],
            state._replace(surr=None),
        )
        surr = surrogate_mod.push_masked(state.surr, *p2)
        surr = surrogate_mod.push_masked(surr, *p1)
        new_state = new_state._replace(surr=surr)
        if cfg.adapt_step_size:
            burn_end = int(cfg.samples_per_chain * cfg.burn_in) - 1
            mh_prob = jnp.exp(jnp.minimum(log_mh, 0.0))
            delta = cfg.adapt_rate * (mh_prob - cfg.adapt_target_accept)
            new_lsw = jnp.clip(
                new_state.log_step_w + jnp.where(i < burn_end, delta, 0.0),
                jnp.log(1e-5),
                jnp.log(10.0),
            )
            new_state = new_state._replace(log_step_w=new_lsw)
        new_state = jax.lax.cond(
            _swap_due(i),
            lambda s: do_swap(s, i, ks),
            lambda s: s,
            new_state,
        )
        if cfg.record_ll_state:
            trace["ll_cur"] = new_state.ll
        if cfg.track_replicas:
            trace["replica"] = new_state.replica_id
        return new_state, trace

    if cfg.proposal in ("precond_rw", "precond_mala", "hmc", "pcn"):
        is_mala = cfg.proposal == "precond_mala"
        is_hmc = cfg.proposal == "hmc"
        is_pcn = cfg.proposal == "pcn"
        chees_on = is_hmc and cfg.hmc_adapt_traj
        grad_mode = is_mala or is_hmc
        pc_start = int(cfg.samples_per_chain * cfg.precond_start_frac)
        burn_end_p = int(cfg.samples_per_chain * cfg.burn_in) - 1
        if is_hmc:
            target_acc = cfg.hmc_target_accept
        elif is_mala:
            target_acc = cfg.mala_target_accept
        else:
            target_acc = cfg.adapt_target_accept
        n_train = data.y_train.shape[0]
        warm_end = (
            int(cfg.samples_per_chain * cfg.warmstart_frac)
            if grad_mode
            else 0
        )
        if grad_mode:
            b_vg = _like_value_and_grad(cfg, spec, data)

        def _precond_diag(state: ChainState, i) -> jax.Array:
            """Per-chain diagonal mass matrix from the Welford buffers:
            normalized per-parameter posterior variance (the overall scale
            lives in the adapted sigma). Identity until ``pc_start``;
            constant after burn-in because the accumulators freeze."""
            cnt = jnp.maximum(
                (jnp.minimum(i, burn_end_p) - warm_end).astype(jnp.float32),
                1.0,
            )
            var = state.pc_m2 / cnt
            m = var / jnp.maximum(jnp.mean(var, axis=1, keepdims=True), 1e-30)
            m = jnp.clip(m, 1e-4, 1e4)
            if cfg.precond_power != 1.0:
                # geometric shrinkage toward identity (config.precond_power)
                m = jnp.power(m, cfg.precond_power)
            return jnp.where(i >= pc_start, m, jnp.ones_like(m))

        def _g_post(g_like, w, tau_sq, adapttemp, vr_args=None):
            """Tempered-posterior gradient from the cached likelihood-term
            gradient: g_like/(tau^2 adapttemp) - w/sigma^2 (regression) or
            g_like/adapttemp - w/sigma^2 (classification). Under the
            variational-reference path, ``vr_args = (state, i, active,
            eta)`` adds the (1 - beta) * grad_w corr term (ops/vref.py).
            ``eta`` enters because the full-covariance family couples the
            w and eta coordinates of z; the diagonal family's w-gradient
            is eta-free."""
            g = g_like / tau_sq[:, None] if is_regression else g_like
            out = g / adapttemp[:, None] - w / cfg.sigma_sq
            if vr_args is not None:
                vr_state, vr_i, active, vr_eta = vr_args
                if cfg.vr_family == "full_cov":
                    # grad_w corr = grad_w log q(z) + w / sigma^2
                    gz = vref_mod.grad_logq_chol(
                        _vr_z(w, vr_eta), vr_state.vr_mean, vr_state.vr_chol
                    )
                    gc = gz[..., : w.shape[-1]] + w / cfg.sigma_sq
                else:
                    mu, var = _vr_stats(vr_state, vr_i)
                    # w-coordinates of the fitted z-reference (regression
                    # appends eta as the last coordinate)
                    gc = vref_mod.grad_correction(
                        w, mu[: w.shape[-1]], var[: w.shape[-1]],
                        cfg.sigma_sq,
                    )
                out = out + jnp.where(active, 1.0, 0.0) * (
                    1.0 - 1.0 / adapttemp
                )[:, None] * gc
            return out

        ETA_TARGET_ACCEPT = 0.44  # 1-D RW-MH optimum (Gelman/Roberts/Gilks)

        def step_precond(
            state: ChainState, xs
        ) -> Tuple[ChainState, Dict[str, jax.Array]]:
            """Preconditioned proposal step (precond_rw / precond_mala / hmc).

            TPU-first flagship mode, not reference behavior. Two MH blocks
            per step (componentwise Metropolis-within-Gibbs — each block
            leaves the tempered posterior invariant, so their composition
            does):

            1. w-block: preconditioned RW, MALA, or HMC move on the weights
               at fixed eta, with the exact q-ratio (Gaussian reverse kernel
               for RW/MALA; kinetic-energy difference for HMC).
               Its per-chain scale adapts on the block's OWN acceptance
               probability — a joint (w, eta) decision would let the
               fixed-scale eta walk pin joint acceptance below the MALA
               target and drive sigma_w into a death spiral (observed:
               sigma -> the clip floor, chain frozen between swaps).
            2. eta-block (regression only): RW move on the log noise
               variance with its own adapted scale. Needs NO dataset pass —
               the tau-independent ``-SSE/2`` is recovered algebraically
               from the carried log-likelihood, so the block is a handful
               of scalar ops per chain.

            All scales and the Welford preconditioner freeze at burn-in end;
            the post-burn-in sampler is an exact MH kernel per chain.
            """
            i, key = xs
            kp, ke, ku, kue, ks = jax.random.split(key, 5)
            adapttemp = jnp.where(i < switch_step, temps, 1.0)  # (C,)
            sig = jnp.exp(state.log_step_w)  # (C,)
            m = _precond_diag(state, i)  # (C, W)
            tau_cur = jnp.exp(state.eta)  # (C,)
            vr_args = None
            if vr_on:
                # eta is fixed through the whole w-block (the eta block
                # runs after), so the current eta is correct at every
                # gradient evaluation point along the trajectory
                vr_args = (state, i, i >= vr_start, state.eta)
            if grad_mode:
                g_cur = _g_post(
                    state.g_like, state.w, tau_cur, adapttemp, vr_args
                )
            g_like_prop = None
            fx_props = []
            if is_hmc:
                # Preconditioned HMC trajectory (PTConfig.proposal "hmc").
                # Mass matrix M = diag(1/m) — m the position-space Welford
                # preconditioner — so momentum p ~ N(0, 1/m), kinetic energy
                # K = 0.5 * sum(m p^2), position step dw = eps * m * p. With
                # L=1 the leapfrog composes to exactly the precond_mala
                # proposal with sigma = eps, and for any L the integrator is
                # reversible + volume-preserving, so the MH correction is
                # the total energy change: the q-ratio IS K_init - K_end.
                # The gradient cache seeds the first half-kick (no recompute
                # at the current point); the trajectory-end gradient becomes
                # the cache on accept.
                kp, kj = jax.random.split(kp)
                eps = sig
                if cfg.hmc_eps_jitter > 0.0:
                    # independent-of-state step jitter breaks periodic orbits
                    eps = eps * (
                        1.0
                        + cfg.hmc_eps_jitter
                        * (2.0 * jax.random.uniform(kj, (c,)) - 1.0)
                    )
                epsw = eps[:, None]
                l_steps = None
                if chees_on:
                    # ChEES (config.hmc_adapt_traj): jittered trajectory
                    # length tau = u_i * exp(log_traj); realized leapfrog
                    # count per chain, masked inside the static-length scan
                    # (all chains pay hmc_leapfrog gradient evals — SIMD)
                    u_traj = vdc_u(i)
                    tau_traj = jnp.exp(state.log_traj) * u_traj  # (C,)
                    l_steps = jnp.clip(
                        jnp.ceil(tau_traj / eps), 1.0, float(cfg.hmc_leapfrog)
                    ).astype(jnp.int32)
                p0 = jax.random.normal(
                    kp, (c, w_dim), jnp.float32
                ) / jnp.sqrt(m)
                k_init = 0.5 * jnp.sum(m * jnp.square(p0), axis=-1)
                (vsh, ash), _gsh = jax.eval_shape(b_vg, state.w)

                def leap(cr, n):
                    w_c, p_c, g_c, gl_c, v_c, a_c = cr
                    p_half = p_c + 0.5 * epsw * g_c
                    w_n = w_c + epsw * m * p_half
                    (v_n, a_n), gl_n = b_vg(w_n)
                    g_n = _g_post(gl_n, w_n, tau_cur, adapttemp, vr_args)
                    p_n = p_half + 0.5 * epsw * g_n
                    if chees_on:
                        # chains whose trajectory already ended carry through
                        upd = n < l_steps
                        uw = upd[:, None]
                        w_n = jnp.where(uw, w_n, w_c)
                        p_n = jnp.where(uw, p_n, p_c)
                        g_n = jnp.where(uw, g_n, g_c)
                        gl_n = jnp.where(uw, gl_n, gl_c)
                        v_n = jnp.where(upd, v_n, v_c)
                        a_n = jnp.where(
                            upd.reshape((c,) + (1,) * (a_n.ndim - 1)),
                            a_n,
                            a_c,
                        )
                    return (w_n, p_n, g_n, gl_n, v_n, a_n), None

                carry0 = (
                    state.w,
                    p0,
                    g_cur,
                    state.g_like,
                    jnp.zeros(vsh.shape, vsh.dtype),
                    jnp.zeros(ash.shape, ash.dtype),
                )
                (w_prop, p_end, _ge, g_like_prop, val, aux), _ = jax.lax.scan(
                    leap,
                    carry0,
                    jnp.arange(cfg.hmc_leapfrog, dtype=jnp.int32),
                )
                k_end = 0.5 * jnp.sum(m * jnp.square(p_end), axis=-1)
                diff_hmc = k_init - k_end
            elif is_pcn:
                # preconditioned Crank-Nicolson: AR(1) move reversible
                # w.r.t. the N(0, sigma_sq I) weight prior. The adapted
                # scale doubles as rho (capped at 1 = independence sampler
                # from the prior). Deliberately NOT preconditioned by the
                # Welford m: prior-reversibility requires the prior metric.
                rho = jnp.minimum(sig, 1.0)[:, None]
                xi = jnp.sqrt(cfg.sigma_sq) * jax.random.normal(
                    kp, (c, w_dim), jnp.float32
                )
                w_prop = jnp.sqrt(1.0 - rho * rho) * state.w + rho * xi
            else:
                noise = (
                    jax.random.normal(kp, (c, w_dim), jnp.float32)
                    * sig[:, None]
                    * jnp.sqrt(m)
                )
                if is_mala:
                    sig2m = (sig * sig)[:, None] * m
                    mean_fwd = state.w + 0.5 * sig2m * g_cur
                else:
                    mean_fwd = state.w
                w_prop = mean_fwd + noise
            if warm_end > 0:
                # deterministic warm start: per-coordinate-RMS-normalized
                # gradient ascent on the tempered log posterior (see
                # PTConfig.warmstart_frac — an initialization scheme, forced
                # accept below, all adaptation masked until it ends)
                g_rms = jnp.sqrt(
                    jnp.mean(jnp.square(g_cur), axis=-1, keepdims=True)
                )
                w_warm = state.w + cfg.warmstart_step * g_cur / jnp.maximum(
                    g_rms, 1e-12
                )
                w_prop = jnp.where(i < warm_end, w_warm, w_prop)
                if is_hmc:
                    # the trajectory evaluated (val, aux, grad) at its own
                    # endpoint; during the forced-accept warm phase the
                    # proposal is w_warm instead — re-evaluate there
                    (val, aux), g_like_prop = jax.lax.cond(
                        i < warm_end,
                        lambda: b_vg(w_warm),
                        lambda: ((val, aux), g_like_prop),
                    )
            prior_prop = (
                b_prior(w_prop, tau_cur) if is_regression else b_prior(w_prop)
            )

            if grad_mode:
                if is_mala:
                    # one fused fwd+bwd: proposal likelihood AND its gradient
                    (val, aux), g_like_prop = b_vg(w_prop)
                if is_regression:
                    ll_prop = (-0.5 * n_train) * (
                        likelihood._LOG_2PI + state.eta
                    ) + val / tau_cur
                    rmse_tr_prop = jnp.sqrt(-2.0 * val / n_train)
                    acc_tr_prop = jnp.zeros((c,), jnp.float32)
                    ev_te = b_eval_te(w_prop, data.x_test, data.y_test, tau_cur)
                    acc_te_prop = jnp.zeros((c,), jnp.float32)
                    if cfg.record_fx:
                        fx_props = [aux, ev_te.fx]
                else:
                    ll_prop = val
                    pred = jnp.argmax(aux, axis=-1).astype(jnp.float32)
                    yf = data.y_train.astype(jnp.float32)[None, :]
                    rmse_tr_prop = jnp.sqrt(
                        jnp.mean(jnp.square(pred - yf), axis=-1)
                    )
                    acc_tr_prop = 100.0 * jnp.mean(
                        (pred == yf).astype(jnp.float32), axis=-1
                    )
                    ev_te = b_eval_te(w_prop, data.x_test, data.y_test)
                    acc_te_prop = ev_te.acc
                    if cfg.record_fx:
                        fx_props = [pred, ev_te.fx]
                rmse_te_prop = ev_te.rmse
                if is_hmc:
                    # leapfrog is reversible + volume-preserving: the MH
                    # correction is the kinetic-energy difference
                    diff_prop = diff_hmc
                else:
                    # exact reverse-kernel q-ratio for the preconditioned
                    # Gaussian proposal (eta is fixed in this block, so both
                    # directions scale the cached gradient by the same tau)
                    g_prop = _g_post(
                        g_like_prop, w_prop, tau_cur, adapttemp, vr_args
                    )
                    mean_rev = w_prop + 0.5 * sig2m * g_prop
                    diff_prop = (
                        jnp.sum(jnp.square(w_prop - mean_fwd) / m, axis=-1)
                        - jnp.sum(jnp.square(state.w - mean_rev) / m, axis=-1)
                    ) / (2.0 * sig * sig)
            else:
                bundle, _ = _eval_bundle(state, w_prop, state.eta, tau_cur)
                (ll_prop, rmse_tr_prop, rmse_te_prop, acc_tr_prop,
                 acc_te_prop, *fx_props) = bundle
                if is_pcn:
                    # pCN q-ratio: log q(w|w') - log q(w'|w) =
                    # (|w'|^2 - |w|^2) / (2 sigma_sq) — exactly the negated
                    # Gaussian w-prior difference, so the generic log_mh
                    # below reduces to the tempered likelihood ratio (plus
                    # the unchanged tau-prior terms, which cancel at fixed
                    # eta). Cotter et al. 2013 thm 4.1 / Rudolf-Sprungk.
                    diff_prop = (
                        jnp.sum(jnp.square(w_prop), axis=-1)
                        - jnp.sum(jnp.square(state.w), axis=-1)
                    ) / (2.0 * cfg.sigma_sq)
                else:
                    diff_prop = jnp.zeros((c,), jnp.float32)

            ll_record = ll_prop / adapttemp if is_regression else ll_prop
            log_mh = (
                (ll_prop - state.ll) / adapttemp
                + (prior_prop - state.prior)
                + diff_prop
            )
            if vr_on:
                # eta is FIXED in this block, so its corr terms cancel —
                # pass the current eta on both sides
                log_mh = log_mh + (1.0 - 1.0 / adapttemp) * (
                    _vr_corr_z(state, i, w_prop, state.eta)
                    - _vr_corr_z(state, i, state.w, state.eta)
                )
            u = jax.random.uniform(ku, (c,))
            accept = u < jnp.exp(jnp.minimum(log_mh, 0.0))
            if warm_end > 0:
                accept = jnp.logical_or(accept, i < warm_end)
            trace = {
                "ll": ll_record,
                "rmse_train": jnp.where(accept, rmse_tr_prop, state.rmse_train),
                "rmse_test": jnp.where(accept, rmse_te_prop, state.rmse_test),
                "acc_train": jnp.where(accept, acc_tr_prop, state.acc_train),
                "acc_test": jnp.where(accept, acc_te_prop, state.acc_test),
                "accept_count": state.n_accept,
            }
            accept_w = accept[:, None]
            new_state = state._replace(
                w=jnp.where(accept_w, w_prop, state.w),
                ll=jnp.where(accept, ll_prop, state.ll),
                prior=jnp.where(accept, prior_prop, state.prior),
                w_last=jnp.where(accept_w, w_prop, state.w_last),
                rmse_train=trace["rmse_train"],
                rmse_test=trace["rmse_test"],
                acc_train=trace["acc_train"],
                acc_test=trace["acc_test"],
                n_accept=state.n_accept + accept.astype(jnp.int32),
            )
            if grad_mode:
                new_state = new_state._replace(
                    g_like=jnp.where(accept_w, g_like_prop, state.g_like)
                )
            if cfg.record_fx:
                new_state = new_state._replace(
                    fx_train=jnp.where(accept_w, fx_props[0], state.fx_train),
                    fx_test=jnp.where(accept_w, fx_props[1], state.fx_test),
                )
                trace["fx_train"] = new_state.fx_train
                trace["fx_test"] = new_state.fx_test
            if cfg.record_w:
                trace["w"] = _w_trace(new_state.w_last)
            if cfg.record_eta and is_regression:
                # paired with this row's w: the post-w-block, pre-eta-block
                # state (a coherent point of the kernel cycle)
                trace["eta"] = _eta_trace(new_state.eta)

            if is_regression:
                # eta-block: RW-MH on log noise variance, dataset-free.
                # val = -SSE/2 recovered from the carried ll:
                #   ll = -N/2 (log 2pi + eta) + val * e^-eta
                sig_e = jnp.exp(state.log_step_eta)
                eta_prop = state.eta + sig_e * jax.random.normal(ke, (c,))
                val_cur = (
                    new_state.ll
                    + 0.5 * n_train * (likelihood._LOG_2PI + state.eta)
                ) * jnp.exp(state.eta)
                ll_eta = (-0.5 * n_train) * (
                    likelihood._LOG_2PI + eta_prop
                ) + val_cur * jnp.exp(-eta_prop)
                # prior tau terms: -(1+nu1) log tau^2 - nu2 / tau^2
                dprior = -(1.0 + cfg.nu_1) * (eta_prop - state.eta) - cfg.nu_2 * (
                    jnp.exp(-eta_prop) - jnp.exp(-state.eta)
                )
                log_mh_e = (ll_eta - new_state.ll) / adapttemp + dprior
                if vr_on:
                    # eta's share of the path correction: (1 - beta) *
                    # (dlog q_eta - dlog p_eta); dlog p_eta IS dprior.
                    # Without this the beta=0 rung's eta would sample its
                    # bare (monotone) prior and run away — see the VR block
                    # comment above.
                    if cfg.vr_family == "full_cov":
                        # the family couples w and eta: difference the
                        # joint log q at the post-w-block weights
                        dlogq_e = _vr_logq(
                            state, i, _vr_z(new_state.w, eta_prop)
                        ) - _vr_logq(
                            state, i, _vr_z(new_state.w, state.eta)
                        )
                    else:
                        vr_mu, vr_var = _vr_stats(state, i)
                        mu_e, var_e = vr_mu[w_dim], vr_var[w_dim]
                        dlogq_e = -0.5 * (
                            jnp.square(eta_prop - mu_e)
                            - jnp.square(state.eta - mu_e)
                        ) / var_e
                    log_mh_e = log_mh_e + jnp.where(
                        i >= vr_start, 1.0, 0.0
                    ) * (1.0 - 1.0 / adapttemp) * (dlogq_e - dprior)
                ue = jax.random.uniform(kue, (c,))
                acc_e = ue < jnp.exp(jnp.minimum(log_mh_e, 0.0))
                new_state = new_state._replace(
                    eta=jnp.where(acc_e, eta_prop, state.eta),
                    ll=jnp.where(acc_e, ll_eta, new_state.ll),
                    prior=new_state.prior + jnp.where(acc_e, dprior, 0.0),
                )
                mh_e_prob = jnp.exp(jnp.minimum(log_mh_e, 0.0))
                new_lse = jnp.clip(
                    state.log_step_eta
                    + jnp.where(
                        i < burn_end_p,
                        cfg.adapt_rate * (mh_e_prob - ETA_TARGET_ACCEPT),
                        0.0,
                    ),
                    jnp.log(1e-4),
                    jnp.log(10.0),
                )
                new_state = new_state._replace(log_step_eta=new_lse)

            # Welford accumulation of the post-decision w (between warm-start
            # end and burn-in end, so the preconditioner is estimated around
            # the landed mode and freezes with the adaptation)
            upd = jnp.logical_and(i >= warm_end, i < burn_end_p).astype(
                jnp.float32
            )
            cnt_new = jnp.maximum(
                (jnp.minimum(i + 1, burn_end_p) - warm_end).astype(
                    jnp.float32
                ),
                1.0,
            )
            delta = new_state.w - state.pc_mean
            mean_new = state.pc_mean + upd * delta / jnp.maximum(cnt_new, 1.0)
            m2_new = state.pc_m2 + upd * delta * (new_state.w - mean_new)
            # Robbins-Monro on the per-chain w-scale, driven by the w-block's
            # own acceptance (frozen after burn-in, same freeze index as the
            # adapt_step_size path)
            mh_prob = jnp.exp(jnp.minimum(log_mh, 0.0))
            dlt = cfg.adapt_rate * (mh_prob - target_acc)
            new_lsw = jnp.clip(
                state.log_step_w
                + jnp.where(
                    jnp.logical_and(i >= warm_end, i < burn_end_p), dlt, 0.0
                ),
                jnp.log(1e-6),
                jnp.log(10.0),
            )
            new_state = new_state._replace(
                log_step_w=new_lsw, pc_mean=mean_new, pc_m2=m2_new
            )
            if chees_on:
                # ChEES gradient ascent on log trajectory length (Hoffman
                # et al. 2021 eq. 8, adapted to tempering): expectations are
                # per-RUNG means over the R ladder replicas; norms/inner
                # products live in the preconditioned metric z = sqrt(m) w,
                # where |z|^2 = sum(m w^2) and <z' - zbar', p'_z> reduces to
                # the PLAIN <w' - wbar', p'> (p_z = p / sqrt(m) cancels m).
                n_lad, k_rung = cfg.n_ladders, cfg.rungs_per_ladder

                def _rung_mean(x):
                    xr = x.reshape(n_lad, k_rung, -1)
                    mu = jnp.mean(xr, axis=0, keepdims=True)
                    return jnp.broadcast_to(mu, xr.shape).reshape(c, -1)

                dxp = w_prop - _rung_mean(w_prop)
                dx = state.w - _rung_mean(state.w)
                dsq = jnp.sum(m * jnp.square(dxp), -1) - jnp.sum(
                    m * jnp.square(dx), -1
                )
                inner = jnp.sum(dxp * p_end, -1)
                # per-chain estimator, acceptance-weighted and rung-averaged
                g_c = mh_prob * dsq * inner * u_traj
                wsum = jnp.maximum(mh_prob.reshape(n_lad, k_rung).sum(0), 1e-6)
                g_rung = jnp.broadcast_to(
                    (g_c.reshape(n_lad, k_rung).sum(0) / wsum)[None, :],
                    (n_lad, k_rung),
                ).reshape(c)
                # chain rule to log-space (d tau / d log_traj = tau), then
                # Adam; frozen with everything else at burn-in end
                g_log = g_rung * tau_traj
                live_tr = jnp.logical_and(i >= warm_end, i < burn_end_p)
                t_ad = jnp.maximum(
                    (jnp.minimum(i, burn_end_p) - warm_end).astype(
                        jnp.float32
                    )
                    + 1.0,
                    1.0,
                )
                m1 = jnp.where(
                    live_tr, 0.9 * state.chees_m1 + 0.1 * g_log, state.chees_m1
                )
                v2 = jnp.where(
                    live_tr,
                    0.999 * state.chees_v2 + 0.001 * jnp.square(g_log),
                    state.chees_v2,
                )
                step_ad = (
                    cfg.chees_rate
                    * (m1 / (1.0 - 0.9**t_ad))
                    / (jnp.sqrt(v2 / (1.0 - 0.999**t_ad)) + 1e-8)
                )
                new_lt = jnp.clip(
                    state.log_traj + jnp.where(live_tr, step_ad, 0.0),
                    jnp.log(1e-4),
                    # cap the MEAN length at what the static bound can
                    # realize (u <= 1), else the gradient pushes into a
                    # regime the clip on l_steps silently ignores
                    jnp.log(eps * cfg.hmc_leapfrog),
                )
                new_state = new_state._replace(
                    log_traj=new_lt, chees_m1=m1, chees_v2=v2
                )
                trace["traj_len"] = l_steps.astype(jnp.float32)
            new_state = jax.lax.cond(
                _swap_due(i),
                lambda s: do_swap(s, i, ks),
                lambda s: s,
                new_state,
            )
            if vr_on:
                new_state = _vr_update(state, new_state, i)
            if cfg.record_ll_state:
                trace["ll_cur"] = new_state.ll
                if vr_on:
                    # corrected-path TI integrand ingredient (see step())
                    trace["vr_corr_cur"] = _vr_corr_z(
                        new_state, i + 1, new_state.w, new_state.eta
                    )
            if cfg.track_replicas:
                trace["replica"] = new_state.replica_id
            return new_state, trace

    def refit_surrogate(st: ChainState) -> ChainState:
        """Refit the surrogate on the current buffer (sampler calls this at
        chunk boundaries, together with recompute_ll to re-anchor)."""
        return st._replace(surr=surr_fam.fit(st.surr, surrogate_proj))

    # ------------------------------------------------------------------
    # Replica-exchange stochastic-gradient Langevin dynamics (reSGLD —
    # Deng et al. 2020; PAPERS.md arxiv 2301.01898 / 2010.01084). Per step,
    # ONE shared minibatch of sg_batch rows drives an unadjusted Langevin
    # move on (w, eta) per rung; the per-step cost is O(C·B·forward) instead
    # of O(C·N·forward). Deliberately APPROXIMATE within chains (no MH —
    # discretization + subsampling bias, the standard SG-MCMC trade);
    # swaps per cfg.sg_swap: "exact" refreshes full-data energies at swap
    # cadence (amortized 1/swap_interval), "corrected" swaps on minibatch
    # energy estimates with the variance-corrected exponent (the unbiased
    # noisy-energy exchange test), never touching the full train set.
    if cfg.proposal == "sgld":
        n_train_s = data.y_train.shape[0]
        bsz = min(cfg.sg_batch, n_train_s)
        scale = n_train_s / bsz
        betas_run = 1.0 / temps  # canonical schedule (validated: no switch)
        # Per-rung Euler step (cfg.sg_lr_scale; the reSGLD line runs hot
        # chains at larger learning rates — Deng et al. 2020, PAPERS.md
        # arxiv 2301.01898): "temperature" sets eps_k = sg_step * T_k (hot
        # rungs explore, discretization bias is cheap there; the cold rung
        # keeps sg_step). (C,) vector; swap energies are eps-independent so
        # the exchange test is untouched.
        if cfg.sg_lr_scale == "temperature":
            eps_c = cfg.sg_step * temps
        else:
            eps_c = cfg.sg_step * jnp.ones_like(temps)
        eps = eps_c[:, None]  # broadcast over the (C, W) weight plane

        if is_regression:

            def _per_mb(wi, xb, yb):
                """tau-independent per-example term: -(y - fx)^2 / 2."""
                fx = spec.forward(wi, xb)[:, 0]
                per = -0.5 * jnp.square(yb - fx)
                return jnp.sum(per), per
        else:

            def _per_mb(wi, xb, yb):
                out = spec.forward(wi, xb)
                logp = spec.log_probs(out)
                yi = yb.astype(jnp.int32)
                per = jnp.take_along_axis(logp, yi[:, None], axis=-1)[:, 0]
                return jnp.sum(per), per

        _vg_mb = jax.vmap(
            jax.value_and_grad(_per_mb, has_aux=True), in_axes=(0, None, None)
        )
        _per_only = jax.vmap(
            lambda wi, xb, yb: _per_mb(wi, xb, yb)[1], in_axes=(0, None, None)
        )
        if not is_regression:
            _hit_mb = jax.vmap(
                lambda wi, xb, yb: (
                    spec.forward(wi, xb).argmax(axis=-1)
                    == yb.astype(jnp.int32)
                ).astype(jnp.float32),
                in_axes=(0, None, None),
            )

        def _gather_batch(kb):
            # without-replacement (permutation prefix): unbiased like
            # with-replacement, but sg_batch = N degenerates to EXACTLY the
            # full batch (estimator variance 0, penalty 0, gradient exact) —
            # the invariant tests/test_sgld.py pins. The with-replacement
            # variance formula used for the corrected penalty then slightly
            # overestimates (missing the finite-population factor), i.e.
            # the swap test is conservative, never anti-conservative.
            idx = jax.random.permutation(kb, n_train_s)[:bsz]
            return (
                jnp.take(data.x_train, idx, axis=0),
                jnp.take(data.y_train, idx, axis=0),
            )

        def _refresh_full(s: ChainState) -> ChainState:
            """Full-data energy + metric refresh (sg_swap='exact')."""
            tau_s = jnp.exp(s.eta)
            if is_regression:
                ev_tr = b_eval_tr(s.w, data.x_train, data.y_train, tau_s)
                ev_te = b_eval_te(s.w, data.x_test, data.y_test, tau_s)
                prior_s = b_prior(s.w, tau_s)
                acc_tr, acc_te = s.acc_train, s.acc_test
            else:
                ev_tr = b_eval_tr(s.w, data.x_train, data.y_train)
                ev_te = b_eval_te(s.w, data.x_test, data.y_test)
                prior_s = b_prior(s.w)
                acc_tr, acc_te = ev_tr.acc, ev_te.acc
            return s._replace(
                ll=ev_tr.loglik, prior=prior_s,
                rmse_train=ev_tr.rmse, rmse_test=ev_te.rmse,
                acc_train=acc_tr, acc_test=acc_te,
            )

        def _corrected_swap(s: ChainState, i, ks) -> ChainState:
            """Minibatch-energy swap with the variance-corrected exponent.

            Estimator E_hat = (N/B) * sum_b c_b with c_b the per-example
            full-LL contribution; on a SHARED batch the pair difference
            E_hat_{k+1} - E_hat_k has variance (N^2/B) * var_b(c_{k+1,b} -
            c_{k,b}) — the correlated rows cancel most of the noise (Deng
            et al. 2020). The metropolis exponent gets
            -(Delta beta)^2 * sigma_hat^2 / 2, making the exchange RATE
            unbiased under Gaussian estimate noise. Test metrics + prior
            refresh exactly (test passes / O(C*W) are not the bottleneck);
            train metrics are minibatch estimates.
            """
            kb2, ks2 = jax.random.split(ks)
            xb, yb = _gather_batch(kb2)
            per = _per_only(s.w, xb, yb)  # (C, B) tau-independent
            if is_regression:
                tau_s = jnp.exp(s.eta)
                cb = (
                    -0.5 * (likelihood._LOG_2PI + s.eta)[:, None]
                    + per * jnp.exp(-s.eta)[:, None]
                )
                ev_te = b_eval_te(s.w, data.x_test, data.y_test, tau_s)
                prior_s = b_prior(s.w, tau_s)
                rmse_tr = jnp.sqrt(-2.0 * jnp.mean(per, axis=-1))
                acc_tr, acc_te = s.acc_train, s.acc_test
            else:
                cb = per
                ev_te = b_eval_te(s.w, data.x_test, data.y_test)
                prior_s = b_prior(s.w)
                rmse_tr = s.rmse_train
                acc_tr = 100.0 * jnp.mean(_hit_mb(s.w, xb, yb), axis=-1)
                acc_te = ev_te.acc
            if cfg.sg_vr:
                # SVRG control variate (config.sg_vr; arxiv 2010.01084):
                # evaluate the SAME shared batch at the anchors; the
                # centered estimator (N/B) sum_b [c_b(w) - c_b(w_a)] +
                # E_full(w_a) is unbiased for any anchor, and the pair
                # variance is taken over the CENTERED per-example terms —
                # iterates near their anchor make it collapse (exactly 0,
                # with an exact full-data energy, on refresh-aligned steps)
                per_a = _per_only(s.sg_anchor_w, xb, yb)
                if is_regression:
                    cb_a = (
                        -0.5 * (likelihood._LOG_2PI + s.sg_anchor_eta)[:, None]
                        + per_a * jnp.exp(-s.sg_anchor_eta)[:, None]
                    )
                else:
                    cb_a = per_a
                cb_c = cb - cb_a
                ll_hat = scale * jnp.sum(cb_c, axis=-1) + s.sg_anchor_full
            else:
                cb_c = cb
                ll_hat = scale * jnp.sum(cb, axis=-1)
            d = cb_c[1:] - cb_c[:-1]  # (C-1, B)
            var_pair = (float(n_train_s) ** 2 / bsz) * jnp.var(d, axis=-1)
            dbeta = betas_run[:-1] - betas_run[1:]
            penalty = 0.5 * jnp.square(dbeta) * var_pair
            s = s._replace(
                ll=ll_hat, prior=prior_s,
                rmse_train=rmse_tr, rmse_test=ev_te.rmse,
                acc_train=acc_tr, acc_test=acc_te,
            )
            return do_swap(s, i, ks2, pair_penalty=penalty)

        def step_sgld(
            state: ChainState, xs
        ) -> Tuple[ChainState, Dict[str, jax.Array]]:
            i, key = xs
            kb, kn, ke, ks = jax.random.split(key, 4)
            xb, yb = _gather_batch(kb)
            (val, _per), g = _vg_mb(state.w, xb, yb)  # (C,), (C,B), (C,W)
            # grad log pi_beta(w) = beta * (N/B) * grad(ll-term) - w/sigma^2
            gl = g * jnp.exp(-state.eta)[:, None] if is_regression else g
            grad_post = (
                betas_run[:, None] * scale * gl - state.w / cfg.sigma_sq
            )
            w_new = (
                state.w
                + 0.5 * eps * grad_post
                + jnp.sqrt(eps)
                * jax.random.normal(kn, (c, w_dim), jnp.float32)
            )
            if is_regression:
                # d log pi_beta / d eta with the minibatch SSE estimate
                # (val = -SSE_b/2): dLL/deta = -N/2 - (N/B) val e^{-eta}
                dll = -0.5 * n_train_s - scale * val * jnp.exp(-state.eta)
                dpr = -(1.0 + cfg.nu_1) + cfg.nu_2 * jnp.exp(-state.eta)
                eta_new = (
                    state.eta
                    + 0.5 * eps_c * (betas_run * dll + dpr)
                    + jnp.sqrt(eps_c)
                    * jax.random.normal(ke, (c,), jnp.float32)
                )
            else:
                eta_new = state.eta
            new_state = state._replace(
                w=w_new,
                eta=eta_new,
                w_last=w_new,
                # every SGLD move is accepted by construction (no MH) —
                # accept% reads 100, documented in the config
                n_accept=state.n_accept + 1,
                n_langevin=state.n_langevin + 1,
            )
            if cfg.sg_vr:
                # anchor refresh (one full-data pass, amortized over
                # sg_anchor_interval steps) BEFORE any swap at this step —
                # a refresh-aligned swap then runs on exact energies with
                # zero penalty
                def _refresh_anchor(s: ChainState) -> ChainState:
                    if is_regression:
                        ev = b_eval_tr(
                            s.w, data.x_train, data.y_train, jnp.exp(s.eta)
                        )
                    else:
                        ev = b_eval_tr(s.w, data.x_train, data.y_train)
                    return s._replace(
                        sg_anchor_w=s.w,
                        sg_anchor_eta=s.eta,
                        sg_anchor_full=ev.loglik,
                    )

                new_state = jax.lax.cond(
                    (i % jnp.maximum(cfg.sg_anchor_interval, 1)) == 0,
                    _refresh_anchor,
                    lambda s: s,
                    new_state,
                )
            if cfg.sg_swap == "exact":
                new_state = jax.lax.cond(
                    _swap_due(i),
                    lambda s: do_swap(_refresh_full(s), i, ks),
                    lambda s: s,
                    new_state,
                )
            else:
                new_state = jax.lax.cond(
                    _swap_due(i),
                    lambda s: _corrected_swap(s, i, ks),
                    lambda s: s,
                    new_state,
                )
            trace = {
                "ll": new_state.ll,
                "rmse_train": new_state.rmse_train,
                "rmse_test": new_state.rmse_test,
                "acc_train": new_state.acc_train,
                "acc_test": new_state.acc_test,
                "accept_count": state.n_accept,
            }
            if cfg.record_w:
                trace["w"] = _w_trace(new_state.w_last)
            if cfg.record_eta and is_regression:
                trace["eta"] = _eta_trace(new_state.eta)
            if cfg.record_ll_state:
                trace["ll_cur"] = new_state.ll
            if cfg.track_replicas:
                trace["replica"] = new_state.replica_id
            return new_state, trace

    da_mode = cfg.use_surrogate and cfg.surrogate_mode == "delayed_acceptance"
    if cfg.proposal == "sgld":
        chosen = step_sgld
    elif cfg.proposal != "reference":
        chosen = step_precond
    elif da_mode:
        chosen = step_da
    else:
        chosen = step
    chosen.recompute_ll = recompute_ll  # applied by the sampler at the 60% switch
    chosen.refit_surrogate = refit_surrogate
    chosen.close_segment = _close_segment  # (state, idx, key) boundary closure
    chosen.do_swap = do_swap  # (state, i, key) — shared by the fused-block
    # driver (ptnn/fused.py) so swap semantics exist exactly once
    return chosen
