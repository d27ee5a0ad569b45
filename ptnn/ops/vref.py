"""Variational reference for the tempering path (stabilized PT).

Classic PT — and every reference entry point
(multicore-pt-classification/pt_classification.py:300-308,
multicore-pt-regression/pt_timeseries_regression.py:300-330) — tempers the
*likelihood only*: rung beta targets ``prior(w) * L(w)^beta``, so the hot end
anneals toward the PRIOR. For Bayesian NNs the prior (N(0, 25 I)) is
astronomically far from the posterior bulk, which is why the repo's replica
transport diagnostics (ops/roundtrip.py, results/convergence.md) measure a
healthy-looking ~46%% swap acceptance coexisting with near-zero actual
cold<->hot round trips: the ladder's communication barrier to the prior is
enormous, so configurations ping-pong between neighboring rungs instead of
regenerating at the hot end.

The fix is to anneal toward a *fitted* reference instead (Surjanovic, Syed,
Bouchard-Cote & Campbell, "Parallel tempering with a variational reference",
NeurIPS 2022): with a diagonal Gaussian ``q = N(mu, diag(s^2))`` moment-matched
to the cold chain, the path becomes

    log pi_beta(w) = log prior(w) + beta * LL(w)
                     + (1 - beta) * [log q(w) - log p_w(w)]

where ``p_w`` is the Gaussian w-part of the prior. At beta=1 this is exactly
the posterior (the correction vanishes); at beta=0 it is exactly ``q`` (the
prior's w-part cancels), which the sampler can draw from IID — so the hot rung
regenerates and replicas genuinely round-trip. All identities used downstream:

* MH accept gains ``(1 - beta) * (corr(w') - corr(w))`` (kernel.py);
* the swap energy becomes ``E = LL - corr`` — the pairwise exponent is
  ``(beta_i - beta_j) * (E_j - E_i)`` with the log-prior terms cancelling,
  so the existing "metropolis" rule (parallel/swap.py) applies unchanged;
* the tempered-posterior gradient gains ``(1 - beta) * grad corr``;
* an independence proposal ``w' ~ q`` at the hottest rung has acceptance
  ``exp(dprior + beta dLL + (1-beta) dcorr + log q(w) - log q(w'))``,
  which is identically 1 at beta=0 (kernel._vr_regen).

Everything here is *up to additive constants that cancel*: every consumer
takes differences of the same function at two states under the same (mu, s^2),
so ``-0.5 sum log s^2`` and the prior's dimension constant are dropped.

Adaptation follows the repo's freeze-at-burn-in exactness convention
(PTConfig.precond_start_frac docs): (mu, s^2) are Welford-estimated from the
cold chain during burn-in and FROZEN at the burn-in boundary, so the retained
samples come from an exactly Markov kernel targeting a fixed path.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

# Numerical floor on the fitted per-parameter variance: a cold chain that has
# not moved in some coordinate would otherwise produce s^2 = 0 and an infinite
# correction at the first proposal away from it.
VAR_FLOOR = 1e-8


def welford_variance(
    m2: jax.Array, count: jax.Array, inflation: float = 1.0
) -> jax.Array:
    """Per-parameter variance from a Welford M2 accumulator.

    ``inflation`` > 1 over-disperses the reference — a cheap guard against
    an under-dispersed burn-in estimate making q lighter-tailed than the
    posterior leg it must overlap.
    """
    var = m2 / jnp.maximum(count, 1.0)
    return jnp.maximum(var * inflation, VAR_FLOOR)


def log_q_quad(w: jax.Array, mu: jax.Array, var: jax.Array) -> jax.Array:
    """``log q(w)`` up to its (state-independent) normalizer.

    ``w``: (..., W); ``mu``/``var``: (W,). Returns (...,).
    """
    return -0.5 * jnp.sum(jnp.square(w - mu) / var, axis=-1)


def correction(
    w: jax.Array, mu: jax.Array, var: jax.Array, sigma_sq: float
) -> jax.Array:
    """Path correction ``corr(w) = log q(w) - log p_w(w)`` up to constants.

    ``p_w = N(0, sigma_sq I)`` is the w-part of the model prior
    (ops/likelihood.py:{classification,regression}_log_prior_dim — the
    tau/dimension terms are w-independent and cancel everywhere corr is
    differenced).
    """
    return log_q_quad(w, mu, var) + 0.5 * jnp.sum(
        jnp.square(w), axis=-1
    ) / sigma_sq


def grad_correction(
    w: jax.Array, mu: jax.Array, var: jax.Array, sigma_sq: float
) -> jax.Array:
    """``d corr / d w`` — feeds the preconditioned-MALA drift (kernel._g_post)."""
    return -(w - mu) / var + w / sigma_sq


def sample_q(
    key: jax.Array, mu: jax.Array, var: jax.Array
) -> jax.Array:
    """One IID draw from the fitted reference ``q = N(mu, diag(var))``."""
    return mu + jnp.sqrt(var) * jax.random.normal(
        key, mu.shape, dtype=mu.dtype
    )


def schedule(
    samples_per_chain: int,
    vr_start_frac: float,
    burn_in: float,
    warmstart_frac: float,
) -> Tuple[int, int, int]:
    """(vr_start, vr_accum_start, vr_burn_end) step indices of the VR
    schedule — the single source of truth shared by the kernel's traced
    gating and host-side consumers (ops/evidence.py needs vr_burn_end: the
    fitted (mu, s^2) are only FROZEN from that step on, so evidence windows
    must start there for the path to be fixed).

    * ``vr_start``: the correction activates (before: plain tempering);
    * ``vr_accum_start``: Welford accumulation begins (half the activation
      point, and never inside a MALA warm start);
    * ``vr_burn_end``: accumulation stops; stats are frozen for every step
      ``i >= vr_burn_end``.
    """
    vr_start = int(samples_per_chain * vr_start_frac)
    vr_burn_end = int(samples_per_chain * burn_in) - 1
    vr_accum_start = max(
        int(samples_per_chain * warmstart_frac), vr_start // 2
    )
    return vr_start, vr_accum_start, vr_burn_end


def frozen_count(
    samples_per_chain: int,
    vr_start_frac: float,
    burn_in: float,
    warmstart_frac: float,
) -> float:
    """The post-freeze Welford sample count (the kernel's traced
    ``min(i, vr_burn_end) - vr_accum_start`` for any ``i >= vr_burn_end``)."""
    _, accum_start, burn_end = schedule(
        samples_per_chain, vr_start_frac, burn_in, warmstart_frac
    )
    return float(max(burn_end - accum_start, 1))


def log_z0(var, prior_dim: int, sigma_sq: float) -> float:
    """Closed-form log normalizer of the beta=0 end of the corrected path.

    The kernel's beta=0 target is ``exp(prior + corr)`` with
    ``corr = log_q_quad - logp_ref`` and the committed model prior equal to
    ``logp_ref - 0.5 * prior_dim * log(sigma_sq)`` up to z-independent
    terms it never writes (ops/likelihood.py:*_log_prior_dim), so

        Z(0) = sigma_sq^(-prior_dim/2) * ∫ exp(log_q_quad(z)) dz
             = sigma_sq^(-prior_dim/2) * prod_i sqrt(2 pi var_i).

    With this anchor the thermodynamic integral of E_beta[LL - corr] over
    the FULL beta in [0, 1] path (vr_hot_infinite gives the beta=0 rung)
    yields the ABSOLUTE log marginal likelihood under the committed prior
    convention — where prior-anchored tempering (ops/evidence.py module
    docstring) only ever yields differences down to beta_min > 0.
    """
    import numpy as np

    var = np.asarray(var, np.float64)
    return float(
        -0.5 * prior_dim * np.log(sigma_sq)
        + 0.5 * np.sum(np.log(2.0 * np.pi * var))
    )


def welford_update(
    mean: jax.Array,
    m2: jax.Array,
    x: jax.Array,
    count_new: jax.Array,
    live: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """One masked Welford step: fold ``x`` in when ``live`` else no-op.

    ``count_new`` is the sample count INCLUDING ``x`` (>= 1 when live).
    """
    upd = live.astype(mean.dtype)
    delta = x - mean
    mean_new = mean + upd * delta / jnp.maximum(count_new, 1.0)
    m2_new = m2 + upd * delta * (x - mean_new)
    return mean_new, m2_new


# ---------------------------------------------------------------------------
# Full-covariance reference family (PTConfig.vr_family="full_cov"; static
# mode only — the round-based adaptation interface, ptnn/rounds.py). The
# vref_transport.md forensics measured that a mean-field q leaves a ~10^4-nat
# energy cliff on the d=61 reference net while an offline full-covariance
# fit closes most of it (draw LL -9,402 -> -790 mean); the staleness problem
# that blocked building it as a FROZEN in-run fit is solved by refitting
# between rounds instead (each round's reference is constant, so each round
# is exactly Markov — Surjanovic et al. 2022's actual adaptation schedule).
# ---------------------------------------------------------------------------


def log_q_chol(z: jax.Array, mu: jax.Array, chol: jax.Array) -> jax.Array:
    """``log q(z)`` for ``q = N(mu, L L^T)`` up to its (state-independent)
    normalizer, via one triangular solve.

    ``z``: (..., Z); ``mu``: (Z,); ``chol``: (Z, Z) lower. Returns (...,).
    """
    dz = z - mu
    # solve L r = dz^T  ->  r = L^{-1} dz^T, shape (Z, ...)
    r = jax.scipy.linalg.solve_triangular(
        chol, jnp.moveaxis(dz, -1, 0).reshape(chol.shape[0], -1), lower=True
    )
    return -0.5 * jnp.sum(jnp.square(r), axis=0).reshape(dz.shape[:-1])


def grad_logq_chol(z: jax.Array, mu: jax.Array, chol: jax.Array) -> jax.Array:
    """``d log q / d z`` for the full-covariance family: ``-Sigma^{-1}(z-mu)``
    via two triangular solves. Shapes as in :func:`log_q_chol`; returns
    (..., Z)."""
    dz = z - mu
    flat = jnp.moveaxis(dz, -1, 0).reshape(chol.shape[0], -1)
    r = jax.scipy.linalg.solve_triangular(chol, flat, lower=True)
    s = jax.scipy.linalg.solve_triangular(chol.T, r, lower=False)
    return -jnp.moveaxis(s.reshape((chol.shape[0],) + dz.shape[:-1]), 0, -1)


def sample_q_chol(key: jax.Array, mu: jax.Array, chol: jax.Array) -> jax.Array:
    """One IID draw from ``q = N(mu, L L^T)``."""
    eps = jax.random.normal(key, mu.shape, dtype=mu.dtype)
    return mu + chol @ eps


def log_z0_chol(chol, prior_dim: int, sigma_sq: float) -> float:
    """Full-covariance analogue of :func:`log_z0`:
    ``Z(0) = sigma_sq^(-prior_dim/2) * (2 pi)^(Z/2) * |L|``."""
    import numpy as np

    d = np.asarray(chol, np.float64).diagonal()
    zdim = d.shape[0]
    return float(
        -0.5 * prior_dim * np.log(sigma_sq)
        + 0.5 * zdim * np.log(2.0 * np.pi)
        + np.sum(np.log(np.abs(d)))
    )


def fit_gaussian(
    draws,
    family: str = "full_cov",
    shrinkage: float = 0.1,
    inflation: float = 1.0,
    var_floor: float = VAR_FLOOR,
):
    """Host-side moment fit for the static reference (rounds interface).

    ``draws``: (n, Z) z-coordinate samples (cold-chain trace of the previous
    round). Returns ``(mu, var, chol)`` with ``chol=None`` for the diagonal
    family. The full-covariance estimate is shrunk toward its own diagonal —
    ``S <- (1-shrinkage) S + shrinkage diag(S)`` — then inflated and floored,
    which keeps the Cholesky well-posed on short, autocorrelated round
    traces (the same failure mode the per-chain surrogate ridge fit hit).
    """
    import numpy as np

    draws = np.asarray(draws, np.float64)
    if draws.ndim != 2 or draws.shape[0] < 2:
        raise ValueError(f"need (n>=2, Z) draws, got {draws.shape}")
    mu = draws.mean(axis=0)
    var = np.maximum(draws.var(axis=0) * inflation, var_floor)
    if family == "diag":
        return (
            mu.astype(np.float32),
            var.astype(np.float32),
            None,
        )
    if family != "full_cov":
        raise ValueError(f"unknown reference family {family!r}")
    s = np.cov(draws, rowvar=False)
    s = np.atleast_2d(s)
    diag = np.diag(np.diag(s))
    s = (1.0 - shrinkage) * s + shrinkage * diag
    s = s * inflation + var_floor * np.eye(s.shape[0])
    chol = np.linalg.cholesky(s)
    return (
        mu.astype(np.float32),
        np.maximum(np.diag(s), var_floor).astype(np.float32),
        chol.astype(np.float32),
    )
