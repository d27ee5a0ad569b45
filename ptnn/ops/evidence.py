"""Marginal-likelihood (model evidence) estimation from the tempered ladder.

A capability the reference's architecture pays for but never uses: a
parallel-tempering run *already* samples the whole path of power posteriors

    p_beta(w) ∝ L(w)^beta p(w),   beta = 1/T per rung,

and the log marginal likelihood is the thermodynamic integral along it:

    log Z(beta_hi) - log Z(beta_lo) = ∫ E_beta[log L] dbeta.

The reference keeps per-chain likelihood traces (pt_classification.py
:465-492) yet aggregates only accuracy/likelihood plots from them; the
ladder's beta dimension is thrown away. Here the per-rung post-MH,
post-swap UNTEMPERED log-likelihood (``PTConfig.record_ll_state`` →
``traces["ll_cur"]``) feeds two standard estimators:

* **Thermodynamic integration (TI)**: trapezoidal quadrature of the
  per-rung mean log-likelihood over beta (Gelman & Meng 1998).
* **Stepping-stone (SS)**: telescoping importance ratios
  ``Z(b_{k+1})/Z(b_k) = E_{b_k}[exp((b_{k+1}-b_k) log L)]`` estimated by
  log-mean-exp over rung k's samples (Xie et al. 2011, Syst. Biol.) —
  unbiased per ratio where TI carries quadrature bias.

Scope notes (honest limits, documented rather than hidden):

* The reference ladder spans beta ∈ [1/maxtemp, 1], not down to beta=0, so
  both estimators return the evidence *difference* across the ladder, not
  the absolute log Z — use ``maxtemp`` large (or a dedicated ladder) when
  the prior-end anchor matters. ``log Z(beta_lo)`` can then be estimated
  analytically only at beta=0 (where Z = 1 under a normalized prior).
* **Corrected-path mode** (``PTConfig.variational_reference``): the VR run
  samples ``exp(prior + beta*LL + (1-beta)*corr)`` (ops/vref.py), whose TI
  integrand is ``E_beta[LL - corr]`` — exactly the swap energy. The kernel
  records the per-rung state correction as ``traces["vr_corr_cur"]``
  alongside ``ll_cur``, and when the ladder carries the beta=0 reference
  rung (``vr_hot_infinite``) the path's cold end has the CLOSED-FORM
  normalizer ``vref.log_z0`` — so TI/SS over the full [0, 1] span gives the
  ABSOLUTE log marginal likelihood (committed-prior convention), a strict
  upgrade over the prior-anchored difference. Generalized stepping stone in
  the sense of Fan et al. 2011 (Mol. Biol. Evol.): the reference
  distribution is the moment-matched q, not the prior, so the importance
  ratios bridge a far smaller gap. The evidence window additionally floors
  at the VR freeze step (the path must be FIXED over the window; before
  the freeze the fitted (mu, s^2) still move).
* The reference's two-phase tempering collapses every rung to T=1 at the
  60% switch (pt_classification.py:317-324): only the TEMPERED phase
  carries beta information. ``window=None`` defaults to the second half of
  the tempered phase; canonical runs (``pt_phase_frac >= 1``) use the
  post-burn-in half of the whole run.
* Regression's sampled noise variance makes L = L(w, tau); the estimators
  are unchanged (the power-posterior path is over the joint).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import numpy as np


class EvidenceEstimate(NamedTuple):
    """Both estimators for one run, plus the ingredients for diagnostics."""

    log_z_ti: float  # trapezoid TI: log Z(beta_max) - log Z(beta_min)
    log_z_ss: float  # stepping-stone estimate of the same difference
    betas: np.ndarray  # (R,) ascending inverse temperatures
    mean_ll: np.ndarray  # (R,) per-rung window-mean TI integrand
    n_samples: int  # window length actually used
    window: Tuple[int, int]
    # Corrected-path (variational-reference) anchoring: the closed-form
    # log Z(0) of the beta=0 path end (vref.log_z0). nan unless the run was
    # a VR run whose ladder includes the beta=0 rung; when set,
    # ``log_z0 + log_z_ti`` (or ``+ log_z_ss``) is the ABSOLUTE log
    # marginal likelihood under the committed prior convention.
    log_z0: float = float("nan")

    @property
    def anchored(self) -> bool:
        return bool(np.isfinite(self.log_z0))

    @property
    def log_z_abs_ti(self) -> float:
        return self.log_z0 + self.log_z_ti

    @property
    def log_z_abs_ss(self) -> float:
        return self.log_z0 + self.log_z_ss


def _window(cfg, n_rows: int, window: Optional[Tuple[int, int]]):
    if window is not None:
        a, b = window
        if not (0 < a < b <= n_rows):
            raise ValueError(f"bad window {window} for {n_rows} trace rows")
        return a, b
    # trace row 0 is the init row; rows 1..S-1 are steps 0..S-2
    switch = min(cfg.temper_switch_step, n_rows - 1)
    if switch <= 0:  # canonical run: whole run is tempered
        switch = n_rows - 1
    a = max(1, switch // 2)
    return a, switch + 1  # rows a..switch hold tempered-phase states


def from_traces(
    traces: Dict[str, np.ndarray],
    temperatures: np.ndarray,
    cfg,
    window: Optional[Tuple[int, int]] = None,
    log_z0: float = float("nan"),
) -> EvidenceEstimate:
    """Estimate the ladder evidence difference from a recorded run.

    Requires ``cfg.record_ll_state`` (the "ll_cur" trace): the carried state
    likelihood follows the chain through rejects and swaps, unlike the
    reference's proposal-likelihood row. ``window``: (start_row, end_row)
    half-open trace-row range; default = second half of the tempered phase,
    floored at the VR freeze step for corrected-path (VR) runs. For VR runs
    the integrand is ``ll - corr`` (see module docstring); ``log_z0``
    anchors the result absolutely (from_result computes it).
    """
    if "ll_cur" not in traces:
        raise ValueError(
            "evidence needs the state-likelihood trace: run with "
            "PTConfig(record_ll_state=True)"
        )
    ll = np.asarray(traces["ll_cur"], np.float64)  # (S, R)
    if "vr_corr_cur" in traces:
        ll = ll - np.asarray(traces["vr_corr_cur"], np.float64)
        if window is None:
            from ptnn.ops import vref

            if cfg.vr_mode == "static":
                freeze = 0  # the reference is fixed for the whole run
            else:
                _, _, freeze = vref.schedule(
                    cfg.samples_per_chain, cfg.vr_start_frac, cfg.burn_in,
                    cfg.warmstart_frac,
                )
            a, b = _window(cfg, ll.shape[0], None)
            window = (max(a, min(freeze, ll.shape[0] - 2)), b)
    a, b = _window(cfg, ll.shape[0], window)
    return from_samples(
        ll[a:b], np.asarray(temperatures), window=(a, b), log_z0=log_z0
    )


def from_result(res, window: Optional[Tuple[int, int]] = None) -> EvidenceEstimate:
    """Convenience wrapper over a ``ptnn.sample`` SampleResult.

    For variational-reference runs whose ladder includes the beta=0
    reference rung (``vr_hot_infinite``), computes the closed-form anchor
    ``vref.log_z0`` from the run's frozen reference fit, making the
    estimates absolute (``.log_z_abs_ti`` / ``.log_z_abs_ss``).
    """
    cfg = res.config
    log_z0 = float("nan")
    if (
        "vr_corr_cur" in res.traces
        and np.isinf(np.asarray(res.temperatures, np.float64)).any()
    ):
        from ptnn import kernel
        from ptnn.ops import vref

        spec = kernel.default_spec(cfg)
        prior_dim = (
            spec.prior_dim_regression
            if cfg.task == "regression"
            else spec.prior_dim_classification
        )
        if cfg.vr_family == "full_cov":
            log_z0 = vref.log_z0_chol(
                np.asarray(res.final_state.vr_chol, np.float64),
                prior_dim,
                cfg.sigma_sq,
            )
        else:
            if cfg.vr_mode == "static":
                # vr_m2 IS the variance (inflation baked in at fit time)
                var = np.maximum(
                    np.asarray(res.final_state.vr_m2, np.float64),
                    vref.VAR_FLOOR,
                )
            else:
                cnt = vref.frozen_count(
                    cfg.samples_per_chain, cfg.vr_start_frac, cfg.burn_in,
                    cfg.warmstart_frac,
                )
                var = np.asarray(
                    vref.welford_variance(
                        np.asarray(res.final_state.vr_m2, np.float64),
                        cnt,
                        cfg.vr_var_inflation,
                    )
                )
            log_z0 = vref.log_z0(var, prior_dim, cfg.sigma_sq)
    return from_traces(res.traces, res.temperatures, cfg, window, log_z0)


def from_samples(
    ll: np.ndarray, temperatures: np.ndarray,
    window: Tuple[int, int] = (0, 0),
    log_z0: float = float("nan"),
) -> EvidenceEstimate:
    """Estimators from raw (n_samples, R) TI-integrand draws (untempered
    log-likelihood; minus the path correction for corrected-path runs),
    sample i of column r distributed under the rung-r path member."""
    ll = np.asarray(ll, np.float64)
    betas = 1.0 / np.asarray(temperatures, np.float64)
    # Pool duplicate-beta columns: under replicated ladders
    # (PTConfig.n_ladders) every rung appears once per ladder and the R
    # replicas' draws are same-path samples — pooling multiplies the draws
    # behind each rung's expectation by R. With a plain ladder this is a
    # no-op (unique betas, one column each).
    ub = np.unique(betas)  # ascending
    if len(ub) < 2:
        raise ValueError("evidence integration needs at least 2 rungs")
    cols = [ll[:, betas == b].T.reshape(-1) for b in ub]
    betas = ub
    mean_ll = np.asarray([c.mean() for c in cols])
    ti = float(np.trapz(mean_ll, betas))

    # stepping stone: sum_k logmeanexp((b_{k+1}-b_k) * ll_k) using rung k's
    # own samples (the colder ratio endpoint is estimated from the warmer
    # rung — the standard direction, whose importance weights are bounded)
    db = np.diff(betas)  # (R-1,)
    ss = 0.0
    for k in range(len(db)):
        z = db[k] * cols[k]
        zmax = z.max()
        ss += float(zmax + np.log(np.mean(np.exp(z - zmax))))
    return EvidenceEstimate(
        log_z_ti=ti,
        log_z_ss=ss,
        betas=betas,
        mean_ll=mean_ll,
        n_samples=len(cols[0]),
        window=window,
        log_z0=log_z0,
    )
