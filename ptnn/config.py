"""Configuration layer for the TPU-native parallel-tempering sampler.

The reference has no config system — hyperparameters are hardcoded constants
inside ``main()`` (multicore-pt-classification/pt_classification.py:1036-1045;
multicore-pt-regression/pt_timeseries_regression.py:915-955) and CLI args are
dead (pt_classification.py:1039). This dataclass replaces that; the presets
below reproduce each reference configuration verbatim (SURVEY.md §5 "Config").
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class PTConfig:
    # Problem
    task: str  # "classification" | "regression"
    topology: Tuple[int, int, int]  # (n_in, n_hidden, n_out)

    # Sampling budget. ``num_samples`` is the TOTAL across chains; each chain
    # draws num_samples // num_chains (pt_classification.py:514).
    num_samples: int = 50_000
    num_chains: int = 10

    # Temperature ladder (pt_classification.py:537-645).
    maxtemp: float = 10.0
    geometric_ladder: bool = True
    # Explicit temperature ladder (overrides maxtemp/geometric_ladder):
    # ascending, custom_ladder[0] == 1.0, one entry per chain. This is how a
    # feedback-tuned schedule (ops/ladder.py:barrier_tuned_temperatures,
    # estimated from a pilot run's pair_swap_accept) is fed back in.
    custom_ladder: Optional[Tuple[float, ...]] = None
    # Replicated tempering ensembles (NOT reference behavior; TPU-first).
    # ``n_ladders = R`` partitions the ``num_chains`` chains into R
    # INDEPENDENT ladders of K = num_chains / R rungs each: the K-rung
    # temperature schedule (from maxtemp/geometric_ladder or a K-long
    # custom_ladder) is tiled R times and swap proposals never cross a
    # ladder boundary (a pair mask in parallel/swap.py). Rationale: on one
    # chip the chain axis is nearly free (fnn_roofline.md), but extra rungs
    # beyond what the communication barrier needs only densify the ladder
    # (observed: a 64-rung maxtemp-5 ladder swaps at ~85% — wasted rungs),
    # whereas R replicated ladders yield R INDEPENDENT cold chains whose
    # effective sample sizes add. Cold rungs sit at chain indices
    # {0, K, 2K, ...}; results.summarize(cold_only=True) and the ESS/
    # round-trip diagnostics understand the tiling.
    n_ladders: int = 1

    # Replica exchange. ``swap_interval`` in steps; the reference derives it
    # as int(swap_ratio * num_samples / num_chains) (pt_classification.py:1040).
    swap_interval: int = 100
    # Cadence convention: classification swaps after steps with
    # (i+1) % interval == 0 (pt_classification.py:438); regression after steps
    # with i % interval == 0 and i != 0 (pt_timeseries_regression.py:427).
    swap_offset: int = 1  # 1 = classification convention, 0 = regression
    # Payload the swap rule compares (SURVEY.md §2.1 inconsistency note):
    # "tempered"        — classification enqueues lhood/adapttemp (:439)
    # "tempered_times_T"— regression enqueues (lhood/adapttemp)*T (:430)
    # "untempered"      — clean fix mode (not reference behavior)
    swap_payload: str = "tempered"
    # Pair-acceptance rule: "half_exp" (reference, pt_classification.py:683),
    # "unclamped" (older variants), "metropolis" (detailed-balance rule with
    # untempered payloads — pairs with swap_payload="untempered").
    swap_rule: str = "half_exp"
    # Sweep structure over the ladder's adjacent pairs:
    # "bubbling" — the reference master's sequential sweep (0,1),(1,2),…
    #              where pair k+1 sees pair k's output, so a configuration
    #              can travel several rungs per sweep (pt_classification.py
    #              :747-755; SURVEY §3.4). Parity default.
    # "even_odd" — DEO-style disjoint pairs, alternating (0,1),(2,3),… and
    #              (1,2),(3,4),… on successive swap events (Okabe et al.
    #              2001; Syed et al. 2021 non-reversible PT). NOT reference
    #              behavior. Every row moves at most one rung per sweep, so
    #              on a sharded chain axis the permutation is a neighbor
    #              ppermute instead of an all-gather (swap_collective_bench
    #              .md), and round-trip behavior is the modern recommended
    #              scheme. Pairs naturally with swap_rule="metropolis".
    swap_style: str = "bubbling"
    # After a swap, the CURRENT reference entry points keep the chain's
    # pre-swap likelihood (stale — pt_classification.py:448 comments out the
    # restore), which freezes chains that swapped a good likelihood against a
    # worse w until the 60% recompute. Every OLDER variant restores it
    # (e.g. misc_code/pt_fnn_multi.py:294, Misc/ldpt_fnn_multi_fixed.py:327),
    # and the committed Res_* baseline statistics (accept ~18%, RMSE 0.0239
    # on Sunspot RW) are only reproducible with restore semantics — so False
    # (restore: permute ll+prior with w) is the default; True mirrors the
    # current entry points' literal behavior.
    stale_likelihood_after_swap: bool = False

    # Proposals.
    use_langevin_gradients: bool = False
    langevin_prob: float = 0.5  # l_prob (pt_classification.py:192)
    learn_rate: float = 0.01
    step_w: float = 0.025  # RW std (pt_classification.py:267)
    step_eta: float = 0.2  # noise-variance RW std (pt_timeseries_regression.py:260)
    # "sequential" (lax.scan, strict parity) | "batch" (fused, fast) |
    # "pallas" (Pallas TPU kernel, bit-compatible with sequential)
    drift_mode: str = "sequential"
    drift_unroll: int = 8
    # Chain-microbatched drift: >1 splits the (C, w_size) drift into this
    # many sequential chunks (lax.map) to bound activation memory — the
    # grad-based CNN drift at 1024 chains keeps ~2.6 GB of conv activations
    # alive per direction under plain vmap, which crashed the 16 GB chip.
    # 1 = full vmap (default). Must divide num_chains.
    drift_chain_microbatch: int = 1
    # Langevin MH q-ratio:
    # "reference"   — the current entry points' simplified difference form
    #                 (pt_classification.py:340-351), a correct MALA ratio;
    # "ldpt_legacy" — faithful emulation of the older variants' misplaced
    #                 parenthesis ``log(pdf1 - log(pdf2))`` with covariance
    #                 step_w (Misc_code/ldpt_classifier_multi.py:244,
    #                 Misc/Misc_code/ldmcmc.py:322): near a mode the term is
    #                 hugely positive (always accept), far away it is NaN
    #                 (always reject). The committed PT_EvalSwapLG* tables
    #                 are only reproducible with this mode.
    qratio: str = "reference"

    # Priors (pt_classification.py:274-276).
    sigma_sq: float = 25.0
    nu_1: float = 0.0
    nu_2: float = 0.0

    # Adaptive proposal step size (opt-in; NOT reference behavior): during
    # the burn-in fraction, each chain's random-walk scale adapts by
    # Robbins-Monro toward a target acceptance rate, then freezes — the
    # frozen-adaptation sampler is exact. Essential for high-dimensional
    # models (CNN/MLP) where one global step_w cannot fit every temperature.
    adapt_step_size: bool = False
    adapt_target_accept: float = 0.234
    adapt_rate: float = 0.05

    # Proposal family (TPU-first flagship modes; NOT reference behavior).
    # "reference"    — the reference's RW / epoch-SGD Langevin machinery
    #                  (use_langevin_gradients & friends above).
    # "precond_rw"   — random walk with a per-chain DIAGONAL preconditioner:
    #                  noise ~ N(0, sigma_c^2 M_c), M_c the normalized
    #                  per-parameter posterior variance estimated by Welford
    #                  accumulation during burn-in; sigma_c Robbins-Monro
    #                  adapted. Both freeze at burn-in end -> exact.
    # "precond_mala" — preconditioned MALA: proposal mean
    #                  w + (sigma_c^2/2) M_c grad log pi_T(w), cov
    #                  sigma_c^2 M_c, with the exact reverse-kernel q-ratio.
    #                  grad log pi_T = grad(ll)/adapttemp + grad(log prior)
    #                  via jax.value_and_grad fused with the likelihood
    #                  forward pass (one fwd+bwd per proposal; the gradient
    #                  at the current point is carried in ChainState.g_like
    #                  and never recomputed). This replaces the reference's
    #                  epoch-SGD drift with the actual tempered-posterior
    #                  gradient — the mode built to win the ESS/s benchmark.
    # "hmc"          — preconditioned Hamiltonian Monte Carlo within PT:
    #                  each step draws a momentum p ~ N(0, M_c^-1) (M_c the
    #                  same Welford diagonal as precond_mala), runs
    #                  ``hmc_leapfrog`` leapfrog steps of the tempered-
    #                  posterior Hamiltonian (one fused value_and_grad per
    #                  leapfrog), and applies the exact MH test on the total
    #                  energy change (the leapfrog integrator is reversible
    #                  and volume-preserving, so the q-ratio IS the kinetic-
    #                  energy difference). With hmc_leapfrog=1 this is
    #                  algebraically precond_mala with sigma = eps. Longer
    #                  trajectories decorrelate draws far faster at the cost
    #                  of L gradient passes per step — the ESS/s play on
    #                  models where the FNN-scale step is latency-bound and
    #                  extra gradient FLOPs ride the idle MXU
    #                  (fnn_roofline.md). Step size (per chain) adapts by
    #                  Robbins-Monro toward hmc_target_accept during burn-in
    #                  and freezes, exactly like the precond_* scales.
    # "pcn"          — preconditioned Crank-Nicolson within PT (Cotter et
    #                  al. 2013 "MCMC methods for functions"; tempered
    #                  variant per the retrieved PAPERS.md line arxiv
    #                  2210.17048): w' = sqrt(1-rho^2) w + rho * xi with
    #                  xi ~ N(0, sigma_sq I) — an AR(1) proposal REVERSIBLE
    #                  w.r.t. the Gaussian weight prior, so the MH test
    #                  reduces exactly to the tempered-likelihood ratio
    #                  (pinned by tests/test_pcn.py: a beta=0 rung accepts
    #                  identically and emits IID prior draws). Gradient-
    #                  free. rho is the adapted per-chain scale (Robbins-
    #                  Monro toward adapt_target_accept, capped at 1; rho=1
    #                  is an independence sampler from the prior). Uses the
    #                  precond-family step structure (separate dataset-free
    #                  eta block, DEO-friendly) but ignores the Welford
    #                  preconditioner: prior-reversibility requires the
    #                  PRIOR metric. Honest scope (measured): its classic
    #                  dimension-robustness is a PRIOR-DOMINATED-regime
    #                  property; at reference temperatures the tempered BNN
    #                  likelihood still gates acceptance, so quality matches
    #                  adapted precond_rw (Sunspot 6k budget: test_mean
    #                  0.0360 vs 0.0362) without beating it — reach for pcn
    #                  when gradients are unavailable and the posterior is
    #                  near-prior (strong tempering, small N, wide nets).
    # "sgld"         — replica-exchange stochastic-gradient Langevin dynamics
    #                  (reSGLD; Deng et al. 2020, and the retrieved PAPERS.md
    #                  line: arxiv 2301.01898 / 2010.01084): per step, ONE
    #                  minibatch of sg_batch rows drives an unadjusted
    #                  Langevin move on (w, eta) toward the rung's tempered
    #                  posterior — w += (sg_step/2) * grad log pi_beta_hat +
    #                  N(0, sg_step) — with the likelihood gradient scaled by
    #                  N/B (unbiased). NO Metropolis correction: this mode is
    #                  deliberately APPROXIMATE (discretization + subsampling
    #                  bias, the standard SG-MCMC trade), built for dataset
    #                  sizes where the exact modes' full-batch passes dominate
    #                  step cost. Swaps: sg_swap below. Requires the
    #                  metropolis/untempered swap machinery and the canonical
    #                  (no temper-switch) schedule.
    proposal: str = "reference"
    # hmc leapfrog steps per proposal (L). Static — the trajectory is an
    # unrolled lax.scan inside the step. L=1 == precond_mala; 8-16 is the
    # usual sweet spot (Neal 2011 §5.4).
    hmc_leapfrog: int = 8
    # Per-step per-chain uniform jitter of the leapfrog step size:
    # eps_eff = eps * U(1 - j, 1 + j). Randomizing eps breaks the periodic
    # orbits a fixed (eps, L) pair can resonate with (Neal 2011 §5.4.3.3);
    # the MH test stays exact for any eps drawn independently of the state.
    hmc_eps_jitter: float = 0.2
    # Robbins-Monro acceptance target for hmc (0.651 is the optimal HMC
    # acceptance rate, Beskos et al. 2013; Stan's NUTS default aims 0.8 —
    # the higher target is safer when the preconditioner is noisy).
    hmc_target_accept: float = 0.75
    # ChEES cross-REPLICA trajectory-length adaptation (Hoffman, Radul &
    # Sountsov, AISTATS 2021 — built for exactly this many-parallel-chains
    # regime). Requires replicated ladders (n_ladders >= 2): the criterion's
    # cross-chain expectations are taken over the R replicas at each RUNG
    # (chains at different temperatures target different distributions, so
    # a plain cross-chain mean would be wrong). Per step the trajectory
    # length is jittered, tau = u_i * exp(log_traj) with u_i a van der
    # Corput (Halton base-2) sequence in the step index; realized leapfrog
    # steps L = clip(ceil(tau / eps), 1, hmc_leapfrog) — ``hmc_leapfrog``
    # becomes the STATIC bound, masked per chain inside the scan. log_traj
    # follows per-rung Adam ascent on the ChEES gradient estimate and
    # freezes at burn-in end (same exactness convention as the
    # preconditioner: the post-burn-in kernel is a fixed mixture over the
    # state-independent jitter, hence exact).
    hmc_adapt_traj: bool = False
    # Adam learning rate on log trajectory length (paper default 0.025).
    chees_rate: float = 0.025
    # sgld minibatch size (rows sampled with replacement per step; shared
    # across chains so the gather is one (B, F) block and pairwise swap
    # energy differences correlate — which SHRINKS the corrected-swap
    # variance, Deng et al. 2020 Sec. 4).
    sg_batch: int = 0
    # sgld Euler-Maruyama step eps: move = (eps/2) grad + N(0, eps).
    sg_step: float = 1e-5
    # How sgld swap energies are produced:
    # "exact"     — at swap cadence, refresh the FULL-data log-likelihood
    #               (+ prior + metrics) and run the standard metropolis
    #               sweep; the per-step minibatch saving is untouched (the
    #               full pass amortizes over swap_interval steps).
    # "corrected" — never touch the full train set: swap on minibatch
    #               energy estimates with the variance-corrected exponent
    #               (beta_k - beta_j)(E_j_hat - E_k_hat) - (beta_k -
    #               beta_j)^2 * sigma_hat^2_pair / 2, the unbiased noisy-
    #               energy exchange test of Deng et al. 2020 (per-pair
    #               variance from per-example energy differences on a
    #               shared batch). For N too large for even periodic full
    #               passes.
    sg_swap: str = "exact"
    # SVRG control variates for the corrected swap test (PAPERS.md arxiv
    # 2010.01084 "Accelerating ... replica exchange SG-MCMC via variance
    # reduction"): the minibatch energy estimator becomes
    #   E_hat_vr(w) = (N/B) sum_b [c_b(w) - c_b(w_anchor)] + E_full(w_anchor)
    # — still unbiased for ANY anchor, but between-refresh iterates stay
    # near their anchor, so the per-example differences (and with them the
    # pair variance sigma_hat^2, hence the swap-rate penalty) shrink by
    # orders of magnitude. Anchors refresh with ONE full-data pass every
    # sg_anchor_interval steps (amortized like the exact mode's, but the
    # cadence decouples from swap_interval and can be much longer); they
    # permute with (w, eta) on swaps — the control variate belongs to the
    # traveling configuration (unbiasedness is anchor-independent; staleness
    # costs only variance until the next refresh).
    sg_vr: bool = False
    # Anchor refresh cadence in steps (required > 0 when sg_vr).
    sg_anchor_interval: int = 0
    # Per-rung sgld step-size scaling (the accelerated-exploration half of
    # the reSGLD line — Deng et al. 2020 run the high-temperature chain at
    # a LARGER learning rate than the cold one; PAPERS.md arxiv 2301.01898):
    # "none"        — every rung uses sg_step (the default; matches the
    #                 committed sgld measurements).
    # "temperature" — rung k uses eps_k = sg_step * T_k: the unadjusted
    #                 Euler-Maruyama discretization bias is O(eps) per rung,
    #                 and the hot rungs exist to EXPLORE, not to be sampled
    #                 from — temperature-proportional steps buy transport
    #                 where bias is cheap while the cold rung (T=1, the one
    #                 that feeds the posterior) keeps the small exact-minded
    #                 step. Swap energies are unaffected (full-data or
    #                 corrected estimates, independent of eps). Requires a
    #                 finite ladder (no beta=0 / vr_hot_infinite rung: an
    #                 infinite temperature would mean an infinite step).
    sg_lr_scale: str = "none"
    # Step at which M_c activates, as a fraction of samples_per_chain (before
    # that: identity preconditioner while Welford statistics accumulate).
    precond_start_frac: float = 0.125
    # Shrinkage exponent on the normalized variance estimate:
    # M = clip(var/mean(var))^power. 1.0 = full empirical preconditioner,
    # 0.0 = identity (pure adaptive MALA/RW). Fractional powers damp noisy
    # Welford ratios — essential at high parameter counts (CNN: d~4k with a
    # burn-in of ~1.5k samples gives variance ratios that are mostly noise;
    # a full-power M freezes most dimensions).
    precond_power: float = 1.0
    # Robbins-Monro acceptance target for precond_mala (0.574 is the optimal
    # MALA acceptance rate, Roberts & Rosenthal 1998); precond_rw uses
    # adapt_target_accept (0.234, the RW optimum).
    mala_target_accept: float = 0.574
    # Deterministic warm start (precond_mala only): for the first
    # ``warmstart_frac`` of the run, chains take normalized gradient-ascent
    # steps on their tempered log-posterior (per-coordinate RMS step
    # ``warmstart_step``) with no MH test. An MCMC initialization scheme, not
    # a sampling kernel — it ends well inside burn-in (validation requires
    # warmstart_frac < precond_start_frac < burn_in), so posterior exactness
    # is untouched while chains reach the typical set in O(100) steps instead
    # of O(10k) tiny MALA moves (the d~4k CNN stalls at ~16% test acc in
    # 3000 steps without it). Scale and Welford adaptation only start after
    # the warm start, so M is estimated around the mode it lands in.
    warmstart_frac: float = 0.0
    warmstart_step: float = 0.01

    # Variational reference for the tempering path (stabilized PT —
    # Surjanovic et al., NeurIPS 2022; NOT reference behavior; ops/vref.py).
    # Anneal toward a diagonal-Gaussian reference q moment-matched to the
    # cold chain instead of toward the prior: the path becomes
    # prior * L^beta * (q/p_w)^(1-beta), exactly the posterior at beta=1 and
    # exactly q at beta=0. Fixes the measured transport failure of
    # prior-anchored tempering (healthy swap%% with ~zero cold<->hot round
    # trips, results/convergence.md): the hot end sits on the fitted
    # posterior approximation, not 25-sigma away from it. (mu, s^2) adapt by
    # Welford accumulation of the cold chain during burn-in and FREEZE at
    # the burn-in boundary — the retained-phase kernel is exactly Markov.
    # Requires the exact swap machinery (swap_rule="metropolis" +
    # swap_payload="untempered"), restore-likelihood semantics, and no
    # temper-switch phase (the reference quirk modes emulate entry-point
    # behavior that has no corrected-path analogue).
    variational_reference: bool = False
    # Correction activates at this fraction of samples_per_chain (before:
    # plain likelihood tempering while cold-chain moments accumulate).
    # Must lie in (0, burn_in); accumulation starts at half this point so
    # the init transient is excluded from the fit.
    vr_start_frac: float = 0.25
    # Variance inflation on the fitted q (>1 = heavier reference; guards an
    # under-dispersed burn-in estimate).
    vr_var_inflation: float = 1.0
    # At every swap event, refresh the hottest rung with an independence
    # proposal w' ~ q (exact MH at any beta; acceptance is identically 1
    # when the hot rung sits at beta=0, i.e. vr_hot_infinite). This is what
    # turns the fitted reference into actual replica regeneration.
    vr_regen: bool = True
    # Pin the hottest rung at T = inf (beta = 0), making it sample q itself
    # — the reference leg of Surjanovic et al.'s stabilized PT. Applied to
    # the built ladder (geometric or custom) by the sampler drivers.
    vr_hot_infinite: bool = False
    # How the reference (mu, scale) is obtained:
    # "welford" — the in-run fit above (accumulate during burn-in, freeze at
    #             the boundary). Diagonal family only.
    # "static"  — externally supplied, FIXED for the whole run, correction
    #             active from step 0 (vr_start_frac ignored). This is the
    #             round-based adaptation interface (ptnn/rounds.py): refit
    #             between rounds, each round exactly Markov — Surjanovic et
    #             al. 2022's actual schedule, and the answer to the
    #             staleness failure vref_transport.md measured for any
    #             frozen in-run fit on d=61. The reference arrays ride in
    #             ChainState (vr_mean = mu; vr_m2 = VARIANCE, not an M2
    #             accumulator; vr_chol = lower Cholesky for "full_cov") —
    #             inject them into init_state before sampling
    #             (kernel.set_static_reference).
    vr_mode: str = "welford"
    # Reference family: "diag" (N(mu, diag(s^2)); both modes) or "full_cov"
    # (N(mu, L L^T); static mode only — the full-covariance fit happens
    # between rounds on the host, ops/vref.py:fit_gaussian).
    vr_family: str = "diag"

    # Two-phase adaptive tempering: tempered until 60% of samples, then T := 1
    # with a likelihood rescale (pt_classification.py:302,317-324). The
    # reference's switch only fires when 0.6*samples is integral; mirrored in
    # ``temper_switch_step``.
    pt_phase_frac: float = 0.6

    # Burn-in fraction dropped in result aggregation (pt_classification.py:782).
    burn_in: float = 0.5

    # Surrogate-assisted PT (the reference's dead surrogate_interval /
    # surrogate_prob plumbing made functional — see ptnn/surrogate.py).
    # Surrogate refits + true-likelihood re-anchoring happen at chunk
    # boundaries, so chunk_steps doubles as the surrogate interval.
    use_surrogate: bool = False
    # "anchored"            — approximate: surrogate steps feed the carried
    #                         likelihood directly; chunk-boundary re-anchoring
    #                         bounds the bias (the published scheme's spirit).
    # "delayed_acceptance"  — exact: consecutive surrogate steps form one
    #                         composite proposal (inner RW-MH against the
    #                         surrogate target), corrected by a single true-
    #                         likelihood Metropolis test at segment close
    #                         (Christen & Fox 2005 two-stage MCMC, multi-step
    #                         segments) — every segment kernel leaves the
    #                         exact posterior invariant for the surrogate
    #                         coefficients in effect.
    surrogate_mode: str = "anchored"
    # Inner-move kind inside delayed-acceptance segments:
    # "rw"   — symmetric random walk (no q-ratio);
    # "mala" — Langevin drift on the ANALYTIC surrogate gradient (a few
    #          matvecs, no dataset pass) with the standard MALA q-ratio;
    #          mixes far better through a fitted surrogate. Exactness is
    #          unaffected either way (any proposal + correct q-ratio).
    surrogate_inner: str = "rw"
    # Surrogate model family:
    # "quadratic" — ridge fit of [1, z, z^2, (Pz)^2] features by normal
    #               equations (a few microseconds on the MXU);
    # "mlp"       — one-tanh-hidden-layer NN trained by warm-started
    #               full-batch Adam refits at chunk boundaries ("NN
    #               surrogate with SGD refits"); captures non-quadratic
    #               likelihood structure at the cost of a ~surrogate_fit_steps
    #               x buffer-sized training loop per refit. Exactness of
    #               delayed_acceptance is family-independent.
    surrogate_family: str = "quadratic"
    surrogate_hidden: int = 16  # MLP hidden units
    surrogate_fit_steps: int = 300  # Adam iterations per refit
    surrogate_fit_lr: float = 1e-2
    # Fit scope:
    # "global"    — one theta for the whole ladder, one shared ring buffer;
    # "per_chain" — one theta PER TEMPERATURE RUNG, each fit on that rung's
    #               own ring buffer (surrogate_buffer rows PER CHAIN). A
    #               quadratic fit is local, and hot rungs roam a far wider
    #               region of w-space than cold ones; per-rung fits track
    #               each locality instead of averaging the regimes. Fits are
    #               one vmapped batched ridge solve at chunk boundaries;
    #               exactness of delayed_acceptance is unaffected.
    surrogate_scope: str = "global"
    surrogate_prob: float = 0.25  # per-step prob of surrogate eval post-warmup
    surrogate_warmup_frac: float = 0.25  # collect-only fraction of the run
    surrogate_buffer: int = 2048  # ring rows (global: total, rounded up to
    #                               chains; per_chain: rows per chain)
    surrogate_proj: int = 64  # random-projection quadratic feature count
    surrogate_ridge: float = 1e-3
    surrogate_min_r2: float = 0.7  # trust gate: fall back to true evals below

    # Runtime knobs (no reference equivalent).
    # Forward-pass compute dtype for likelihood evaluations: "bfloat16" casts
    # weights+activations to bf16 (half the HBM traffic, single-pass MXU) and
    # keeps every likelihood REDUCTION in float32. Opt-in speed/precision
    # tradeoff: per-step log-likelihoods move by O(1e-2 relative fx error), so
    # parity with float32 runs is distributional, not bitwise. Langevin drift
    # stays float32 (strict proposal parity).
    eval_dtype: str = "float32"
    record_w: bool = True  # record full pos_w trace (the posterior)
    # Record the pos_w trace for only the first k chains (0 = all). The
    # trace is (samples, k, w_size): at 1024+ chains a full-w trace is a
    # multi-100MB host fetch per run — cold-chain-only (k=1) keeps ESS
    # diagnostics cheap on the tunneled backend. Under replicated ladders
    # (n_ladders > 1) the k traced chains are the first k COLD rungs
    # (stride rungs_per_ladder), so k=n_ladders captures exactly the
    # independent posterior samplers.
    record_w_chains: int = 0
    # Record the post-step eta (log noise variance) of the same chains
    # record_w_chains selects (trace key "eta") — the rounds driver
    # (ptnn/rounds.py) needs joint (w, eta) cold-chain draws to fit the
    # z-reference; regression task only.
    record_eta: bool = False
    # Keep every k-th trace row (1 = every step, the reference layout).
    # Device-side: each chunk's scan output is strided BEFORE the host
    # fetch, so a 1M-step run with thin=64 ships 64x fewer trace bytes
    # over the wire — the enabling knob for convergence studies at
    # 10^6-step budgets. Rows retained are the steps where
    # (index-within-chunk + 1) % thin == 0; the init row 0 is always
    # kept. Counters (accept%, swap%, pair stats) are exact regardless.
    # Round-trip/replica diagnostics need swap-resolution traces — with
    # track_replicas, thin must divide into the swap cadence story or the
    # crossing counts undercount (validate() rejects the combination).
    # Per-step sampler only; fused_step falls back with a warning.
    record_thin: int = 1
    record_fx: bool = False  # record posterior-predictive traces (ldmcmc mode)
    # Record the post-MH post-swap UNTEMPERED state log-likelihood per rung
    # each step (trace key "ll_cur") — the per-rung expectations that
    # marginal-likelihood estimation integrates (ops/evidence.py). Off by
    # default: trace["ll"] keeps the reference's proposal-likelihood
    # semantics and artifact layout untouched.
    record_ll_state: bool = False
    # Track replica identity through swaps (an int32 label permuted with the
    # traveling (w, eta)) and record it each step (trace key "replica").
    # Feeds the round-trip-rate and ladder-flow diagnostics
    # (ops/roundtrip.py) — the standard measure of whether replica exchange
    # actually transports configurations cold<->hot, which the reference's
    # swap%% scalar cannot distinguish from neighbor ping-ponging.
    track_replicas: bool = False
    chunk_steps: int = 1000  # steps per jitted chunk (host streaming cadence)
    # Fused-block execution (TPU-first; NOT reference behavior; ptnn/fused.py
    # + ops/pallas_step.py): run every inter-swap interval as ONE Pallas
    # kernel invocation with chain state resident in VMEM, so the per-step
    # scan dispatch floor (~20-40 us, fnn_roofline.md) amortizes over the
    # whole interval. Identical sampling semantics (pinned vs an oracle and
    # vs the per-step path); different RNG stream, so cross-path parity is
    # distributional. Scope: reference RW proposal, BOTH tasks, single
    # device, f32, working set within the VMEM budget (fused.runtime_reason;
    # outside it, sample()/throughput fall back to the per-step sampler
    # with a warning — those configs are compute-bound anyway).
    fused_step: bool = False
    # Unroll factor for the main step lax.scan (identical sampling
    # semantics at any value; results are bit-equal). Measured NEUTRAL on
    # the FNN-scale step (fnn_roofline.md "unroll ablation"): the ~20 us
    # per-iteration floor is per-kernel dispatch of the step's many small
    # fused kernels, which unrolling duplicates rather than amortizes —
    # the sequential MH dependence blocks cross-iteration fusion. Kept as
    # a tuning knob for larger-model steps where the balance may differ.
    scan_unroll: int = 1

    # ------------------------------------------------------------------
    @property
    def samples_per_chain(self) -> int:
        return int(self.num_samples / self.num_chains)

    @property
    def n_steps(self) -> int:
        """MCMC iterations per chain: the reference loops range(samples-1)
        (pt_classification.py:313); trace row 0 is the untouched init row."""
        return self.samples_per_chain - 1

    @property
    def temper_switch_step(self) -> int:
        """Step index at which adapttemp switches to 1, or n_steps+1 (never)
        when 0.6*samples is non-integral — mirroring the reference's exact
        ``i == samples*0.6`` comparison (pt_classification.py:320)."""
        pt = self.samples_per_chain * self.pt_phase_frac
        if float(pt).is_integer():
            return int(pt)
        return self.n_steps + 1

    @property
    def w_size(self) -> int:
        i, h, o = self.topology
        return i * h + h * o + h + o

    @property
    def rungs_per_ladder(self) -> int:
        """Rungs in each independent temperature ladder (= num_chains unless
        replicated ladders are on — see ``n_ladders``)."""
        return self.num_chains // self.n_ladders

    def validate(self) -> "PTConfig":
        if self.task not in ("classification", "regression"):
            raise ValueError(f"unknown task {self.task!r}")
        if self.swap_payload not in ("tempered", "tempered_times_T", "untempered"):
            raise ValueError(f"unknown swap_payload {self.swap_payload!r}")
        if self.swap_rule not in ("half_exp", "unclamped", "metropolis"):
            raise ValueError(f"unknown swap_rule {self.swap_rule!r}")
        if self.swap_rule == "metropolis" and self.swap_payload != "untempered":
            raise ValueError("metropolis swap rule requires untempered payloads")
        if self.swap_style not in ("bubbling", "even_odd"):
            raise ValueError(f"unknown swap_style {self.swap_style!r}")
        if self.record_thin < 1:
            raise ValueError(
                f"record_thin must be >= 1, got {self.record_thin}"
            )
        if self.record_thin > 1 and self.track_replicas:
            raise ValueError(
                "record_thin > 1 strides the replica trace below swap "
                "resolution, silently undercounting round trips — run "
                "transport diagnostics unthinned"
            )
        if self.n_ladders < 1:
            raise ValueError(f"n_ladders must be >=1, got {self.n_ladders}")
        if self.num_chains % self.n_ladders:
            raise ValueError(
                f"n_ladders={self.n_ladders} must divide "
                f"num_chains={self.num_chains}"
            )
        if self.n_ladders > 1:
            if self.rungs_per_ladder < 2:
                raise ValueError(
                    "replicated ladders need >=2 rungs each "
                    f"(num_chains={self.num_chains}, n_ladders={self.n_ladders})"
                )
            if self.variational_reference:
                # the VR fit/regen machinery assumes one cold rung (index 0)
                # and one hot rung (index C-1); pooled-fit support is future
                raise ValueError(
                    "variational_reference does not support n_ladders > 1"
                )
        if self.custom_ladder is not None:
            lad = tuple(float(t) for t in self.custom_ladder)
            if len(lad) != self.rungs_per_ladder:
                raise ValueError(
                    f"custom_ladder has {len(lad)} temperatures for "
                    f"{self.rungs_per_ladder} rungs per ladder"
                )
            if lad[0] != 1.0:
                raise ValueError("custom_ladder[0] must be 1.0 (cold chain)")
            if any(b >= a for b, a in zip(lad, lad[1:])):
                raise ValueError("custom_ladder must be strictly increasing")
            object.__setattr__(self, "custom_ladder", lad)  # frozen dataclass
        if self.drift_mode not in ("sequential", "batch", "pallas"):
            raise ValueError(f"unknown drift_mode {self.drift_mode!r}")
        if self.drift_chain_microbatch < 1 or (
            self.num_chains % self.drift_chain_microbatch
        ):
            raise ValueError(
                f"drift_chain_microbatch={self.drift_chain_microbatch} must "
                f"be >=1 and divide num_chains={self.num_chains}"
            )
        if self.qratio not in ("reference", "ldpt_legacy"):
            raise ValueError(f"unknown qratio {self.qratio!r}")
        if self.scan_unroll < 1:
            raise ValueError(f"scan_unroll={self.scan_unroll} must be >= 1")
        if self.surrogate_mode not in ("anchored", "delayed_acceptance"):
            raise ValueError(f"unknown surrogate_mode {self.surrogate_mode!r}")
        if self.surrogate_inner not in ("rw", "mala"):
            raise ValueError(f"unknown surrogate_inner {self.surrogate_inner!r}")
        if self.eval_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"unknown eval_dtype {self.eval_dtype!r}")
        if (
            self.use_surrogate
            and self.surrogate_mode == "delayed_acceptance"
            and self.stale_likelihood_after_swap
        ):
            raise ValueError(
                "delayed_acceptance requires restore-likelihood swap "
                "semantics: stale swaps permute (w, eta) but not ll, so the "
                "segment-closure Metropolis test would correct against a "
                "likelihood that does not correspond to the anchor weights, "
                "voiding the mode's exactness guarantee"
            )
        if self.surrogate_scope not in ("global", "per_chain"):
            raise ValueError(
                f"unknown surrogate_scope {self.surrogate_scope!r}"
            )
        if self.surrogate_family not in ("quadratic", "mlp"):
            raise ValueError(
                f"unknown surrogate_family {self.surrogate_family!r}"
            )
        if self.use_surrogate:
            # activation threshold per family; see surrogate.init_for
            if self.surrogate_family == "mlp":
                fdim = 4 * self.surrogate_hidden + 2 * (self.w_size + 1)
            else:
                # features span [w, eta]; surrogate.feature_dim
                fdim = 1 + 2 * (self.w_size + 1) + self.surrogate_proj
            if self.surrogate_scope == "per_chain":
                if self.surrogate_buffer < fdim:
                    raise ValueError(
                        f"surrogate_buffer={self.surrogate_buffer} (per-chain "
                        f"rows) is below the surrogate feature dimension "
                        f"{fdim} for w_size={self.w_size}: the per-chain "
                        "ridge fits would never activate while still paying "
                        "per-step bookkeeping. Raise surrogate_buffer to >= "
                        f"{fdim} or lower surrogate_proj."
                    )
            else:
                rounded = (
                    (self.surrogate_buffer + self.num_chains - 1)
                    // self.num_chains
                ) * self.num_chains
                if rounded < fdim:
                    raise ValueError(
                        f"surrogate_buffer={self.surrogate_buffer} (rounded "
                        f"to {rounded}) is below the surrogate feature "
                        f"dimension {fdim} for w_size={self.w_size}: the "
                        "ridge fit would never activate while still paying "
                        "per-step bookkeeping. Raise surrogate_buffer to >= "
                        f"{fdim} or lower surrogate_proj."
                    )
        if self.proposal not in (
            "reference", "precond_rw", "precond_mala", "hmc", "pcn", "sgld"
        ):
            raise ValueError(f"unknown proposal {self.proposal!r}")
        if self.warmstart_frac and self.proposal not in (
            "precond_mala", "hmc"
        ):
            raise ValueError(
                "warmstart_frac needs gradients: precond_mala/hmc only"
            )
        if self.proposal == "hmc":
            if self.hmc_leapfrog < 1:
                raise ValueError("hmc_leapfrog must be >= 1")
            if not 0.0 <= self.hmc_eps_jitter < 1.0:
                raise ValueError("hmc_eps_jitter must lie in [0, 1)")
            if not 0.0 < self.hmc_target_accept < 1.0:
                raise ValueError("hmc_target_accept must lie in (0, 1)")
            if self.hmc_adapt_traj:
                if self.n_ladders < 2:
                    raise ValueError(
                        "hmc_adapt_traj (ChEES) estimates its cross-chain "
                        "expectations over the replicas at each rung — it "
                        "requires replicated ladders (n_ladders >= 2)"
                    )
                if self.chees_rate <= 0.0:
                    raise ValueError("chees_rate must be > 0")
        elif self.hmc_adapt_traj:
            raise ValueError("hmc_adapt_traj applies to proposal='hmc' only")
        if self.proposal != "reference":
            if self.use_langevin_gradients:
                raise ValueError(
                    "precond_*/sgld proposals replace the reference proposal "
                    "machinery entirely; use_langevin_gradients must be False"
                )
            if self.use_surrogate:
                raise ValueError(
                    "precond_*/sgld proposals are not combined with "
                    "surrogate modes (the surrogate inner kernels have their "
                    "own proposal machinery)"
                )
            if self.adapt_step_size:
                raise ValueError(
                    "precond_*/sgld proposals manage their own step scale; "
                    "leave adapt_step_size=False"
                )
        if self.proposal != "sgld" and (self.sg_vr or self.sg_anchor_interval):
            raise ValueError(
                "sg_vr/sg_anchor_interval apply to proposal='sgld'"
            )
        if self.sg_lr_scale not in ("none", "temperature"):
            raise ValueError("sg_lr_scale must be 'none' or 'temperature'")
        if self.sg_lr_scale != "none" and self.proposal != "sgld":
            raise ValueError("sg_lr_scale applies to proposal='sgld'")
        if self.sg_lr_scale != "none" and self.vr_hot_infinite:
            # Explicit guard for the invariant the doc comment above
            # sg_lr_scale promises: eps_c = sg_step * T_c is infinite at a
            # beta=0 rung. Today sgld already excludes variational_reference
            # (which vr_hot_infinite requires), but that exclusion is
            # incidental — enforce the step-size invariant directly.
            raise ValueError(
                "sg_lr_scale='temperature' requires a finite ladder: "
                "vr_hot_infinite pins the hottest rung at beta=0 "
                "(T=infinity), where a temperature-proportional step is "
                "infinite"
            )
        if self.proposal == "sgld":
            if self.sg_batch <= 0:
                raise ValueError(
                    "proposal='sgld' needs sg_batch > 0: the whole point is "
                    "minibatch-subsampled likelihood gradients"
                )
            if self.sg_step <= 0.0:
                raise ValueError("sg_step must be positive")
            if self.sg_swap not in ("exact", "corrected"):
                raise ValueError("sg_swap must be 'exact' or 'corrected'")
            if self.sg_vr:
                if self.sg_swap != "corrected":
                    raise ValueError(
                        "sg_vr reduces the CORRECTED swap test's estimator "
                        "variance; sg_swap='exact' has no estimator to "
                        "variance-reduce"
                    )
                if self.sg_anchor_interval <= 0:
                    raise ValueError(
                        "sg_vr needs sg_anchor_interval > 0 (full-data "
                        "anchor refresh cadence in steps)"
                    )
            if self.swap_payload != "untempered" or self.swap_rule != "metropolis":
                raise ValueError(
                    "sgld swaps use untempered energies under the "
                    "detailed-balance rule: set swap_payload='untempered', "
                    "swap_rule='metropolis' (the reference quirk rules have "
                    "no noisy-energy analogue)"
                )
            if self.stale_likelihood_after_swap:
                raise ValueError(
                    "sgld requires restore-likelihood swap semantics (the "
                    "carried energy travels with the configuration)"
                )
            if 0 < self.temper_switch_step <= self.n_steps:
                raise ValueError(
                    "sgld requires the canonical (no temper-switch) "
                    "schedule: pass pt_phase_frac >= 1. The 60% switch "
                    "collapses every rung to T=1 mid-run, which the "
                    "constant-beta SGLD drift does not model"
                )
            if self.variational_reference:
                raise ValueError(
                    "sgld + variational_reference is not combined (the "
                    "corrected-path gradient/swap terms are not threaded "
                    "through the stochastic-gradient branch)"
                )
            if self.record_fx:
                raise ValueError(
                    "sgld does not carry posterior-predictive fx traces "
                    "(metrics refresh at swap cadence only); record_fx=False"
                )
        if self.proposal in ("precond_rw", "precond_mala", "hmc", "pcn"):
            if not 0.0 < self.precond_start_frac < self.burn_in:
                raise ValueError(
                    "precond_start_frac must lie in (0, burn_in): the "
                    "preconditioner freezes at burn-in end and needs Welford "
                    "samples before activating"
                )
            if not 0.0 <= self.warmstart_frac < self.precond_start_frac:
                raise ValueError(
                    "warmstart_frac must lie in [0, precond_start_frac): "
                    "Welford statistics are collected between warm-start end "
                    "and preconditioner activation"
                )
        if (
            self.proposal in ("precond_mala", "hmc")
            and self.stale_likelihood_after_swap
        ):
            raise ValueError(
                f"{self.proposal} requires restore-likelihood swap semantics: "
                "the cached gradient permutes with (w, eta) at swaps, which "
                "is only coherent when ll/prior permute too"
            )
        if self.qratio == "ldpt_legacy" and self.adapt_step_size:
            raise ValueError(
                "adapt_step_size is incompatible with the legacy q-ratio "
                "emulation (its pdf cliff is defined by the fixed step_w)"
            )
        if self.variational_reference:
            if self.swaps_enabled and self.swap_rule != "metropolis":
                raise ValueError(
                    "variational_reference corrects the tempering path "
                    "exactly; the swap energy E = LL - corr is only valid "
                    "under swap_rule='metropolis' with untempered payloads "
                    "(the half_exp/unclamped rules emulate reference quirks "
                    "that have no corrected-path analogue)"
                )
            if self.stale_likelihood_after_swap:
                raise ValueError(
                    "variational_reference requires restore-likelihood swap "
                    "semantics: the swap energy is recomputed from the "
                    "traveling w, which must stay consistent with ll/prior"
                )
            if self.use_surrogate:
                raise ValueError(
                    "variational_reference is not combined with surrogate "
                    "modes (the surrogate approximates the LIKELIHOOD; its "
                    "inner kernels would need the path correction threaded "
                    "through every branch — out of scope)"
                )
            if 0 < self.temper_switch_step <= self.n_steps:
                raise ValueError(
                    "variational_reference requires the canonical (no "
                    "temper-switch) schedule: pass pt_phase_frac >= 1 (e.g. "
                    "classification_preset(canonical=True)). The 60% switch "
                    "collapses every rung to T=1, where the corrected path "
                    "is pointless"
                )
            if self.qratio != "reference":
                raise ValueError(
                    "variational_reference is exactness-focused; the legacy "
                    "q-ratio emulation is excluded"
                )
            if self.vr_mode not in ("welford", "static"):
                raise ValueError(f"unknown vr_mode {self.vr_mode!r}")
            if self.vr_family not in ("diag", "full_cov"):
                raise ValueError(f"unknown vr_family {self.vr_family!r}")
            if self.vr_family == "full_cov" and self.vr_mode != "static":
                raise ValueError(
                    "vr_family='full_cov' requires vr_mode='static': the "
                    "full-covariance fit happens between rounds on the host "
                    "(ptnn/rounds.py), not by in-run Welford accumulation"
                )
            if self.vr_mode == "welford":
                if not 0.0 < self.vr_start_frac < self.burn_in:
                    raise ValueError(
                        "vr_start_frac must lie in (0, burn_in): the "
                        "reference fit freezes at burn-in end and needs "
                        "Welford samples before activating"
                    )
                if self.warmstart_frac >= self.vr_start_frac:
                    raise ValueError(
                        "vr_start_frac must exceed warmstart_frac: moment "
                        "accumulation only starts after the warm start, and "
                        "the correction needs accumulated samples when it "
                        "activates"
                    )
            if self.vr_var_inflation < 1.0:
                raise ValueError(
                    "vr_var_inflation < 1 would make the fitted reference "
                    "LIGHTER-tailed than its own moment estimate"
                )
        elif self.vr_mode != "welford" or self.vr_family != "diag":
            raise ValueError(
                "vr_mode/vr_family apply to variational_reference runs only"
            )
        if self.vr_hot_infinite and not (
            self.variational_reference and self.vr_regen
        ):
            raise ValueError(
                "vr_hot_infinite pins the hottest rung at beta=0, where the "
                "target IS the fitted q: only meaningful with "
                "variational_reference and vr_regen (without regeneration "
                "the beta=0 rung would random-walk a distribution it could "
                "sample IID)"
            )
        if self.fused_step:
            if self.use_langevin_gradients or self.proposal not in (
                "reference",
                "precond_mala",
                "hmc",
            ):
                raise ValueError(
                    "fused_step covers the reference RW, precond-MALA and "
                    "HMC proposals; other modes keep the per-step sampler"
                )
            if self.use_surrogate or self.variational_reference:
                raise ValueError(
                    "fused_step excludes surrogate/variational-reference "
                    "machinery"
                )
            if self.record_fx or self.record_ll_state:
                raise ValueError(
                    "fused_step does not record fx/ll_cur traces"
                )
            if self.eval_dtype != "float32":
                raise ValueError("fused_step is float32-only")
        if self.num_chains < 2 and self.swaps_enabled:
            raise ValueError(
                "need at least 2 chains for parallel tempering (single-chain "
                "MCMC: disable swapping with swap_interval=0)"
            )
        return self

    @property
    def swaps_enabled(self) -> bool:
        return 0 < self.swap_interval <= self.n_steps


# ---------------------------------------------------------------------------
# Presets reproducing the reference experiment drivers.


def classification_preset(
    topology: Tuple[int, int, int],
    num_samples: int = 50_000,
    use_langevin_gradients: bool = False,
    learn_rate: float = 0.01,
    num_chains: int = 10,
    swap_ratio: float = 0.02,
    maxtemp: float = 10.0,
    canonical: bool = False,
    legacy_lg: bool = False,
) -> PTConfig:
    """Hyperparameter block of pt_classification.py:1036-1045.

    ``canonical=True`` removes the adaptive-temperature phase — chains stay
    tempered for the whole run, as in
    Misc_code/canonical_pt_classifier.py (zero ``adapttemp`` switches there,
    SURVEY.md §2.2) — via a never-firing switch step.

    ``legacy_lg=True`` reproduces the variant that generated the committed
    PT_EvalSwapLG* baselines: Langevin drift every step with the legacy
    (buggy) q-ratio (see PTConfig.qratio) — effectively noisy SGD with
    near-certain acceptance near modes.
    """
    swap_interval = int(swap_ratio * num_samples / num_chains)
    return PTConfig(
        pt_phase_frac=2.0 if canonical else 0.6,
        # The committed LG tables' acceptance is exactly half the RW tables'
        # on the large sets (bank 31.5 vs 61.6, PenDigit 25.1 vs 50.7):
        # l_prob stays 0.5 and the legacy ratio simply rejects the Langevin
        # half when the epoch drift is large (small sets: accepts it all).
        qratio="ldpt_legacy" if legacy_lg else "reference",
        # Untempered payloads reproduce the committed LG tables' ~50% swap
        # rate (converged equal-likelihood chains under the 0.5*exp rule);
        # see PARITY.md "classification Langevin" notes.
        swap_payload="untempered" if legacy_lg else "tempered",
        task="classification",
        topology=topology,
        num_samples=num_samples,
        num_chains=num_chains,
        maxtemp=maxtemp,
        swap_interval=swap_interval,
        swap_offset=1,
        use_langevin_gradients=use_langevin_gradients or legacy_lg,
        learn_rate=learn_rate,
        burn_in=0.5,
    ).validate()


def regression_preset(
    topology: Tuple[int, int, int] = (4, 10, 1),
    num_samples: int = 100_000,
    use_langevin_gradients: bool = True,
    langevin_prob: float = 0.5,
    learn_rate: float = 0.1,
    num_chains: int = 10,
    swap_ratio: float = 0.01,
    maxtemp: float = 2.0,
) -> PTConfig:
    """Hyperparameter block of pt_timeseries_regression.py:915-955."""
    swap_interval = int(swap_ratio * num_samples / num_chains)
    return PTConfig(
        task="regression",
        topology=topology,
        num_samples=num_samples,
        num_chains=num_chains,
        maxtemp=maxtemp,
        swap_interval=swap_interval,
        swap_offset=0,
        swap_payload="tempered_times_T",
        use_langevin_gradients=use_langevin_gradients,
        langevin_prob=langevin_prob,
        learn_rate=learn_rate,
        burn_in=0.5,
    ).validate()


def to_json_dict(cfg: PTConfig) -> dict:
    """JSON-safe dict of a config (tuples -> lists; inf survives as the
    non-strict JSON ``Infinity`` literal, which json.load round-trips)."""
    return dataclasses.asdict(cfg)


def from_json_dict(d: dict) -> PTConfig:
    """Rebuild a validated PTConfig from ``to_json_dict`` output.

    Unknown keys are ignored (forward compatibility with configs written by
    newer versions); list-typed fields are restored to tuples.
    """
    names = {f.name for f in dataclasses.fields(PTConfig)}
    kw = {k: v for k, v in d.items() if k in names}
    for k in ("topology", "custom_ladder"):
        if kw.get(k) is not None:
            kw[k] = tuple(kw[k])
    return PTConfig(**kw).validate()
