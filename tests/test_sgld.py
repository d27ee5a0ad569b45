"""Tests for replica-exchange stochastic-gradient Langevin dynamics
(PTConfig.proposal="sgld"; kernel.step_sgld; Deng et al. 2020 /
PAPERS.md arxiv 2301.01898, 2010.01084).

Sharpest pins:
* sg_batch = N degenerates to the exact full batch (permutation-prefix
  sampling), so the corrected-swap minibatch energy equals the true
  full-data log-likelihood exactly — checked by recomputing from the w
  trace at swap rows;
* in exact mode the carried energy/metrics refresh ONLY at swap cadence —
  trace rows are piecewise constant between swap events;
* the variance penalty enters the metropolis exponent (swap-module unit
  test) and measurably suppresses acceptance at small batches.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import ptnn
from ptnn.data import load_classification, load_regression
from ptnn.parallel import swap as swap_mod


def _sgld_cfg(**kw):
    base = dict(
        task="regression",
        topology=(4, 10, 1),
        num_samples=8 * 2000,
        num_chains=8,
        maxtemp=5.0,
        swap_interval=20,
        swap_offset=0,
        swap_payload="untempered",
        swap_rule="metropolis",
        swap_style="even_odd",
        pt_phase_frac=2.0,
        proposal="sgld",
        sg_batch=32,
        sg_step=2e-5,
        record_w=False,
        chunk_steps=200,
    )
    base.update(kw)
    return ptnn.PTConfig(**base).validate()


def test_validation_gates():
    ok = _sgld_cfg()
    assert ok.proposal == "sgld"
    with pytest.raises(ValueError, match="sg_batch"):
        _sgld_cfg(sg_batch=0)
    with pytest.raises(ValueError, match="sg_step"):
        _sgld_cfg(sg_step=0.0)
    with pytest.raises(ValueError, match="untempered"):
        _sgld_cfg(swap_payload="tempered", swap_rule="half_exp")
    with pytest.raises(ValueError, match="canonical"):
        _sgld_cfg(pt_phase_frac=0.6)
    with pytest.raises(ValueError, match="restore-likelihood"):
        _sgld_cfg(stale_likelihood_after_swap=True)
    with pytest.raises(ValueError, match="sg_swap"):
        _sgld_cfg(sg_swap="bogus")
    with pytest.raises(ValueError, match="use_langevin_gradients"):
        _sgld_cfg(use_langevin_gradients=True)
    with pytest.raises(ValueError, match="variational_reference"):
        _sgld_cfg(variational_reference=True, vr_start_frac=0.25)


def test_swap_penalty_unit():
    """pair_penalty shifts the metropolis exponent in both sweep styles."""
    key = jax.random.PRNGKey(0)
    ll = jnp.asarray([0.0, 10.0, 20.0, 30.0])
    betas = jnp.asarray([1.0, 0.5, 0.25, 0.125])
    res0 = swap_mod.disjoint_pair_permutation(ll, key, betas=betas, parity=0)
    # zero penalty == no penalty
    resz = swap_mod.disjoint_pair_permutation(
        ll, key, betas=betas, parity=0, pair_penalty=jnp.zeros(3)
    )
    np.testing.assert_array_equal(res0.pair_accept, resz.pair_accept)
    # a huge penalty kills every pair
    resk = swap_mod.disjoint_pair_permutation(
        ll, key, betas=betas, parity=0, pair_penalty=jnp.full(3, 1e6)
    )
    assert float(jnp.max(resk.pair_accept)) == 0.0
    # exact shift: exponent (b1-b2)(lh2-lh1) - p
    p = jnp.asarray([1.0, 2.0, 3.0])
    resp = swap_mod.sweep_permutation(
        ll, key, rule="metropolis", betas=betas, pair_penalty=p
    )
    # first pair of the bubbling sweep sees the original payloads
    want0 = min(1.0, np.exp((1.0 - 0.5) * 10.0 - 1.0))
    assert float(resp.pair_accept[0]) == pytest.approx(want0)
    with pytest.raises(ValueError, match="metropolis"):
        swap_mod.sweep_permutation(
            ll, key, rule="half_exp", pair_penalty=p
        )


def test_full_batch_corrected_energy_is_exact():
    """sg_batch = N: the permutation-prefix batch IS the dataset, so the
    corrected-swap energy estimate equals the true full-data log-likelihood
    — recomputed here from the recorded w trace at a swap row."""
    prob = load_classification("iris")
    n = prob.train.shape[0]
    cfg = _sgld_cfg(
        task="classification",
        topology=prob.topology,
        num_samples=4 * 400,
        num_chains=4,
        maxtemp=10.0,
        sg_batch=10 ** 6,  # clipped to N inside the kernel
        sg_step=1e-4,
        sg_swap="corrected",
        record_w=True,
        chunk_steps=100,
    )
    res = ptnn.sample(cfg, prob.train, prob.test, seed=1)
    from ptnn import kernel
    from ptnn.sampler import make_dataset

    data = make_dataset(cfg, prob.train, prob.test)
    spec = kernel.default_spec(cfg)
    # row r of the trace is written by step r-1; swap events fire at steps
    # with i % 20 == 0, i > 0 -> rows 21, 41, ... carry refreshed energies
    r = 201
    w_row = np.asarray(res.traces["w"][r])  # (C, W)
    ll_row = np.asarray(res.traces["ll"][r])  # (C,)
    for ci in range(cfg.num_chains):
        out = spec.forward(jnp.asarray(w_row[ci]), data.x_train)
        logp = spec.log_probs(out)
        yi = np.asarray(data.y_train, np.int64)
        want = float(np.sum(np.asarray(logp)[np.arange(n), yi]))
        assert ll_row[ci] == pytest.approx(want, rel=1e-5, abs=1e-2)


def test_exact_mode_piecewise_constant_metrics():
    """In sg_swap='exact' the carried metrics refresh only at swap cadence:
    between swap rows the rmse_test trace must be exactly constant."""
    prob = load_regression("Sunspot")
    cfg = _sgld_cfg(num_samples=8 * 400, chunk_steps=100)
    res = ptnn.sample(cfg, prob.train, prob.test, seed=0)
    r = np.asarray(res.traces["rmse_test"][:, 0])
    # swap events at steps 20, 40, ... -> trace rows 21, 41, ...; rows in
    # between carry the same refreshed value
    seg = r[22:40]  # strictly inside one inter-swap window
    assert np.all(seg == seg[0])
    # ... and the refreshes actually change it across windows
    assert len(np.unique(r[21::20])) > 3
    # no-MH bookkeeping: every move counts as accepted (the ratio's
    # denominator is the reference's samples count, one more than the
    # steps taken, so it reads (S-1)/S)
    assert np.all(np.asarray(res.accept_ratio_per_chain) > 99.0)


def test_sgld_learns_and_transports():
    """End to end on Sunspot: SGLD at minibatch 32 reaches a sane posterior
    region, swaps fire under the corrected test, and replica transport
    diagnostics ride along."""
    from ptnn.ops.roundtrip import roundtrip_stats

    prob = load_regression("Sunspot")
    cfg = _sgld_cfg(
        num_samples=8 * 3000,
        sg_swap="corrected",
        swap_interval=10,
        track_replicas=True,
        chunk_steps=250,
    )
    res = ptnn.sample(cfg, prob.train, prob.test, seed=0)
    b = cfg.samples_per_chain // 2
    rmse_cold = float(np.mean(res.traces["rmse_test"][b:, 0]))
    assert rmse_cold < 0.08  # data scale ~0.25; exact modes reach ~0.03
    assert 1.0 < res.swap_percent < 80.0
    stats = roundtrip_stats(res.traces["replica"])
    assert stats.flow_up.shape == (cfg.num_chains,)
    assert np.isfinite(np.asarray(res.final_state.ll)).all()


def test_sgld_sharded_matches_unsharded():
    """sgld under an 8-device chain mesh: the shared minibatch gather
    replicates, per-rung moves shard, and the corrected swap's per-pair
    variance reduction crosses shard boundaries. Traces must match the
    single-device run."""
    from ptnn.parallel import mesh as mesh_mod

    prob = load_regression("Sunspot")
    cfg = _sgld_cfg(
        num_samples=8 * 400, sg_swap="corrected", chunk_steps=100
    )
    r_plain = ptnn.sample(cfg, prob.train, prob.test, seed=3)
    r_mesh = ptnn.sample(
        cfg, prob.train, prob.test, seed=3, mesh=mesh_mod.make_mesh()
    )
    np.testing.assert_allclose(
        r_plain.traces["ll"], r_mesh.traces["ll"], rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(r_plain.final_state.w),
        np.asarray(r_mesh.final_state.w),
        rtol=1e-4,
        atol=1e-4,
    )


def test_sgld_checkpoint_resume_identical(tmp_path):
    prob = load_regression("Sunspot")
    cfg = _sgld_cfg(num_samples=8 * 600, chunk_steps=100)
    full = ptnn.sample(cfg, prob.train, prob.test, seed=7)
    ck = str(tmp_path / "sg.npz")
    r1 = ptnn.sample(
        cfg, prob.train, prob.test, seed=7,
        checkpoint_path=ck, checkpoint_every=2,
    )
    r2 = ptnn.sample(
        cfg, prob.train, prob.test, seed=7,
        checkpoint_path=ck, checkpoint_every=2,
    )
    for r in (r1, r2):
        np.testing.assert_array_equal(full.traces["ll"], r.traces["ll"])
        np.testing.assert_array_equal(
            np.asarray(full.final_state.w), np.asarray(r.final_state.w)
        )


def test_sgld_respects_replicated_ladders():
    """reSGLD composes with n_ladders: swap pairs never cross a ladder
    boundary in either sg_swap mode (the pair mask applies to the sgld
    swap path via do_swap like every other proposal)."""
    prob = load_regression("Sunspot")
    for mode in ("exact", "corrected"):
        cfg = _sgld_cfg(
            n_ladders=2, track_replicas=True, sg_swap=mode,
            num_samples=8 * 600, chunk_steps=200,
        )
        res = ptnn.sample(cfg, prob.train, prob.test, seed=4)
        k = cfg.rungs_per_ladder
        rid = np.asarray(res.traces["replica"])
        np.testing.assert_array_equal(
            rid // k,
            np.broadcast_to(np.arange(cfg.num_chains) // k, rid.shape),
        )
        assert int(res.final_state.n_swap_accepted) > 0


# ---------------------------------------------------------------------------
# SVRG control variates for the corrected swap (cfg.sg_vr; arxiv 2010.01084)


def test_vr_validation_gates():
    with pytest.raises(ValueError, match="sg_vr reduces the CORRECTED"):
        _sgld_cfg(sg_vr=True, sg_anchor_interval=100)
    with pytest.raises(ValueError, match="sg_anchor_interval"):
        _sgld_cfg(sg_swap="corrected", sg_vr=True)
    with pytest.raises(ValueError, match="apply to proposal='sgld'"):
        ptnn.PTConfig(
            task="regression", topology=(4, 10, 1), num_samples=800,
            num_chains=8, maxtemp=5.0, swap_interval=20, swap_offset=0,
            sg_vr=True,
        ).validate()


def test_vr_full_batch_energy_is_exact():
    """sg_batch = N with sg_vr: the centered estimator telescopes to the
    exact full-data log-likelihood (the anchor terms cancel against the
    stored anchor energy), whatever the anchor staleness."""
    prob = load_classification("iris")
    n = prob.train.shape[0]
    cfg = _sgld_cfg(
        task="classification",
        topology=prob.topology,
        num_samples=4 * 400,
        num_chains=4,
        maxtemp=10.0,
        sg_batch=10 ** 6,
        sg_step=1e-4,
        sg_swap="corrected",
        sg_vr=True,
        sg_anchor_interval=130,  # deliberately NOT swap-aligned
        record_w=True,
        chunk_steps=100,
    )
    res = ptnn.sample(cfg, prob.train, prob.test, seed=1)
    from ptnn import kernel
    from ptnn.sampler import make_dataset

    data = make_dataset(cfg, prob.train, prob.test)
    spec = kernel.default_spec(cfg)
    r = 201  # a swap row (see test_full_batch_corrected_energy_is_exact)
    w_row = np.asarray(res.traces["w"][r])
    ll_row = np.asarray(res.traces["ll"][r])
    for ci in range(cfg.num_chains):
        out = spec.forward(jnp.asarray(w_row[ci]), data.x_train)
        logp = spec.log_probs(out)
        yi = np.asarray(data.y_train, np.int64)
        want = float(np.sum(np.asarray(logp)[np.arange(n), yi]))
        assert ll_row[ci] == pytest.approx(want, rel=1e-5, abs=5e-2)


def test_vr_boosts_swap_acceptance_at_small_batch():
    """The point of the control variate: at B << N the naive corrected
    test's variance penalty crushes swap acceptance; anchored estimators
    restore most of it. Same seed, same schedule, only sg_vr differs."""
    prob = load_regression("Sunspot")
    kw = dict(
        num_samples=8 * 1500,
        sg_batch=16,
        sg_swap="corrected",
        chunk_steps=300,
    )
    plain = ptnn.sample(
        _sgld_cfg(**kw), prob.train, prob.test, seed=5
    )
    vr = ptnn.sample(
        _sgld_cfg(sg_vr=True, sg_anchor_interval=20, **kw),
        prob.train, prob.test, seed=5,
    )
    assert np.isfinite(vr.traces["ll"][1:]).all()
    # strictly more accepted swaps under variance reduction, by a margin
    assert vr.swap_percent > plain.swap_percent + 5.0
    # and the anchors are actually live (refreshed away from the init)
    st = vr.final_state
    assert float(np.abs(np.asarray(st.sg_anchor_w)).mean()) > 0.0
    assert np.isfinite(np.asarray(st.sg_anchor_full)).all()


# ---------------------------------------------------------------------------
# Per-rung step scaling (cfg.sg_lr_scale; the reSGLD accelerated-exploration
# recipe — hot chains at larger learning rates, Deng et al. 2020 /
# arxiv 2301.01898)


def test_lr_scale_validation_gates():
    with pytest.raises(ValueError, match="sg_lr_scale"):
        _sgld_cfg(sg_lr_scale="bogus")
    with pytest.raises(ValueError, match="applies to proposal='sgld'"):
        ptnn.PTConfig(
            task="regression", topology=(4, 10, 1), num_samples=800,
            num_chains=8, maxtemp=5.0, swap_interval=20, swap_offset=0,
            sg_lr_scale="temperature",
        ).validate()


def test_lr_scale_hot_rung_is_plain_run_at_scaled_step():
    """Sharp degeneracy pin: with swaps disabled chains are independent,
    and the SHARED rng draws (batch index + noise planes) are identical
    across configs — so the T=2 rung under sg_lr_scale='temperature' at
    sg_step=s must be BIT-IDENTICAL to the same rung under 'none' at
    sg_step=2s. The cold rungs (eps s vs 2s) must differ."""
    prob = load_regression("Sunspot")
    kw = dict(
        num_samples=2 * 150, num_chains=2, maxtemp=2.0,
        custom_ladder=(1.0, 2.0), swap_interval=1000, record_w=True,
        chunk_steps=150,
    )
    scaled = ptnn.sample(
        _sgld_cfg(sg_lr_scale="temperature", sg_step=2e-5, **kw),
        prob.train, prob.test, seed=2,
    )
    plain2x = ptnn.sample(
        _sgld_cfg(sg_step=4e-5, **kw), prob.train, prob.test, seed=2
    )
    w_s = np.asarray(scaled.traces["w"])
    w_p = np.asarray(plain2x.traces["w"])
    np.testing.assert_array_equal(w_s[:, 1, :], w_p[:, 1, :])
    assert np.any(w_s[1:, 0, :] != w_p[1:, 0, :])


def test_lr_scale_hot_rungs_take_bigger_steps():
    """The observable contract: per-step displacement scales like
    sqrt(eps_k) (the injected noise dominates once the early descent
    transient has passed), so the hottest rung must move ~sqrt(T_max)
    farther per step than the cold rung under 'temperature' scaling — and
    must NOT under 'none'. Swaps are disabled by cadence (interval > run
    length) so displacement is purely the Langevin move; only the LATE
    half of the run is measured (the early drift-dominated descent is
    shared across rungs and dilutes the ratio)."""
    prob = load_regression("Sunspot")
    kw = dict(
        num_samples=8 * 200, swap_interval=1000, record_w=True,
        chunk_steps=200,
    )
    disp = {}
    for mode in ("none", "temperature"):
        res = ptnn.sample(
            _sgld_cfg(sg_lr_scale=mode, **kw), prob.train, prob.test, seed=3
        )
        w = np.asarray(res.traces["w"])  # (S, C, W)
        d = np.linalg.norm(np.diff(w, axis=0), axis=-1)  # (S-1, C)
        disp[mode] = d[d.shape[0] // 2 :].mean(axis=0)  # late-half mean
    ratio_scaled = disp["temperature"][-1] / disp["temperature"][0]
    ratio_plain = disp["none"][-1] / disp["none"][0]
    # maxtemp=5 geometric ladder: sqrt(5) ~ 2.24 expected (measured 2.22)
    assert ratio_scaled > 1.8
    assert ratio_plain < 1.2


def test_vr_checkpoint_resume_identical(tmp_path):
    prob = load_regression("Sunspot")
    cfg = _sgld_cfg(
        num_samples=8 * 600, sg_swap="corrected", sg_vr=True,
        sg_anchor_interval=50, chunk_steps=100,
    )
    full = ptnn.sample(cfg, prob.train, prob.test, seed=7)
    ck = str(tmp_path / "sgvr.npz")
    r1 = ptnn.sample(
        cfg, prob.train, prob.test, seed=7,
        checkpoint_path=ck, checkpoint_every=2,
    )
    r2 = ptnn.sample(
        cfg, prob.train, prob.test, seed=7,
        checkpoint_path=ck, checkpoint_every=2,
    )
    for r in (r1, r2):
        np.testing.assert_array_equal(full.traces["ll"], r.traces["ll"])
        np.testing.assert_array_equal(
            np.asarray(full.final_state.sg_anchor_w),
            np.asarray(r.final_state.sg_anchor_w),
        )
