"""Tests for the variational-reference tempering path (stabilized PT).

ops/vref.py + the kernel wiring (corrected MH, corrected swap energy,
hot-rung regeneration, Welford fit with burn-in freeze). The sharpest
correctness probes:

* before activation the corrected path IS the plain path — streams must be
  bit-identical to a no-VR run up to the activation step;
* at beta=0 (vr_hot_infinite) the regeneration acceptance ratio cancels
  algebraically to exactly 1 — any wiring error in prior/corr/log-q breaks
  the 100% acceptance;
* precond_mala's gradient cache must stay consistent through regeneration
  refreshes of the hot row (same invariant as tests/test_precond.py).
"""

import dataclasses

import numpy as np
import jax
import pytest

from ptnn import PTConfig, sample
from ptnn.config import classification_preset
from ptnn.data import load_classification, load_regression
from ptnn.ops import vref


@pytest.fixture(scope="module")
def sunspot():
    p = load_regression("Sunspot")
    return p.train, p.test


@pytest.fixture(scope="module")
def iris():
    p = load_classification("iris")
    return p.train, p.test


def _vr_cfg(**kw):
    """Small regression VR config (canonical schedule, exact swap rule)."""
    base = dict(
        task="regression",
        topology=(4, 10, 1),
        num_samples=4800,
        num_chains=8,
        maxtemp=5.0,
        swap_interval=20,
        swap_offset=0,
        swap_payload="untempered",
        swap_rule="metropolis",
        pt_phase_frac=2.0,  # canonical schedule (no 60% temper switch)
        variational_reference=True,
        vr_start_frac=0.25,
        chunk_steps=150,
    )
    base.update(kw)
    return PTConfig(**base).validate()


def test_validation_gates():
    ok = _vr_cfg()
    assert ok.variational_reference
    with pytest.raises(ValueError, match="metropolis"):
        _vr_cfg(swap_rule="half_exp", swap_payload="tempered")
    with pytest.raises(ValueError, match="restore-likelihood"):
        _vr_cfg(stale_likelihood_after_swap=True)
    with pytest.raises(ValueError, match="surrogate"):
        _vr_cfg(use_surrogate=True, surrogate_buffer=4096)
    with pytest.raises(ValueError, match="vr_start_frac"):
        _vr_cfg(vr_start_frac=0.6)  # >= burn_in
    with pytest.raises(ValueError, match="vr_hot_infinite"):
        _vr_cfg(variational_reference=False, vr_hot_infinite=True)
    with pytest.raises(ValueError, match="canonical"):
        # classification preset with the 60% temper switch live
        cfg = classification_preset((4, 12, 3), num_samples=2000, num_chains=4)
        dataclasses.replace(
            cfg,
            swap_rule="metropolis",
            swap_payload="untempered",
            variational_reference=True,
        ).validate()
    with pytest.raises(ValueError, match="warmstart"):
        _vr_cfg(
            proposal="precond_mala",
            warmstart_frac=0.3,
            precond_start_frac=0.4,
            vr_start_frac=0.2,
        )


def test_correction_matches_numpy(rng):
    w = rng.normal(size=(6, 11)).astype(np.float32)
    mu = rng.normal(size=(11,)).astype(np.float32)
    var = rng.uniform(0.5, 2.0, size=(11,)).astype(np.float32)
    sigma_sq = 25.0
    got = np.asarray(vref.correction(w, mu, var, sigma_sq))
    want = -0.5 * ((w - mu) ** 2 / var).sum(-1) + 0.5 * (w**2).sum(
        -1
    ) / sigma_sq
    np.testing.assert_allclose(got, want, rtol=1e-5)
    g = np.asarray(vref.grad_correction(w, mu, var, sigma_sq))
    np.testing.assert_allclose(
        g, -(w - mu) / var + w / sigma_sq, rtol=1e-5
    )
    # the correction is exactly zero when q equals the prior's w-part
    zero = np.asarray(
        vref.correction(w, np.zeros(11, np.float32),
                        np.full(11, sigma_sq, np.float32), sigma_sq)
    )
    np.testing.assert_allclose(zero, 0.0, atol=1e-5)


def test_inactive_before_start_bitidentical(sunspot):
    """Before vr_start the corrected path IS the plain path: with
    vr_regen=False (no extra RNG split) every trace row up to activation
    must match a no-VR run bit for bit — pins the zero-before-activation
    gating of both the MH term and the swap energy."""
    cfg_vr = _vr_cfg(vr_regen=False, record_w=True)
    cfg_plain = dataclasses.replace(
        cfg_vr, variational_reference=False
    ).validate()
    r_vr = sample(cfg_vr, *sunspot, seed=11)
    r_plain = sample(cfg_plain, *sunspot, seed=11)
    vr_start = int(cfg_vr.samples_per_chain * cfg_vr.vr_start_frac)
    # trace row t is written by step t-1; rows up to vr_start are pre-activation
    np.testing.assert_array_equal(
        r_vr.traces["ll"][:vr_start], r_plain.traces["ll"][:vr_start]
    )
    np.testing.assert_array_equal(
        r_vr.traces["w"][:vr_start], r_plain.traces["w"][:vr_start]
    )
    # ... and the corrected path genuinely kicks in afterwards
    assert (r_vr.traces["ll"][vr_start + 2 :] != r_plain.traces["ll"][
        vr_start + 2 :
    ]).any()


@pytest.mark.parametrize("task", ["regression", "classification"])
def test_regen_beta0_always_accepts(task, sunspot, iris):
    """At beta=0 the hot rung targets exactly q, so the independence
    refresh cancels to acceptance 1 — prior w-part vs corr's -log p_w and
    log q vs the proposal density. 100.0%% acceptance is an algebraic
    identity; anything less means the regen ratio is mis-wired."""
    if task == "regression":
        cfg = _vr_cfg(vr_hot_infinite=True)
        train, test = sunspot
    else:
        cfg = classification_preset(
            (4, 12, 3), num_samples=4000, num_chains=4, canonical=True
        )
        cfg = dataclasses.replace(
            cfg,
            swap_rule="metropolis",
            swap_payload="untempered",
            swap_interval=20,
            variational_reference=True,
            vr_hot_infinite=True,
            chunk_steps=200,
        ).validate()
        train, test = iris
    res = sample(cfg, train, test, seed=5)
    assert np.isinf(res.temperatures[-1])
    assert res.vr_regen_proposed > 10
    assert res.vr_regen_accept_pct == pytest.approx(100.0)
    # the run stays finite end to end
    assert np.isfinite(np.asarray(res.final_state.ll)[:-1]).all()


def test_regen_finite_beta_is_selective(sunspot):
    """At finite hot temperature the regen MH test actually rejects some
    proposals (the target is not q), while still accepting some — pins
    that the ratio is neither degenerate-accept nor degenerate-reject."""
    cfg = _vr_cfg(maxtemp=3.0)
    res = sample(cfg, *sunspot, seed=5)
    assert res.vr_regen_proposed > 10
    assert 0.0 < res.vr_regen_accept_pct < 100.0


def test_precond_mala_vr_gradient_cache_consistent(sunspot):
    """g_like must equal a fresh gradient at the final w: accept masking,
    swap permutation AND the regen hot-row refresh all have to agree."""
    cfg = _vr_cfg(
        proposal="precond_mala",
        step_w=0.01,
        vr_hot_infinite=True,
        precond_start_frac=0.2,
        vr_start_frac=0.125,
    )
    train, test = sunspot
    res = sample(cfg, train, test, seed=9)
    st = res.final_state
    from ptnn import kernel
    from ptnn.sampler import make_dataset

    data = make_dataset(cfg, train, test)
    (_, _), g_fresh = kernel._like_value_and_grad(
        cfg, kernel.default_spec(cfg), data
    )(np.asarray(st.w))
    np.testing.assert_allclose(
        np.asarray(st.g_like), np.asarray(g_fresh), rtol=2e-4, atol=2e-4
    )


def test_checkpoint_resume_carries_vr_state(sunspot, tmp_path):
    """vr_mean / vr_m2 / regen counters round-trip through a checkpoint
    bit-exactly (generic ChainState flattening must carry the new fields)."""
    import os

    cfg = _vr_cfg(num_samples=3200, chunk_steps=100, vr_hot_infinite=True)
    ck = str(tmp_path / "vr.npz")
    full = sample(cfg, *sunspot, seed=13)
    r1 = sample(cfg, *sunspot, seed=13, checkpoint_path=ck, checkpoint_every=2)
    assert os.path.exists(ck)
    r2 = sample(cfg, *sunspot, seed=13, checkpoint_path=ck, checkpoint_every=2)
    for res in (r1, r2):
        np.testing.assert_array_equal(full.traces["ll"], res.traces["ll"])
        np.testing.assert_array_equal(
            np.asarray(full.final_state.vr_mean),
            np.asarray(res.final_state.vr_mean),
        )
        np.testing.assert_array_equal(
            np.asarray(full.final_state.vr_m2),
            np.asarray(res.final_state.vr_m2),
        )
        assert res.vr_regen_proposed == full.vr_regen_proposed
        assert res.vr_regen_accept_pct == full.vr_regen_accept_pct


def test_vr_sharded_matches_unsharded(sunspot):
    """The VR path under an 8-device chain mesh: global (W,) Welford state
    replicates, the cold-chain row read and the hot-row regen scatter cross
    shard boundaries. Traces must match the single-device run."""
    from ptnn.parallel import mesh as mesh_mod

    cfg = _vr_cfg(num_samples=2400, chunk_steps=100, vr_hot_infinite=True)
    r_plain = sample(cfg, *sunspot, seed=3)
    mesh = mesh_mod.make_mesh()
    r_mesh = sample(cfg, *sunspot, seed=3, mesh=mesh)
    np.testing.assert_allclose(
        r_plain.traces["ll"], r_mesh.traces["ll"], rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(r_plain.final_state.vr_mean),
        np.asarray(r_mesh.final_state.vr_mean),
        rtol=1e-4,
        atol=1e-5,
    )
    assert r_mesh.vr_regen_proposed == r_plain.vr_regen_proposed


@pytest.mark.slow
def test_vr_transport_beats_prior_anchored_path(sunspot):
    """The headline claim: with the corrected path + beta=0 regeneration,
    replicas complete cold<->hot round trips where prior-anchored tempering
    completes NONE at the same budget — the transport failure
    results/convergence.md measured is what this feature exists to fix.

    Configuration follows results/vref_transport.md: a posterior the
    Gaussian reference can actually fit (13-parameter net), a DEO ladder
    sized for the measured barrier (16 rungs) and barrier-equalized from a
    pilot run (the tuned schedule below is that pilot's output, embedded
    so the test is one-shot), and frequent sweeps. Round trips arrive in
    bursts once a replica breaks through the q<->beta_min pair, so counts
    are aggregated over two seeds. On the 61-parameter topology a frozen
    Gaussian cannot track the drifting cold chain and transport stays at
    zero either way (documented there)."""
    from ptnn.ops.roundtrip import roundtrip_stats

    tuned = (1.0, 1.099, 1.22, 1.374, 1.575, 1.846, 2.205, 2.588,
             3.156, 4.055, 5.377, 7.375, 10.287, 16.666, 33.333,
             float("inf"))
    common = dict(
        topology=(4, 2, 1),
        num_samples=32_000,
        num_chains=16,
        maxtemp=20.0,
        custom_ladder=tuned,
        swap_interval=2,
        swap_style="even_odd",
        track_replicas=True,
        chunk_steps=250,
    )
    cfg_vr = _vr_cfg(vr_hot_infinite=True, **common)
    cfg_plain = dataclasses.replace(
        cfg_vr,
        variational_reference=False,
        vr_hot_infinite=False,
        # the geometric 1..20 ladder: a beta=0 rung without the fitted
        # reference would target the bare prior and is not the baseline
        custom_ladder=None,
    ).validate()
    n_vr = n_plain = 0
    for seed in (21, 22):
        n_vr += roundtrip_stats(
            sample(cfg_vr, *sunspot, seed=seed).traces["replica"]
        ).round_trips.sum()
        n_plain += roundtrip_stats(
            sample(cfg_plain, *sunspot, seed=seed).traces["replica"]
        ).round_trips.sum()
    assert n_vr > n_plain
    assert n_vr >= 2
    assert n_plain == 0
