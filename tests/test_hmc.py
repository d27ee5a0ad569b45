"""Tests for the preconditioned HMC-within-PT proposal (proposal="hmc").

TPU-first flagship mode, no reference equivalent: per step, a momentum draw
p ~ N(0, M^-1) (M the Welford diagonal preconditioner shared with
precond_*), ``hmc_leapfrog`` leapfrog steps on the tempered-posterior
Hamiltonian, and an exact MH test on the total energy change. Key
correctness handles pinned here:

* energy conservation — with a tiny frozen step size the leapfrog error is
  O(eps^2) and acceptance must be ~100% (the sharpest cheap test of the
  Hamiltonian/kinetic-energy algebra: any sign or scaling error in the
  K-terms destroys it);
* gradient-cache consistency — ChainState.g_like must equal a fresh
  gradient at ChainState.w after accept masking, trajectory ends, swap
  permutations, the temper switch, and chunk boundaries;
* chunk invariance — bit-identical traces regardless of chunk_steps.
"""

import dataclasses

import numpy as np
import jax
import pytest

from ptnn import PTConfig, sample
from ptnn.data import load_regression, load_classification
from ptnn import kernel
from ptnn.sampler import make_dataset
from ptnn.parallel import mesh as mesh_mod


def hmc_cfg(**kw):
    base = dict(
        task="regression",
        topology=(4, 10, 1),
        num_samples=8 * 600,
        num_chains=8,
        maxtemp=5.0,
        swap_interval=50,
        swap_offset=0,
        swap_payload="tempered_times_T",
        proposal="hmc",
        hmc_leapfrog=5,
        step_w=0.01,
        chunk_steps=300,
    )
    base.update(kw)
    return PTConfig(**base).validate()


@pytest.fixture(scope="module")
def sunspot():
    p = load_regression("Sunspot")
    return p.train, p.test


def test_validation_rules():
    with pytest.raises(ValueError, match="hmc_leapfrog"):
        hmc_cfg(hmc_leapfrog=0)
    with pytest.raises(ValueError, match="hmc_eps_jitter"):
        hmc_cfg(hmc_eps_jitter=1.5)
    with pytest.raises(ValueError, match="hmc_target_accept"):
        hmc_cfg(hmc_target_accept=0.0)
    with pytest.raises(ValueError, match="restore-likelihood"):
        hmc_cfg(stale_likelihood_after_swap=True)
    with pytest.raises(ValueError, match="use_langevin_gradients"):
        hmc_cfg(use_langevin_gradients=True)
    # warm start is allowed for hmc (gradients available)
    hmc_cfg(warmstart_frac=0.05, precond_start_frac=0.2)


def test_energy_conservation_small_eps(sunspot):
    """With a tiny FROZEN step size (adapt_rate=0) the leapfrog energy error
    is O(eps^2) and every trajectory must be accepted: this pins the sign
    and scaling of both kinetic-energy terms and the position/momentum
    update order."""
    cfg = hmc_cfg(
        num_samples=8 * 100,
        step_w=1e-4,
        adapt_rate=0.0,
        hmc_leapfrog=8,
        chunk_steps=100,
        swap_interval=0,  # pure HMC; swaps tested separately
    )
    res = sample(cfg, *sunspot, seed=0)
    # accept_ratio divides by samples_per_chain (100) while only 99 MH steps
    # run, so exactly-all-accepted reads 99.0
    assert res.accept_ratio_per_chain.min() >= 99.0


def test_hmc_smoke_and_adaptation(sunspot):
    cfg = hmc_cfg(num_samples=8 * 400, chunk_steps=200)
    res = sample(cfg, *sunspot, seed=0)
    assert np.isfinite(res.traces["ll"][1:]).all()
    assert np.isfinite(res.traces["rmse_test"][1:]).all()
    # acceptance lands in a sane band around the 0.75 target
    assert 25.0 < res.accept_ratio_per_chain.mean() < 98.0
    st = res.final_state
    sig = np.exp(np.asarray(st.log_step_w))
    assert np.std(sig) > 0.0  # scales adapted per temperature
    assert float(np.asarray(st.pc_m2).mean()) > 0.0


def test_chunk_invariance_hmc(sunspot):
    cfg_a = hmc_cfg(num_samples=8 * 300, chunk_steps=299)
    cfg_b = hmc_cfg(num_samples=8 * 300, chunk_steps=50)
    ra = sample(cfg_a, *sunspot, seed=3)
    rb = sample(cfg_b, *sunspot, seed=3)
    for k in ("ll", "rmse_test", "w"):
        np.testing.assert_array_equal(ra.traces[k], rb.traces[k])


def test_gradient_cache_consistency_hmc(sunspot):
    """After accepts, rejects, trajectory ends, swaps, the temper switch and
    eta moves, the carried g_like must equal a fresh gradient at the final
    w."""
    cfg = hmc_cfg(num_samples=8 * 300, chunk_steps=150)
    res = sample(cfg, *sunspot, seed=1)
    st = res.final_state
    data = make_dataset(cfg, *sunspot)
    spec = kernel.default_spec(cfg)
    (_, _), g_fresh = kernel._like_value_and_grad(cfg, spec, data)(
        jax.numpy.asarray(st.w)
    )
    np.testing.assert_allclose(
        np.asarray(g_fresh), np.asarray(st.g_like), rtol=1e-5, atol=1e-6
    )


@pytest.mark.slow
def test_hmc_learns_sunspot(sunspot):
    """Quality floor: the cold chain's late rmse_test must be in the
    reference's ballpark after a modest budget (the gradient trajectories
    should land the typical set far faster than RW)."""
    cfg = hmc_cfg(num_samples=8 * 600)
    res = sample(cfg, *sunspot, seed=2)
    assert float(np.mean(res.traces["rmse_test"][-100:, 0])) < 0.06


def test_hmc_classification_smoke():
    prob = load_classification("iris")
    cfg = PTConfig(
        task="classification",
        topology=prob.topology,
        num_samples=10 * 300,
        num_chains=10,
        maxtemp=10.0,
        swap_interval=50,
        swap_offset=1,
        proposal="hmc",
        hmc_leapfrog=4,
        step_w=0.02,
        chunk_steps=150,
    ).validate()
    res = sample(cfg, prob.train, prob.test, seed=0)
    assert np.isfinite(res.traces["ll"][1:]).all()
    assert float(res.traces["acc_test"][-1, 0]) > 60.0
    st = res.final_state
    data = make_dataset(cfg, prob.train, prob.test)
    spec = kernel.default_spec(cfg)
    (_, _), g_fresh = kernel._like_value_and_grad(cfg, spec, data)(
        jax.numpy.asarray(st.w)
    )
    np.testing.assert_allclose(
        np.asarray(g_fresh), np.asarray(st.g_like), rtol=1e-5, atol=1e-6
    )


@pytest.mark.slow
def test_hmc_sharded_matches_single_device(sunspot):
    """One chain per device: the leapfrog scan, gradient-cache permutation
    at swaps, and DEO sweeps must agree with the unsharded run.

    Unlike the RW modes, HMC positions incorporate gradient VALUES every
    leapfrog step, so per-backend 1-ulp arithmetic differences (GSPMD
    partitions fuse/tile slightly differently) compound deterministically
    and the trajectories must eventually diverge — trace equality is only
    checkable over a short horizon; after that the right invariants are
    statistical."""
    cfg = hmc_cfg(
        num_samples=8 * 200,
        chunk_steps=100,
        swap_style="even_odd",
        swap_interval=20,
    )
    r_plain = sample(cfg, *sunspot, seed=5)
    r_mesh = sample(cfg, *sunspot, seed=5, mesh=mesh_mod.make_mesh())
    # short horizon: same trajectories before ulp drift compounds
    for k in ("ll", "rmse_test", "w"):
        np.testing.assert_allclose(
            r_plain.traces[k][:20], r_mesh.traces[k][:20],
            rtol=2e-3, atol=1e-3,
        )
    # long horizon: statistically the same sampler
    assert np.isfinite(r_mesh.traces["ll"][1:]).all()
    acc_p = r_plain.accept_ratio_per_chain
    acc_m = r_mesh.accept_ratio_per_chain
    np.testing.assert_allclose(acc_p.mean(), acc_m.mean(), atol=12.0)
    rp = float(np.mean(r_plain.traces["rmse_test"][-50:, 0]))
    rm = float(np.mean(r_mesh.traces["rmse_test"][-50:, 0]))
    assert abs(rp - rm) < 0.05


@pytest.mark.slow
def test_hmc_resume_from_midrun_checkpoint(sunspot, tmp_path, monkeypatch):
    """Resume from a genuine mid-run checkpoint reproduces the
    uninterrupted run (the HMC state rides the generic ChainState fields —
    g_like, pc_*, log_step_* — so this pins checkpoint field coverage)."""
    import os
    import shutil

    from ptnn import checkpoint as ck_mod

    cfg = hmc_cfg(num_samples=8 * 200, chunk_steps=50)
    ck = str(tmp_path / "run.npz")
    first_ck = str(tmp_path / "first.npz")
    full = sample(cfg, *sunspot, seed=9)

    real_save = ck_mod.save

    def capturing_save(path, *a, **kw):
        real_save(path, *a, **kw)
        if not os.path.exists(first_ck):
            shutil.copy(path, first_ck)

    monkeypatch.setattr(ck_mod, "save", capturing_save)
    sample(cfg, *sunspot, seed=9, checkpoint_path=ck, checkpoint_every=1)
    monkeypatch.undo()

    _st, done, _tr = ck_mod.load(
        first_ck, cfg, 9, kernel.default_spec(cfg).name
    )
    assert 0 < done < cfg.n_steps
    r = sample(cfg, *sunspot, seed=9, checkpoint_path=first_ck)
    for k in ("ll", "rmse_test", "w"):
        np.testing.assert_array_equal(full.traces[k], r.traces[k])
    np.testing.assert_array_equal(
        full.final_state.n_accept, r.final_state.n_accept
    )
