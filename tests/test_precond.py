"""Tests for the preconditioned proposal modes (precond_rw / precond_mala).

These are TPU-first flagship modes with no reference equivalent
(PTConfig.proposal docstring): per-chain Robbins-Monro scale adaptation plus
a Welford-estimated diagonal preconditioner, both frozen at burn-in end so
the post-burn-in sampler is an exact MH kernel. The strongest correctness
check here is gradient-cache consistency: ``ChainState.g_like`` must equal a
freshly computed gradient at ``ChainState.w`` after any number of steps —
accept masking, swap permutation, and chunk boundaries all have to agree for
that to hold.
"""

import dataclasses

import numpy as np
import jax
import pytest

from ptnn import PTConfig, sample
from ptnn.data import load_regression, load_classification
from ptnn import kernel
from ptnn.sampler import make_dataset


def mala_cfg(**kw):
    base = dict(
        task="regression",
        topology=(4, 10, 1),
        num_samples=8 * 600,
        num_chains=8,
        maxtemp=5.0,
        swap_interval=50,
        swap_offset=0,
        swap_payload="tempered_times_T",
        proposal="precond_mala",
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
    with pytest.raises(ValueError, match="unknown proposal"):
        mala_cfg(proposal="nope")
    with pytest.raises(ValueError, match="use_langevin_gradients"):
        mala_cfg(use_langevin_gradients=True)
    with pytest.raises(ValueError, match="restore-likelihood"):
        mala_cfg(stale_likelihood_after_swap=True)
    with pytest.raises(ValueError, match="adapt_step_size"):
        mala_cfg(adapt_step_size=True)
    with pytest.raises(ValueError, match="precond_start_frac"):
        mala_cfg(precond_start_frac=0.9)


def test_mala_smoke_and_adaptation(sunspot):
    cfg = mala_cfg()
    res = sample(cfg, *sunspot, seed=0)
    assert np.isfinite(res.traces["ll"][1:]).all()
    assert np.isfinite(res.traces["rmse_test"][1:]).all()
    # acceptance lands in a sane band around the 0.574 MALA target
    assert 15.0 < res.accept_ratio_per_chain.mean() < 90.0
    st = res.final_state
    # scales adapted away from the common init and spread across temperatures
    sig = np.exp(np.asarray(st.log_step_w))
    assert np.std(sig) > 0.0
    # Welford accumulators saw burn-in samples
    assert float(np.asarray(st.pc_m2).mean()) > 0.0


@pytest.mark.parametrize("proposal", ["precond_rw", "precond_mala", "pcn"])
def test_chunk_invariance_precond(sunspot, proposal):
    """Chunking is an implementation detail: identical traces regardless of
    chunk_steps (per-step keys derive from absolute indices; the carried
    Welford/gradient state must round-trip chunk boundaries bit-exactly)."""
    cfg_a = mala_cfg(proposal=proposal, num_samples=8 * 300, chunk_steps=299)
    cfg_b = mala_cfg(proposal=proposal, num_samples=8 * 300, chunk_steps=50)
    ra = sample(cfg_a, *sunspot, seed=3)
    rb = sample(cfg_b, *sunspot, seed=3)
    for k in ("ll", "rmse_test", "w"):
        np.testing.assert_array_equal(ra.traces[k], rb.traces[k])


def test_gradient_cache_consistency(sunspot):
    """After a full run (accepts, rejects, swaps, temper switch, eta moves),
    the carried g_like must equal the gradient freshly evaluated at the
    final w."""
    cfg = mala_cfg(num_samples=8 * 500, chunk_steps=250)
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


def test_preconditioner_freezes_after_burnin(sunspot):
    """pc_mean/pc_m2, log_step_w, and log_step_eta stop changing after
    burn-in: drive one trajectory with a single compiled chunk executable,
    snapshot at the first chunk boundary past the freeze index, and compare
    against the end of the run — the adaptation state must be bit-identical
    (the masked updates multiply by exactly zero) while w keeps moving."""
    steps = 400
    cfg = mala_cfg(num_samples=8 * steps, chunk_steps=100)
    burn_end = int(cfg.samples_per_chain * cfg.burn_in) - 1  # 199
    data = make_dataset(cfg, *sunspot)
    from ptnn.ops import ladder
    from ptnn.sampler import _step_keys

    temps = jax.numpy.asarray(
        ladder.assign_temperatures(cfg.num_chains, cfg.maxtemp),
        jax.numpy.float32,
    )
    key = jax.random.PRNGKey(2)
    k_init, k_run = jax.random.split(key)
    state = kernel.init_state(k_init, cfg, data)
    step = kernel.make_step_fn(cfg, data, temps)

    @jax.jit
    def chunk(st, start):
        idx = start + jax.numpy.arange(100)
        st, _ = jax.lax.scan(step, st, (idx, _step_keys(k_run, start, 100)))
        return st

    snap = None
    for start in range(0, 300, 100):  # chunk boundaries at 100, 200, 300
        state = chunk(state, jax.numpy.asarray(start, jax.numpy.int32))
        if start + 100 > burn_end and snap is None:
            snap = jax.device_get(state)  # first boundary past the freeze
    st_final = jax.device_get(state)
    np.testing.assert_array_equal(snap.pc_m2, st_final.pc_m2)
    np.testing.assert_array_equal(snap.pc_mean, st_final.pc_mean)
    np.testing.assert_array_equal(snap.log_step_w, st_final.log_step_w)
    np.testing.assert_array_equal(snap.log_step_eta, st_final.log_step_eta)
    assert not np.array_equal(snap.w, st_final.w)


def test_record_w_chains_subset(sunspot):
    """record_w_chains=1 must trace exactly the cold chain's pos_w rows of
    the full-trace run (same RNG stream, same trajectory)."""
    cfg_full = mala_cfg(num_samples=8 * 200, chunk_steps=100)
    cfg_cold = dataclasses.replace(cfg_full, record_w_chains=1).validate()
    rf = sample(cfg_full, *sunspot, seed=7)
    rc = sample(cfg_cold, *sunspot, seed=7)
    assert rc.traces["w"].shape[1] == 1
    np.testing.assert_array_equal(rc.traces["w"][:, 0], rf.traces["w"][:, 0])


def test_warmstart_smoke(sunspot):
    """Warm start: forced-accept descent phase, adaptation masked until it
    ends, and the likelihood strictly improves over the warm phase."""
    cfg = mala_cfg(
        num_samples=8 * 400,
        warmstart_frac=0.1,
        precond_start_frac=0.3,
        chunk_steps=200,
    )
    res = sample(cfg, *sunspot, seed=0)
    warm_end = int(cfg.samples_per_chain * cfg.warmstart_frac)
    ll = res.traces["ll"]  # rows 1.. are steps 0..
    # median ll across chains rises during the warm phase
    assert np.median(ll[warm_end]) > np.median(ll[2])
    # gradient cache still consistent after warm start + sampling
    st = res.final_state
    data = make_dataset(cfg, *sunspot)
    spec = kernel.default_spec(cfg)
    (_, _), g_fresh = kernel._like_value_and_grad(cfg, spec, data)(
        jax.numpy.asarray(st.w)
    )
    np.testing.assert_allclose(
        np.asarray(g_fresh), np.asarray(st.g_like), rtol=1e-5, atol=1e-6
    )


def test_mala_classification_smoke():
    prob = load_classification("iris")
    cfg = PTConfig(
        task="classification",
        topology=prob.topology,
        num_samples=10 * 300,
        num_chains=10,
        maxtemp=10.0,
        swap_interval=50,
        swap_offset=1,
        proposal="precond_mala",
        step_w=0.02,
        chunk_steps=150,
    ).validate()
    res = sample(cfg, prob.train, prob.test, seed=0)
    assert np.isfinite(res.traces["ll"][1:]).all()
    # the gradient mode should actually learn iris in 300 steps
    assert float(res.traces["acc_test"][-1, 0]) > 60.0
    # cache consistency on the classification branch too
    st = res.final_state
    data = make_dataset(cfg, prob.train, prob.test)
    spec = kernel.default_spec(cfg)
    (_, _), g_fresh = kernel._like_value_and_grad(cfg, spec, data)(
        jax.numpy.asarray(st.w)
    )
    np.testing.assert_allclose(
        np.asarray(g_fresh), np.asarray(st.g_like), rtol=1e-5, atol=1e-6
    )
