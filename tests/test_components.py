"""Tests: checkpoint/resume, single-chain MCMC, ESS, swap rules, native IO."""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ptnn import PTConfig, mcmc, sample
from ptnn.config import regression_preset
from ptnn.data import load_regression
from ptnn.ops import ess
from ptnn.parallel import swap
from ptnn import native


@pytest.fixture(scope="module")
def sunspot():
    p = load_regression("Sunspot")
    return p.train, p.test


def small_cfg(**kw):
    base = dict(
        task="regression",
        topology=(4, 10, 1),
        num_samples=2400,
        num_chains=8,
        maxtemp=3.0,
        swap_interval=30,
        swap_offset=0,
        swap_payload="tempered_times_T",
        use_langevin_gradients=False,
        chunk_steps=60,
    )
    base.update(kw)
    return PTConfig(**base).validate()


@pytest.mark.slow
def test_checkpoint_resume_identical(sunspot, tmp_path):
    """A run interrupted at a checkpoint and resumed must produce exactly the
    traces of an uninterrupted run."""
    cfg = small_cfg()
    ck = str(tmp_path / "run.npz")
    full = sample(cfg, *sunspot, seed=5)

    # simulate preemption: run with checkpointing, then delete the sampler's
    # progress past the first checkpoint by re-running from the checkpoint
    r1 = sample(cfg, *sunspot, seed=5, checkpoint_path=ck, checkpoint_every=2)
    assert os.path.exists(ck)
    # resume from final checkpoint: should skip all work and return identical
    r2 = sample(cfg, *sunspot, seed=5, checkpoint_path=ck, checkpoint_every=2)
    for k in full.traces:
        np.testing.assert_allclose(full.traces[k], r1.traces[k], rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(full.traces[k], r2.traces[k], rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_checkpoint_partial_resume(sunspot, tmp_path, monkeypatch):
    """Resume from a genuine MID-RUN checkpoint reproduces the uninterrupted
    run exactly (covers resume_at > 0 slicing, trace concatenation, and the
    absolute-index RNG re-derivation)."""
    import shutil

    from ptnn import checkpoint as ck_mod

    cfg = small_cfg()
    ck = str(tmp_path / "part.npz")
    first_ck = str(tmp_path / "first.npz")
    full = sample(cfg, *sunspot, seed=9)

    # capture the FIRST checkpoint the sampler writes (a true mid-run state)
    real_save = ck_mod.save

    def capturing_save(path, *a, **kw):
        real_save(path, *a, **kw)
        if not os.path.exists(first_ck):
            shutil.copy(path, first_ck)

    monkeypatch.setattr(ck_mod, "save", capturing_save)
    sample(cfg, *sunspot, seed=9, checkpoint_path=ck, checkpoint_every=1)
    monkeypatch.undo()

    from ptnn import kernel as kernel_mod

    _st, done, _tr = ck_mod.load(
        first_ck, cfg, 9, kernel_mod.default_spec(cfg).name
    )
    assert 0 < done < cfg.n_steps  # genuinely mid-run
    # resume from the mid-run checkpoint and compare to the uninterrupted run
    r = sample(cfg, *sunspot, seed=9, checkpoint_path=first_ck)
    np.testing.assert_allclose(full.traces["ll"], r.traces["ll"], rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(
        full.final_state.n_accept, r.final_state.n_accept
    )


def test_checkpoint_fingerprint_mismatch(sunspot, tmp_path):
    from ptnn import checkpoint as ck_mod

    cfg = small_cfg()
    ck = str(tmp_path / "fp.npz")
    from ptnn import kernel as kernel_mod

    name = kernel_mod.default_spec(cfg).name
    sample(cfg, *sunspot, seed=1, checkpoint_path=ck)
    assert ck_mod.load(ck, cfg, 2, name) is None  # different seed
    assert ck_mod.load(ck, dataclasses.replace(cfg, maxtemp=4.0), 1, name) is None
    assert ck_mod.load(ck, cfg, 1, "other-model") is None  # different model


def test_single_chain_mcmc(sunspot):
    cfg = mcmc.single_chain_config(
        "regression", (4, 10, 1), samples=400, use_langevin_gradients=False
    )
    cfg = dataclasses.replace(cfg, step_w=0.02)
    res = mcmc.run_single_chain(cfg, *sunspot, seed=0)
    assert res.traces["ll"].shape == (400, 1)
    assert "fx_test" in res.traces
    b = mcmc.predictive_bands(res, "test")
    n_test = sunspot[1].shape[0]
    assert b["mean"].shape == (n_test,)
    assert (b["low"] <= b["high"]).all()


def test_single_chain_plots(sunspot, tmp_path):
    cfg = mcmc.single_chain_config(
        "regression", (4, 10, 1), samples=300, use_langevin_gradients=False
    )
    res = mcmc.run_single_chain(cfg, *sunspot, seed=0)
    mcmc.plot_uncertainty(res, sunspot[0][:, 4], sunspot[1][:, 4], str(tmp_path))
    assert (tmp_path / "mcmcres_test.png").exists()
    assert (tmp_path / "param_0.png").exists()


def test_ess_iid_vs_correlated():
    rng = np.random.default_rng(0)
    iid = rng.standard_normal(4000)
    assert ess.ess(iid) > 2000  # near n for iid
    # AR(1) with strong correlation -> much smaller ESS
    x = np.zeros(4000)
    for i in range(1, 4000):
        x[i] = 0.95 * x[i - 1] + rng.standard_normal()
    assert ess.ess(x) < 400
    assert ess.ess(np.ones(100)) == 1.0


def test_split_rhat():
    rng = np.random.default_rng(7)
    # 4 well-mixed iid chains: R-hat ~ 1
    good = rng.standard_normal((2000, 4))
    assert ess.split_rhat(good) < 1.01
    # chains stuck at different locations: R-hat blows up
    bad = good + np.array([0.0, 0.0, 3.0, 3.0])
    assert ess.split_rhat(bad) > 1.5
    # within-chain drift is caught by the split (single chain)
    drift = np.concatenate([rng.standard_normal(1000), 5 + rng.standard_normal(1000)])
    assert ess.split_rhat(drift) > 1.5
    # scale mismatch is caught by the folded statistic
    scales = rng.standard_normal((2000, 4)) * np.array([1.0, 1.0, 1.0, 8.0])
    assert ess.split_rhat(scales) > 1.1
    # degenerate inputs
    assert ess.split_rhat(np.ones((100, 2))) == 1.0
    assert np.isnan(ess.split_rhat(np.ones(3)))


def test_metropolis_swap_rule():
    """Correct rule: equal likelihoods at different betas never swap downhill
    randomly with prob > ... for equal lls, accept prob = exp(0) = 1."""
    ll = jnp.asarray([-50.0, -50.0])
    betas = jnp.asarray([1.0, 0.5])
    res = swap.sweep_permutation(ll, jax.random.PRNGKey(0), rule="metropolis", betas=betas)
    assert int(res.n_accepted) == 1  # exp(0) = 1 -> always swap
    # hot chain better than cold: (b1-b2)(lh2-lh1) > 0 -> always swap
    res2 = swap.sweep_permutation(
        jnp.asarray([-100.0, -50.0]), jax.random.PRNGKey(1), rule="metropolis", betas=betas
    )
    assert int(res2.n_accepted) == 1
    # cold much better than hot: essentially never swaps
    accs = [
        int(
            swap.sweep_permutation(
                jnp.asarray([-10.0, -500.0]),
                jax.random.PRNGKey(s),
                rule="metropolis",
                betas=betas,
            ).n_accepted
        )
        for s in range(20)
    ]
    assert sum(accs) == 0


def test_metropolis_requires_untempered_payload():
    with pytest.raises(ValueError):
        small_cfg(swap_rule="metropolis", swap_payload="tempered").validate()
    cfg = small_cfg(swap_rule="metropolis", swap_payload="untempered")
    assert cfg.swap_rule == "metropolis"


def test_da_requires_restore_swap_semantics():
    """Stale swaps permute (w, eta) but not ll, so DA segment closure would
    correct against the wrong anchor likelihood — config must reject it."""
    with pytest.raises(ValueError, match="delayed_acceptance"):
        small_cfg(
            use_surrogate=True,
            surrogate_mode="delayed_acceptance",
            stale_likelihood_after_swap=True,
        )
    # restore semantics (the default) stays valid
    cfg = small_cfg(use_surrogate=True, surrogate_mode="delayed_acceptance")
    assert cfg.surrogate_mode == "delayed_acceptance"


def test_surrogate_buffer_must_cover_feature_dim():
    """A ring buffer smaller than the surrogate feature dimension can never
    fit — config errors instead of silently degrading to true evals."""
    with pytest.raises(ValueError, match="feature dimension"):
        small_cfg(
            topology=(4, 200, 1),  # w_size=1401 -> fdim=2869 > 2048 default
            use_surrogate=True,
        )
    # large enough buffer passes
    cfg = small_cfg(topology=(4, 200, 1), use_surrogate=True,
                    surrogate_buffer=4096)
    assert cfg.use_surrogate


def test_native_savetxt_matches_numpy(tmp_path):
    rng = np.random.default_rng(3)
    a = (rng.standard_normal((500, 7)) * 50).astype(np.float64)
    p1, p2 = str(tmp_path / "a.txt"), str(tmp_path / "b.txt")
    native.savetxt(p1, a, "%1.4f")
    np.savetxt(p2, a, fmt="%1.4f")
    b1, b2 = np.loadtxt(p1), np.loadtxt(p2)
    np.testing.assert_allclose(b1, b2, atol=1e-4)
    # default scientific format round-trips exactly
    native.savetxt(p1, a)
    np.testing.assert_allclose(np.loadtxt(p1), a)


@pytest.mark.slow
def test_legacy_qratio_mode(sunspot):
    """legacy_lg reproduces the committed LG baselines' always-accept
    dynamics near modes (tiny run: acceptance should exceed the correct
    MALA ratio's)."""
    from ptnn.config import classification_preset
    from ptnn.data import load_classification

    p = load_classification("iris", seed=0)
    legacy = dataclasses.replace(
        classification_preset(p.topology, num_samples=1500, legacy_lg=True),
        record_w=False,
        chunk_steps=75,
    )
    assert legacy.qratio == "ldpt_legacy" and legacy.langevin_prob == 0.5
    r_leg = sample(legacy, p.train, p.test, seed=0)
    correct = dataclasses.replace(legacy, qratio="reference")
    r_ref = sample(correct, p.train, p.test, seed=0)
    assert (
        r_leg.accept_ratio_per_chain.mean() > r_ref.accept_ratio_per_chain.mean()
    )
    assert np.isfinite(r_leg.traces["ll"][1:]).all()


def test_vmapped_maxtemp_sweep(sunspot):
    """Whole maxtemp sweep as one vmapped program; cells must match
    individually-run configurations statistically."""
    from ptnn import sweeps

    cfg = small_cfg(num_samples=1600)
    out = sweeps.maxtemp_sweep(cfg, [2.0, 5.0], *sunspot, seed=0)
    assert out["test_mean"].shape == (2,)
    assert np.isfinite(out["test_mean"]).all()
    assert (out["swap_pct"] >= 0).all() and (out["swap_pct"] <= 100).all()
    # hotter ladders accept more on average in the tempered phase
    assert out["accept_pct"][1] > out["accept_pct"][0] * 0.5


def test_vmapped_seed_sweep(sunspot):
    from ptnn import sweeps

    cfg = small_cfg(num_samples=1600)
    out = sweeps.seed_sweep(cfg, [0, 1, 2], *sunspot)
    assert out["test_mean"].shape == (3,)
    # different seeds give different (but finite, same-ballpark) results
    assert len(set(np.round(out["test_mean"], 6))) > 1
    assert np.isfinite(out["test_mean"]).all()


def test_vmapped_swap_interval_sweep(sunspot):
    """Swap cadence as a TRACED sweep axis: one compile for the whole grid,
    cells equal a per-cell static-interval run (tolerance: the traced mask is
    semantically identical, so this is exact up to compilation fusion)."""
    import dataclasses

    from ptnn import sweeps

    cfg = small_cfg(num_samples=1600)
    out = sweeps.swap_interval_sweep(cfg, [25, 50, 100], *sunspot, seed=0)
    assert out["test_mean"].shape == (3,)
    assert np.isfinite(out["test_mean"]).all()
    # denser cadence proposes more sweeps; acceptance % stays a percentage
    assert (out["swap_pct"] >= 0).all() and (out["swap_pct"] <= 100).all()
    # cross-check one cell against the static path (same seed stream)
    cell = sweeps.seed_sweep(
        dataclasses.replace(cfg, swap_interval=50), [0], *sunspot
    )
    # seed_sweep derives per-cell keys differently (PRNGKey(s) vs split),
    # so compare statistically: same ballpark RMSE
    assert abs(float(out["test_mean"][1]) - float(cell["test_mean"][0])) < 0.15


def test_vmapped_lprob_sweep(sunspot):
    from ptnn import sweeps

    cfg = small_cfg(num_samples=1600, learn_rate=0.01)
    out = sweeps.lprob_sweep(cfg, [0.0, 0.5, 1.0], *sunspot, seed=0)
    assert out["test_mean"].shape == (3,)
    assert np.isfinite(out["test_mean"]).all()


def test_surrogate_module_fits_quadratic(rng):
    """The random-projection quadratic surrogate must fit a quadratic ll."""
    import jax
    from ptnn import surrogate

    w_dim, n_proj, B = 12, 32, 512
    proj = surrogate.make_projection(jax.random.PRNGKey(0), w_dim, n_proj)
    st = surrogate.init(B, w_dim, n_proj)
    ws = rng.standard_normal((B, w_dim)).astype(np.float32)
    lls = (-np.sum(ws**2, axis=1) + 3.0).astype(np.float32)
    st = surrogate.push(st, jnp.asarray(ws), jnp.asarray(lls))
    st = surrogate.fit(st, proj, ridge=1e-4)
    assert bool(st.fitted)
    r2 = float(surrogate.r_squared(st, proj))
    assert r2 > 0.9, r2
    pred = surrogate.predict(st, proj, jnp.asarray(ws[:8]))
    np.testing.assert_allclose(np.asarray(pred), lls[:8], rtol=0.2, atol=1.0)


def test_surrogate_ring_buffer(rng):
    import jax
    from ptnn import surrogate

    st = surrogate.init(16, 4, 8)
    for k in range(5):  # 5 blocks of 8 rows into a 16-row ring
        w = jnp.full((8, 4), float(k))
        st = surrogate.push(st, w, jnp.full((8,), float(k)))
    assert int(st.count) == 16
    assert int(st.ptr) == 8
    # ring holds blocks 3 (rows 8..15 -> positions 8..15) and 4 (positions 0..7)
    assert float(st.buf_ll[0]) == 4.0 and float(st.buf_ll[8]) == 3.0


@pytest.mark.slow
def test_surrogate_assisted_sampler_runs(sunspot):
    """End-to-end surrogate-assisted PT: runs, saves dataset passes, and the
    cold chain still reaches sane fits."""
    cfg = small_cfg(
        num_samples=8 * 600,
        use_surrogate=True,
        surrogate_prob=0.5,
        surrogate_warmup_frac=0.2,
        surrogate_buffer=512,
        surrogate_proj=32,
        chunk_steps=100,
    )
    res = sample(cfg, *sunspot, seed=0)
    assert np.isfinite(res.traces["ll"][1:]).all()
    assert np.isfinite(res.traces["rmse_test"][1:]).all()
    assert bool(res.final_state.surr.fitted)
    # surrogate steps must actually occur: on a surrogate step the rmse trace
    # repeats its previous row (no true eval ran), so repeated rows are more
    # frequent than in the no-surrogate run
    base = sample(dataclasses.replace(cfg, use_surrogate=False), *sunspot, seed=0)
    def rep_frac(r):
        m = r.traces["rmse_train"]
        return float(np.mean(np.all(m[1:] == m[:-1], axis=1)))
    assert rep_frac(res) > rep_frac(base) + 0.05, (rep_frac(res), rep_frac(base))
    assert res.traces["rmse_test"][-1, 0] < 0.2
    assert base.traces["rmse_test"][-1, 0] < 0.2


@pytest.mark.slow
def test_adaptive_step_size(sunspot):
    """Per-chain step-size adaptation converges acceptance toward the target
    during burn-in and freezes afterwards."""
    cfg = small_cfg(
        num_samples=8 * 800,
        adapt_step_size=True,
        adapt_target_accept=0.3,
        adapt_rate=0.1,
        chunk_steps=200,
        step_w=0.3,  # deliberately far too large
    )
    res = sample(cfg, *sunspot, seed=0)
    lsw = res.final_state.log_step_w
    assert lsw is not None and np.isfinite(lsw).all()
    # adapted well below the bad initial value
    assert np.exp(lsw).max() < 0.3
    # second-half acceptance in a sane band around the target
    a0 = res.traces["accept_count"][400, :]
    a1 = res.traces["accept_count"][-1, :]
    rate = (a1 - a0) / (cfg.samples_per_chain - 401)
    assert 0.1 < rate.mean() < 0.6, rate.mean()
    # without adaptation the same config barely accepts
    base = sample(dataclasses.replace(cfg, adapt_step_size=False), *sunspot, seed=0)
    b0 = base.traces["accept_count"][400, :]
    b1 = base.traces["accept_count"][-1, :]
    base_rate = (b1 - b0) / (cfg.samples_per_chain - 401)
    assert rate.mean() > 3 * base_rate.mean()


@pytest.mark.slow
def test_surrogate_checkpoint_resume(sunspot, tmp_path, monkeypatch):
    """Anchored-surrogate resume from a MID-RUN checkpoint is identical to an
    uninterrupted run: the ring buffer (and fitted coefficients) round-trip
    through the checkpoint, so the post-resume refits see the same data."""
    import shutil

    from ptnn import checkpoint as ck_mod
    from ptnn import kernel as kernel_mod

    cfg = small_cfg(
        num_samples=8 * 300,
        use_surrogate=True,
        surrogate_prob=0.3,
        surrogate_warmup_frac=0.2,
        surrogate_buffer=256,
        surrogate_proj=16,
        chunk_steps=75,
    )
    ck = str(tmp_path / "s.npz")
    mid_ck = str(tmp_path / "mid.npz")
    full = sample(cfg, *sunspot, seed=2)

    # capture a true mid-run checkpoint (first one the sampler writes)
    real_save = ck_mod.save

    def capturing_save(path, *a, **kw):
        real_save(path, *a, **kw)
        if not os.path.exists(mid_ck):
            shutil.copy(path, mid_ck)

    monkeypatch.setattr(ck_mod, "save", capturing_save)
    sample(cfg, *sunspot, seed=2, checkpoint_path=ck, checkpoint_every=1)
    monkeypatch.undo()

    st, done, _tr = ck_mod.load(mid_ck, cfg, 2, kernel_mod.default_spec(cfg).name)
    assert 0 < done < cfg.n_steps  # genuinely mid-run
    assert st.surr is not None  # ring buffer round-tripped
    r = sample(cfg, *sunspot, seed=2, checkpoint_path=mid_ck)
    for k in full.traces:
        np.testing.assert_allclose(
            full.traces[k], r.traces[k], rtol=1e-6, atol=1e-7
        )
    np.testing.assert_array_equal(
        full.final_state.n_accept, r.final_state.n_accept
    )


def test_even_odd_swap_sampler(sunspot):
    """swap_style="even_odd" (DEO, opt-in — NOT reference behavior) runs
    end-to-end with the detailed-balance rule and counts disjoint pairs:
    alternating sweeps over 8 chains propose 4 and 3 pairs."""
    train, test = sunspot
    cfg = PTConfig(
        task="regression",
        topology=(4, 5, 1),
        num_samples=8 * 400,
        num_chains=8,
        maxtemp=5.0,
        swap_interval=100,
        swap_offset=0,
        swap_payload="untempered",
        swap_rule="metropolis",
        swap_style="even_odd",
        use_langevin_gradients=False,
        record_w=False,
    ).validate()
    res = sample(cfg, train, test, seed=0)
    st = res.final_state
    # sweeps fire at i=100,200,300 -> parities 1,0,1 -> 3+4+3 pairs
    assert int(st.n_swap_proposed) == 10
    assert 0 <= int(st.n_swap_accepted) <= 10
    assert np.isfinite(np.asarray(res.traces["rmse_test"])).all()


def test_oracle_pt_batched_matches_scalar():
    """oracle_pt's chain-batched drift/forward must agree with the scalar
    reference-faithful versions (same math, vectorized chain loop)."""
    import oracle_pt

    rng = np.random.RandomState(0)
    topo = (4, 5, 1)
    X = rng.rand(17, 4)
    T = rng.rand(17, 1)
    wb = rng.randn(3, 31)
    scalar = np.stack(
        [oracle_pt.sgd_epoch(wb[i], X, T, topo, 0.1) for i in range(3)]
    )
    batched = oracle_pt.sgd_epoch_chains(wb, X, T, topo, 0.1)
    np.testing.assert_allclose(batched, scalar, rtol=0, atol=1e-13)
    y = rng.rand(17)
    ll_s = np.array(
        [oracle_pt.reg_likelihood(wb[i], X, y, 0.7, topo, 2.0)[0] for i in range(3)]
    )
    ll_b, rmse_b = oracle_pt.reg_likelihood_chains(
        wb, X, y, np.full(3, 0.7), np.full(3, 2.0), topo
    )
    np.testing.assert_allclose(ll_b, ll_s, rtol=1e-12)


@pytest.mark.slow
def test_oracle_pt_agrees_with_ptnn_stale_mode():
    """The NumPy PT oracle (literal reference semantics) and ptnn with
    stale_likelihood_after_swap=True are independent implementations of the
    same sampler; their pooled statistics must land in the same region.
    Loose bands — parity is distributional (SURVEY §7 hard-part 4) and the
    budget here is small; this guards the forensic asset against rot."""
    import oracle_pt

    train, test = load_regression("Lazer").train, load_regression("Lazer").test
    o = oracle_pt.run_reference_pt_regression(
        train, test, samples_per_chain=3000, use_langevin=False, seed=0
    )
    cfg = dataclasses.replace(
        regression_preset(
            num_samples=30_000, maxtemp=5.0, use_langevin_gradients=False,
            learn_rate=0.1,
        ),
        stale_likelihood_after_swap=True,
        record_w=False,
    ).validate()
    res = sample(cfg, train, test, seed=0)
    swap_p = res.swap_percent
    accept_p = float(np.mean(res.accept_ratio_per_chain))
    assert abs(o["swap_pct"] - swap_p) < 25.0, (o["swap_pct"], swap_p)
    assert abs(o["accept_pct"] - accept_p) < 15.0, (o["accept_pct"], accept_p)


@pytest.mark.slow
def test_oracle_pt_classification_agrees_with_ptnn_stale_mode():
    """Classification twin of the regression agreement gate (VERDICT r2
    item 8): the NumPy classification PT oracle (literal
    pt_classification.py semantics — tempered payloads, stale carried
    likelihood, (i+1)%interval rendezvous) and ptnn with
    stale_likelihood_after_swap=True must land in the same statistical
    region. Bands are loose — parity is distributional and the budget here
    is small; this pins both entry-point semantics against rot."""
    import oracle_pt

    from ptnn.config import classification_preset
    from ptnn.data import load_classification

    p = load_classification("iris", seed=0)
    o = oracle_pt.run_reference_pt_classification(
        p.train, p.test, p.topology, samples_per_chain=3000,
        use_langevin=False, seed=0,
    )
    cfg = dataclasses.replace(
        classification_preset(p.topology, num_samples=30_000),
        stale_likelihood_after_swap=True,
        record_w=False,
    ).validate()
    res = sample(cfg, p.train, p.test, seed=0)
    b = cfg.samples_per_chain // 2
    pooled = float(np.mean(np.asarray(res.traces["acc_test"])[b:, :]))
    accept_p = float(np.mean(res.accept_ratio_per_chain))
    assert abs(o["acc_test_mean"] - pooled) < 25.0, (o["acc_test_mean"], pooled)
    assert abs(o["accept_pct"] - accept_p) < 15.0, (o["accept_pct"], accept_p)
    assert abs(o["swap_pct"] - res.swap_percent) < 25.0, (
        o["swap_pct"], res.swap_percent)


def test_bench_flagship_quality_gate():
    """The bench flagship maximizes ESS/s SUBJECT TO the cold-RMSE gate
    (VERDICT r3 item 1a): throughput alone cannot win, and an empty
    eligible set yields None rather than an ungated pick."""
    import bench

    ess = {
        "fast_bad": {"value": 60_000.0},
        "good": {"value": 40_000.0},
        "slow_good": {"value": 10_000.0},
    }
    rmse = {"fast_bad": 0.0254, "good": 0.0102, "slow_good": 0.0110}
    assert bench.pick_flagship(ess, rmse, 0.0239) == "good"
    # gate tight enough to exclude everything -> None, not a fallback
    assert bench.pick_flagship(ess, rmse, 0.005) is None
    # gate wide open -> raw throughput wins
    assert bench.pick_flagship(ess, rmse, 1.0) == "fast_bad"
    # classification arm: quality is accuracy, gate is a MINIMUM
    acc = {"fast_bad": 88.1, "good": 97.2, "slow_good": 96.9}
    assert (
        bench.pick_flagship(ess, acc, 96.76, higher_is_better=True) == "good"
    )
    assert (
        bench.pick_flagship(ess, acc, 99.0, higher_is_better=True) is None
    )
    assert (
        bench.pick_flagship(ess, acc, 0.0, higher_is_better=True)
        == "fast_bad"
    )
