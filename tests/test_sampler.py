"""End-to-end sampler tests: shapes, determinism, chunk invariance, swaps."""

import numpy as np
import jax
import pytest

from ptnn import PTConfig, regression_preset, classification_preset, sample
from ptnn.data import load_regression
from ptnn.kernel import swap_due
import dataclasses


def small_reg_cfg(**kw):
    base = dict(
        task="regression",
        topology=(4, 10, 1),
        num_samples=4000,  # 500 per chain
        num_chains=8,
        maxtemp=2.0,
        swap_interval=50,
        swap_offset=0,
        swap_payload="tempered_times_T",
        use_langevin_gradients=False,
        chunk_steps=200,
    )
    base.update(kw)
    return PTConfig(**base).validate()


@pytest.fixture(scope="module")
def sunspot():
    p = load_regression("Sunspot")
    return p.train, p.test


def test_smoke_regression_rw(sunspot):
    cfg = small_reg_cfg()
    res = sample(cfg, *sunspot, seed=0)
    s, c = cfg.samples_per_chain, cfg.num_chains
    assert res.traces["w"].shape == (s, c, cfg.w_size)
    assert res.traces["ll"].shape == (s, c)
    assert res.traces["rmse_train"].shape == (s, c)
    # init rows follow the reference conventions
    np.testing.assert_array_equal(res.traces["w"][0], 1.0)
    np.testing.assert_array_equal(res.traces["ll"][0], -100.0)
    np.testing.assert_array_equal(res.traces["rmse_train"][0], 0.0)
    # finite traces after step 0
    assert np.isfinite(res.traces["ll"][1:]).all()
    assert np.isfinite(res.traces["rmse_test"][1:]).all()
    # some acceptance, not everything
    assert 0.5 < res.accept_ratio_per_chain.mean() < 99.5
    # swap accounting: sweeps happen and percentages are sane
    assert 0.0 <= res.swap_percent <= 100.0
    n_sweeps = int(res.final_state.n_swap_proposed) // (cfg.num_chains - 1)
    expected_sweeps = sum(
        bool(swap_due(cfg, i)) for i in range(cfg.n_steps)
    )
    assert n_sweeps == expected_sweeps
    # temperatures: chain 0 cold
    assert res.temperatures[0] == 1.0


@pytest.mark.slow
def test_chunk_invariance(sunspot):
    """Traces must not depend on the host-streaming chunk size."""
    cfg_a = small_reg_cfg(chunk_steps=499)
    cfg_b = small_reg_cfg(chunk_steps=100)
    ra = sample(cfg_a, *sunspot, seed=3)
    rb = sample(cfg_b, *sunspot, seed=3)
    for k in ra.traces:
        np.testing.assert_allclose(ra.traces[k], rb.traces[k], rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(
        ra.final_state.n_accept, rb.final_state.n_accept
    )


@pytest.mark.slow
def test_seed_determinism_and_variation(sunspot):
    cfg = small_reg_cfg(num_samples=1600)
    r1 = sample(cfg, *sunspot, seed=11)
    r2 = sample(cfg, *sunspot, seed=11)
    r3 = sample(cfg, *sunspot, seed=12)
    np.testing.assert_array_equal(r1.traces["ll"], r2.traces["ll"])
    assert not np.array_equal(r1.traces["ll"], r3.traces["ll"])


@pytest.mark.slow
def test_langevin_regression_runs(sunspot):
    cfg = small_reg_cfg(
        num_samples=800,
        use_langevin_gradients=True,
        langevin_prob=0.5,
        learn_rate=0.1,
        drift_mode="sequential",
    )
    res = sample(cfg, *sunspot, seed=0)
    assert np.isfinite(res.traces["ll"][1:]).all()
    lrat = res.langevin_ratio_per_chain
    assert 20.0 < lrat.mean() < 80.0  # ~50% of steps use the gradient
    # Langevin run should make clear progress within 100 steps on Sunspot
    assert res.traces["rmse_test"][-1].min() < 0.25


@pytest.mark.slow
def test_langevin_batch_mode_runs(sunspot):
    cfg = small_reg_cfg(
        num_samples=800,
        use_langevin_gradients=True,
        drift_mode="batch",
        learn_rate=0.1,
    )
    res = sample(cfg, *sunspot, seed=0)
    assert np.isfinite(res.traces["ll"][1:]).all()


@pytest.mark.slow
def test_classification_smoke():
    from ptnn.data import load_classification

    p = load_classification("iris", seed=0)
    cfg = dataclasses.replace(
        classification_preset(p.topology, num_samples=2000, use_langevin_gradients=False),
        chunk_steps=100,
    )
    res = sample(cfg, p.train, p.test, seed=0)
    assert res.traces["acc_test"].shape == (200, 10)
    assert np.isfinite(res.traces["ll"][1:]).all()
    assert (res.traces["acc_test"] <= 100.0).all()
    # RW on iris mixes poorly but should accept plenty (ref: ~95%)
    assert res.accept_ratio_per_chain.mean() > 30.0


@pytest.mark.slow
def test_record_w_off(sunspot):
    cfg = small_reg_cfg(num_samples=800, record_w=False)
    res = sample(cfg, *sunspot, seed=0)
    assert "w" not in res.traces
    assert res.traces["ll"].shape[0] == cfg.samples_per_chain


def test_record_thin_strides_traces(sunspot):
    """record_thin keeps every k-th row of the SAME chain: thinned traces
    equal the unthinned run's rows at steps thin-1, 2*thin-1, ... and the
    final state is bit-identical (thinning is pure trace selection)."""
    from ptnn.sampler import _pick_chunk

    cfg_full = small_reg_cfg()
    cfg_thin = dataclasses.replace(cfg_full, record_thin=4).validate()
    res_f = sample(cfg_full, *sunspot, seed=3)
    res_t = sample(cfg_thin, *sunspot, seed=3)
    # expected retained steps: local positions thin-1, 2*thin-1, ... within
    # each executed chunk (replicate the sampler's segment/chunk plan)
    n, switch = cfg_full.n_steps, cfg_full.temper_switch_step
    segs = [(0, switch), (switch, n)] if 0 < switch < n else [(0, n)]
    target = max(1, min(cfg_full.chunk_steps, n))
    steps = []
    for a, b in segs:
        chunk = _pick_chunk(b - a, target)
        done = a
        while done < b:
            length = min(chunk, b - done)
            steps.extend(range(done + 3, done + length, 4))
            done += length
    rows = [s + 1 for s in steps]  # merged traces: row = step + 1
    assert res_t.traces["ll"].shape[0] == len(rows) + 1  # + init row
    for k in res_t.traces:
        np.testing.assert_array_equal(
            res_t.traces[k][1:], res_f.traces[k][rows], err_msg=k
        )
    np.testing.assert_array_equal(
        np.asarray(res_t.final_state.w), np.asarray(res_f.final_state.w)
    )
    np.testing.assert_array_equal(
        np.asarray(res_t.final_state.ll), np.asarray(res_f.final_state.ll)
    )


def test_record_thin_rejects_replica_tracking():
    with pytest.raises(ValueError, match="record_thin"):
        small_reg_cfg(record_thin=4, track_replicas=True)


def test_summarize_on_thinned_run(sunspot):
    """results.summarize derives burn-in from the RECORDED rows, not
    samples_per_chain: on a record_thin run the old samples-based index
    sliced past the end (empty post-burn rows -> NaN means). The thinned
    summary must be finite and agree with the unthinned run's summary
    (same chain, strided trace)."""
    from ptnn import results as results_mod

    cfg_full = small_reg_cfg()
    cfg_thin = dataclasses.replace(cfg_full, record_thin=4).validate()
    s_f = results_mod.summarize(sample(cfg_full, *sunspot, seed=3), "Sunspot")
    s_t = results_mod.summarize(sample(cfg_thin, *sunspot, seed=3), "Sunspot")
    for field in ("train_mean", "test_mean", "train_best", "test_best"):
        vf, vt = getattr(s_f, field), getattr(s_t, field)
        assert np.isfinite(vt), field
        assert abs(vf - vt) < 0.05, (field, vf, vt)
