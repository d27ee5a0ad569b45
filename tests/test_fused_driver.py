"""Fused-block driver (ptnn/fused.py) vs the per-step sampler.

RNG streams differ (noise is drawn per block), so equivalence is
distributional: same trace shapes/artifact semantics, matching accept/swap
statistics and pooled posterior metrics within tolerances on a small Sunspot
config. Runs the real Pallas kernel through the interpreter on the CPU test
backend (slow -> tiny budgets).
"""

import dataclasses

import numpy as np
import pytest

import ptnn
from ptnn import fused
from ptnn.data import load_regression


def _cfg(**kw):
    base = dict(
        task="regression",
        topology=(4, 10, 1),
        num_samples=8 * 400,
        num_chains=8,
        maxtemp=5.0,
        swap_interval=25,
        swap_offset=0,
        swap_payload="tempered_times_T",
        use_langevin_gradients=False,
        record_w=True,
        chunk_steps=120,
    )
    base.update(kw)
    return ptnn.PTConfig(**base).validate()


def test_block_plan_covers_run_exactly():
    cfg = _cfg(num_samples=8 * 500, swap_interval=100)
    plan = fused.block_plan(cfg, k_cap=128)
    steps = []
    for seg in plan:
        for s, ln, _f in seg:
            steps.extend(range(s, s + ln))
    assert steps == list(range(cfg.n_steps))
    # swap flags fire exactly at the per-step cadence
    flagged = sorted(
        s + ln - 1 for seg in plan for (s, ln, f) in seg if f
    )
    expected = [
        i for i in range(cfg.n_steps) if fused._swap_due_host(cfg, i)
    ]
    assert flagged == expected
    # segments split at the temper switch
    sw = cfg.temper_switch_step
    if 0 < sw < cfg.n_steps:
        assert plan[0][-1][0] + plan[0][-1][1] == sw
        assert plan[1][0][0] == sw


@pytest.mark.slow
def test_fused_sample_matches_perstep_statistically():
    prob = load_regression("Sunspot")
    cfg = _cfg()
    res_f = ptnn.sample(
        dataclasses.replace(cfg, fused_step=True).validate(),
        prob.train, prob.test, seed=3,
    )
    res_s = ptnn.sample(cfg, prob.train, prob.test, seed=3)

    # identical artifact surface
    assert set(res_f.traces) == set(res_s.traces)
    for k in res_f.traces:
        assert res_f.traces[k].shape == res_s.traces[k].shape, k
    # same init rows
    assert np.all(res_f.traces["w"][0] == 1.0)
    assert np.all(res_f.traces["ll"][0] == -100.0)
    # accept trace is cumulative counts
    assert np.all(np.diff(res_f.traces["accept_count"], axis=0) >= 0)

    b = cfg.samples_per_chain // 2
    rmse_f = float(np.mean(res_f.traces["rmse_test"][b:, :]))
    rmse_s = float(np.mean(res_s.traces["rmse_test"][b:, :]))
    assert abs(rmse_f - rmse_s) < 0.05, (rmse_f, rmse_s)
    acc_f = float(np.mean(res_f.accept_ratio_per_chain))
    acc_s = float(np.mean(res_s.accept_ratio_per_chain))
    assert abs(acc_f - acc_s) < 12.0, (acc_f, acc_s)
    assert abs(res_f.swap_percent - res_s.swap_percent) < 25.0
    # pair statistics populated (ladder tuner input)
    assert res_f.pair_swap_accept.shape == (cfg.num_chains - 1,)
    assert np.all(res_f.pair_swap_accept >= 0.0)


@pytest.mark.slow
def test_fused_cls_sample_matches_perstep_statistically():
    from ptnn.data import load_classification

    prob = load_classification("iris")
    cfg = ptnn.PTConfig(
        task="classification",
        topology=(4, 12, 3),
        num_samples=8 * 400,
        num_chains=8,
        maxtemp=5.0,
        swap_interval=25,
        swap_offset=0,
        use_langevin_gradients=False,
        record_w=True,
        chunk_steps=120,
    ).validate()
    res_f = ptnn.sample(
        dataclasses.replace(cfg, fused_step=True).validate(),
        prob.train, prob.test, seed=3,
    )
    res_s = ptnn.sample(cfg, prob.train, prob.test, seed=3)

    assert set(res_f.traces) == set(res_s.traces)
    for k in res_f.traces:
        assert res_f.traces[k].shape == res_s.traces[k].shape, k
    # classification traces carry real accuracies (write-on-accept)
    b = cfg.samples_per_chain // 2
    acc_te_f = float(np.mean(res_f.traces["acc_test"][b:, :]))
    acc_te_s = float(np.mean(res_s.traces["acc_test"][b:, :]))
    # whole-ladder pool learns past chance (33% on iris) even at this tiny
    # 400-step budget with hot chains diluting (measured ~39 both paths)
    assert acc_te_f > 36.0, acc_te_f
    assert abs(acc_te_f - acc_te_s) < 10.0, (acc_te_f, acc_te_s)
    acc_f = float(np.mean(res_f.accept_ratio_per_chain))
    acc_s = float(np.mean(res_s.accept_ratio_per_chain))
    assert abs(acc_f - acc_s) < 10.0, (acc_f, acc_s)
    assert abs(res_f.swap_percent - res_s.swap_percent) < 20.0


@pytest.mark.slow
def test_fused_mala_sample_matches_perstep_statistically():
    prob = load_regression("Sunspot")
    cfg = _cfg(
        proposal="precond_mala",
        adapt_rate=0.1,
        swap_style="even_odd",
        swap_interval=10,
        warmstart_frac=0.1,
        precond_start_frac=0.3,
        num_samples=8 * 600,
        chunk_steps=150,
    )
    res_f = ptnn.sample(
        dataclasses.replace(cfg, fused_step=True).validate(),
        prob.train, prob.test, seed=5,
    )
    res_s = ptnn.sample(cfg, prob.train, prob.test, seed=5)

    assert set(res_f.traces) == set(res_s.traces)
    for k in res_f.traces:
        assert res_f.traces[k].shape == res_s.traces[k].shape, k
    b = cfg.samples_per_chain // 2
    rmse_f = float(np.mean(res_f.traces["rmse_test"][b:, :]))
    rmse_s = float(np.mean(res_s.traces["rmse_test"][b:, :]))
    assert abs(rmse_f - rmse_s) < 0.05, (rmse_f, rmse_s)
    acc_f = float(np.mean(res_f.accept_ratio_per_chain))
    acc_s = float(np.mean(res_s.accept_ratio_per_chain))
    assert abs(acc_f - acc_s) < 12.0, (acc_f, acc_s)
    assert abs(res_f.swap_percent - res_s.swap_percent) < 25.0
    # the adapted scales actually moved and froze plausibly
    lsw = np.asarray(res_f.final_state.log_step_w)
    assert np.all(np.isfinite(lsw)) and np.std(lsw) > 0.0


@pytest.mark.slow
def test_fused_sample_replica_tracking_and_ensembles():
    prob = load_regression("Sunspot")
    cfg = dataclasses.replace(
        _cfg(num_samples=8 * 200, swap_interval=10),
        fused_step=True,
        track_replicas=True,
        n_ladders=2,
        swap_style="even_odd",
        swap_payload="untempered",
        swap_rule="metropolis",
    ).validate()
    res = ptnn.sample(cfg, prob.train, prob.test, seed=1)
    reps = res.traces["replica"]
    assert reps.shape == (cfg.samples_per_chain, cfg.num_chains)
    # every step holds a permutation of chain ids
    for row in reps[:: 37]:
        assert sorted(row.tolist()) == list(range(cfg.num_chains))
    # ladder boundary (pair index rungs_per_ladder-1) never swaps:
    # replicas born in ladder 0 stay in ladder 0
    k = cfg.rungs_per_ladder
    assert np.all((reps < k) == (np.arange(cfg.num_chains)[None, :] < k))


def test_fused_rejects_unsupported_configs():
    with pytest.raises(ValueError, match="reference RW"):
        _cfg(fused_step=True, use_langevin_gradients=True)
    # classification IS supported (both tasks are fused scope)
    ptnn.PTConfig(
        task="classification", topology=(4, 5, 2), fused_step=True
    ).validate()


def test_fused_runtime_fallbacks(tmp_path):
    prob = load_regression("Sunspot")
    # checkpointing falls back to the (checkpointable) per-step sampler
    cfg = _cfg(fused_step=True, num_samples=8 * 60, swap_interval=20)
    with pytest.warns(UserWarning, match="falling back.*checkpoint"):
        res = ptnn.sample(
            cfg, prob.train, prob.test,
            checkpoint_path=str(tmp_path / "ck.bin"),
        )
    assert res.traces["ll"].shape == (cfg.samples_per_chain, cfg.num_chains)
    # a working set beyond the VMEM budget falls back too: w_size and row
    # counts both huge
    big = ptnn.PTConfig(
        task="classification", topology=(34, 50, 2), fused_step=True,
        num_samples=8 * 10, num_chains=8, swap_interval=5,
    ).validate()
    x = np.random.default_rng(0).normal(size=(6000, 35)).astype(np.float32)
    x[:, -1] = np.random.default_rng(1).integers(0, 2, size=6000)
    assert fused.runtime_reason(big, x, x) is not None


@pytest.mark.slow
def test_fused_hmc_chees_sample_matches_perstep_statistically():
    prob = load_regression("Sunspot")
    cfg = _cfg(
        proposal="hmc",
        adapt_rate=0.1,
        swap_style="even_odd",
        swap_interval=10,
        swap_payload="untempered",
        swap_rule="metropolis",
        warmstart_frac=0.1,
        precond_start_frac=0.3,
        hmc_leapfrog=4,
        hmc_adapt_traj=True,
        n_ladders=2,
        num_samples=8 * 400,
        chunk_steps=100,
    )
    res_f = ptnn.sample(
        dataclasses.replace(cfg, fused_step=True).validate(),
        prob.train, prob.test, seed=5,
    )
    res_s = ptnn.sample(cfg, prob.train, prob.test, seed=5)

    assert set(res_f.traces) == set(res_s.traces)
    for k in res_f.traces:
        assert res_f.traces[k].shape == res_s.traces[k].shape, k
    b = cfg.samples_per_chain // 2
    rmse_f = float(np.mean(res_f.traces["rmse_test"][b:, :]))
    rmse_s = float(np.mean(res_s.traces["rmse_test"][b:, :]))
    assert abs(rmse_f - rmse_s) < 0.05, (rmse_f, rmse_s)
    acc_f = float(np.mean(res_f.accept_ratio_per_chain))
    acc_s = float(np.mean(res_s.accept_ratio_per_chain))
    assert abs(acc_f - acc_s) < 15.0, (acc_f, acc_s)
    assert abs(res_f.swap_percent - res_s.swap_percent) < 25.0
    # realized trajectory lengths live inside the static bound and moved
    tl = res_f.traces["traj_len"][1:, :]
    assert np.all((tl >= 1.0) & (tl <= cfg.hmc_leapfrog))
    assert np.std(tl) > 0.0
    # the ChEES-adapted log trajectory actually moved and stayed finite
    lt = np.asarray(res_f.final_state.log_traj)
    assert np.all(np.isfinite(lt)) and np.std(lt) > 0.0


def test_fused_hmc_chees_needs_complete_ladders_per_block():
    # 160 chains split a ladder across the 128-lane block boundary
    cfg = _cfg(
        proposal="hmc", hmc_adapt_traj=True, n_ladders=40,
        num_chains=160, maxtemp=5.0, swap_interval=10,
        swap_style="even_odd", swap_payload="untempered",
        swap_rule="metropolis", fused_step=True,
    )
    assert "128-lane" in fused.fused_reason(cfg)
    # 256 chains = 2 blocks of 32 complete 4-rung ladders: allowed
    cfg2 = dataclasses.replace(cfg, num_chains=256, n_ladders=64).validate()
    assert fused.fused_reason(cfg2) is None


@pytest.mark.slow
def test_fused_mala_cls_sample_matches_perstep_statistically():
    from ptnn.data import load_classification

    prob = load_classification("iris")
    cfg = ptnn.PTConfig(
        task="classification",
        topology=(4, 12, 3),
        num_samples=8 * 400,
        num_chains=8,
        maxtemp=10.0,
        swap_interval=10,
        swap_style="even_odd",
        swap_payload="untempered",
        swap_rule="metropolis",
        proposal="precond_mala",
        adapt_rate=0.1,
        warmstart_frac=0.1,
        precond_start_frac=0.3,
        record_w=True,
        chunk_steps=100,
    ).validate()
    res_f = ptnn.sample(
        dataclasses.replace(cfg, fused_step=True).validate(),
        prob.train, prob.test, seed=5,
    )
    res_s = ptnn.sample(cfg, prob.train, prob.test, seed=5)

    assert set(res_f.traces) == set(res_s.traces)
    for k in res_f.traces:
        assert res_f.traces[k].shape == res_s.traces[k].shape, k
    b = cfg.samples_per_chain // 2
    acc_te_f = float(np.mean(res_f.traces["acc_test"][b:, 0]))
    acc_te_s = float(np.mean(res_s.traces["acc_test"][b:, 0]))
    # cold-chain test accuracy in the same band, and actually learned
    # (tiny 400-step budget: expect well above the 33% chance floor)
    assert acc_te_f > 60.0 and acc_te_s > 60.0, (acc_te_f, acc_te_s)
    assert abs(acc_te_f - acc_te_s) < 20.0, (acc_te_f, acc_te_s)
    acc_f = float(np.mean(res_f.accept_ratio_per_chain))
    acc_s = float(np.mean(res_s.accept_ratio_per_chain))
    assert abs(acc_f - acc_s) < 15.0, (acc_f, acc_s)
    assert abs(res_f.swap_percent - res_s.swap_percent) < 25.0


@pytest.mark.slow
def test_fused_sharded_equals_unsharded():
    """2-device chain-sharded fused blocks == single-device, bit-for-bit
    (per-chain kernel math is device-local; the swap gather is exact)."""
    import jax

    from ptnn.parallel import mesh as mesh_mod

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    mesh = mesh_mod.make_mesh(jax.devices()[:2])
    prob = load_regression("Sunspot")
    cfg = dataclasses.replace(
        _cfg(
            num_chains=256,
            num_samples=256 * 40,
            swap_interval=10,
            chunk_steps=40,
        ),
        fused_step=True,
    ).validate()
    assert fused.runtime_reason(cfg, prob.train, prob.test, mesh=mesh) is None
    res_m = ptnn.sample(cfg, prob.train, prob.test, seed=3, mesh=mesh)
    res_1 = ptnn.sample(cfg, prob.train, prob.test, seed=3)
    for k in res_1.traces:
        np.testing.assert_allclose(
            res_m.traces[k], res_1.traces[k], rtol=1e-6, atol=1e-7,
            err_msg=k,
        )
    assert res_m.swap_percent == res_1.swap_percent


@pytest.mark.parametrize("thin", [4, 50])
def test_fused_record_thin_strides_traces(thin):
    """record_thin on the FUSED path keeps every k-th executed row per
    scan CHUNK of the SAME chain, selected device-side before the host
    fetch: thinned traces equal the unthinned fused run's rows at
    chunk-local executed positions thin-1, 2*thin-1, ... and the final
    state is bit-identical (thinning is pure trace selection). thin=4
    exercises the gather regime (thin < block length), thin=50 the
    sparse conditional-write regime (thin >= block length, the long-run
    convergence-study path)."""
    from ptnn.fused import _Fused

    prob = load_regression("Sunspot")
    cfg_full = _cfg(num_samples=8 * 400, swap_interval=25, chunk_steps=120)
    cfg_full = dataclasses.replace(cfg_full, fused_step=True).validate()
    cfg_thin = dataclasses.replace(cfg_full, record_thin=thin).validate()
    res_f = ptnn.sample(cfg_full, prob.train, prob.test, seed=3)
    res_t = ptnn.sample(cfg_thin, prob.train, prob.test, seed=3)
    eng = _Fused(cfg_full, prob.train, prob.test, 3, record_w=True)
    assert (thin >= eng.k_max) == (thin == 50)  # both regimes covered
    group = max(1, int(np.ceil(cfg_full.chunk_steps / eng.k_max)))
    rows = []  # merged traces: row = global step + 1 (init row 0)
    for seg in eng.plan:
        for gi in range(0, len(seg), group):
            steps = [
                start + p
                for (start, length, _f) in seg[gi : gi + group]
                for p in range(length)
            ]
            rows += [s + 1 for s in steps[thin - 1 :: thin]]
    assert res_t.traces["ll"].shape[0] == len(rows) + 1
    for k in res_t.traces:
        np.testing.assert_array_equal(
            res_t.traces[k][1:], res_f.traces[k][rows], err_msg=k
        )
    np.testing.assert_array_equal(
        np.asarray(res_t.final_state.w), np.asarray(res_f.final_state.w)
    )


@pytest.mark.slow
def test_fused_chees_256x4_sharded_equals_unsharded():
    """The crowned bench flagship SHAPE (chees16_fused_256x4: 1024 chains
    = 256 complete 4-rung ladders = eight 128-lane blocks) sharded 4
    blocks per device over 2 shards == single-device, bit-for-bit — the
    config being advertised is the config being validated (VERDICT r4
    item 7). Leapfrog bound 4 keeps interpret-mode cost down; the
    block/ladder/shard geometry is exactly the flagship's."""
    import jax

    from ptnn.parallel import mesh as mesh_mod

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    mesh = mesh_mod.make_mesh(jax.devices()[:2])
    prob = load_regression("Sunspot")
    cfg = _cfg(
        num_chains=1024,
        num_samples=1024 * 20,
        n_ladders=256,
        proposal="hmc",
        hmc_leapfrog=4,
        hmc_adapt_traj=True,
        adapt_rate=0.1,
        warmstart_frac=0.1,
        precond_start_frac=0.3,
        step_w=0.01,
        swap_interval=10,
        swap_style="even_odd",
        swap_payload="untempered",
        swap_rule="metropolis",
        chunk_steps=20,
        fused_step=True,
    )
    assert fused.runtime_reason(cfg, prob.train, prob.test, mesh=mesh) is None
    res_m = ptnn.sample(cfg, prob.train, prob.test, seed=3, mesh=mesh)
    res_1 = ptnn.sample(cfg, prob.train, prob.test, seed=3)
    for k in res_1.traces:
        np.testing.assert_array_equal(
            np.asarray(res_m.traces[k]), np.asarray(res_1.traces[k]),
            err_msg=k,
        )
    assert res_m.swap_percent == res_1.swap_percent


def test_fused_mesh_divisibility_gate():
    import jax

    from ptnn.parallel import mesh as mesh_mod

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    mesh = mesh_mod.make_mesh(jax.devices()[:2])
    cfg = dataclasses.replace(_cfg(num_chains=8), fused_step=True).validate()
    reason = fused.fused_reason(cfg, mesh=mesh)
    assert reason is not None and "divisible" in reason
    # ChEES shards when every 128-lane block holds complete ladders
    # (num_chains % 128 == 0, rungs_per_ladder | 128) ...
    cfg2 = _cfg(
        proposal="hmc", hmc_adapt_traj=True, n_ladders=64, num_chains=256,
        swap_interval=10, swap_style="even_odd", swap_payload="untempered",
        swap_rule="metropolis", fused_step=True,
    )
    assert fused.fused_reason(cfg2, mesh=mesh) is None
    # ... and is rejected when blocks would split ladders
    cfg3 = dataclasses.replace(
        cfg2, num_chains=192, n_ladders=48
    ).validate()
    assert "128-lane" in fused.fused_reason(cfg3, mesh=mesh)
    cfg4 = dataclasses.replace(
        cfg2, num_chains=384, n_ladders=32
    ).validate()  # 12 rungs/ladder does not divide 128
    assert "128-lane" in fused.fused_reason(cfg4, mesh=mesh)


@pytest.mark.slow
def test_fused_hmc_cls_sample_matches_perstep_statistically():
    from ptnn.data import load_classification

    prob = load_classification("iris")
    cfg = ptnn.PTConfig(
        task="classification",
        topology=(4, 12, 3),
        num_samples=8 * 400,
        num_chains=8,
        maxtemp=10.0,
        swap_interval=10,
        swap_style="even_odd",
        swap_payload="untempered",
        swap_rule="metropolis",
        proposal="hmc",
        hmc_leapfrog=4,
        hmc_adapt_traj=True,
        n_ladders=2,
        adapt_rate=0.1,
        warmstart_frac=0.1,
        precond_start_frac=0.3,
        record_w=True,
        chunk_steps=100,
    ).validate()
    res_f = ptnn.sample(
        dataclasses.replace(cfg, fused_step=True).validate(),
        prob.train, prob.test, seed=5,
    )
    res_s = ptnn.sample(cfg, prob.train, prob.test, seed=5)

    assert set(res_f.traces) == set(res_s.traces)
    for k in res_f.traces:
        assert res_f.traces[k].shape == res_s.traces[k].shape, k
    b = cfg.samples_per_chain // 2
    acc_te_f = float(np.mean(res_f.traces["acc_test"][b:, 0]))
    acc_te_s = float(np.mean(res_s.traces["acc_test"][b:, 0]))
    # cold-chain test accuracy in the same band, and actually learned
    assert acc_te_f > 60.0 and acc_te_s > 60.0, (acc_te_f, acc_te_s)
    assert abs(acc_te_f - acc_te_s) < 20.0, (acc_te_f, acc_te_s)
    acc_f = float(np.mean(res_f.accept_ratio_per_chain))
    acc_s = float(np.mean(res_s.accept_ratio_per_chain))
    assert abs(acc_f - acc_s) < 15.0, (acc_f, acc_s)
    assert abs(res_f.swap_percent - res_s.swap_percent) < 25.0
    # realized trajectory lengths live inside the static bound and moved
    tl = res_f.traces["traj_len"][1:, :]
    assert np.all((tl >= 1.0) & (tl <= cfg.hmc_leapfrog))
    assert np.std(tl) > 0.0
    # classification has no eta machinery: eta is a pure pass-through
    np.testing.assert_array_equal(
        np.asarray(res_f.final_state.eta), np.asarray(res_s.final_state.eta)
    )
