"""Communication-barrier ladder tuning (ops/ladder.py) + pair swap stats.

The reference's ladder is a fixed geometric grid (pt_classification.py:
537-622) with no feedback from how the posterior actually resists exchange.
ptnn measures the per-pair expected swap acceptance (Rao-Blackwellized, in
SampleResult.pair_swap_accept) and re-spaces the ladder at equal increments
of the estimated communication barrier (Syed et al. 2021).
"""

import dataclasses

import numpy as np
import pytest

from ptnn import PTConfig, sample, tuning
from ptnn.data import load_regression
from ptnn.ops import ladder


# ---------------------------------------------------------------------------
# unit: the barrier schedule


def geo(c=8, maxtemp=10.0):
    return ladder.assign_temperatures(c, maxtemp)


def test_barrier_cumulative_and_total():
    temps = geo(5, 4.0)
    cum, total = ladder.communication_barrier(temps, [0.1, 0.2, 0.3, 0.4])
    np.testing.assert_allclose(cum, [0.0, 0.1, 0.3, 0.6, 1.0])
    assert total == pytest.approx(1.0)
    with pytest.raises(ValueError):
        ladder.communication_barrier(temps, [0.1, 0.2])


def test_uniform_rejection_keeps_ladder():
    temps = geo()
    tuned = ladder.barrier_tuned_temperatures(temps, np.full(7, 0.3))
    np.testing.assert_allclose(tuned, temps, rtol=1e-6)


def test_zero_barrier_keeps_ladder():
    temps = geo()
    tuned = ladder.barrier_tuned_temperatures(temps, np.zeros(7))
    np.testing.assert_allclose(tuned, temps)


def test_concentrated_barrier_concentrates_rungs():
    temps = geo(8, 10.0)
    reject = np.array([0.94, 0.01, 0.01, 0.01, 0.01, 0.01, 0.01])
    tuned = ladder.barrier_tuned_temperatures(temps, reject)
    # endpoints pinned, strictly increasing
    assert tuned[0] == 1.0 and tuned[-1] == pytest.approx(10.0)
    assert (np.diff(tuned) > 0).all()
    # most interior rungs move into the bottleneck pair's interval
    inside = np.sum((tuned > temps[0]) & (tuned < temps[1]))
    assert inside >= 5, tuned
    # and the bottleneck pair's beta gap shrinks hard
    b_old, b_new = 1.0 / temps, 1.0 / tuned
    assert (b_old[0] - b_new[1]) < 0.2 * (b_old[0] - b_old[1])


def test_tuned_ladder_is_valid_custom_ladder():
    temps = geo(6, 5.0)
    tuned = ladder.barrier_tuned_temperatures(
        temps, np.array([0.7, 0.1, 0.2, 0.5, 0.05])
    )
    cfg = PTConfig(
        task="regression",
        topology=(4, 5, 1),
        num_samples=600,
        num_chains=6,
        custom_ladder=tuple(tuned),
    ).validate()
    assert cfg.custom_ladder[0] == 1.0


def test_custom_ladder_validation():
    base = dict(task="regression", topology=(4, 5, 1), num_chains=4)
    with pytest.raises(ValueError, match="temperatures for"):
        PTConfig(**base, custom_ladder=(1.0, 2.0)).validate()
    with pytest.raises(ValueError, match="must be 1.0"):
        PTConfig(**base, custom_ladder=(1.1, 2.0, 3.0, 4.0)).validate()
    with pytest.raises(ValueError, match="strictly increasing"):
        PTConfig(**base, custom_ladder=(1.0, 3.0, 2.0, 4.0)).validate()


# ---------------------------------------------------------------------------
# end-to-end plumbing


@pytest.fixture(scope="module")
def sunspot():
    p = load_regression("Sunspot")
    return p.train, p.test


def _cfg(**kw):
    base = dict(
        task="regression",
        topology=(4, 10, 1),
        num_samples=4000,
        num_chains=8,
        maxtemp=10.0,
        swap_interval=10,
        swap_offset=0,
        swap_payload="tempered_times_T",
        use_langevin_gradients=False,
        chunk_steps=250,
    )
    base.update(kw)
    return PTConfig(**base).validate()


def test_pair_swap_accept_recorded(sunspot):
    res = sample(_cfg(), *sunspot, seed=0)
    pa = res.pair_swap_accept
    assert pa.shape == (7,)
    assert ((pa >= 0.0) & (pa <= 1.0)).all()
    cnt = np.asarray(res.final_state.pair_prop_count)
    assert (cnt[:-1] > 0).all() and cnt[-1] == 0  # padding row untouched


def test_pair_swap_accept_even_odd_alternation(sunspot):
    res = sample(
        _cfg(
            swap_style="even_odd",
            swap_rule="metropolis",
            swap_payload="untempered",
        ),
        *sunspot,
        seed=0,
    )
    cnt = np.asarray(res.final_state.pair_prop_count)[:-1]
    # even and odd pairs are proposed on alternating sweeps: counts split
    assert abs(int(cnt[0::2].sum()) - int(cnt[1::2].sum())) <= cnt.max()
    assert (cnt > 0).all()
    assert ((res.pair_swap_accept >= 0) & (res.pair_swap_accept <= 1)).all()


def test_custom_ladder_matches_geometric_bitwise(sunspot):
    """custom_ladder set to the geometric ladder reproduces the maxtemp run
    exactly — the override changes only where temperatures come from."""
    cfg_a = _cfg(record_w=True)
    temps = ladder.assign_temperatures(8, 10.0)
    cfg_b = dataclasses.replace(
        _cfg(record_w=True), custom_ladder=tuple(float(t) for t in temps)
    ).validate()
    res_a = sample(cfg_a, *sunspot, seed=11)
    res_b = sample(cfg_b, *sunspot, seed=11)
    np.testing.assert_array_equal(res_a.traces["w"], res_b.traces["w"])
    np.testing.assert_allclose(res_a.temperatures, res_b.temperatures)


def test_suggest_num_chains():
    assert tuning.suggest_num_chains(0.0) == 2
    assert tuning.suggest_num_chains(3.8, target_reject=0.5) == 9
    assert tuning.suggest_num_chains(3.8, target_reject=0.25) == 17
    with pytest.raises(ValueError):
        tuning.suggest_num_chains(1.0, target_reject=1.5)


@pytest.mark.slow
def test_feedback_rounds_equalize_rejections(sunspot):
    """tune_ladder flattens the pair-rejection profile (the objective the
    equal-barrier schedule optimizes) and lowers the cold-end bottleneck.
    Uses the flagship precond_mala sampler so within-chain mixing is fast
    enough for the profile to be an equilibrium property, not a transient
    (CPU-measured at this exact budget: std 0.131 -> 0.047, bottleneck
    0.83 -> 0.60 over two feedback rounds). Statistical, hence slow tier.
    tune_ladder itself forces pt_phase_frac=2.0 — after the reference's 60%
    temper switch every rung samples at T=1 and rejections collapse, which
    would dilute the measured profile."""
    cfg = _cfg(
        num_samples=48_000,
        swap_style="even_odd",
        swap_rule="metropolis",
        swap_payload="untempered",
        proposal="precond_mala",
        adapt_rate=0.1,
        warmstart_frac=0.1,
        precond_start_frac=0.3,
        chunk_steps=1000,
    )
    out = tuning.tune_ladder(cfg, *sunspot, rounds=3, seeds=(0, 1))
    first, last = out.history[0], out.history[-1]
    assert float(np.std(last.pair_reject)) < 0.6 * float(np.std(first.pair_reject))
    assert float(last.pair_reject.max()) < float(first.pair_reject.max())
    # the barrier estimate is a property of the posterior, not the ladder:
    # successive rounds must agree
    assert last.barrier == pytest.approx(first.barrier, rel=0.15)
    assert out.suggested_num_chains >= 8
    # tuned ladder is a valid custom_ladder
    PTConfig(
        task="regression",
        topology=(4, 10, 1),
        num_chains=8,
        custom_ladder=tuple(float(t) for t in out.temperatures),
    ).validate()


def test_tune_ladder_pools_replicated_ladders(sunspot):
    """With replicated ladders the tuner returns PER-LADDER arrays and its
    rejection profile equals the manual pooling of the R replicas' pair
    stats from an identical pilot run."""
    cfg = _cfg(num_chains=8, n_ladders=2, maxtemp=5.0)
    out = tuning.tune_ladder(cfg, *sunspot, rounds=1, seeds=(0,))
    k = cfg.rungs_per_ladder
    assert out.history[0].temperatures.shape == (k,)
    assert out.history[0].pair_reject.shape == (k - 1,)
    assert out.temperatures.shape == (k,)
    # manual pooling from the same pilot config/seed
    pilot = dataclasses.replace(
        cfg, pt_phase_frac=2.0, record_fx=False, record_w=False,
        track_replicas=False,
    ).validate()
    res = sample(pilot, *sunspot, seed=0)
    acc = np.mean(
        [res.pair_swap_accept[r * k : r * k + k - 1] for r in range(2)],
        axis=0,
    )
    np.testing.assert_allclose(out.history[0].pair_reject, 1.0 - acc)
    # tuned schedule is a valid per-ladder custom_ladder for the SAME config
    dataclasses.replace(
        cfg, custom_ladder=tuple(float(t) for t in out.temperatures)
    ).validate()
