"""Replica-identity tracking (track_replicas) + round-trip diagnostics.

The reference never tracks replica identity — its swap_perc scalar
(pt_classification.py:773-776) is its only exchange metric. ptnn threads an
int32 label through the swap permutation and ops/roundtrip.py computes the
standard transport diagnostics (round-trip rate, Katzgraber up-flow f(k)).
"""

import dataclasses

import numpy as np
import pytest

from ptnn import PTConfig, sample
from ptnn.data import load_regression
from ptnn.kernel import swap_due
from ptnn.ops import roundtrip


# ---------------------------------------------------------------------------
# unit tests on synthetic traces


def _rung_major(pos):
    """(steps, C) replica->rung positions  ->  rung-major permutation trace."""
    pos = np.asarray(pos)
    steps, c = pos.shape
    rep = np.empty_like(pos)
    rows = np.arange(steps)[:, None]
    rep[rows, pos] = np.arange(c)[None, :]
    return rep


def test_single_round_trip_counted():
    # one replica walks 0 -> 2 -> 0 on a 3-rung ladder; others idle by swap
    pos_r0 = [0, 1, 2, 1, 0, 0]
    pos = np.zeros((6, 3), dtype=np.int64)
    pos[:, 0] = pos_r0
    # keep rows valid permutations: replica 1/2 occupy the slots r0 vacates
    occupied = {(t, p) for t, p in enumerate(pos_r0)}
    for t in range(6):
        free = [k for k in range(3) if (t, k) not in occupied]
        pos[t, 1], pos[t, 2] = free
    stats = roundtrip.roundtrip_stats(_rung_major(pos))
    assert stats.round_trips[0] == 1
    assert stats.round_trips.sum() == 1
    assert stats.visits_cold[0] == 3 and stats.visits_hot[0] == 1


def test_hot_start_needs_full_cycle():
    # replica starting at the hot end: hot -> cold -> hot -> cold is ONE
    # cold->hot->cold trip (the first descent only starts the clock)
    pos_r0 = [2, 1, 0, 1, 2, 1, 0]
    pos = np.zeros((7, 3), dtype=np.int64)
    pos[:, 0] = pos_r0
    occupied = {(t, p) for t, p in enumerate(pos_r0)}
    for t in range(7):
        free = [k for k in range(3) if (t, k) not in occupied]
        pos[t, 1], pos[t, 2] = free
    stats = roundtrip.roundtrip_stats(_rung_major(pos))
    assert stats.round_trips[0] == 1


def test_pingpong_scores_zero_trips():
    # two middle rungs swapping forever: swap% is 100 but transport is nil
    steps, c = 200, 4
    pos = np.tile(np.arange(c), (steps, 1))
    pos[1::2, 1], pos[1::2, 2] = 2, 1
    stats = roundtrip.roundtrip_stats(_rung_major(pos))
    assert stats.round_trips.sum() == 0
    assert stats.rate_per_kstep == 0.0


def test_flow_fraction_deterministic_conveyor():
    # a C-cycle conveyor: every replica moves up one rung per step, wrapping
    # hot->cold — each rung sees a 50/50 mix of up/down labels in steady
    # state except the extremes (cold is always up, hot always down)
    c, laps = 8, 30
    pos0 = np.arange(c)
    pos = np.stack([(pos0 + t) % c for t in range(laps * c)], axis=0)
    stats = roundtrip.roundtrip_stats(_rung_major(pos))
    # wrap hot->cold is NOT a physical descent through the ladder, but the
    # label machinery only looks at extreme touches, so each lap after the
    # first completes a trip per replica
    assert stats.round_trips.sum() >= c * (laps - 2)
    assert stats.flow_up[0] == 1.0
    assert stats.flow_up[-1] == 0.0
    assert np.all(stats.flow_samples > 0)


def test_format_report_runs():
    pos = np.tile(np.arange(3), (10, 1))
    stats = roundtrip.roundtrip_stats(_rung_major(pos))
    txt = roundtrip.format_report(stats, temps=np.array([1.0, 2.0, 4.0]))
    assert "round trips" in txt and "| 2 | 4.000" in txt


# ---------------------------------------------------------------------------
# end-to-end through the sampler


@pytest.fixture(scope="module")
def sunspot():
    p = load_regression("Sunspot")
    return p.train, p.test


def _cfg(**kw):
    base = dict(
        task="regression",
        topology=(4, 10, 1),
        num_samples=4800,
        num_chains=8,
        maxtemp=2.0,
        swap_interval=20,
        swap_offset=0,
        swap_payload="tempered_times_T",
        use_langevin_gradients=False,
        track_replicas=True,
        chunk_steps=150,
    )
    base.update(kw)
    return PTConfig(**base).validate()


def test_replica_trace_is_permutation_and_swap_aligned(sunspot):
    # 4 rungs x 200 sweeps: enough exchange for at least one full round trip
    cfg = _cfg(num_chains=4, num_samples=8000, swap_interval=10)
    res = sample(cfg, *sunspot, seed=3)
    rep = res.traces["replica"]
    s, c = cfg.samples_per_chain, cfg.num_chains
    assert rep.shape == (s, c)
    np.testing.assert_array_equal(rep[0], np.arange(c))
    sorted_rows = np.sort(rep, axis=1)
    np.testing.assert_array_equal(sorted_rows, np.tile(np.arange(c), (s, 1)))
    # identity changes ONLY at swap-due steps (trace row r = step r-1)
    changed = (rep[1:] != rep[:-1]).any(axis=1)
    due = np.array([bool(swap_due(cfg, i)) for i in range(s - 1)])
    assert not changed[~due].any()
    assert changed[due].any()  # at ~50% pair acceptance some sweeps swap
    # transport happens at this maxtemp: at least one full round trip
    stats = roundtrip.roundtrip_stats(rep)
    assert stats.round_trips.sum() >= 1
    assert np.nanmax(stats.flow_up) <= 1.0 and np.nanmin(stats.flow_up) >= 0.0


def test_track_replicas_does_not_change_sampling(sunspot):
    """The labels are pure observers: (w, ll) streams are bit-identical
    with tracking on and off."""
    res_a = sample(_cfg(record_w=True), *sunspot, seed=5)
    res_b = sample(
        dataclasses.replace(_cfg(record_w=True), track_replicas=False).validate(),
        *sunspot,
        seed=5,
    )
    np.testing.assert_array_equal(res_a.traces["w"], res_b.traces["w"])
    np.testing.assert_array_equal(res_a.traces["ll"], res_b.traces["ll"])
    assert "replica" not in res_b.traces


def test_checkpoint_resume_carries_replica_state(sunspot, tmp_path):
    """Mid-run resume round-trips replica labels and the per-pair swap
    statistics exactly (both are new ChainState fields the generic
    checkpoint flattening must carry)."""
    import os

    cfg = _cfg(num_samples=3200, chunk_steps=100)
    ck = str(tmp_path / "rt.npz")
    full = sample(cfg, *sunspot, seed=13)
    r1 = sample(cfg, *sunspot, seed=13, checkpoint_path=ck, checkpoint_every=2)
    assert os.path.exists(ck)
    r2 = sample(cfg, *sunspot, seed=13, checkpoint_path=ck, checkpoint_every=2)
    for res in (r1, r2):
        np.testing.assert_array_equal(full.traces["replica"], res.traces["replica"])
        np.testing.assert_allclose(
            full.pair_swap_accept, res.pair_swap_accept, rtol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(full.final_state.pair_prop_count),
            np.asarray(res.final_state.pair_prop_count),
        )


def test_precond_mala_tracks_replicas(sunspot):
    cfg = _cfg(proposal="precond_mala")
    res = sample(cfg, *sunspot, seed=7)
    rep = res.traces["replica"]
    sorted_rows = np.sort(rep, axis=1)
    np.testing.assert_array_equal(
        sorted_rows, np.tile(np.arange(cfg.num_chains), (rep.shape[0], 1))
    )
    assert (rep[1:] != rep[:-1]).any()
