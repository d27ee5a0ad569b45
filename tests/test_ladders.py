"""Replicated tempering ensembles (``PTConfig.n_ladders``).

NOT reference behavior — the TPU-first ensemble design: R independent
K-rung ladders share one compiled program (the chain axis is nearly free on
a chip, fnn_roofline.md), swap pairs never cross a ladder boundary, and the
R cold chains are independent posterior samplers whose ESS adds
(ops/ess.pooled_multi_ess).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ptnn import PTConfig, sample
from ptnn.data import load_regression
from ptnn.ops import ess as ess_mod
from ptnn.ops import roundtrip as rt_mod
from ptnn.parallel import mesh as mesh_mod
from ptnn.parallel import swap as swap_mod
from ptnn.results import summarize
from ptnn.sampler import build_temperatures


def ladder_cfg(**kw):
    base = dict(
        task="regression",
        topology=(4, 10, 1),
        num_samples=4000,  # 500 per chain
        num_chains=8,
        n_ladders=2,
        maxtemp=3.0,
        swap_interval=25,
        swap_offset=0,
        swap_payload="tempered_times_T",
        use_langevin_gradients=False,
        chunk_steps=250,
        track_replicas=True,
    )
    base.update(kw)
    return PTConfig(**base).validate()


@pytest.fixture(scope="module")
def sunspot():
    p = load_regression("Sunspot")
    return p.train, p.test


# ---------------------------------------------------------------- config


def test_validation():
    with pytest.raises(ValueError, match="divide"):
        ladder_cfg(num_chains=10, n_ladders=4)
    with pytest.raises(ValueError, match=">=2 rungs"):
        ladder_cfg(num_chains=8, n_ladders=8)
    with pytest.raises(ValueError, match="variational_reference"):
        ladder_cfg(variational_reference=True)
    # custom_ladder is per-ladder length (K), not num_chains
    cfg = ladder_cfg(custom_ladder=(1.0, 1.5, 2.2, 3.0))
    assert cfg.rungs_per_ladder == 4
    with pytest.raises(ValueError, match="rungs per ladder"):
        ladder_cfg(custom_ladder=tuple(float(i + 1) for i in range(8)))


def test_temperature_tiling():
    cfg = ladder_cfg()
    t = build_temperatures(cfg)
    assert t.shape == (8,)
    np.testing.assert_allclose(t[:4], t[4:])
    assert t[0] == 1.0 and t[4] == 1.0
    assert np.all(np.diff(t[:4]) > 0)
    # custom per-ladder schedule tiles too
    cfg2 = ladder_cfg(custom_ladder=(1.0, 1.5, 2.2, 3.0))
    np.testing.assert_allclose(build_temperatures(cfg2), [1.0, 1.5, 2.2, 3.0] * 2)


# ------------------------------------------------------------- pair mask


def _always_swap_payload(c):
    # descending payloads: lh2 - lh1 >> 0 for every adjacent pair under the
    # metropolis rule with untempered payloads and steep betas
    return jnp.arange(c, dtype=jnp.float32) * 100.0


@pytest.mark.parametrize("style", ["bubbling", "even_odd"])
def test_pair_mask_blocks_boundary(style):
    # half_exp rule + ascending payloads: EVERY adjacent pair (including the
    # ladder-boundary one) would swap with probability 1 if proposed — only
    # the mask can stop the boundary crossing
    c, k = 8, 4
    payload = _always_swap_payload(c)
    mask = jnp.asarray((np.arange(c - 1) + 1) % k != 0, bool)
    key = jax.random.PRNGKey(0)
    if style == "bubbling":
        res = swap_mod.sweep_permutation(payload, key, pair_mask=mask)
        assert int(res.n_proposed) == int(mask.sum())
    else:
        hits = np.zeros(c - 1, int)
        for parity in (0, 1):
            res = swap_mod.disjoint_pair_permutation(
                payload, key, rule="half_exp", parity=parity, pair_mask=mask
            )
            hits += np.asarray(res.pair_active, int)
            perm = np.asarray(res.perm)
            # no index crosses its ladder block
            assert np.array_equal(perm // k, np.arange(c) // k)
        # over both parities every non-boundary pair was proposed once
        np.testing.assert_array_equal(hits, np.asarray(mask, int))
        return
    # bubbling: the permutation must stay block-diagonal even though every
    # unmasked pair swaps with probability ~1
    perm = np.asarray(res.perm)
    assert np.array_equal(perm // k, np.arange(c) // k)
    # boundary pair reports inactive + zero expected acceptance
    assert not bool(res.pair_active[k - 1])
    assert float(res.pair_accept[k - 1]) == 0.0


# ------------------------------------------------------------ end to end


@pytest.mark.parametrize("style", ["bubbling", "even_odd"])
def test_replicas_never_cross_ladders(sunspot, style):
    kw = dict(swap_style=style)
    if style == "even_odd":
        kw.update(swap_rule="metropolis", swap_payload="untempered")
    cfg = ladder_cfg(**kw)
    res = sample(cfg, *sunspot, seed=3)
    k = cfg.rungs_per_ladder
    rid = np.asarray(res.traces["replica"])  # (S, C) identity at each rung
    assert rid.shape == (cfg.samples_per_chain, cfg.num_chains)
    # every step: the replica sitting at rung j of ladder b started in b
    blocks = rid // k
    np.testing.assert_array_equal(
        blocks, np.broadcast_to(np.arange(cfg.num_chains) // k, rid.shape)
    )
    # swaps do happen inside ladders
    assert int(res.final_state.n_swap_accepted) > 0
    # result temperatures are tiled
    np.testing.assert_allclose(res.temperatures[:k], res.temperatures[k:])


def test_single_ladder_path_unchanged(sunspot):
    """n_ladders=1 must be bit-identical to a config without the field."""
    cfg1 = ladder_cfg(n_ladders=1)
    cfg2 = dataclasses.replace(cfg1)  # same; field default exercised
    r1 = sample(cfg1, *sunspot, seed=5)
    r2 = sample(cfg2, *sunspot, seed=5)
    np.testing.assert_array_equal(r1.traces["w"], r2.traces["w"])


def test_cold_only_summary_pools_all_cold_rungs(sunspot):
    cfg = ladder_cfg()
    res = sample(cfg, *sunspot, seed=11)
    s_cold = summarize(res, "Sunspot", cold_only=True)
    b = int(cfg.samples_per_chain * cfg.burn_in)
    k = cfg.rungs_per_ladder
    expect = float(np.mean(res.traces["rmse_test"][b:, [0, k]]))
    assert s_cold.test_mean == pytest.approx(expect)


def test_sharded_matches_single_device(sunspot):
    cfg = ladder_cfg(swap_style="even_odd", swap_rule="metropolis",
                     swap_payload="untempered")
    r_plain = sample(cfg, *sunspot, seed=7)
    m = mesh_mod.make_mesh()
    r_mesh = sample(cfg, *sunspot, seed=7, mesh=m)
    for key in ("w", "ll", "replica"):
        np.testing.assert_allclose(
            r_plain.traces[key], r_mesh.traces[key], rtol=2e-4, atol=1e-4
        )


# ------------------------------------------------------------ diagnostics


def test_pooled_multi_ess_sums_independent_chains(rng):
    s = rng.standard_normal((400, 3, 5))
    total = ess_mod.pooled_multi_ess(s)
    parts = [ess_mod.multi_ess(s[:, r, :]) for r in range(3)]
    assert total == pytest.approx(sum(parts))
    with pytest.raises(ValueError):
        ess_mod.pooled_multi_ess(s[:, 0, :])


def test_roundtrip_stats_per_ladder():
    # two independent 3-rung ladders; replica trace is rung-major identities.
    # Ladder 0: replica 0 cycles 0->1->2->1->0 (one round trip); others idle.
    k = 3
    pos0 = np.array([0, 1, 2, 1, 0, 0, 0, 0])  # rung of replica 0 over time
    steps = len(pos0)
    rid = np.tile(np.arange(2 * k), (steps, 1))
    for t, p in enumerate(pos0):
        # swap replica 0 into rung p (within ladder 0)
        rid[t, [0, p]] = rid[t, [p, 0]]
    st = rt_mod.roundtrip_stats(rid, n_ladders=2)
    assert st.round_trips.shape == (2 * k,)
    assert int(st.round_trips[0]) == 1
    assert int(st.round_trips.sum()) == 1
    # same trace read as ONE 6-rung ladder: no replica touches rung 5 -> 0 trips
    st1 = rt_mod.roundtrip_stats(rid)
    assert int(st1.round_trips.sum()) == 0


def test_record_w_chains_records_cold_rungs(sunspot):
    """Under replicated ladders record_w_chains=k traces the first k COLD
    rungs (stride K), not the first k chain indices."""
    cfg_all = ladder_cfg()
    cfg_k = ladder_cfg(record_w_chains=2)
    r_all = sample(cfg_all, *sunspot, seed=13)
    r_k = sample(cfg_k, *sunspot, seed=13)
    k = cfg_all.rungs_per_ladder
    assert r_k.traces["w"].shape[1] == 2
    np.testing.assert_array_equal(
        r_k.traces["w"], r_all.traces["w"][:, [0, k], :]
    )
