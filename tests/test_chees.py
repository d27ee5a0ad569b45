"""ChEES cross-replica trajectory-length adaptation (``hmc_adapt_traj``).

Hoffman, Radul & Sountsov (AISTATS 2021) adapted to tempering: the
criterion's cross-chain expectations are per-RUNG means over the
``n_ladders`` replicas; the jittered trajectory length tau = u_i *
exp(log_traj) uses a van der Corput sequence in the step index (state
independent — the post-freeze kernel is an exact mixture); realized
leapfrog counts are masked inside the static ``hmc_leapfrog``-length scan.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ptnn import PTConfig, sample
from ptnn import kernel
from ptnn.data import load_regression
from ptnn.sampler import build_temperatures, make_dataset


def chees_cfg(**kw):
    base = dict(
        task="regression",
        topology=(4, 10, 1),
        num_samples=8 * 600,
        num_chains=8,
        n_ladders=4,
        maxtemp=3.0,
        swap_interval=10,
        swap_offset=0,
        swap_payload="untempered",
        swap_rule="metropolis",
        swap_style="even_odd",
        proposal="hmc",
        hmc_leapfrog=6,
        hmc_adapt_traj=True,
        adapt_rate=0.1,
        precond_start_frac=0.3,
        step_w=0.01,
        chunk_steps=200,
    )
    base.update(kw)
    return PTConfig(**base).validate()


@pytest.fixture(scope="module")
def sunspot():
    p = load_regression("Sunspot")
    return p.train, p.test


def test_validation():
    with pytest.raises(ValueError, match="n_ladders >= 2"):
        chees_cfg(n_ladders=1)
    with pytest.raises(ValueError, match="proposal='hmc' only"):
        chees_cfg(proposal="precond_mala")
    with pytest.raises(ValueError, match="chees_rate"):
        chees_cfg(chees_rate=0.0)


def test_vdc_sequence():
    # base-2 radical inverse of 1, 2, 3, 4, 5 = 1/2, 1/4, 3/4, 1/8, 5/8
    got = [float(kernel.vdc_u(i)) for i in range(5)]
    np.testing.assert_allclose(got, [0.5, 0.25, 0.75, 0.125, 0.625])
    # low discrepancy over a longer window: 64 consecutive values fill
    # (0, 1) with every 1/16-bin hit
    u64 = np.asarray([float(kernel.vdc_u(i)) for i in range(64)])
    hist, _ = np.histogram(u64, bins=16, range=(0.0, 1.0))
    assert (hist == 4).all()


def test_full_length_trajectories_match_plain_hmc(sunspot):
    """With log_traj forced high enough that every chain realizes the full
    hmc_leapfrog steps, ONE masked-scan step must be bit-identical to the
    plain (unmasked) HMC step — pins the carry-through masking as exactly
    the identity on active chains."""
    cfg_c = chees_cfg()
    cfg_p = chees_cfg(hmc_adapt_traj=False)
    data = make_dataset(cfg_c, *sunspot)
    temps = jnp.asarray(build_temperatures(cfg_c), jnp.float32)
    k_init = jax.random.PRNGKey(3)
    st_c = kernel.init_state(k_init, cfg_c, data)
    st_p = kernel.init_state(k_init, cfg_p, data)
    np.testing.assert_array_equal(st_c.w, st_p.w)
    # tau = exp(20) * u >> eps * L for any u in the vdc sequence
    st_c = st_c._replace(log_traj=jnp.full_like(st_c.log_traj, 20.0))
    step_c = kernel.make_step_fn(cfg_c, data, temps)
    step_p = kernel.make_step_fn(cfg_p, data, temps)
    xs = (jnp.asarray(0, jnp.int32), jax.random.PRNGKey(7))
    new_c, tr_c = jax.jit(step_c)(st_c, xs)
    new_p, tr_p = jax.jit(step_p)(st_p, xs)
    np.testing.assert_array_equal(np.asarray(new_c.w), np.asarray(new_p.w))
    np.testing.assert_array_equal(
        np.asarray(new_c.ll), np.asarray(new_p.ll)
    )
    np.testing.assert_array_equal(
        np.asarray(tr_c["traj_len"]), float(cfg_c.hmc_leapfrog)
    )


def test_adapts_then_freezes(sunspot):
    cfg = chees_cfg()
    res = sample(cfg, *sunspot, seed=1)
    tl = np.asarray(res.traces["traj_len"])  # (S, C)
    assert tl[1:].min() >= 1.0 and tl[1:].max() <= cfg.hmc_leapfrog
    lt = np.asarray(res.final_state.log_traj)
    init = np.log(0.5 * cfg.hmc_leapfrog * cfg.step_w)
    # adaptation moved the mean trajectory length away from its init
    assert np.all(np.isfinite(lt)) and np.any(np.abs(lt - init) > 0.1)
    # post-burn-in the realized lengths are a FIXED function of (i, eps,
    # log_traj): rerunning the sampler reproduces them bit-identically
    res2 = sample(cfg, *sunspot, seed=1)
    np.testing.assert_array_equal(tl, np.asarray(res2.traces["traj_len"]))
    # frozen log_traj: stepping the final state at a post-burn-in index
    # leaves it unchanged
    data = make_dataset(cfg, *sunspot)
    temps = jnp.asarray(build_temperatures(cfg), jnp.float32)
    step = kernel.make_step_fn(cfg, data, temps)
    i_post = jnp.asarray(cfg.n_steps - 1, jnp.int32)
    new_st, _ = jax.jit(step)(
        res.final_state, (i_post, jax.random.PRNGKey(11))
    )
    np.testing.assert_array_equal(
        np.asarray(new_st.log_traj), np.asarray(res.final_state.log_traj)
    )


def test_rung_tied_adaptation(sunspot):
    """Replicas of the same rung share the ChEES gradient; their log_traj
    values stay close (they can only diverge through the per-chain eps cap),
    while different rungs are free to differ."""
    cfg = chees_cfg(num_samples=8 * 400)
    res = sample(cfg, *sunspot, seed=2)
    lt = np.asarray(res.final_state.log_traj).reshape(
        cfg.n_ladders, cfg.rungs_per_ladder
    )
    spread_within = np.ptp(lt, axis=0).max()  # across replicas, same rung
    assert spread_within < 1.0  # replicas agree to within e^1 in tau


def test_chunk_invariance(sunspot):
    cfg1 = chees_cfg(num_samples=8 * 300, chunk_steps=50)
    cfg2 = chees_cfg(num_samples=8 * 300, chunk_steps=300)
    r1 = sample(cfg1, *sunspot, seed=5)
    r2 = sample(cfg2, *sunspot, seed=5)
    for k in ("ll", "rmse_test", "traj_len"):
        np.testing.assert_array_equal(r1.traces[k], r2.traces[k])


@pytest.mark.slow
def test_checkpoint_resume_bit_identical(sunspot, tmp_path, monkeypatch):
    import os
    import shutil

    from ptnn import checkpoint as ck_mod

    cfg = chees_cfg(num_samples=8 * 200, chunk_steps=50)
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
    for k in ("ll", "rmse_test", "w", "traj_len"):
        np.testing.assert_array_equal(full.traces[k], r.traces[k])
    np.testing.assert_array_equal(
        np.asarray(full.final_state.log_traj),
        np.asarray(r.final_state.log_traj),
    )
