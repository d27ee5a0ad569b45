"""Round-based VR adaptation (ptnn/rounds.py) + the full-covariance static
reference family (ops/vref.py, kernel static mode).

Sharpest probes:
* ``log_q_chol`` / ``grad_logq_chol`` / ``sample_q_chol`` against autodiff
  and moment identities — the triangular-solve algebra;
* beta=0 regeneration acceptance is identically 100% under a STATIC
  full-covariance reference (any wiring error in the joint (w, eta)
  coordinates, the chol solve, or the prior terms breaks the cancellation);
* static-mode runs are exactly reproducible through a checkpoint resume
  (vr_chol rides ChainState);
* run_rounds: doubling budgets, warm start, ladder re-spacing, history.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ptnn import PTConfig, sample
from ptnn import kernel, rounds
from ptnn.data import load_classification, load_regression
from ptnn.ops import vref


@pytest.fixture(scope="module")
def lazer():
    p = load_regression("Lazer")
    return p.train, p.test


@pytest.fixture(scope="module")
def iris():
    p = load_classification("iris")
    return p.train, p.test


def _static_cfg(**kw):
    base = dict(
        task="regression",
        topology=(4, 5, 1),
        num_samples=8 * 240,
        num_chains=8,
        maxtemp=5.0,
        swap_interval=10,
        swap_offset=0,
        swap_payload="untempered",
        swap_rule="metropolis",
        swap_style="even_odd",
        pt_phase_frac=2.0,
        variational_reference=True,
        vr_mode="static",
        vr_family="full_cov",
        vr_hot_infinite=True,
        chunk_steps=80,
    )
    base.update(kw)
    return PTConfig(**base).validate()


# ---------------------------------------------------------------------------
# ops/vref.py full-covariance family
# ---------------------------------------------------------------------------


def test_log_q_chol_matches_dense_quadratic():
    rng = np.random.default_rng(0)
    z_dim = 7
    a = rng.normal(size=(z_dim, z_dim))
    cov = a @ a.T + z_dim * np.eye(z_dim)
    chol = np.linalg.cholesky(cov)
    mu = rng.normal(size=z_dim)
    z = rng.normal(size=(4, z_dim))
    got = np.asarray(
        vref.log_q_chol(jnp.asarray(z, jnp.float32),
                        jnp.asarray(mu, jnp.float32),
                        jnp.asarray(chol, jnp.float32))
    )
    prec = np.linalg.inv(cov)
    want = np.array([-0.5 * (d @ prec @ d) for d in (z - mu)])
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_grad_logq_chol_matches_autodiff():
    rng = np.random.default_rng(1)
    z_dim = 6
    a = rng.normal(size=(z_dim, z_dim))
    chol = jnp.asarray(np.linalg.cholesky(a @ a.T + np.eye(z_dim)),
                       jnp.float32)
    mu = jnp.asarray(rng.normal(size=z_dim), jnp.float32)
    z = jnp.asarray(rng.normal(size=z_dim), jnp.float32)
    got = vref.grad_logq_chol(z, mu, chol)
    want = jax.grad(lambda zz: vref.log_q_chol(zz, mu, chol))(z)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_sample_q_chol_moments():
    rng = np.random.default_rng(2)
    z_dim = 3
    a = rng.normal(size=(z_dim, z_dim))
    cov = a @ a.T + np.eye(z_dim)
    chol = jnp.asarray(np.linalg.cholesky(cov), jnp.float32)
    mu = jnp.asarray([1.0, -2.0, 0.5], jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(3), 4000)
    draws = np.asarray(jax.vmap(
        lambda k: vref.sample_q_chol(k, mu, chol))(keys))
    np.testing.assert_allclose(draws.mean(0), np.asarray(mu), atol=0.15)
    np.testing.assert_allclose(np.cov(draws, rowvar=False), cov,
                               atol=0.35 * np.max(np.abs(cov)))


def test_fit_gaussian_families():
    rng = np.random.default_rng(4)
    z_dim = 5
    a = rng.normal(size=(z_dim, z_dim)) * 0.5
    cov = a @ a.T + np.diag(np.arange(1.0, z_dim + 1.0))
    draws = rng.multivariate_normal(np.arange(z_dim, dtype=float), cov,
                                    size=6000)
    mu_d, var_d, chol_d = vref.fit_gaussian(draws, family="diag")
    assert chol_d is None
    np.testing.assert_allclose(mu_d, np.arange(z_dim), atol=0.2)
    np.testing.assert_allclose(var_d, np.diag(cov), rtol=0.15)
    mu_f, var_f, chol_f = vref.fit_gaussian(
        draws, family="full_cov", shrinkage=0.0)
    np.testing.assert_allclose(chol_f @ chol_f.T, cov,
                               atol=0.2 * np.max(np.abs(cov)))
    # shrinkage pulls off-diagonals toward zero, keeps the diagonal
    _, _, chol_s = vref.fit_gaussian(draws, family="full_cov", shrinkage=1.0)
    s = chol_s @ chol_s.T
    off = s - np.diag(np.diag(s))
    assert np.max(np.abs(off)) < 0.05 * np.max(np.diag(s))
    with pytest.raises(ValueError, match="family"):
        vref.fit_gaussian(draws, family="nope")
    with pytest.raises(ValueError, match="draws"):
        vref.fit_gaussian(draws[:1])


def test_log_z0_chol_matches_diag_case():
    # with a diagonal chol the two normalizers must agree exactly
    var = np.array([0.5, 2.0, 1.7])
    chol = np.diag(np.sqrt(var))
    a = vref.log_z0(var, prior_dim=3, sigma_sq=25.0)
    b = vref.log_z0_chol(chol, prior_dim=3, sigma_sq=25.0)
    np.testing.assert_allclose(a, b, rtol=1e-12)


# ---------------------------------------------------------------------------
# config gates
# ---------------------------------------------------------------------------


def test_static_mode_validation():
    assert _static_cfg().vr_family == "full_cov"
    with pytest.raises(ValueError, match="full_cov"):
        _static_cfg(vr_mode="welford")
    with pytest.raises(ValueError, match="vr_mode"):
        _static_cfg(vr_mode="nope")
    with pytest.raises(ValueError, match="vr_family"):
        _static_cfg(vr_family="nope")
    with pytest.raises(ValueError, match="variational_reference"):
        _static_cfg(variational_reference=False, vr_hot_infinite=False)


def test_set_static_reference_shape_gates(lazer):
    from ptnn import sampler as sampler_mod

    cfg = _static_cfg()
    data = sampler_mod.make_dataset(cfg, *lazer)
    st = kernel.init_state(jax.random.PRNGKey(0), cfg, data)
    zdim = st.vr_mean.shape[0]
    mu, var = np.zeros(zdim), np.ones(zdim)
    with pytest.raises(ValueError, match="chol"):
        kernel.set_static_reference(st, cfg, mu, var)  # full_cov needs chol
    out = kernel.set_static_reference(st, cfg, mu, var, np.eye(zdim))
    assert out.vr_chol.shape == (zdim, zdim)
    with pytest.raises(ValueError, match="shape"):
        kernel.set_static_reference(st, cfg, mu[:-1], var[:-1],
                                    np.eye(zdim - 1))
    cfg_w = _static_cfg(vr_mode="welford", vr_family="diag")
    st_w = kernel.init_state(jax.random.PRNGKey(0), cfg_w, data)
    with pytest.raises(ValueError, match="static"):
        kernel.set_static_reference(st_w, cfg_w, mu, var)


# ---------------------------------------------------------------------------
# kernel static mode: exactness + reproducibility
# ---------------------------------------------------------------------------


def _fitted_state(cfg, train, test, seed=0):
    """Init + a plausible non-trivial static reference (off-center, mildly
    correlated) so exactness checks do not run at the degenerate identity."""
    from ptnn import sampler as sampler_mod

    data = sampler_mod.make_dataset(cfg, train, test)
    st = kernel.init_state(jax.random.PRNGKey(seed), cfg, data)
    zdim = st.vr_mean.shape[0]
    rng = np.random.default_rng(7)
    a = rng.normal(size=(zdim, zdim)) * 0.05
    cov = a @ a.T + np.eye(zdim) * 0.8
    chol = np.linalg.cholesky(cov)
    mu = rng.normal(size=zdim) * 0.3
    if cfg.vr_family == "diag":
        return kernel.set_static_reference(st, cfg, mu, np.diag(cov))
    return kernel.set_static_reference(st, cfg, mu, np.diag(cov), chol)


def test_beta0_regen_accepts_identically_fullcov(lazer):
    """The beta=0 independence-regeneration ratio cancels algebraically to 1
    under the static full-covariance reference — the end-to-end identity
    pinning log_q_chol/sample_q_chol and the joint (w, eta) coordinates."""
    cfg = _static_cfg(proposal="precond_mala", step_w=0.01)
    st = _fitted_state(cfg, *lazer)
    res = sample(cfg, *lazer, seed=1, init_state=st)
    n_prop = int(res.final_state.n_regen_proposed)
    n_acc = int(res.final_state.n_regen_accepted)
    assert n_prop > 0
    assert n_acc == n_prop  # identically 100%
    assert np.isfinite(np.asarray(res.traces["rmse_test"])).all()


def test_static_diag_runs_and_regen_exact(lazer):
    cfg = _static_cfg(vr_family="diag")
    st = _fitted_state(cfg, *lazer)
    res = sample(cfg, *lazer, seed=2, init_state=st)
    assert int(res.final_state.n_regen_proposed) > 0
    assert int(res.final_state.n_regen_accepted) == int(
        res.final_state.n_regen_proposed
    )


def test_static_checkpoint_resume_bit_exact(lazer, tmp_path):
    """vr_chol rides ChainState through checkpoints; resumed == full run."""
    cfg = _static_cfg(num_samples=8 * 160, chunk_steps=40)
    st = _fitted_state(cfg, *lazer)
    full = sample(cfg, *lazer, seed=3, init_state=st)
    ck = str(tmp_path / "ck")
    # run with checkpointing, interrupt by running only half the chunks:
    # emulate by checkpoint_every=1 then re-invoking (sample resumes)
    first = sample(cfg, *lazer, seed=3, init_state=st,
                   checkpoint_path=ck, checkpoint_every=1)
    resumed = sample(cfg, *lazer, seed=3, init_state=st,
                     checkpoint_path=ck, checkpoint_every=1)
    for a, b in ((first, full), (resumed, full)):
        np.testing.assert_array_equal(
            np.asarray(a.traces["rmse_test"]),
            np.asarray(b.traces["rmse_test"]),
        )
    np.testing.assert_array_equal(
        np.asarray(first.final_state.vr_chol),
        np.asarray(full.final_state.vr_chol),
    )


def test_init_state_warm_start_overrides(lazer):
    from ptnn import sampler as sampler_mod

    cfg = _static_cfg()
    data = sampler_mod.make_dataset(cfg, *lazer)
    c, w_dim = cfg.num_chains, cfg.w_size
    rng = np.random.default_rng(5)
    w0 = rng.normal(size=(c, w_dim)).astype(np.float32)
    eta0 = rng.normal(size=(c,)).astype(np.float32)
    st = kernel.init_state(jax.random.PRNGKey(0), cfg, data,
                           init_w=w0, init_eta=eta0)
    np.testing.assert_array_equal(np.asarray(st.w), w0)
    np.testing.assert_array_equal(np.asarray(st.eta), eta0)
    # cached ll is consistent: a no-op recompute from (w, eta) matches
    temps = jnp.asarray(np.ones(c, np.float32))
    step = kernel.make_step_fn(cfg, data, temps)
    np.testing.assert_allclose(
        np.asarray(step.recompute_ll(st).ll), np.asarray(st.ll), rtol=1e-6
    )
    with pytest.raises(ValueError, match="init_w"):
        kernel.init_state(jax.random.PRNGKey(0), cfg, data,
                          init_w=w0[:, :-1])
    with pytest.raises(ValueError, match="init_eta"):
        kernel.init_state(jax.random.PRNGKey(0), cfg, data,
                          init_w=w0, init_eta=eta0[:-1])


# ---------------------------------------------------------------------------
# run_rounds
# ---------------------------------------------------------------------------


def test_round_budgets_doubling():
    assert rounds.round_budgets(1600, 4, 100) == [200, 400, 800, 1600]
    assert rounds.round_budgets(1600, 3, 500) == [500, 800, 1600]
    assert rounds.round_budgets(64, 3, 256) == [64, 64, 64]  # floor clamps
    with pytest.raises(ValueError):
        rounds.round_budgets(100, 0)


def test_run_rounds_regression_fullcov(lazer):
    cfg = _static_cfg(num_samples=8 * 320)
    rr = rounds.run_rounds(cfg, *lazer, seed=0, n_rounds=3,
                           min_round_samples=80)
    assert len(rr.history) == 3
    assert [h.samples_per_chain for h in rr.history] == [80, 160, 320]
    # round 0 is prior-anchored: no regen counters
    assert np.isnan(rr.history[0].regen_accept_percent)
    # later rounds ride the beta=0 leg: regen is algebraically exact
    for h in rr.history[1:]:
        assert h.regen_accept_percent == pytest.approx(100.0)
        assert h.round_trips_per_kstep >= 0.0
    assert rr.history[0].fit_draws > 0 and rr.history[-1].fit_draws == 0
    zdim = cfg.w_size + 1  # regression: z = (w, eta)
    assert rr.mu.shape == (zdim,) and rr.chol.shape == (zdim, zdim)
    assert rr.config.custom_ladder is not None  # ladder was re-spaced
    assert np.isfinite(rr.history[-1].test_metric)
    # the markdown report renders
    txt = rounds.format_history(rr.history)
    assert txt.count("\n") == len(rr.history) + 1


def test_run_rounds_classification_diag(iris):
    cfg = _static_cfg(
        task="classification",
        topology=(4, 6, 3),
        vr_family="diag",
        num_samples=8 * 240,
        step_eta=0.2,
    )
    rr = rounds.run_rounds(cfg, *iris, seed=1, n_rounds=2,
                           min_round_samples=80, retune_ladder=False,
                           warm_start=False)
    assert len(rr.history) == 2
    assert rr.chol is None
    assert rr.mu.shape == (cfg.w_size,)  # classification: z = w
    assert rr.config.custom_ladder is None  # retune off
    assert 0.0 <= rr.history[-1].test_metric <= 100.0


def test_run_rounds_gates(lazer):
    with pytest.raises(ValueError, match="static"):
        rounds.run_rounds(
            _static_cfg(vr_mode="welford", vr_family="diag"), *lazer
        )


def test_static_fullcov_sharded_matches_unsharded(lazer):
    """The static full-covariance reference under an 8-device chain mesh:
    the (Z,) mean and (Z, Z) Cholesky replicate, the triangular-solve
    log q enters MH/swap/drift on sharded chain blocks, and the beta=0
    regen scatter crosses shard boundaries. Traces must match the
    single-device run (the welford-mode analogue lives in test_vref.py)."""
    from ptnn.parallel import mesh as mesh_mod

    cfg = _static_cfg(num_samples=8 * 160, chunk_steps=40)
    st = _fitted_state(cfg, *lazer)
    r_plain = sample(cfg, *lazer, seed=6, init_state=st)
    mesh = mesh_mod.make_mesh()
    st_m = _fitted_state(cfg, *lazer)
    r_mesh = sample(cfg, *lazer, seed=6, mesh=mesh, init_state=st_m)
    np.testing.assert_allclose(
        r_plain.traces["ll"], r_mesh.traces["ll"], rtol=1e-4, atol=1e-4
    )
    assert int(r_mesh.final_state.n_regen_proposed) == int(
        r_plain.final_state.n_regen_proposed
    )
    np.testing.assert_array_equal(
        np.asarray(r_plain.final_state.vr_chol),
        np.asarray(r_mesh.final_state.vr_chol),
    )
