"""Delayed-acceptance surrogate mode (exact two-stage surrogate PT).

The anchored surrogate mode is approximate (the carried likelihood is fed
surrogate values between re-anchors); delayed-acceptance mode corrects every
surrogate segment with one true-likelihood Metropolis test, so the kernel
leaves the exact posterior invariant. These tests check the mechanical
invariants that distinguish the two modes and the statistical agreement with
the plain sampler.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ptnn import PTConfig, sample
from ptnn.data import load_regression


@pytest.fixture(scope="module")
def sunspot():
    p = load_regression("Sunspot")
    return p.train, p.test


def da_cfg(**kw):
    base = dict(
        task="regression",
        topology=(4, 10, 1),
        num_samples=8 * 600,
        num_chains=8,
        maxtemp=3.0,
        swap_interval=30,
        swap_offset=0,
        swap_payload="tempered_times_T",
        use_langevin_gradients=False,
        chunk_steps=100,
        use_surrogate=True,
        surrogate_mode="delayed_acceptance",
        surrogate_prob=0.5,
        surrogate_warmup_frac=0.2,
        surrogate_buffer=512,
        surrogate_proj=32,
    )
    base.update(kw)
    return PTConfig(**base).validate()


def _true_ll(res, train):
    """Untempered train log-likelihood at the final state, per chain."""
    from ptnn import kernel, make_dataset
    from ptnn.ops import likelihood

    cfg = res.config
    data = make_dataset(cfg, train, train)
    st = res.final_state
    from ptnn.models import fnn

    fwd = jax.vmap(lambda w: fnn.forward(w, data.x_train, cfg.topology)[:, 0])
    fx = fwd(jnp.asarray(st.w))
    tau = jnp.exp(jnp.asarray(st.eta))
    ev = jax.vmap(likelihood.regression_eval_from_fx, in_axes=(0, None, 0))(
        fx, data.y_train, tau
    )
    return np.asarray(ev.loglik)


@pytest.mark.slow
def test_da_carried_likelihood_is_exact(sunspot):
    """Invariant: after the run (final segment closed), every chain's carried
    log-likelihood equals the TRUE likelihood of its current weights — the
    property the anchored mode deliberately gives up."""
    res = sample(da_cfg(), *sunspot, seed=0)
    assert res.da_segments > 0, "no surrogate segments ever opened"
    assert not bool(res.final_state.da.active)
    ll_true = _true_ll(res, sunspot[0])
    np.testing.assert_allclose(
        np.asarray(res.final_state.ll), ll_true, rtol=1e-4, atol=1e-3
    )
    # segment corrections both accept and reject across the run
    acc = res.da_accept_per_chain
    assert acc is not None and np.all(acc <= 100.0)
    assert np.any(acc > 0.0), "every segment correction rejected"


@pytest.mark.slow
def test_da_skips_dataset_passes(sunspot):
    """Surrogate segments must actually occur: metric trace rows repeat more
    often than in the no-surrogate run (no true eval on segment steps)."""
    cfg = da_cfg()
    res = sample(cfg, *sunspot, seed=0)
    base = sample(
        dataclasses.replace(cfg, use_surrogate=False), *sunspot, seed=0
    )

    def rep_frac(r):
        m = r.traces["rmse_train"]
        return float(np.mean(np.all(m[1:] == m[:-1], axis=1)))

    assert rep_frac(res) > rep_frac(base) + 0.05, (rep_frac(res), rep_frac(base))
    # both reach sane cold-chain fits
    assert res.traces["rmse_test"][-1, 0] < 0.2
    assert base.traces["rmse_test"][-1, 0] < 0.2


@pytest.mark.slow
def test_da_posterior_matches_plain_sampler(sunspot):
    """Statistical gate: the DA sampler's post-burn-in cold-chain likelihood
    level must agree with the plain sampler's (it targets the same posterior
    exactly); the anchored mode is allowed to drift."""
    cfg = da_cfg(num_samples=8 * 800, surrogate_prob=0.4)
    means = {}
    for name, c in {
        "da": cfg,
        "plain": dataclasses.replace(cfg, use_surrogate=False),
    }.items():
        vals = []
        for seed in (0, 1):
            r = sample(c, *sunspot, seed=seed)
            burn = r.traces["ll"].shape[0] // 2
            # cold chain, true-eval rows only (segment rows carry surrogate
            # values); compare the final-quarter mean likelihood level
            tail = r.traces["rmse_test"][-200:, 0]
            vals.append(float(np.mean(tail)))
        means[name] = np.mean(vals)
    # same posterior -> same cold-chain predictive error level (loose gate:
    # both well-fit and within 40% of each other)
    assert means["da"] < 0.2 and means["plain"] < 0.2, means
    assert abs(means["da"] - means["plain"]) < 0.4 * means["plain"] + 0.02, means


@pytest.mark.slow
def test_da_checkpoint_resume_identical(sunspot, tmp_path):
    """Mid-segment checkpoints persist the DA state: a resumed run reproduces
    the uninterrupted run's traces exactly."""
    cfg = da_cfg(num_samples=8 * 300, chunk_steps=60)
    ck = str(tmp_path / "da.npz")
    full = sample(cfg, *sunspot, seed=3)
    r1 = sample(cfg, *sunspot, seed=3, checkpoint_path=ck, checkpoint_every=1)
    r2 = sample(cfg, *sunspot, seed=3, checkpoint_path=ck, checkpoint_every=1)
    for k in full.traces:
        np.testing.assert_allclose(
            full.traces[k], r1.traces[k], rtol=1e-6, atol=1e-7
        )
        np.testing.assert_allclose(
            full.traces[k], r2.traces[k], rtol=1e-6, atol=1e-7
        )


def test_surrogate_grad_predict_matches_autodiff():
    """The analytic surrogate gradient must equal jax.grad of predict."""
    from ptnn import surrogate

    zdim, n_proj, B = 11, 16, 256
    key = jax.random.PRNGKey(3)
    proj = surrogate.make_projection(key, zdim, n_proj)
    st = surrogate.init(B, zdim, n_proj)
    zs = jax.random.normal(jax.random.PRNGKey(4), (B, zdim), jnp.float32)
    lls = -jnp.sum(zs * zs, axis=1) + 0.3 * zs[:, 0]
    st = surrogate.push(st, zs, lls)
    st = surrogate.fit(st, proj, ridge=1e-4)
    assert bool(st.fitted)
    z = zs[:5]
    g_analytic = surrogate.grad_predict(st, proj, z)
    g_auto = jax.vmap(
        jax.grad(lambda zi: surrogate.predict(st, proj, zi[None, :])[0])
    )(z)
    np.testing.assert_allclose(
        np.asarray(g_analytic), np.asarray(g_auto), rtol=1e-4, atol=1e-4
    )


def test_per_chain_fit_matches_independent_global_fits():
    """Per-chain layout: the vmapped batched ridge solve must equal fitting
    each rung's buffer independently with the global-path code."""
    from ptnn import surrogate

    C, zdim, n_proj, B = 5, 7, 8, 128
    proj = surrogate.make_projection(jax.random.PRNGKey(0), zdim, n_proj)
    st = surrogate.init(B, zdim, n_proj, num_chains=C)
    key = jax.random.PRNGKey(1)
    # each rung sees a DIFFERENT quadratic target (hot rungs roam wider)
    zs = jax.random.normal(key, (B, C, zdim), jnp.float32) * (
        1.0 + jnp.arange(C, dtype=jnp.float32)[None, :, None]
    )
    coefs = jnp.arange(1, C + 1, dtype=jnp.float32)
    lls = -coefs[None, :] * jnp.sum(zs * zs, axis=-1) + 0.2 * zs[..., 0]
    for i in range(B):
        st = surrogate.push(st, zs[i], lls[i])
    assert int(st.count) == B and int(st.ptr) == 0  # wrapped exactly once
    st = surrogate.fit(st, proj, ridge=1e-4)
    assert bool(st.fitted)
    assert st.theta.shape[0] == C
    r2 = surrogate.r_squared(st, proj)
    assert r2.shape == (C,) and np.all(np.asarray(r2) > 0.95)
    for c_idx in range(C):
        ref = surrogate.init(B, zdim, n_proj)
        ref = surrogate.push(
            ref, np.asarray(st.buf_w[c_idx]), np.asarray(st.buf_ll[c_idx])
        )
        ref = surrogate.fit(ref, proj, ridge=1e-4)
        np.testing.assert_allclose(
            np.asarray(st.theta[c_idx]), np.asarray(ref.theta),
            rtol=2e-3, atol=2e-3,
        )
    # per-chain predict routes rung i's theta to row i
    z = zs[0]
    pred = surrogate.predict(st, proj, z)
    for c_idx in range(C):
        one = surrogate.features(z[c_idx : c_idx + 1], proj) @ st.theta[c_idx]
        np.testing.assert_allclose(
            np.asarray(pred[c_idx]), np.asarray(one[0]), rtol=1e-4, atol=1e-4
        )
    # analytic gradient matches autodiff through the per-chain predict
    g_analytic = surrogate.grad_predict(st, proj, z)
    g_auto = jax.vmap(
        lambda zi, th: jax.grad(
            lambda q: (surrogate.features(q[None, :], proj) @ th)[0]
        )(zi)
    )(z, st.theta)
    np.testing.assert_allclose(
        np.asarray(g_analytic), np.asarray(g_auto), rtol=1e-3, atol=1e-3
    )


def test_per_chain_push_masked_ring_semantics():
    """Masked pushes advance all rings in lockstep and are no-ops when
    invalid; rings wrap independently of the chain count."""
    from ptnn import surrogate

    C, zdim, n_proj, B = 3, 4, 2, 5
    st = surrogate.init(B, zdim, n_proj, num_chains=C)
    z0 = jnp.ones((C, zdim)) * jnp.arange(1, C + 1, dtype=jnp.float32)[:, None]
    st = surrogate.push_masked(st, z0, jnp.arange(C, dtype=jnp.float32),
                               jnp.ones((), jnp.bool_))
    assert int(st.count) == 1 and int(st.ptr) == 1
    st_no = surrogate.push_masked(st, z0 * 9, jnp.full((C,), 99.0),
                                  jnp.zeros((), jnp.bool_))
    assert int(st_no.count) == 1 and int(st_no.ptr) == 1
    np.testing.assert_array_equal(
        np.asarray(st_no.buf_w), np.asarray(st.buf_w)
    )
    for k in range(2, B + 3):  # push past capacity: wraps, count saturates
        st = surrogate.push(st, z0 + k, jnp.full((C,), float(k)))
    assert int(st.count) == B and int(st.ptr) == (B + 2) % B
    # the wrap overwrote the oldest rows; every ring saw the same schedule
    np.testing.assert_allclose(
        np.asarray(st.buf_ll[0]), np.asarray(st.buf_ll[1])
    )


def test_mlp_family_grad_matches_autodiff_and_beats_quadratic():
    """MLP surrogate family: analytic gradient equals jax.grad of predict,
    and Adam refits fit a deliberately non-quadratic target far better than
    the quadratic ridge family (the capability the family adds)."""
    from ptnn import surrogate

    zdim, hidden, B = 6, 24, 512
    key = jax.random.PRNGKey(7)
    zs = 2.0 * jax.random.normal(key, (B, zdim), jnp.float32)
    lls = jnp.sin(2.0 * zs[:, 0]) + jnp.tanh(zs[:, 1] * zs[:, 2]) - 0.1 * jnp.sum(
        zs * zs, axis=1
    )

    theta0 = surrogate.mlp_init_theta(jax.random.PRNGKey(8), zdim, hidden)
    st = surrogate.init(B, zdim, 8)._replace(theta=theta0)
    st = surrogate.push(st, zs, lls)
    st_mlp = surrogate.mlp_fit(st, hidden, 2000, 1e-2, min_r2=0.7)
    assert bool(st_mlp.fitted)

    proj = surrogate.make_projection(jax.random.PRNGKey(9), zdim, 8)
    st_quad = surrogate.fit(
        surrogate.push(surrogate.init(B, zdim, 8), zs, lls), proj, ridge=1e-4,
        min_r2=-10.0,
    )

    def mse(pred):
        return float(jnp.mean(jnp.square(pred - lls)))

    err_mlp = mse(surrogate.mlp_predict(st_mlp.theta, zs, hidden))
    err_quad = mse(surrogate.predict(st_quad, proj, zs))
    assert err_mlp < 0.5 * err_quad, (err_mlp, err_quad)

    z = zs[:4]
    g_analytic = surrogate.mlp_grad(st_mlp.theta, z, hidden)
    g_auto = jax.vmap(
        jax.grad(
            lambda zi: surrogate.mlp_predict(st_mlp.theta, zi[None, :], hidden)[0]
        )
    )(z)
    np.testing.assert_allclose(
        np.asarray(g_analytic), np.asarray(g_auto), rtol=1e-3, atol=1e-3
    )


def test_mlp_per_chain_fit_shapes_and_warm_start():
    """Per-chain MLP layout: vmapped fits produce per-rung thetas; a second
    refit warm-starts from the first (loss keeps dropping)."""
    from ptnn import surrogate

    C, zdim, hidden, B = 3, 4, 8, 256
    keys = jax.random.split(jax.random.PRNGKey(0), C)
    theta0 = jax.vmap(
        lambda k: surrogate.mlp_init_theta(k, zdim, hidden)
    )(keys)
    st = surrogate.init(B, zdim, 4, num_chains=C)._replace(theta=theta0)
    zs = jax.random.normal(jax.random.PRNGKey(1), (B, C, zdim), jnp.float32)
    lls = jnp.sin(zs[..., 0] * 3.0) - jnp.sum(zs * zs, axis=-1)
    for i in range(B):
        st = surrogate.push(st, zs[i], lls[i])
    st1 = surrogate.mlp_fit(st, hidden, 150, 1e-2, min_r2=-10.0)
    assert st1.theta.shape == (C, surrogate.mlp_dim(zdim, hidden))
    st2 = surrogate.mlp_fit(st1, hidden, 150, 1e-2, min_r2=-10.0)

    def err(s):
        pred = surrogate.mlp_predict(s.theta, zs[0], hidden)
        tot = 0.0
        for i in range(B):
            p = surrogate.mlp_predict(s.theta, zs[i], hidden)
            tot += float(jnp.mean(jnp.square(p - lls[i])))
        return tot / B

    assert err(st2) < err(st1), (err(st2), err(st1))


@pytest.mark.slow
def test_da_mlp_family_exact(sunspot):
    """DA mode with surrogate_family='mlp': segments open and the carried
    likelihood is exact at run end (family-independent exactness)."""
    cfg = da_cfg(
        surrogate_family="mlp",
        surrogate_hidden=16,
        surrogate_fit_steps=200,
        surrogate_inner="mala",
        num_samples=8 * 600,
    )
    res = sample(cfg, *sunspot, seed=0)
    assert res.da_segments > 0, "no surrogate segments ever opened"
    assert not bool(res.final_state.da.active)
    ll_true = _true_ll(res, sunspot[0])
    np.testing.assert_allclose(
        np.asarray(res.final_state.ll), ll_true, rtol=1e-4, atol=1e-3
    )
    assert np.isfinite(res.traces["ll"][1:]).all()


@pytest.mark.slow
def test_da_per_chain_scope_exact_and_resumes(sunspot, tmp_path):
    """DA mode with surrogate_scope='per_chain': the exactness invariant
    (carried ll == true ll at run end) holds, every rung's fit activates,
    and mid-run checkpoints resume bit-identically."""
    cfg = da_cfg(
        surrogate_scope="per_chain",
        surrogate_buffer=256,
        surrogate_inner="mala",
        num_samples=8 * 500,
    )
    res = sample(cfg, *sunspot, seed=0)
    assert res.da_segments > 0, "no surrogate segments ever opened"
    assert not bool(res.final_state.da.active)
    assert res.final_state.surr.theta.shape[0] == cfg.num_chains
    ll_true = _true_ll(res, sunspot[0])
    np.testing.assert_allclose(
        np.asarray(res.final_state.ll), ll_true, rtol=1e-4, atol=1e-3
    )
    ck = str(tmp_path / "dapc.npz")
    r1 = sample(cfg, *sunspot, seed=0, checkpoint_path=ck, checkpoint_every=1)
    r2 = sample(cfg, *sunspot, seed=0, checkpoint_path=ck, checkpoint_every=1)
    for k in res.traces:
        np.testing.assert_allclose(
            res.traces[k], r1.traces[k], rtol=1e-6, atol=1e-7
        )
        np.testing.assert_allclose(
            res.traces[k], r2.traces[k], rtol=1e-6, atol=1e-7
        )


@pytest.mark.slow
def test_da_mala_inner_moves(sunspot):
    """Surrogate-MALA inner moves: exactness invariant still holds, and the
    drifted inner proposals move further per segment than plain RW (higher
    or comparable segment throughput at the same step size)."""
    cfg = da_cfg(surrogate_inner="mala")
    res = sample(cfg, *sunspot, seed=0)
    assert res.da_segments > 0
    assert not bool(res.final_state.da.active)
    ll_true = _true_ll(res, sunspot[0])
    np.testing.assert_allclose(
        np.asarray(res.final_state.ll), ll_true, rtol=1e-4, atol=1e-3
    )
    assert np.isfinite(res.traces["ll"][1:]).all()
    assert res.traces["rmse_test"][-1, 0] < 0.2
    # MH with the MALA q-ratio must not blow up acceptance to 0/100
    acc = res.accept_ratio_per_chain
    assert np.all(acc > 1.0) and np.all(acc < 99.0), acc


@pytest.mark.slow
def test_da_classification_runs():
    """DA mode on the classification task (no eta, multinomial likelihood)."""
    from ptnn.data import load_classification

    p = load_classification("iris")
    cfg = PTConfig(
        task="classification",
        topology=(4, 6, 3),
        num_samples=8 * 400,
        num_chains=8,
        maxtemp=5.0,
        swap_interval=40,
        swap_offset=1,
        use_langevin_gradients=False,
        chunk_steps=100,
        use_surrogate=True,
        surrogate_mode="delayed_acceptance",
        surrogate_prob=0.5,
        surrogate_warmup_frac=0.2,
        surrogate_buffer=512,
        surrogate_proj=32,
    ).validate()
    res = sample(cfg, p.train, p.test, seed=0)
    assert res.da_segments > 0
    assert np.isfinite(res.traces["ll"][1:]).all()
    # cold chain learns something (Iris is easy; chance = 33%)
    assert res.traces["acc_train"][-1, 0] > 40.0
