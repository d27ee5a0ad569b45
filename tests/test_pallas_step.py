"""Fused RW block kernel (ops/pallas_step.py) vs an independent oracle.

The kernel consumes PREGENERATED noise/uniform arrays, so its output is a
deterministic function of its inputs: the oracle below replays the exact
step semantics with plain vmapped jnp ops on the (C, W) layout — a different
decomposition (fnn.forward per chain vs in-kernel plane FMAs), same math.
Agreement is checked on the CPU interpreter to float tolerance, with the
integer accept counters required to match EXACTLY (no knife-edge uniforms at
the chosen seed).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ptnn.models import fnn
from ptnn.ops import pallas_step as ps

TOPO = (4, 10, 1)
W = 4 * 10 + 10 + 10 + 1  # 61
LANES = ps.LANES


def _mk_data(rng, ntr=37, nte=23):
    x_tr = rng.normal(size=(ntr, 4)).astype(np.float32)
    y_tr = rng.normal(size=(ntr,)).astype(np.float32)
    x_te = rng.normal(size=(nte, 4)).astype(np.float32)
    y_te = rng.normal(size=(nte,)).astype(np.float32)
    return x_tr, y_tr, x_te, y_te


def _mk_state(rng, c_pad, p_pad, chains, raw, scal):
    """Initial state whose carried (ll, prior) are the REAL values at the
    initial (w, eta) — so the MH chain has a healthy accept/reject mix
    (a mis-anchored carry makes every proposal reject, which would leave the
    write-on-accept trace semantics untested)."""
    w = np.zeros((p_pad, c_pad), np.float32)
    w[:W, :chains] = rng.normal(size=(W, chains)).astype(np.float32)
    eta = np.zeros((1, c_pad), np.float32)
    eta[0, :chains] = rng.normal(size=(chains,)).astype(np.float32) * 0.3

    x_tr, y_tr, _xte, _yte = [jnp.asarray(a) for a in raw]
    ntr = x_tr.shape[0]
    i_dim, h_dim, _ = TOPO
    wc = jnp.asarray(w)[:W, :chains].T  # (C, W)
    fx = jax.vmap(lambda wi: fnn.forward(wi, x_tr, TOPO)[:, 0])(wc)
    sse = jnp.sum(jnp.square(y_tr[None] - fx), axis=-1)
    ec = jnp.asarray(eta)[0, :chains]
    tau = jnp.exp(ec)
    ll = -0.5 * ntr * (ps._LOG_2PI + ec) - 0.5 * sse / tau
    prior = (
        -0.5 * (i_dim * h_dim + h_dim + 2) * math.log(scal["sigma_sq"])
        - jnp.sum(jnp.square(wc), axis=-1) / (2.0 * scal["sigma_sq"])
        - (1.0 + scal["nu_1"]) * ec
        - scal["nu_2"] / tau
    )
    pad1 = lambda v, fill: jnp.concatenate(
        [v, jnp.full((c_pad - chains,), fill, jnp.float32)]
    ).reshape(1, c_pad)
    return dict(
        w=jnp.asarray(w),
        w_last=jnp.asarray(np.ones_like(w)),
        eta=jnp.asarray(eta),
        ll=pad1(ll, -50.0),
        prior=pad1(prior, -3.0),
        rmse_train=jnp.zeros((1, c_pad), jnp.float32),
        rmse_test=jnp.zeros((1, c_pad), jnp.float32),
        acc_train=jnp.zeros((1, c_pad), jnp.float32),
        acc_test=jnp.zeros((1, c_pad), jnp.float32),
        n_accept=jnp.zeros((1, c_pad), jnp.int32),
        log_step_w=jnp.full((1, c_pad), math.log(0.025), jnp.float32),
    )


def _oracle(state, noise_w, noise_eta, u_mh, start, length, raw, adapttemp,
            scal, chains):
    """Plain-JAX replay on (C, W) weights via the model-zoo forward."""
    x_tr, y_tr, x_te, y_te = [jnp.asarray(a) for a in raw]
    ntr, nte = x_tr.shape[0], x_te.shape[0]
    i_dim, h_dim, _ = TOPO
    prior_const = -0.5 * (i_dim * h_dim + h_dim + 2) * math.log(
        scal["sigma_sq"]
    )
    fwd = jax.vmap(lambda wi, x: fnn.forward(wi, x, TOPO)[:, 0], (0, None))

    w = jnp.asarray(state["w"])[:W, :chains].T  # (C, W)
    wl = jnp.asarray(state["w_last"])[:W, :chains].T
    eta = jnp.asarray(state["eta"])[0, :chains]
    ll = jnp.asarray(state["ll"])[0, :chains]
    pr = jnp.asarray(state["prior"])[0, :chains]
    rtr = jnp.asarray(state["rmse_train"])[0, :chains]
    rte = jnp.asarray(state["rmse_test"])[0, :chains]
    na = jnp.asarray(state["n_accept"])[0, :chains]
    lsw = jnp.asarray(state["log_step_w"])[0, :chains]
    at = jnp.asarray(adapttemp)[0, :chains]

    tr = {k: [] for k in ("ll", "rmse_train", "rmse_test", "accept_count")}
    for k in range(int(length)):
        step = jnp.exp(lsw) if scal["adapt"] else scal["step_w"]
        nw = jnp.asarray(noise_w)[k, :W, :chains].T  # (C, W)
        w_prop = w + (step[:, None] if scal["adapt"] else step) * nw
        eta_prop = eta + scal["step_eta"] * jnp.asarray(noise_eta)[k, :chains]
        tau = jnp.exp(eta_prop)
        pr_prop = (
            prior_const
            - jnp.sum(jnp.square(w_prop), axis=-1) / (2.0 * scal["sigma_sq"])
            - (1.0 + scal["nu_1"]) * eta_prop
            - scal["nu_2"] / tau
        )
        fx_tr = fwd(w_prop, x_tr)
        sse_tr = jnp.sum(jnp.square(y_tr[None] - fx_tr), axis=-1)
        fx_te = fwd(w_prop, x_te)
        sse_te = jnp.sum(jnp.square(y_te[None] - fx_te), axis=-1)
        ll_prop = -0.5 * ntr * (ps._LOG_2PI + eta_prop) - 0.5 * sse_tr / tau
        log_mh = (ll_prop - ll) / at + (pr_prop - pr)
        a = jnp.exp(jnp.minimum(log_mh, 0.0))
        acc = jnp.asarray(u_mh)[k, :chains] < a
        tr["ll"].append(ll_prop / at)
        rtr = jnp.where(acc, jnp.sqrt(sse_tr / ntr), rtr)
        rte = jnp.where(acc, jnp.sqrt(sse_te / nte), rte)
        tr["rmse_train"].append(rtr)
        tr["rmse_test"].append(rte)
        tr["accept_count"].append(na)
        w = jnp.where(acc[:, None], w_prop, w)
        wl = jnp.where(acc[:, None], w_prop, wl)
        eta = jnp.where(acc, eta_prop, eta)
        ll = jnp.where(acc, ll_prop, ll)
        pr = jnp.where(acc, pr_prop, pr)
        na = na + acc.astype(jnp.int32)
        if scal["adapt"]:
            upd = (start + k) < scal["burn_end"]
            lsw = jnp.clip(
                lsw
                + jnp.where(
                    upd,
                    scal["adapt_rate"] * (a - scal["adapt_target"]),
                    0.0,
                ),
                math.log(1e-5),
                math.log(10.0),
            )
    out = dict(w=w, w_last=wl, eta=eta, ll=ll, prior=pr, rmse_train=rtr,
               rmse_test=rte, n_accept=na, log_step_w=lsw)
    return out, {k: jnp.stack(v) for k, v in tr.items()}


TOPO_C = (4, 6, 3)
WC = 4 * 6 + 6 * 3 + 6 + 3  # 51


def _mk_data_cls(rng, ntr=29, nte=19):
    x_tr = rng.normal(size=(ntr, 4)).astype(np.float32)
    y_tr = rng.integers(0, 3, size=(ntr,)).astype(np.float32)
    x_te = rng.normal(size=(nte, 4)).astype(np.float32)
    y_te = rng.integers(0, 3, size=(nte,)).astype(np.float32)
    return x_tr, y_tr, x_te, y_te


def _cls_eval(wc, x, y):
    """(C, W) weights -> per-chain (ll, rmse, acc) via the model zoo."""
    out = jax.vmap(lambda wi: fnn.forward(wi, x, TOPO_C), (0,))(wc)  # (C,N,O)
    logp = jax.nn.log_softmax(out, axis=-1)
    yi = y.astype(jnp.int32)
    ll = jnp.sum(
        jnp.take_along_axis(logp, yi[None, :, None], axis=-1)[..., 0], axis=-1
    )
    pred = jnp.argmax(out, axis=-1).astype(jnp.float32)
    rmse = jnp.sqrt(jnp.mean(jnp.square(pred - y[None]), axis=-1))
    acc = 100.0 * jnp.mean((pred == y[None]).astype(jnp.float32), axis=-1)
    return ll, rmse, acc


def _mk_state_cls(rng, c_pad, p_pad, chains, raw, scal):
    w = np.zeros((p_pad, c_pad), np.float32)
    w[:WC, :chains] = rng.normal(size=(WC, chains)).astype(np.float32)
    x_tr, y_tr = jnp.asarray(raw[0]), jnp.asarray(raw[1])
    wc = jnp.asarray(w)[:WC, :chains].T
    ll, _r, _a = _cls_eval(wc, x_tr, y_tr)
    prior = (
        -0.5 * WC * math.log(scal["sigma_sq"])
        - jnp.sum(jnp.square(wc), axis=-1) / (2.0 * scal["sigma_sq"])
    )
    pad1 = lambda v, fill: jnp.concatenate(
        [v, jnp.full((c_pad - chains,), fill, jnp.float32)]
    ).reshape(1, c_pad)
    return dict(
        w=jnp.asarray(w),
        w_last=jnp.asarray(np.ones_like(w)),
        eta=jnp.zeros((1, c_pad), jnp.float32),
        ll=pad1(ll, -50.0),
        prior=pad1(prior, -3.0),
        rmse_train=jnp.zeros((1, c_pad), jnp.float32),
        rmse_test=jnp.zeros((1, c_pad), jnp.float32),
        acc_train=jnp.zeros((1, c_pad), jnp.float32),
        acc_test=jnp.zeros((1, c_pad), jnp.float32),
        n_accept=jnp.zeros((1, c_pad), jnp.int32),
        log_step_w=jnp.full((1, c_pad), math.log(0.05), jnp.float32),
    )


def _oracle_cls(state, noise_w, u_mh, start, length, raw, adapttemp, scal,
                chains):
    """Plain-JAX replay of the classification RW step
    (pt_classification.py:313-448 semantics; w-only proposal, untempered
    trace ll, argmax metrics)."""
    x_tr, y_tr, x_te, y_te = [jnp.asarray(a) for a in raw]
    w = jnp.asarray(state["w"])[:WC, :chains].T
    wl = jnp.asarray(state["w_last"])[:WC, :chains].T
    ll = jnp.asarray(state["ll"])[0, :chains]
    pr = jnp.asarray(state["prior"])[0, :chains]
    rtr = jnp.asarray(state["rmse_train"])[0, :chains]
    rte = jnp.asarray(state["rmse_test"])[0, :chains]
    atr = jnp.asarray(state["acc_train"])[0, :chains]
    ate = jnp.asarray(state["acc_test"])[0, :chains]
    na = jnp.asarray(state["n_accept"])[0, :chains]
    lsw = jnp.asarray(state["log_step_w"])[0, :chains]
    at = jnp.asarray(adapttemp)[0, :chains]

    keys = ("ll", "rmse_train", "rmse_test", "acc_train", "acc_test",
            "accept_count")
    tr = {k: [] for k in keys}
    for k in range(int(length)):
        step = jnp.exp(lsw) if scal["adapt"] else scal["step_w"]
        nw = jnp.asarray(noise_w)[k, :WC, :chains].T
        w_prop = w + (step[:, None] if scal["adapt"] else step) * nw
        pr_prop = (
            -0.5 * WC * math.log(scal["sigma_sq"])
            - jnp.sum(jnp.square(w_prop), axis=-1) / (2.0 * scal["sigma_sq"])
        )
        ll_prop, rtr_p, atr_p = _cls_eval(w_prop, x_tr, y_tr)
        _llte, rte_p, ate_p = _cls_eval(w_prop, x_te, y_te)
        log_mh = (ll_prop - ll) / at + (pr_prop - pr)
        a = jnp.exp(jnp.minimum(log_mh, 0.0))
        acc = jnp.asarray(u_mh)[k, :chains] < a
        tr["ll"].append(ll_prop)  # UNTEMPERED (pt_classification.py:404)
        rtr = jnp.where(acc, rtr_p, rtr)
        rte = jnp.where(acc, rte_p, rte)
        atr = jnp.where(acc, atr_p, atr)
        ate = jnp.where(acc, ate_p, ate)
        tr["rmse_train"].append(rtr)
        tr["rmse_test"].append(rte)
        tr["acc_train"].append(atr)
        tr["acc_test"].append(ate)
        tr["accept_count"].append(na)
        w = jnp.where(acc[:, None], w_prop, w)
        wl = jnp.where(acc[:, None], w_prop, wl)
        ll = jnp.where(acc, ll_prop, ll)
        pr = jnp.where(acc, pr_prop, pr)
        na = na + acc.astype(jnp.int32)
        if scal["adapt"]:
            upd = (start + k) < scal["burn_end"]
            lsw = jnp.clip(
                lsw
                + jnp.where(
                    upd, scal["adapt_rate"] * (a - scal["adapt_target"]), 0.0
                ),
                math.log(1e-5),
                math.log(10.0),
            )
    out = dict(w=w, w_last=wl, ll=ll, prior=pr, rmse_train=rtr,
               rmse_test=rte, acc_train=atr, acc_test=ate, n_accept=na,
               log_step_w=lsw)
    return out, {k: jnp.stack(v) for k, v in tr.items()}


def _scal(adapt=False):
    return dict(
        step_w=0.025, step_eta=0.2, sigma_sq=25.0, nu_1=0.0, nu_2=0.0,
        adapt=adapt, adapt_rate=0.1, adapt_target=0.234, burn_end=37,
    )


@pytest.mark.parametrize("adapt", [False, True])
def test_fused_rw_block_matches_oracle(rng, adapt):
    chains, k_max, length, start = 6, 12, 9, 30
    p_pad, c_pad = 64, LANES
    raw = _mk_data(rng)
    data = ps.prep_data(*[jnp.asarray(a) for a in raw])
    scal = _scal(adapt)
    state = _mk_state(rng, c_pad, p_pad, chains, raw, scal)
    noise_w = np.zeros((k_max, p_pad, c_pad), np.float32)
    noise_w[:, :W, :chains] = rng.normal(size=(k_max, W, chains))
    noise_eta = np.zeros((k_max, c_pad), np.float32)
    noise_eta[:, :chains] = rng.normal(size=(k_max, chains))
    u = np.ones((k_max, c_pad), np.float32)
    u[:, :chains] = rng.uniform(size=(k_max, chains))
    adapttemp = np.ones((1, c_pad), np.float32)
    adapttemp[0, :chains] = np.geomspace(1.0, 4.0, chains)

    new_state, traces = ps.fused_rw_block_impl(
        state, jnp.asarray(noise_w), jnp.asarray(noise_eta), jnp.asarray(u),
        start, length, data, jnp.asarray(adapttemp), TOPO, scal,
        record_w=True, interpret=True,
    )
    ora_state, ora_tr = _oracle(
        state, noise_w, noise_eta, u, start, length, raw, adapttemp, scal,
        chains,
    )

    # the run must exercise both branches of the write-on-accept carries
    na = np.asarray(new_state["n_accept"])[0, :chains]
    assert na.sum() > 0 and na.sum() < length * chains, na

    # integer decisions must agree exactly
    np.testing.assert_array_equal(
        np.asarray(new_state["n_accept"])[0, :chains],
        np.asarray(ora_state["n_accept"]),
    )
    np.testing.assert_array_equal(
        np.asarray(traces["accept_count"])[:length, :chains],
        np.asarray(ora_tr["accept_count"]),
    )
    for k in ("eta", "ll", "prior", "rmse_train", "rmse_test", "log_step_w"):
        np.testing.assert_allclose(
            np.asarray(new_state[k])[0, :chains],
            np.asarray(ora_state[k]),
            rtol=2e-4, atol=2e-5, err_msg=k,
        )
    np.testing.assert_allclose(
        np.asarray(new_state["w"])[:W, :chains].T,
        np.asarray(ora_state["w"]), rtol=2e-4, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(new_state["w_last"])[:W, :chains].T,
        np.asarray(ora_state["w_last"]), rtol=2e-4, atol=2e-5,
    )
    for k in ("ll", "rmse_train", "rmse_test"):
        np.testing.assert_allclose(
            np.asarray(traces[k])[:length, :chains],
            np.asarray(ora_tr[k]), rtol=2e-4, atol=2e-5, err_msg=k,
        )
    # w trace rows are write-on-accept carries of w_last
    np.testing.assert_allclose(
        np.asarray(traces["w"])[length - 1, :W, :chains].T,
        np.asarray(ora_state["w_last"]), rtol=2e-4, atol=2e-5,
    )
    # padded weight rows never move (noise masked, init zero)
    assert np.all(np.asarray(new_state["w"])[W:, :] == 0.0)


@pytest.mark.parametrize("adapt", [False, True])
def test_fused_cls_block_matches_oracle(rng, adapt):
    chains, k_max, length, start = 5, 10, 8, 20
    p_pad, c_pad = 56, LANES  # pad8(WC=51)
    raw = _mk_data_cls(rng)
    data = ps.prep_data(*[jnp.asarray(a) for a in raw], n_classes=3)
    scal = dict(_scal(adapt), step_w=0.05, task_cls=True)
    state = _mk_state_cls(rng, c_pad, p_pad, chains, raw, scal)
    noise_w = np.zeros((k_max, p_pad, c_pad), np.float32)
    noise_w[:, :WC, :chains] = rng.normal(size=(k_max, WC, chains))
    noise_eta = np.zeros((k_max, c_pad), np.float32)  # unused (w-only)
    u = np.ones((k_max, c_pad), np.float32)
    u[:, :chains] = rng.uniform(size=(k_max, chains))
    adapttemp = np.ones((1, c_pad), np.float32)
    adapttemp[0, :chains] = np.geomspace(1.0, 4.0, chains)

    new_state, traces = ps.fused_rw_block_impl(
        state, jnp.asarray(noise_w), jnp.asarray(noise_eta), jnp.asarray(u),
        start, length, data, jnp.asarray(adapttemp), TOPO_C, scal,
        record_w=True, interpret=True,
    )
    ora_state, ora_tr = _oracle_cls(
        state, noise_w, u, start, length, raw, adapttemp, scal, chains
    )

    na = np.asarray(new_state["n_accept"])[0, :chains]
    assert na.sum() > 0 and na.sum() < length * chains, na

    np.testing.assert_array_equal(na, np.asarray(ora_state["n_accept"]))
    np.testing.assert_array_equal(
        np.asarray(traces["accept_count"])[:length, :chains],
        np.asarray(ora_tr["accept_count"]),
    )
    # eta is untouched junk for classification (w-only proposal)
    np.testing.assert_array_equal(
        np.asarray(new_state["eta"]), np.asarray(state["eta"])
    )
    for k in ("ll", "prior", "rmse_train", "rmse_test", "acc_train",
              "acc_test", "log_step_w"):
        np.testing.assert_allclose(
            np.asarray(new_state[k])[0, :chains],
            np.asarray(ora_state[k]),
            rtol=2e-4, atol=2e-5, err_msg=k,
        )
    np.testing.assert_allclose(
        np.asarray(new_state["w"])[:WC, :chains].T,
        np.asarray(ora_state["w"]), rtol=2e-4, atol=2e-5,
    )
    for k in ("ll", "rmse_train", "rmse_test", "acc_train", "acc_test"):
        np.testing.assert_allclose(
            np.asarray(traces[k])[:length, :chains],
            np.asarray(ora_tr[k]), rtol=2e-4, atol=2e-5, err_msg=k,
        )
    assert np.all(np.asarray(new_state["w"])[WC:, :] == 0.0)


def _mala_scal():
    return dict(
        sigma_sq=25.0, nu_1=0.0, nu_2=0.0, adapt_rate=0.1,
        mala_target=0.574, warmstart_step=0.05, precond_power=1.0,
        pc_start=10, warm_end=6, burn_end=20,
    )


def _vg_reg():
    def f(wi, x, y):
        fx = fnn.forward(wi, x, TOPO)[:, 0]
        return -0.5 * jnp.sum(jnp.square(y - fx)), fx

    return jax.vmap(jax.value_and_grad(f, has_aux=True), (0, None, None))


def _mk_state_mala(rng, c_pad, p_pad, chains, raw, scal):
    base = _mk_state(rng, c_pad, p_pad, chains, raw, dict(scal, step_eta=0.2))
    x_tr, y_tr = jnp.asarray(raw[0]), jnp.asarray(raw[1])
    wc = jnp.asarray(base["w"])[:W, :chains].T
    (_v, _fx), g = _vg_reg()(wc, x_tr, y_tr)
    gl = np.zeros((p_pad, c_pad), np.float32)
    gl[:W, :chains] = np.asarray(g).T
    base.update(
        log_step_w=jnp.full((1, c_pad), math.log(0.05), jnp.float32),
        log_step_eta=jnp.full((1, c_pad), math.log(0.2), jnp.float32),
        g_like=jnp.asarray(gl),
        pc_mean=jnp.zeros((p_pad, c_pad), jnp.float32),
        pc_m2=jnp.zeros((p_pad, c_pad), jnp.float32),
    )
    del base["acc_train"], base["acc_test"]
    return base


def _oracle_mala(state, noise_w, noise_eta, u_mh, u_eta, start, length, raw,
                 adapttemp, scal, chains):
    """Plain-JAX replay of kernel.step_precond (precond_mala, regression):
    MALA w-block with autodiff gradients + exact reverse q-ratio, forced-
    accept warm start, dataset-free eta block, Welford + Robbins-Monro."""
    x_tr, y_tr, x_te, y_te = [jnp.asarray(a) for a in raw]
    ntr, nte = x_tr.shape[0], x_te.shape[0]
    i_dim, h_dim, _ = TOPO
    ssq_const = -0.5 * (i_dim * h_dim + h_dim + 2) * math.log(
        scal["sigma_sq"]
    )
    vg = _vg_reg()
    fwd = jax.vmap(lambda wi, x: fnn.forward(wi, x, TOPO)[:, 0], (0, None))

    w = jnp.asarray(state["w"])[:W, :chains].T
    wl = jnp.asarray(state["w_last"])[:W, :chains].T
    eta = jnp.asarray(state["eta"])[0, :chains]
    ll = jnp.asarray(state["ll"])[0, :chains]
    pr = jnp.asarray(state["prior"])[0, :chains]
    rtr = jnp.asarray(state["rmse_train"])[0, :chains]
    rte = jnp.asarray(state["rmse_test"])[0, :chains]
    na = jnp.asarray(state["n_accept"])[0, :chains]
    lsw = jnp.asarray(state["log_step_w"])[0, :chains]
    lse = jnp.asarray(state["log_step_eta"])[0, :chains]
    gl = jnp.asarray(state["g_like"])[:W, :chains].T
    pm = jnp.asarray(state["pc_mean"])[:W, :chains].T
    p2 = jnp.asarray(state["pc_m2"])[:W, :chains].T
    at = jnp.asarray(adapttemp)[0, :chains]

    sq = scal["sigma_sq"]
    tr = {k: [] for k in ("ll", "rmse_train", "rmse_test", "accept_count")}
    for k in range(int(length)):
        i = start + k
        sig = jnp.exp(lsw)
        cnt = float(max(min(i, scal["burn_end"]) - scal["warm_end"], 1))
        var = p2 / cnt
        m = jnp.clip(
            var / jnp.maximum(jnp.mean(var, axis=1, keepdims=True), 1e-30),
            1e-4, 1e4,
        )
        m = jnp.where(i >= scal["pc_start"], m, jnp.ones_like(m))
        tau = jnp.exp(eta)
        g_cur = gl / (tau * at)[:, None] - w / sq
        sig2m = (sig * sig)[:, None] * m
        mean_fwd = w + 0.5 * sig2m * g_cur
        nw = jnp.asarray(noise_w)[k, :W, :chains].T
        w_prop = mean_fwd + sig[:, None] * jnp.sqrt(m) * nw
        g_rms = jnp.sqrt(jnp.mean(jnp.square(g_cur), axis=-1, keepdims=True))
        w_warm = w + scal["warmstart_step"] * g_cur / jnp.maximum(
            g_rms, 1e-12
        )
        w_prop = jnp.where(i < scal["warm_end"], w_warm, w_prop)
        pr_prop = (
            ssq_const
            - jnp.sum(jnp.square(w_prop), axis=-1) / (2.0 * sq)
            - (1.0 + scal["nu_1"]) * eta
            - scal["nu_2"] / tau
        )
        (val, _fx), gl_prop = vg(w_prop, x_tr, y_tr)
        ll_prop = -0.5 * ntr * (ps._LOG_2PI + eta) + val / tau
        rtr_p = jnp.sqrt(-2.0 * val / ntr)
        fx_te = fwd(w_prop, x_te)
        rte_p = jnp.sqrt(jnp.mean(jnp.square(y_te[None] - fx_te), axis=-1))
        g_prop = gl_prop / (tau * at)[:, None] - w_prop / sq
        mean_rev = w_prop + 0.5 * sig2m * g_prop
        diff = (
            jnp.sum(jnp.square(w_prop - mean_fwd) / m, axis=-1)
            - jnp.sum(jnp.square(w - mean_rev) / m, axis=-1)
        ) / (2.0 * sig * sig)
        log_mh = (ll_prop - ll) / at + (pr_prop - pr) + diff
        acc = jnp.logical_or(
            jnp.asarray(u_mh)[k, :chains] < jnp.exp(jnp.minimum(log_mh, 0.0)),
            i < scal["warm_end"],
        )
        tr["ll"].append(ll_prop / at)
        rtr = jnp.where(acc, rtr_p, rtr)
        rte = jnp.where(acc, rte_p, rte)
        tr["rmse_train"].append(rtr)
        tr["rmse_test"].append(rte)
        tr["accept_count"].append(na)
        w = jnp.where(acc[:, None], w_prop, w)
        wl = jnp.where(acc[:, None], w_prop, wl)
        ll = jnp.where(acc, ll_prop, ll)
        pr = jnp.where(acc, pr_prop, pr)
        gl = jnp.where(acc[:, None], gl_prop, gl)
        na = na + acc.astype(jnp.int32)
        # eta block
        sig_e = jnp.exp(lse)
        eta_prop = eta + sig_e * jnp.asarray(noise_eta)[k, :chains]
        val_cur = (ll + 0.5 * ntr * (ps._LOG_2PI + eta)) * jnp.exp(eta)
        ll_eta = -0.5 * ntr * (ps._LOG_2PI + eta_prop) + val_cur * jnp.exp(
            -eta_prop
        )
        dprior = -(1.0 + scal["nu_1"]) * (eta_prop - eta) - scal["nu_2"] * (
            jnp.exp(-eta_prop) - jnp.exp(-eta)
        )
        log_mh_e = (ll_eta - ll) / at + dprior
        mh_e = jnp.exp(jnp.minimum(log_mh_e, 0.0))
        acc_e = jnp.asarray(u_eta)[k, :chains] < mh_e
        eta = jnp.where(acc_e, eta_prop, eta)
        ll = jnp.where(acc_e, ll_eta, ll)
        pr = pr + jnp.where(acc_e, dprior, 0.0)
        lse = jnp.clip(
            lse
            + jnp.where(
                i < scal["burn_end"],
                scal["adapt_rate"] * (mh_e - ps.ETA_TARGET_ACCEPT),
                0.0,
            ),
            math.log(1e-4),
            math.log(10.0),
        )
        # Welford + RM
        updf = 1.0 if scal["warm_end"] <= i < scal["burn_end"] else 0.0
        cnt_new = float(
            max(min(i + 1, scal["burn_end"]) - scal["warm_end"], 1)
        )
        delta = w - pm
        pm = pm + updf * delta / cnt_new
        p2 = p2 + updf * delta * (w - pm)
        mh_p = jnp.exp(jnp.minimum(log_mh, 0.0))
        lsw = jnp.clip(
            lsw
            + (
                scal["adapt_rate"] * (mh_p - scal["mala_target"])
                if updf > 0.0
                else jnp.zeros_like(lsw)
            ),
            math.log(1e-6),
            math.log(10.0),
        )
    out = dict(w=w, w_last=wl, eta=eta, ll=ll, prior=pr, rmse_train=rtr,
               rmse_test=rte, n_accept=na, log_step_w=lsw, log_step_eta=lse,
               g_like=gl, pc_mean=pm, pc_m2=p2)
    return out, {k: jnp.stack(v) for k, v in tr.items()}


def test_fused_mala_block_matches_oracle(rng):
    chains, k_max, length, start = 6, 24, 24, 0
    p_pad, c_pad = 64, LANES
    raw = _mk_data(rng)
    data = ps.prep_data(*[jnp.asarray(a) for a in raw])
    scal = _mala_scal()  # warm 0-5, precond from 10, adapt until 20: the
    # single block crosses every phase boundary
    state = _mk_state_mala(rng, c_pad, p_pad, chains, raw, scal)
    noise_w = np.zeros((k_max, p_pad, c_pad), np.float32)
    noise_w[:, :W, :chains] = rng.normal(size=(k_max, W, chains))
    noise_eta = np.zeros((k_max, c_pad), np.float32)
    noise_eta[:, :chains] = rng.normal(size=(k_max, chains))
    u = np.ones((k_max, c_pad), np.float32)
    u[:, :chains] = rng.uniform(size=(k_max, chains))
    ue = np.ones((k_max, c_pad), np.float32)
    ue[:, :chains] = rng.uniform(size=(k_max, chains))
    adapttemp = np.ones((1, c_pad), np.float32)
    adapttemp[0, :chains] = np.geomspace(1.0, 4.0, chains)

    new_state, traces = ps.fused_mala_block_impl(
        state, jnp.asarray(noise_w), jnp.asarray(noise_eta), jnp.asarray(u),
        jnp.asarray(ue), start, length, data, jnp.asarray(adapttemp), TOPO,
        scal, record_w=True, interpret=True,
    )
    ora_state, ora_tr = _oracle_mala(
        state, noise_w, noise_eta, u, ue, start, length, raw, adapttemp,
        scal, chains,
    )

    na = np.asarray(new_state["n_accept"])[0, :chains]
    # forced warm accepts happened; post-warm steps rejected at least once
    assert na.sum() >= scal["warm_end"] * chains
    assert na.sum() < length * chains, na

    np.testing.assert_array_equal(na, np.asarray(ora_state["n_accept"]))
    np.testing.assert_array_equal(
        np.asarray(traces["accept_count"])[:length, :chains],
        np.asarray(ora_tr["accept_count"]),
    )
    for k in ("eta", "ll", "prior", "rmse_train", "rmse_test", "log_step_w",
              "log_step_eta"):
        np.testing.assert_allclose(
            np.asarray(new_state[k])[0, :chains],
            np.asarray(ora_state[k]),
            rtol=5e-4, atol=5e-5, err_msg=k,
        )
    for k in ("w", "w_last", "g_like", "pc_mean", "pc_m2"):
        np.testing.assert_allclose(
            np.asarray(new_state[k])[:W, :chains].T,
            np.asarray(ora_state[k]), rtol=5e-4, atol=5e-5, err_msg=k,
        )
    for k in ("ll", "rmse_train", "rmse_test"):
        np.testing.assert_allclose(
            np.asarray(traces[k])[:length, :chains],
            np.asarray(ora_tr[k]), rtol=5e-4, atol=5e-5, err_msg=k,
        )
    # padded rows never move
    assert np.all(np.asarray(new_state["w"])[W:, :] == 0.0)
    assert np.all(np.asarray(new_state["g_like"])[W:, :] == 0.0)


def test_fused_rw_block_zero_length_is_noop(rng):
    chains, k_max = 4, 8
    p_pad, c_pad = 64, LANES
    raw = _mk_data(rng)
    data = ps.prep_data(*[jnp.asarray(a) for a in raw])
    state = _mk_state(rng, c_pad, p_pad, chains, raw, _scal())
    z = jnp.zeros((k_max, p_pad, c_pad), jnp.float32)
    ze = jnp.zeros((k_max, c_pad), jnp.float32)
    new_state, _tr = ps.fused_rw_block_impl(
        state, z, ze, ze, 0, 0, data, jnp.ones((1, c_pad), jnp.float32),
        TOPO, _scal(), record_w=False, interpret=True,
    )
    for k, v in state.items():
        np.testing.assert_array_equal(np.asarray(new_state[k]), np.asarray(v))


# ---------------------------------------------------------------------------
# Fused preconditioned-HMC block (with in-kernel ChEES) vs oracle.


def _hmc_scal():
    return dict(
        sigma_sq=25.0, nu_1=0.0, nu_2=0.0, adapt_rate=0.1,
        hmc_target=0.75, warmstart_step=0.05, precond_power=1.0,
        pc_start=10, warm_end=6, burn_end=20, leapfrog=4, eps_jitter=0.2,
        chees=True, chees_rate=0.025, n_ladders=2,
    )


def _mk_state_hmc(rng, c_pad, p_pad, chains, raw, scal):
    base = _mk_state_mala(rng, c_pad, p_pad, chains, raw, scal)
    pad1 = lambda v: jnp.pad(
        jnp.asarray(v, jnp.float32), (0, c_pad - chains)
    ).reshape(1, c_pad)
    base.update(
        log_traj=pad1(np.full((chains,), math.log(0.1), np.float32)),
        chees_m1=pad1(np.zeros((chains,), np.float32)),
        chees_v2=pad1(np.zeros((chains,), np.float32)),
    )
    return base


def _oracle_hmc(state, noise_w, noise_eta, u_mh, u_eta, u_jit, u_traj,
                start, length, raw, adapttemp, scal, chains):
    """Plain-JAX replay of the fused HMC block semantics (leapfrog on the
    tempered Hamiltonian, kinetic-energy MH correction, forced-accept warm
    start with a fresh endpoint eval, dataset-free eta block, in-kernel
    ChEES rung-sum adaptation, Welford + Robbins-Monro)."""
    x_tr, y_tr, x_te, y_te = [jnp.asarray(a) for a in raw]
    ntr, nte = x_tr.shape[0], x_te.shape[0]
    i_dim, h_dim, _ = TOPO
    ssq_const = -0.5 * (i_dim * h_dim + h_dim + 2) * math.log(
        scal["sigma_sq"]
    )
    vg = _vg_reg()
    fwd = jax.vmap(lambda wi, x: fnn.forward(wi, x, TOPO)[:, 0], (0, None))
    n_lad = scal["n_ladders"]
    k_rung = chains // n_lad
    L = scal["leapfrog"]

    w = jnp.asarray(state["w"])[:W, :chains].T
    wl = jnp.asarray(state["w_last"])[:W, :chains].T
    eta = jnp.asarray(state["eta"])[0, :chains]
    ll = jnp.asarray(state["ll"])[0, :chains]
    pr = jnp.asarray(state["prior"])[0, :chains]
    rtr = jnp.asarray(state["rmse_train"])[0, :chains]
    rte = jnp.asarray(state["rmse_test"])[0, :chains]
    na = jnp.asarray(state["n_accept"])[0, :chains]
    lsw = jnp.asarray(state["log_step_w"])[0, :chains]
    lse = jnp.asarray(state["log_step_eta"])[0, :chains]
    gl = jnp.asarray(state["g_like"])[:W, :chains].T
    pm = jnp.asarray(state["pc_mean"])[:W, :chains].T
    p2 = jnp.asarray(state["pc_m2"])[:W, :chains].T
    lt = jnp.asarray(state["log_traj"])[0, :chains]
    m1 = jnp.asarray(state["chees_m1"])[0, :chains]
    v2 = jnp.asarray(state["chees_v2"])[0, :chains]
    at = jnp.asarray(adapttemp)[0, :chains]

    sq = scal["sigma_sq"]
    tr = {k: [] for k in ("ll", "rmse_train", "rmse_test", "accept_count",
                          "traj_len")}

    def rung_mean(x):
        xr = x.reshape(n_lad, k_rung, -1)
        mu = jnp.mean(xr, axis=0, keepdims=True)
        return jnp.broadcast_to(mu, xr.shape).reshape(chains, -1)

    for k in range(int(length)):
        i = start + k
        sig = jnp.exp(lsw)
        cnt = float(max(min(i, scal["burn_end"]) - scal["warm_end"], 1))
        var = p2 / cnt
        m = jnp.clip(
            var / jnp.maximum(jnp.mean(var, axis=1, keepdims=True), 1e-30),
            1e-4, 1e4,
        )
        m = jnp.where(i >= scal["pc_start"], m, jnp.ones_like(m))
        tau = jnp.exp(eta)
        g_cur = gl / (tau * at)[:, None] - w / sq
        eps = sig * (
            1.0
            + scal["eps_jitter"]
            * (2.0 * jnp.asarray(u_jit)[k, :chains] - 1.0)
        )
        if scal["chees"]:
            u_t = jnp.asarray(u_traj)[k, :chains]
            tau_traj = jnp.exp(lt) * u_t
            l_steps = jnp.clip(jnp.ceil(tau_traj / eps), 1.0, float(L))
        else:
            l_steps = jnp.full((chains,), float(L))
        epsw = eps[:, None]
        p0 = jnp.asarray(noise_w)[k, :W, :chains].T / jnp.sqrt(m)
        k_init = 0.5 * jnp.sum(m * jnp.square(p0), axis=-1)
        w_c, p_c, g_c = w, p0, g_cur
        for n in range(L):
            p_half = p_c + 0.5 * epsw * g_c
            w_n = w_c + epsw * m * p_half
            (_v, _fx), gl_n = vg(w_n, x_tr, y_tr)
            g_n = gl_n / (tau * at)[:, None] - w_n / sq
            p_n = p_half + 0.5 * epsw * g_n
            upd = (float(n) < l_steps)[:, None]
            w_c = jnp.where(upd, w_n, w_c)
            p_c = jnp.where(upd, p_n, p_c)
            g_c = jnp.where(upd, g_n, g_c)
        k_end = 0.5 * jnp.sum(m * jnp.square(p_c), axis=-1)
        g_rms = jnp.sqrt(jnp.mean(jnp.square(g_cur), axis=-1, keepdims=True))
        w_warm = w + scal["warmstart_step"] * g_cur / jnp.maximum(
            g_rms, 1e-12
        )
        w_prop = jnp.where(i < scal["warm_end"], w_warm, w_c)
        pr_prop = (
            ssq_const
            - jnp.sum(jnp.square(w_prop), axis=-1) / (2.0 * sq)
            - (1.0 + scal["nu_1"]) * eta
            - scal["nu_2"] / tau
        )
        (val, _fx), gl_prop = vg(w_prop, x_tr, y_tr)
        ll_prop = -0.5 * ntr * (ps._LOG_2PI + eta) + val / tau
        rtr_p = jnp.sqrt(-2.0 * val / ntr)
        fx_te = fwd(w_prop, x_te)
        rte_p = jnp.sqrt(jnp.mean(jnp.square(y_te[None] - fx_te), axis=-1))
        diff = k_init - k_end
        log_mh = (ll_prop - ll) / at + (pr_prop - pr) + diff
        a = jnp.exp(jnp.minimum(log_mh, 0.0))
        acc = jnp.logical_or(
            jnp.asarray(u_mh)[k, :chains] < a, i < scal["warm_end"]
        )
        tr["ll"].append(ll_prop / at)
        rtr = jnp.where(acc, rtr_p, rtr)
        rte = jnp.where(acc, rte_p, rte)
        tr["rmse_train"].append(rtr)
        tr["rmse_test"].append(rte)
        tr["accept_count"].append(na)
        tr["traj_len"].append(l_steps)
        w_old = w
        w = jnp.where(acc[:, None], w_prop, w)
        wl = jnp.where(acc[:, None], w_prop, wl)
        ll = jnp.where(acc, ll_prop, ll)
        pr = jnp.where(acc, pr_prop, pr)
        gl = jnp.where(acc[:, None], gl_prop, gl)
        na = na + acc.astype(jnp.int32)
        # eta block
        sig_e = jnp.exp(lse)
        eta_prop = eta + sig_e * jnp.asarray(noise_eta)[k, :chains]
        val_cur = (ll + 0.5 * ntr * (ps._LOG_2PI + eta)) * jnp.exp(eta)
        ll_eta = -0.5 * ntr * (ps._LOG_2PI + eta_prop) + val_cur * jnp.exp(
            -eta_prop
        )
        dprior = -(1.0 + scal["nu_1"]) * (eta_prop - eta) - scal["nu_2"] * (
            jnp.exp(-eta_prop) - jnp.exp(-eta)
        )
        log_mh_e = (ll_eta - ll) / at + dprior
        mh_e = jnp.exp(jnp.minimum(log_mh_e, 0.0))
        acc_e = jnp.asarray(u_eta)[k, :chains] < mh_e
        eta = jnp.where(acc_e, eta_prop, eta)
        ll = jnp.where(acc_e, ll_eta, ll)
        pr = pr + jnp.where(acc_e, dprior, 0.0)
        lse = jnp.clip(
            lse
            + jnp.where(
                i < scal["burn_end"],
                scal["adapt_rate"] * (mh_e - ps.ETA_TARGET_ACCEPT),
                0.0,
            ),
            math.log(1e-4),
            math.log(10.0),
        )
        # ChEES adaptation (rung sums over ladder replicas)
        if scal["chees"]:
            dxp = w_prop - rung_mean(w_prop)
            dx = w_old - rung_mean(w_old)
            dsq = jnp.sum(m * jnp.square(dxp), -1) - jnp.sum(
                m * jnp.square(dx), -1
            )
            inner = jnp.sum(dxp * p_c, -1)
            g_ch = a * dsq * inner * u_t
            wsum = jnp.maximum(a.reshape(n_lad, k_rung).sum(0), 1e-6)
            g_rung = jnp.broadcast_to(
                (g_ch.reshape(n_lad, k_rung).sum(0) / wsum)[None, :],
                (n_lad, k_rung),
            ).reshape(chains)
            g_log = g_rung * tau_traj
            live_tr = scal["warm_end"] <= i < scal["burn_end"]
            t_ad = float(
                max(min(i, scal["burn_end"]) - scal["warm_end"], 0) + 1
            )
            if live_tr:
                m1 = 0.9 * m1 + 0.1 * g_log
                v2 = 0.999 * v2 + 0.001 * jnp.square(g_log)
                step_ad = (
                    scal["chees_rate"]
                    * (m1 / (1.0 - 0.9 ** t_ad))
                    / (jnp.sqrt(v2 / (1.0 - 0.999 ** t_ad)) + 1e-8)
                )
            else:
                step_ad = jnp.zeros_like(lt)
            lt = jnp.clip(
                lt + step_ad, math.log(1e-4), jnp.log(eps * float(L))
            )
        # Welford + RM
        updf = 1.0 if scal["warm_end"] <= i < scal["burn_end"] else 0.0
        cnt_new = float(
            max(min(i + 1, scal["burn_end"]) - scal["warm_end"], 1)
        )
        delta = w - pm
        pm = pm + updf * delta / cnt_new
        p2 = p2 + updf * delta * (w - pm)
        lsw = jnp.clip(
            lsw
            + (
                scal["adapt_rate"] * (a - scal["hmc_target"])
                if updf > 0.0
                else jnp.zeros_like(lsw)
            ),
            math.log(1e-6),
            math.log(10.0),
        )
    out = dict(w=w, w_last=wl, eta=eta, ll=ll, prior=pr, rmse_train=rtr,
               rmse_test=rte, n_accept=na, log_step_w=lsw, log_step_eta=lse,
               g_like=gl, pc_mean=pm, pc_m2=p2, log_traj=lt, chees_m1=m1,
               chees_v2=v2)
    return out, {k: jnp.stack(v) for k, v in tr.items()}


@pytest.mark.parametrize("chees", [True, False])
def test_fused_hmc_block_matches_oracle(rng, chees):
    chains, k_max, length, start = 6, 24, 24, 0
    p_pad, c_pad = 64, LANES
    raw = _mk_data(rng)
    data = ps.prep_data(*[jnp.asarray(a) for a in raw])
    scal = dict(_hmc_scal(), chees=chees)  # warm 0-5, precond from 10,
    # adapt until 20: the single block crosses every phase boundary
    state = _mk_state_hmc(rng, c_pad, p_pad, chains, raw, scal)
    noise_w = np.zeros((k_max, p_pad, c_pad), np.float32)
    noise_w[:, :W, :chains] = rng.normal(size=(k_max, W, chains))
    noise_eta = np.zeros((k_max, c_pad), np.float32)
    noise_eta[:, :chains] = rng.normal(size=(k_max, chains))
    u = np.ones((k_max, c_pad), np.float32)
    u[:, :chains] = rng.uniform(size=(k_max, chains))
    ue = np.ones((k_max, c_pad), np.float32)
    ue[:, :chains] = rng.uniform(size=(k_max, chains))
    uj = np.broadcast_to(
        rng.uniform(size=(k_max, 1)).astype(np.float32), (k_max, c_pad)
    ).copy()
    ut = np.broadcast_to(
        rng.uniform(size=(k_max, 1)).astype(np.float32), (k_max, c_pad)
    ).copy()
    adapttemp = np.ones((1, c_pad), np.float32)
    adapttemp[0, :chains] = np.geomspace(1.0, 4.0, chains)
    rs = ps.rung_sum_matrix(chains, chains // scal["n_ladders"], c_pad)

    new_state, traces = ps.fused_hmc_block_impl(
        state, jnp.asarray(noise_w), jnp.asarray(noise_eta), jnp.asarray(u),
        jnp.asarray(ue), jnp.asarray(uj), jnp.asarray(ut), rs, start, length,
        data, jnp.asarray(adapttemp), TOPO, scal, record_w=True,
        interpret=True,
    )
    ora_state, ora_tr = _oracle_hmc(
        state, noise_w, noise_eta, u, ue, uj, ut, start, length, raw,
        adapttemp, scal, chains,
    )

    na = np.asarray(new_state["n_accept"])[0, :chains]
    assert na.sum() >= scal["warm_end"] * chains  # forced warm accepts
    assert na.sum() < length * chains, na  # and at least one rejection

    np.testing.assert_array_equal(na, np.asarray(ora_state["n_accept"]))
    np.testing.assert_array_equal(
        np.asarray(traces["accept_count"])[:length, :chains],
        np.asarray(ora_tr["accept_count"]),
    )
    np.testing.assert_array_equal(
        np.asarray(traces["traj_len"])[:length, :chains],
        np.asarray(ora_tr["traj_len"]),
    )
    for k in ("eta", "ll", "prior", "rmse_train", "rmse_test", "log_step_w",
              "log_step_eta", "log_traj", "chees_m1", "chees_v2"):
        np.testing.assert_allclose(
            np.asarray(new_state[k])[0, :chains],
            np.asarray(ora_state[k]),
            rtol=5e-4, atol=5e-5, err_msg=k,
        )
    for k in ("w", "w_last", "g_like", "pc_mean", "pc_m2"):
        np.testing.assert_allclose(
            np.asarray(new_state[k])[:W, :chains].T,
            np.asarray(ora_state[k]), rtol=5e-4, atol=5e-5, err_msg=k,
        )
    for k in ("ll", "rmse_train", "rmse_test"):
        np.testing.assert_allclose(
            np.asarray(traces[k])[:length, :chains],
            np.asarray(ora_tr[k]), rtol=5e-4, atol=5e-5, err_msg=k,
        )
    assert np.all(np.asarray(new_state["w"])[W:, :] == 0.0)
    assert np.all(np.asarray(new_state["g_like"])[W:, :] == 0.0)


def test_fused_hmc_chees_multiblock_matches_per_block_oracle(rng):
    """Multi-block ChEES: 256 chains = 2 grid blocks, each holding 32
    complete 4-rung ladders. The kernel's rung-sum matmul pools each
    block's OWN replicas, so the whole run must equal two independent
    single-block oracle replays (one per 128-lane half)."""
    chains, k_max, length, start = 256, 12, 12, 0
    p_pad, c_pad = 64, 2 * LANES
    rungs = 4  # 32 ladders per 128-lane block
    raw = _mk_data(rng)
    data = ps.prep_data(*[jnp.asarray(a) for a in raw])
    scal = dict(_hmc_scal(), n_ladders=LANES // rungs)
    state = _mk_state_hmc(rng, c_pad, p_pad, chains, raw, scal)
    noise_w = np.zeros((k_max, p_pad, c_pad), np.float32)
    noise_w[:, :W, :] = rng.normal(size=(k_max, W, chains))
    noise_eta = rng.normal(size=(k_max, c_pad)).astype(np.float32)
    u = rng.uniform(size=(k_max, c_pad)).astype(np.float32)
    ue = rng.uniform(size=(k_max, c_pad)).astype(np.float32)
    uj = np.broadcast_to(
        rng.uniform(size=(k_max, 1)).astype(np.float32), (k_max, c_pad)
    ).copy()
    ut = np.broadcast_to(
        rng.uniform(size=(k_max, 1)).astype(np.float32), (k_max, c_pad)
    ).copy()
    # temperature by rung within each ladder (chain = ladder*K + rung)
    adapttemp = np.tile(
        np.geomspace(1.0, 4.0, rungs).astype(np.float32), chains // rungs
    )[None, :]
    rs = ps.rung_sum_matrix(LANES, rungs, LANES)

    new_state, _traces = ps.fused_hmc_block_impl(
        state, jnp.asarray(noise_w), jnp.asarray(noise_eta), jnp.asarray(u),
        jnp.asarray(ue), jnp.asarray(uj), jnp.asarray(ut), rs, start, length,
        data, jnp.asarray(adapttemp), TOPO, scal, record_w=False,
        interpret=True,
    )
    for b in range(2):
        lo, hi = b * LANES, (b + 1) * LANES
        st_b = {k: jnp.asarray(np.asarray(v)[..., lo:hi])
                for k, v in state.items()}
        ora_state, _ = _oracle_hmc(
            st_b, noise_w[..., lo:hi], noise_eta[:, lo:hi], u[:, lo:hi],
            ue[:, lo:hi], uj[:, lo:hi], ut[:, lo:hi], start, length, raw,
            adapttemp[:, lo:hi], scal, LANES,
        )
        np.testing.assert_array_equal(
            np.asarray(new_state["n_accept"])[0, lo:hi],
            np.asarray(ora_state["n_accept"]), err_msg=f"block {b}",
        )
        for k in ("log_traj", "chees_m1", "chees_v2", "ll", "eta"):
            np.testing.assert_allclose(
                np.asarray(new_state[k])[0, lo:hi],
                np.asarray(ora_state[k]),
                rtol=5e-4, atol=5e-5, err_msg=f"{k} block {b}",
            )
        np.testing.assert_allclose(
            np.asarray(new_state["w"])[:W, lo:hi].T,
            np.asarray(ora_state["w"]), rtol=5e-4, atol=5e-5,
            err_msg=f"w block {b}",
        )


# ---------------------------------------------------------------------------
# Fused preconditioned-MALA block, classification task, vs oracle.

TOPO_C2 = (4, 5, 3)
WC2 = 4 * 5 + 5 * 3 + 5 + 3  # 43


def _mk_data_cls2(rng, ntr=37, nte=23, n_cls=3):
    x_tr = rng.normal(size=(ntr, 4)).astype(np.float32)
    y_tr = rng.integers(0, n_cls, size=(ntr,)).astype(np.float32)
    x_te = rng.normal(size=(nte, 4)).astype(np.float32)
    y_te = rng.integers(0, n_cls, size=(nte,)).astype(np.float32)
    return x_tr, y_tr, x_te, y_te


def _vg_cls():
    def f(wi, x, yi):
        out = fnn.forward(wi, x, TOPO_C2)
        logp = jax.nn.log_softmax(out, axis=-1)
        val = jnp.sum(jnp.take_along_axis(logp, yi[:, None], axis=-1))
        return val, out

    return jax.vmap(jax.value_and_grad(f, has_aux=True), (0, None, None))


def _mala_cls_scal():
    return dict(
        sigma_sq=25.0, adapt_rate=0.1, mala_target=0.574,
        warmstart_step=0.05, precond_power=1.0, pc_start=10, warm_end=6,
        burn_end=20,
    )


def _mk_state_mala_cls(rng, c_pad, p_pad, chains, raw, scal):
    w = np.zeros((p_pad, c_pad), np.float32)
    w[:WC2, :chains] = rng.normal(size=(WC2, chains)).astype(np.float32)
    x_tr = jnp.asarray(raw[0])
    y_tr = jnp.asarray(raw[1]).astype(jnp.int32)
    wc = jnp.asarray(w)[:WC2, :chains].T
    (val, _out), g = _vg_cls()(wc, x_tr, y_tr)
    prior = -0.5 * WC2 * math.log(scal["sigma_sq"]) - jnp.sum(
        jnp.square(wc), axis=-1
    ) / (2.0 * scal["sigma_sq"])
    gl = np.zeros((p_pad, c_pad), np.float32)
    gl[:WC2, :chains] = np.asarray(g).T
    pad1 = lambda v, fill: jnp.concatenate(
        [jnp.asarray(v, jnp.float32),
         jnp.full((c_pad - chains,), fill, jnp.float32)]
    ).reshape(1, c_pad)
    return dict(
        w=jnp.asarray(w),
        w_last=jnp.asarray(np.ones_like(w)),
        eta=jnp.zeros((1, c_pad), jnp.float32),
        ll=pad1(val, -50.0),
        prior=pad1(prior, -3.0),
        rmse_train=jnp.zeros((1, c_pad), jnp.float32),
        rmse_test=jnp.zeros((1, c_pad), jnp.float32),
        acc_train=jnp.zeros((1, c_pad), jnp.float32),
        acc_test=jnp.zeros((1, c_pad), jnp.float32),
        n_accept=jnp.zeros((1, c_pad), jnp.int32),
        # large enough that post-warm proposals actually reject sometimes
        log_step_w=jnp.full((1, c_pad), math.log(0.6), jnp.float32),
        g_like=jnp.asarray(gl),
        pc_mean=jnp.zeros((p_pad, c_pad), jnp.float32),
        pc_m2=jnp.zeros((p_pad, c_pad), jnp.float32),
    )


def _oracle_mala_cls(state, noise_w, u_mh, start, length, raw, adapttemp,
                     scal, chains):
    """Plain-JAX replay of kernel.step_precond (precond_mala,
    classification): MALA w-block with autodiff gradients, untempered
    multinomial likelihood, Gaussian w_size-dim prior, no eta machinery."""
    x_tr = jnp.asarray(raw[0])
    y_tr = jnp.asarray(raw[1]).astype(jnp.int32)
    x_te = jnp.asarray(raw[2])
    y_te = jnp.asarray(raw[3]).astype(jnp.int32)
    vg = _vg_cls()
    fwd = jax.vmap(lambda wi, x: fnn.forward(wi, x, TOPO_C2), (0, None))
    sq = scal["sigma_sq"]
    prior_const = -0.5 * WC2 * math.log(sq)

    def metrics(out, y):
        pred = jnp.argmax(out, axis=-1).astype(jnp.float32)
        yf = y.astype(jnp.float32)[None, :]
        rmse = jnp.sqrt(jnp.mean(jnp.square(pred - yf), axis=-1))
        acc = 100.0 * jnp.mean((pred == yf).astype(jnp.float32), axis=-1)
        return rmse, acc

    w = jnp.asarray(state["w"])[:WC2, :chains].T
    wl = jnp.asarray(state["w_last"])[:WC2, :chains].T
    ll = jnp.asarray(state["ll"])[0, :chains]
    pr = jnp.asarray(state["prior"])[0, :chains]
    rtr = jnp.asarray(state["rmse_train"])[0, :chains]
    rte = jnp.asarray(state["rmse_test"])[0, :chains]
    atr = jnp.asarray(state["acc_train"])[0, :chains]
    ate = jnp.asarray(state["acc_test"])[0, :chains]
    na = jnp.asarray(state["n_accept"])[0, :chains]
    lsw = jnp.asarray(state["log_step_w"])[0, :chains]
    gl = jnp.asarray(state["g_like"])[:WC2, :chains].T
    pm = jnp.asarray(state["pc_mean"])[:WC2, :chains].T
    p2 = jnp.asarray(state["pc_m2"])[:WC2, :chains].T
    at = jnp.asarray(adapttemp)[0, :chains]

    tr = {k: [] for k in ("ll", "rmse_train", "rmse_test", "acc_train",
                          "acc_test", "accept_count")}
    for k in range(int(length)):
        i = start + k
        sig = jnp.exp(lsw)
        cnt = float(max(min(i, scal["burn_end"]) - scal["warm_end"], 1))
        var = p2 / cnt
        m = jnp.clip(
            var / jnp.maximum(jnp.mean(var, axis=1, keepdims=True), 1e-30),
            1e-4, 1e4,
        )
        m = jnp.where(i >= scal["pc_start"], m, jnp.ones_like(m))
        g_cur = gl / at[:, None] - w / sq
        sig2m = (sig * sig)[:, None] * m
        mean_fwd = w + 0.5 * sig2m * g_cur
        nw = jnp.asarray(noise_w)[k, :WC2, :chains].T
        w_prop = mean_fwd + sig[:, None] * jnp.sqrt(m) * nw
        g_rms = jnp.sqrt(jnp.mean(jnp.square(g_cur), axis=-1, keepdims=True))
        w_warm = w + scal["warmstart_step"] * g_cur / jnp.maximum(
            g_rms, 1e-12
        )
        w_prop = jnp.where(i < scal["warm_end"], w_warm, w_prop)
        pr_prop = prior_const - jnp.sum(jnp.square(w_prop), axis=-1) / (
            2.0 * sq
        )
        (val, out_tr), gl_prop = vg(w_prop, x_tr, y_tr)
        ll_prop = val
        rtr_p, atr_p = metrics(out_tr, y_tr)
        out_te = fwd(w_prop, x_te)
        rte_p, ate_p = metrics(out_te, y_te)
        g_prop = gl_prop / at[:, None] - w_prop / sq
        mean_rev = w_prop + 0.5 * sig2m * g_prop
        diff = (
            jnp.sum(jnp.square(w_prop - mean_fwd) / m, axis=-1)
            - jnp.sum(jnp.square(w - mean_rev) / m, axis=-1)
        ) / (2.0 * sig * sig)
        log_mh = (ll_prop - ll) / at + (pr_prop - pr) + diff
        a = jnp.exp(jnp.minimum(log_mh, 0.0))
        acc = jnp.logical_or(
            jnp.asarray(u_mh)[k, :chains] < a, i < scal["warm_end"]
        )
        tr["ll"].append(ll_prop)  # untempered (classification convention)
        rtr = jnp.where(acc, rtr_p, rtr)
        rte = jnp.where(acc, rte_p, rte)
        atr = jnp.where(acc, atr_p, atr)
        ate = jnp.where(acc, ate_p, ate)
        tr["rmse_train"].append(rtr)
        tr["rmse_test"].append(rte)
        tr["acc_train"].append(atr)
        tr["acc_test"].append(ate)
        tr["accept_count"].append(na)
        w = jnp.where(acc[:, None], w_prop, w)
        wl = jnp.where(acc[:, None], w_prop, wl)
        ll = jnp.where(acc, ll_prop, ll)
        pr = jnp.where(acc, pr_prop, pr)
        gl = jnp.where(acc[:, None], gl_prop, gl)
        na = na + acc.astype(jnp.int32)
        # Welford + RM
        updf = 1.0 if scal["warm_end"] <= i < scal["burn_end"] else 0.0
        cnt_new = float(
            max(min(i + 1, scal["burn_end"]) - scal["warm_end"], 1)
        )
        delta = w - pm
        pm = pm + updf * delta / cnt_new
        p2 = p2 + updf * delta * (w - pm)
        lsw = jnp.clip(
            lsw
            + (
                scal["adapt_rate"] * (a - scal["mala_target"])
                if updf > 0.0
                else jnp.zeros_like(lsw)
            ),
            math.log(1e-6),
            math.log(10.0),
        )
    out = dict(w=w, w_last=wl, ll=ll, prior=pr, rmse_train=rtr,
               rmse_test=rte, acc_train=atr, acc_test=ate, n_accept=na,
               log_step_w=lsw, g_like=gl, pc_mean=pm, pc_m2=p2)
    return out, {k: jnp.stack(v) for k, v in tr.items()}


def test_fused_mala_cls_block_matches_oracle(rng):
    chains, k_max, length, start = 6, 24, 24, 0
    p_pad, c_pad = 48, LANES
    raw = _mk_data_cls2(rng)
    data = ps.prep_data(
        *[jnp.asarray(a) for a in raw], n_classes=TOPO_C2[2]
    )
    scal = _mala_cls_scal()  # block crosses warm/pc/burn boundaries
    state = _mk_state_mala_cls(rng, c_pad, p_pad, chains, raw, scal)
    noise_w = np.zeros((k_max, p_pad, c_pad), np.float32)
    noise_w[:, :WC2, :chains] = rng.normal(size=(k_max, WC2, chains))
    u = np.ones((k_max, c_pad), np.float32)
    u[:, :chains] = rng.uniform(size=(k_max, chains))
    adapttemp = np.ones((1, c_pad), np.float32)
    adapttemp[0, :chains] = np.geomspace(1.0, 4.0, chains)

    new_state, traces = ps.fused_mala_cls_block_impl(
        state, jnp.asarray(noise_w), jnp.asarray(u), start, length, data,
        jnp.asarray(adapttemp), TOPO_C2, scal, record_w=True, interpret=True,
    )
    ora_state, ora_tr = _oracle_mala_cls(
        state, noise_w, u, start, length, raw, adapttemp, scal, chains,
    )

    na = np.asarray(new_state["n_accept"])[0, :chains]
    assert na.sum() >= scal["warm_end"] * chains
    assert na.sum() < length * chains, na

    np.testing.assert_array_equal(na, np.asarray(ora_state["n_accept"]))
    np.testing.assert_array_equal(
        np.asarray(traces["accept_count"])[:length, :chains],
        np.asarray(ora_tr["accept_count"]),
    )
    for k in ("ll", "prior", "rmse_train", "rmse_test", "acc_train",
              "acc_test", "log_step_w"):
        np.testing.assert_allclose(
            np.asarray(new_state[k])[0, :chains],
            np.asarray(ora_state[k]),
            rtol=5e-4, atol=5e-5, err_msg=k,
        )
    for k in ("w", "w_last", "g_like", "pc_mean", "pc_m2"):
        np.testing.assert_allclose(
            np.asarray(new_state[k])[:WC2, :chains].T,
            np.asarray(ora_state[k]), rtol=5e-4, atol=5e-5, err_msg=k,
        )
    for k in ("ll", "rmse_train", "rmse_test", "acc_train", "acc_test"):
        np.testing.assert_allclose(
            np.asarray(traces[k])[:length, :chains],
            np.asarray(ora_tr[k]), rtol=5e-4, atol=5e-5, err_msg=k,
        )
    assert np.all(np.asarray(new_state["w"])[WC2:, :] == 0.0)
    assert np.all(np.asarray(new_state["g_like"])[WC2:, :] == 0.0)


# ---------------------------------------------------------------------------
# Fused preconditioned-HMC block, classification task, vs oracle.


def _hmc_cls_scal(chees=True):
    return dict(
        sigma_sq=25.0, adapt_rate=0.1, hmc_target=0.75, warmstart_step=0.05,
        precond_power=1.0, pc_start=10, warm_end=6, burn_end=20,
        leapfrog=4, eps_jitter=0.2, chees=chees, chees_rate=0.025,
        n_ladders=2,
    )


def _mk_state_hmc_cls(rng, c_pad, p_pad, chains, raw, scal):
    base = _mk_state_mala_cls(rng, c_pad, p_pad, chains, raw, scal)
    pad1 = lambda v: jnp.pad(
        jnp.asarray(v, jnp.float32), (0, c_pad - chains)
    ).reshape(1, c_pad)
    # eps large enough that leapfrog energy error actually rejects sometimes
    # (the multinomial posterior at w_size 43 is too flat for eps ~0.1), but
    # not so large that full-L float32 trajectories turn chaotic and the
    # kernel-vs-autodiff summation-order drift blows past the tolerance
    base["log_step_w"] = jnp.full((1, c_pad), math.log(0.75), jnp.float32)
    base.update(
        log_traj=pad1(np.full((chains,), math.log(0.1), np.float32)),
        chees_m1=pad1(np.zeros((chains,), np.float32)),
        chees_v2=pad1(np.zeros((chains,), np.float32)),
    )
    return base


def _oracle_hmc_cls(state, noise_w, u_mh, u_jit, u_traj, start, length, raw,
                    adapttemp, scal, chains):
    """Plain-JAX replay of the fused classification-HMC block semantics:
    leapfrog on the tempered multinomial posterior with autodiff gradients,
    kinetic-energy MH, untempered ll carried/recorded, NO eta machinery,
    forced-accept warm start, ChEES rung-sum adaptation, Welford + RM."""
    x_tr = jnp.asarray(raw[0])
    y_tr = jnp.asarray(raw[1]).astype(jnp.int32)
    x_te = jnp.asarray(raw[2])
    y_te = jnp.asarray(raw[3]).astype(jnp.int32)
    vg = _vg_cls()
    fwd = jax.vmap(lambda wi, x: fnn.forward(wi, x, TOPO_C2), (0, None))
    sq = scal["sigma_sq"]
    prior_const = -0.5 * WC2 * math.log(sq)
    n_lad = scal["n_ladders"]
    k_rung = chains // n_lad
    L = scal["leapfrog"]

    def metrics(out, y):
        pred = jnp.argmax(out, axis=-1).astype(jnp.float32)
        yf = y.astype(jnp.float32)[None, :]
        rmse = jnp.sqrt(jnp.mean(jnp.square(pred - yf), axis=-1))
        acc = 100.0 * jnp.mean((pred == yf).astype(jnp.float32), axis=-1)
        return rmse, acc

    def rung_mean(x):
        xr = x.reshape(n_lad, k_rung, -1)
        mu = jnp.mean(xr, axis=0, keepdims=True)
        return jnp.broadcast_to(mu, xr.shape).reshape(chains, -1)

    w = jnp.asarray(state["w"])[:WC2, :chains].T
    wl = jnp.asarray(state["w_last"])[:WC2, :chains].T
    ll = jnp.asarray(state["ll"])[0, :chains]
    pr = jnp.asarray(state["prior"])[0, :chains]
    rtr = jnp.asarray(state["rmse_train"])[0, :chains]
    rte = jnp.asarray(state["rmse_test"])[0, :chains]
    atr = jnp.asarray(state["acc_train"])[0, :chains]
    ate = jnp.asarray(state["acc_test"])[0, :chains]
    na = jnp.asarray(state["n_accept"])[0, :chains]
    lsw = jnp.asarray(state["log_step_w"])[0, :chains]
    gl = jnp.asarray(state["g_like"])[:WC2, :chains].T
    pm = jnp.asarray(state["pc_mean"])[:WC2, :chains].T
    p2 = jnp.asarray(state["pc_m2"])[:WC2, :chains].T
    lt = jnp.asarray(state["log_traj"])[0, :chains]
    m1 = jnp.asarray(state["chees_m1"])[0, :chains]
    v2 = jnp.asarray(state["chees_v2"])[0, :chains]
    at = jnp.asarray(adapttemp)[0, :chains]

    tr = {k: [] for k in ("ll", "rmse_train", "rmse_test", "acc_train",
                          "acc_test", "accept_count", "traj_len")}
    for k in range(int(length)):
        i = start + k
        sig = jnp.exp(lsw)
        cnt = float(max(min(i, scal["burn_end"]) - scal["warm_end"], 1))
        var = p2 / cnt
        m = jnp.clip(
            var / jnp.maximum(jnp.mean(var, axis=1, keepdims=True), 1e-30),
            1e-4, 1e4,
        )
        m = jnp.where(i >= scal["pc_start"], m, jnp.ones_like(m))
        g_cur = gl / at[:, None] - w / sq
        eps = sig * (
            1.0
            + scal["eps_jitter"]
            * (2.0 * jnp.asarray(u_jit)[k, :chains] - 1.0)
        )
        if scal["chees"]:
            u_t = jnp.asarray(u_traj)[k, :chains]
            tau_traj = jnp.exp(lt) * u_t
            l_steps = jnp.clip(jnp.ceil(tau_traj / eps), 1.0, float(L))
        else:
            l_steps = jnp.full((chains,), float(L))
        epsw = eps[:, None]
        p0 = jnp.asarray(noise_w)[k, :WC2, :chains].T / jnp.sqrt(m)
        k_init = 0.5 * jnp.sum(m * jnp.square(p0), axis=-1)
        w_c, p_c, g_c = w, p0, g_cur
        for n in range(L):
            p_half = p_c + 0.5 * epsw * g_c
            w_n = w_c + epsw * m * p_half
            (_v, _out), gl_n = vg(w_n, x_tr, y_tr)
            g_n = gl_n / at[:, None] - w_n / sq
            p_n = p_half + 0.5 * epsw * g_n
            upd = (float(n) < l_steps)[:, None]
            w_c = jnp.where(upd, w_n, w_c)
            p_c = jnp.where(upd, p_n, p_c)
            g_c = jnp.where(upd, g_n, g_c)
        k_end = 0.5 * jnp.sum(m * jnp.square(p_c), axis=-1)
        g_rms = jnp.sqrt(jnp.mean(jnp.square(g_cur), axis=-1, keepdims=True))
        w_warm = w + scal["warmstart_step"] * g_cur / jnp.maximum(
            g_rms, 1e-12
        )
        w_prop = jnp.where(i < scal["warm_end"], w_warm, w_c)
        pr_prop = prior_const - jnp.sum(jnp.square(w_prop), axis=-1) / (
            2.0 * sq
        )
        (val, out_tr), gl_prop = vg(w_prop, x_tr, y_tr)
        ll_prop = val
        rtr_p, atr_p = metrics(out_tr, y_tr)
        out_te = fwd(w_prop, x_te)
        rte_p, ate_p = metrics(out_te, y_te)
        diff = k_init - k_end
        log_mh = (ll_prop - ll) / at + (pr_prop - pr) + diff
        a = jnp.exp(jnp.minimum(log_mh, 0.0))
        acc = jnp.logical_or(
            jnp.asarray(u_mh)[k, :chains] < a, i < scal["warm_end"]
        )
        tr["ll"].append(ll_prop)  # untempered (classification convention)
        rtr = jnp.where(acc, rtr_p, rtr)
        rte = jnp.where(acc, rte_p, rte)
        atr = jnp.where(acc, atr_p, atr)
        ate = jnp.where(acc, ate_p, ate)
        tr["rmse_train"].append(rtr)
        tr["rmse_test"].append(rte)
        tr["acc_train"].append(atr)
        tr["acc_test"].append(ate)
        tr["accept_count"].append(na)
        tr["traj_len"].append(l_steps)
        w_old = w
        w = jnp.where(acc[:, None], w_prop, w)
        wl = jnp.where(acc[:, None], w_prop, wl)
        ll = jnp.where(acc, ll_prop, ll)
        pr = jnp.where(acc, pr_prop, pr)
        gl = jnp.where(acc[:, None], gl_prop, gl)
        na = na + acc.astype(jnp.int32)
        # ChEES adaptation (rung sums over ladder replicas)
        if scal["chees"]:
            dxp = w_prop - rung_mean(w_prop)
            dx = w_old - rung_mean(w_old)
            dsq = jnp.sum(m * jnp.square(dxp), -1) - jnp.sum(
                m * jnp.square(dx), -1
            )
            inner = jnp.sum(dxp * p_c, -1)
            g_ch = a * dsq * inner * u_t
            wsum = jnp.maximum(a.reshape(n_lad, k_rung).sum(0), 1e-6)
            g_rung = jnp.broadcast_to(
                (g_ch.reshape(n_lad, k_rung).sum(0) / wsum)[None, :],
                (n_lad, k_rung),
            ).reshape(chains)
            g_log = g_rung * tau_traj
            live_tr = scal["warm_end"] <= i < scal["burn_end"]
            t_ad = float(
                max(min(i, scal["burn_end"]) - scal["warm_end"], 0) + 1
            )
            if live_tr:
                m1 = 0.9 * m1 + 0.1 * g_log
                v2 = 0.999 * v2 + 0.001 * jnp.square(g_log)
                step_ad = (
                    scal["chees_rate"]
                    * (m1 / (1.0 - 0.9 ** t_ad))
                    / (jnp.sqrt(v2 / (1.0 - 0.999 ** t_ad)) + 1e-8)
                )
            else:
                step_ad = jnp.zeros_like(lt)
            lt = jnp.clip(
                lt + step_ad, math.log(1e-4), jnp.log(eps * float(L))
            )
        # Welford + RM
        updf = 1.0 if scal["warm_end"] <= i < scal["burn_end"] else 0.0
        cnt_new = float(
            max(min(i + 1, scal["burn_end"]) - scal["warm_end"], 1)
        )
        delta = w - pm
        pm = pm + updf * delta / cnt_new
        p2 = p2 + updf * delta * (w - pm)
        lsw = jnp.clip(
            lsw
            + (
                scal["adapt_rate"] * (a - scal["hmc_target"])
                if updf > 0.0
                else jnp.zeros_like(lsw)
            ),
            math.log(1e-6),
            math.log(10.0),
        )
    out = dict(w=w, w_last=wl, ll=ll, prior=pr, rmse_train=rtr,
               rmse_test=rte, acc_train=atr, acc_test=ate, n_accept=na,
               log_step_w=lsw, g_like=gl, pc_mean=pm, pc_m2=p2, log_traj=lt,
               chees_m1=m1, chees_v2=v2)
    return out, {k: jnp.stack(v) for k, v in tr.items()}


@pytest.mark.parametrize("chees", [True, False])
def test_fused_hmc_cls_block_matches_oracle(rng, chees):
    chains, k_max, length, start = 6, 24, 24, 0
    p_pad, c_pad = 48, LANES
    raw = _mk_data_cls2(rng)
    data = ps.prep_data(
        *[jnp.asarray(a) for a in raw], n_classes=3
    )
    scal = _hmc_cls_scal(chees)
    state = _mk_state_hmc_cls(rng, c_pad, p_pad, chains, raw, scal)
    noise_w = np.zeros((k_max, p_pad, c_pad), np.float32)
    noise_w[:, :WC2, :chains] = rng.normal(size=(k_max, WC2, chains))
    u = np.ones((k_max, c_pad), np.float32)
    u[:, :chains] = rng.uniform(size=(k_max, chains))
    uj = np.broadcast_to(
        rng.uniform(size=(k_max, 1)).astype(np.float32), (k_max, c_pad)
    ).copy()
    ut = np.broadcast_to(
        rng.uniform(size=(k_max, 1)).astype(np.float32), (k_max, c_pad)
    ).copy()
    adapttemp = np.ones((1, c_pad), np.float32)
    adapttemp[0, :chains] = np.geomspace(1.0, 4.0, chains)
    rs = ps.rung_sum_matrix(chains, chains // scal["n_ladders"], c_pad)

    new_state, traces = ps.fused_hmc_cls_block_impl(
        state, jnp.asarray(noise_w), jnp.asarray(u), jnp.asarray(uj),
        jnp.asarray(ut), rs, start, length, data, jnp.asarray(adapttemp),
        TOPO_C2, scal, record_w=True, interpret=True,
    )
    ora_state, ora_tr = _oracle_hmc_cls(
        state, noise_w, u, uj, ut, start, length, raw, adapttemp, scal,
        chains,
    )

    na = np.asarray(new_state["n_accept"])[0, :chains]
    assert na.sum() >= scal["warm_end"] * chains  # forced warm accepts
    assert na.sum() < length * chains, na  # and at least one rejection

    np.testing.assert_array_equal(na, np.asarray(ora_state["n_accept"]))
    np.testing.assert_array_equal(
        np.asarray(traces["accept_count"])[:length, :chains],
        np.asarray(ora_tr["accept_count"]),
    )
    np.testing.assert_array_equal(
        np.asarray(traces["traj_len"])[:length, :chains],
        np.asarray(ora_tr["traj_len"]),
    )
    # eta is a pure pass-through (no noise parameter in the multinomial)
    np.testing.assert_array_equal(
        np.asarray(new_state["eta"]), np.asarray(state["eta"])
    )
    for k in ("ll", "prior", "rmse_train", "rmse_test", "acc_train",
              "acc_test", "log_step_w", "log_traj", "chees_m1", "chees_v2"):
        np.testing.assert_allclose(
            np.asarray(new_state[k])[0, :chains],
            np.asarray(ora_state[k]),
            rtol=5e-4, atol=5e-5, err_msg=k,
        )
    for k in ("w", "w_last", "g_like", "pc_mean", "pc_m2"):
        np.testing.assert_allclose(
            np.asarray(new_state[k])[:WC2, :chains].T,
            np.asarray(ora_state[k]), rtol=5e-4, atol=5e-5, err_msg=k,
        )
    for k in ("ll", "rmse_train", "rmse_test", "acc_train", "acc_test"):
        np.testing.assert_allclose(
            np.asarray(traces[k])[:length, :chains],
            np.asarray(ora_tr[k]), rtol=5e-4, atol=5e-5, err_msg=k,
        )
    assert np.all(np.asarray(new_state["w"])[WC2:, :] == 0.0)
    assert np.all(np.asarray(new_state["g_like"])[WC2:, :] == 0.0)
