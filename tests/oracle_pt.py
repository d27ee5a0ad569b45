"""Faithful single-process NumPy emulation of the reference PT sampler.

The reference runs one OS process per chain plus a master doing queue/event
rendezvous (pt_timeseries_regression.py:138-485, :659-771). For parity
forensics we need its *literal semantics* runnable deterministically without
multiprocessing: this module steps all chains in lockstep and performs the
master's sequential bubbling swap sweep in-line at the reference's cadence.

Semantics reproduced exactly (regression entry point):
  * per-step: Bernoulli(l_prob) Langevin proposal with 2 per-sample-SGD
    drift epochs and the simplified q-ratio divided by adapttemp
    (pt_timeseries_regression.py:326-346), else RW N(w, step_w);
  * eta RW proposal every step, tau = exp(eta) (:355-356);
  * Gaussian likelihood / adapttemp (:200-205); tau^2 prior terms (:215-221);
  * two-phase tempering: adapttemp = T until int(0.6*samples), then 1 with a
    one-time likelihood recompute (:317-324);
  * swap rendezvous when i % swap_interval == 0 and i != 0 (:427): payload
    likelihood*T (:430), master sweep over adjacent pairs with
    min(1, 0.5*exp(min(709, lh2-lh1))) (:683 classification, :659-698
    regression), re-enqueued so accepted configs bubble; chains resume with
    swapped (w, eta) but their PRE-swap likelihood (stale; :445-448);
  * traces: rmse recorded on accept, carried on reject (:410-423);
  * aggregation: per-chain post-burn-in pooling of rmse_test (show_results).

The only deviation: ``evaluate_proposal``'s per-sample Python forward loop is
replaced by an equivalent batched matmul (row-independent, identical math);
the DRIFT keeps the reference's per-sample sequential update order.
"""

from __future__ import annotations

import math

import numpy as np


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def split_w(w, topo):
    i, h, o = topo
    w1 = w[: i * h].reshape(i, h)
    w2 = w[i * h : i * h + h * o].reshape(h, o)
    b1 = w[i * h + h * o : i * h + h * o + h]
    b2 = w[i * h + h * o + h :]
    return w1, w2, b1, b2


def forward(w, X, topo):
    w1, w2, b1, b2 = split_w(w, topo)
    hid = sigmoid(X @ w1 - b1)
    return sigmoid(hid @ w2 - b2)


def sgd_epoch(w, X, T, topo, lr):
    """One epoch of the reference's per-sample SGD (langevin_gradient with
    depth=1): sequential dataset order, deltas from the delta rule with
    subtracted biases (pt_timeseries_regression.py:57-78, :99-118)."""
    w1, w2, b1, b2 = (a.copy() for a in split_w(w, topo))
    for xi, ti in zip(X, T):
        hid = sigmoid(xi @ w1 - b1)
        out = sigmoid(hid @ w2 - b2)
        out_delta = (ti - out) * out * (1 - out)
        hid_delta = (w2 @ out_delta) * hid * (1 - hid)
        w2 += lr * np.outer(hid, out_delta)
        b2 += -lr * out_delta
        w1 += lr * np.outer(xi, hid_delta)
        b1 += -lr * hid_delta
    return np.concatenate([w1.ravel(), w2.ravel(), b1, b2])


def sgd_epoch_chains(w_batch, X, T, topo, lr):
    """``sgd_epoch`` for a (B, w_size) batch of chains at once.

    Identical math per chain (the per-sample update order is preserved; only
    the loop over chains is vectorized into einsums), ~10x less Python
    overhead — the full-budget LG forensics are unusable without it on this
    1-core box. Agreement with ``sgd_epoch`` is checked in
    tests/test_components.py.
    """
    i_dim, h, o = topo
    B = w_batch.shape[0]
    w1 = w_batch[:, : i_dim * h].reshape(B, i_dim, h).copy()
    w2 = w_batch[:, i_dim * h : i_dim * h + h * o].reshape(B, h, o).copy()
    b1 = w_batch[:, i_dim * h + h * o : i_dim * h + h * o + h].copy()
    b2 = w_batch[:, i_dim * h + h * o + h :].copy()
    for xi, ti in zip(X, T):
        hid = sigmoid(np.einsum("i,bih->bh", xi, w1, optimize=True) - b1)  # (B, h)
        out = sigmoid(np.einsum("bh,bho->bo", hid, w2, optimize=True) - b2)  # (B, o)
        out_delta = (ti - out) * out * (1 - out)  # (B, o)
        hid_delta = np.einsum("bho,bo->bh", w2, out_delta, optimize=True) * hid * (1 - hid)
        w2 += lr * np.einsum("bh,bo->bho", hid, out_delta, optimize=True)
        b2 += -lr * out_delta
        w1 += lr * np.einsum("i,bh->bih", xi, hid_delta, optimize=True)
        b1 += -lr * hid_delta
    return np.concatenate(
        [w1.reshape(B, -1), w2.reshape(B, -1), b1, b2], axis=1
    )


def reg_likelihood(w, X, y, tau_sq, topo, adapttemp):
    fx = forward(w, X, topo)[:, 0]
    rmse = float(np.sqrt(np.mean((fx - y) ** 2)))
    loss = np.sum(-0.5 * np.log(2 * math.pi * tau_sq) - 0.5 * (y - fx) ** 2 / tau_sq)
    return loss / adapttemp, rmse


def forward_chains(w_batch, X, topo):
    """(B, w_size) x (N, i) -> (B, N) scalar outputs, chain-batched."""
    i_dim, h, o = topo
    B = w_batch.shape[0]
    w1 = w_batch[:, : i_dim * h].reshape(B, i_dim, h)
    w2 = w_batch[:, i_dim * h : i_dim * h + h * o].reshape(B, h, o)
    b1 = w_batch[:, i_dim * h + h * o : i_dim * h + h * o + h]
    b2 = w_batch[:, i_dim * h + h * o + h :]
    hid = sigmoid(np.einsum("ni,bih->bnh", X, w1, optimize=True) - b1[:, None, :])
    out = sigmoid(np.einsum("bnh,bho->bno", hid, w2, optimize=True) - b2[:, None, :])
    return out[:, :, 0]


def reg_likelihood_chains(w_batch, X, y, tau_sq, adapttemp, topo):
    """Chain-batched likelihood: (B,) tempered loglik and (B,) rmse."""
    fx = forward_chains(w_batch, X, topo)  # (B, N)
    rmse = np.sqrt(np.mean((fx - y) ** 2, axis=1))
    loss = np.sum(
        -0.5 * np.log(2 * math.pi * tau_sq)[:, None]
        - 0.5 * (y - fx) ** 2 / tau_sq[:, None],
        axis=1,
    )
    return loss / adapttemp, rmse


def reg_prior(w, tausq, topo, sigma_squared=25.0, nu_1=0.0, nu_2=0.0):
    i, h, _ = topo
    part1 = -1 * ((i * h + h + 2) / 2) * np.log(sigma_squared)
    part2 = 1 / (2 * sigma_squared) * np.sum(np.square(w))
    return part1 - part2 - (1 + nu_1) * np.log(tausq) - (nu_2 / tausq)


def assign_temperatures_ref(num_chains, maxtemp):
    """Geometric ladder as the reference's assign_temperatures builds it
    (betas from logspace, inverted; pt_classification.py:616,624-645)."""
    betas = np.logspace(0, -np.log10(maxtemp), num_chains)
    return 1.0 / betas


def run_reference_pt_regression(
    train,
    test,
    topo=(4, 5, 1),
    num_chains=10,
    samples_per_chain=10_000,
    maxtemp=5.0,
    swap_interval=100,
    l_prob=0.5,
    lr=0.1,
    use_langevin=True,
    seed=0,
    burn_in=0.5,
):
    """Returns dict with pooled post-burn-in rmse stats and accept/swap %."""
    rng = np.random.RandomState(seed)
    topo = tuple(topo)
    i_dim, h, o = topo
    w_size = i_dim * h + h * o + h + o
    step_w, step_eta = 0.025, 0.2
    X_tr, y_tr = train[:, :i_dim], train[:, i_dim]
    X_te, y_te = test[:, :i_dim], test[:, i_dim]
    T_tr = train[:, i_dim:]
    temps = assign_temperatures_ref(num_chains, maxtemp)
    pt_samples = int(samples_per_chain * 0.6)

    C = num_chains
    w = rng.randn(C, w_size)
    eta = np.empty(C)
    ll = np.empty(C)  # tempered, as carried by each chain
    prior = np.empty(C)
    adapt = temps.copy()
    for c in range(C):
        fx = forward(w[c], X_tr, topo)[:, 0]
        eta[c] = np.log(np.var(fx - y_tr))
        tau = math.exp(eta[c])
        ll[c], _ = reg_likelihood(w[c], X_tr, y_tr, tau, topo, adapt[c])
        prior[c] = reg_prior(w[c], tau, topo)

    rmse_test = np.zeros((samples_per_chain, C))
    n_acc = np.zeros(C, dtype=int)
    n_swap = 0
    n_swap_prop = 0

    sq = step_w * step_w
    for i in range(samples_per_chain - 1):
        if i == pt_samples:
            adapt[:] = 1.0
            ll, _ = reg_likelihood_chains(w, X_tr, y_tr, np.exp(eta), adapt, topo)
        # Chain loop vectorized (the reference steps chains in independent
        # processes; any interleaving of their RNG draws is equivalent —
        # parity is distributional, SURVEY §7 hard-part 4).
        lx = rng.uniform(size=C)
        use_l = np.zeros(C, bool) if not use_langevin else (lx < l_prob)
        sel = np.where(use_l)[0]
        w_gd = w.copy()
        if sel.size:
            w_gd[sel] = sgd_epoch_chains(w[sel], X_tr, T_tr, topo, lr)
        w_prop = rng.normal(w_gd, step_w)  # == N(w, step_w) for RW chains
        diff_prop = np.zeros(C)
        if sel.size:
            w_prop_gd = sgd_epoch_chains(w_prop[sel], X_tr, T_tr, topo, lr)
            first = -0.5 * np.sum((w[sel] - w_prop_gd) ** 2, axis=1) / sq
            second = -0.5 * np.sum((w_prop[sel] - w_gd[sel]) ** 2, axis=1) / sq
            diff_prop[sel] = (first - second) / adapt[sel]
        eta_prop = eta + rng.normal(0, step_eta, C)
        tau_prop = np.exp(eta_prop)
        ll_prop, _ = reg_likelihood_chains(w_prop, X_tr, y_tr, tau_prop, adapt, topo)
        _, rte = reg_likelihood_chains(w_prop, X_te, y_te, tau_prop, adapt, topo)
        i_d, h_d, _o = topo
        prior_prop = (
            -((i_d * h_d + h_d + 2) / 2) * np.log(25.0)
            - np.sum(np.square(w_prop), axis=1) / 50.0
            - np.log(tau_prop)
        )
        with np.errstate(over="ignore"):
            mh = np.minimum(
                1.0, np.exp(np.minimum(709.0, (ll_prop - ll) + (prior_prop - prior) + diff_prop))
            )
        accept = rng.uniform(size=C) < mh
        n_acc += accept
        ll = np.where(accept, ll_prop, ll)
        prior = np.where(accept, prior_prop, prior)
        eta = np.where(accept, eta_prop, eta)
        w = np.where(accept[:, None], w_prop, w)
        rmse_test[i + 1] = np.where(accept, rte, rmse_test[i])
        # master swap sweep (stale likelihood on resume)
        if i % swap_interval == 0 and i != 0:
            payload = ll * temps  # chains enqueue likelihood*T (:430)
            for k in range(C - 1):
                n_swap_prop += 1
                lh1, lh2 = payload[k], payload[k + 1]
                try:
                    a = min(1.0, 0.5 * math.exp(min(709.0, lh2 - lh1)))
                except OverflowError:
                    a = 1.0
                if rng.uniform() < a:
                    n_swap += 1
                    w[[k, k + 1]] = w[[k + 1, k]]
                    eta[[k, k + 1]] = eta[[k + 1, k]]
                    payload[[k, k + 1]] = payload[[k + 1, k]]
                    # ll/prior deliberately NOT swapped (stale, :445-448)

    b = int(samples_per_chain * burn_in)
    pooled = rmse_test[b:, :].ravel()
    return {
        "rmse_test_mean": float(pooled.mean()),
        "rmse_test_std": float(pooled.std()),
        "rmse_test_best": float(pooled[pooled > 0].min()) if (pooled > 0).any() else float("nan"),
        "accept_pct": float(100.0 * n_acc.sum() / (C * samples_per_chain)),
        "swap_pct": float(100.0 * n_swap / max(n_swap_prop, 1)),
    }


def cls_eval_chains(w_batch, X, y, topo, adapttemp):
    """Chain-batched classification eval: tempered multinomial loglik over
    softmax(sigmoid outputs) (pt_classification.py:209-222, :108-110),
    plus accuracy of argmax predictions (:55, :199-206)."""
    i_dim, h, o = topo
    B = w_batch.shape[0]
    w1 = w_batch[:, : i_dim * h].reshape(B, i_dim, h)
    w2 = w_batch[:, i_dim * h : i_dim * h + h * o].reshape(B, h, o)
    b1 = w_batch[:, i_dim * h + h * o : i_dim * h + h * o + h]
    b2 = w_batch[:, i_dim * h + h * o + h :]
    hid = sigmoid(np.einsum("ni,bih->bnh", X, w1, optimize=True) - b1[:, None, :])
    out = sigmoid(np.einsum("bnh,bho->bno", hid, w2, optimize=True) - b2[:, None, :])  # (B,N,O)
    e = np.exp(out)
    prob = e / e.sum(axis=2, keepdims=True)
    n = X.shape[0]
    ll = np.log(prob[:, np.arange(n), y.astype(int)]).sum(axis=1) / adapttemp
    pred = np.argmax(out, axis=2)
    acc = 100.0 * (pred == y.astype(int)[None, :]).mean(axis=1)
    return ll, acc


def run_reference_pt_classification(
    train,
    test,
    topo,
    num_chains=10,
    samples_per_chain=5_000,
    maxtemp=10.0,
    swap_interval=100,
    l_prob=0.5,
    lr=0.01,
    use_langevin=False,
    seed=0,
    burn_in=0.5,
):
    """Classification twin of ``run_reference_pt_regression``.

    Deltas mirrored from pt_classification.py: no eta/tau (pure multinomial
    likelihood :209-222); full-dimension prior normalization (:224-230);
    swap rendezvous at (i+1) % swap_interval == 0 (:438) with the TEMPERED
    carried likelihood as payload (:439); temper switch only fires when
    0.6*samples is integral (:302 float comparison); the master performs
    int(samples/swap_interval) sweeps — one more than the chains trigger,
    consuming the end-of-run puts (:724) — mirrored as a final sweep so the
    swap%% denominator matches. RW drift only (the committed LG class tables
    came from the legacy variants; SURVEY §2.2).
    """
    rng = np.random.RandomState(seed)
    topo = tuple(topo)
    i_dim, h, o = topo
    w_size = i_dim * h + h * o + h + o
    step_w = 0.025
    X_tr, y_tr = train[:, :i_dim], train[:, i_dim]
    X_te, y_te = test[:, :i_dim], test[:, i_dim]
    T_tr = np.eye(o)[y_tr.astype(int)]
    temps = assign_temperatures_ref(num_chains, maxtemp)
    pt_cut = samples_per_chain * 0.6  # float: switch fires only if integral
    prior_dim = i_dim * h + h + o + h * o

    C = num_chains
    w = rng.randn(C, w_size)
    adapt = temps.copy()
    ll, _ = cls_eval_chains(w, X_tr, y_tr, topo, adapt)
    prior = -(prior_dim / 2) * np.log(25.0) - np.sum(np.square(w), axis=1) / 50.0

    acc_test = np.zeros((samples_per_chain, C))
    n_acc = np.zeros(C, dtype=int)
    n_swap = 0
    n_swap_prop = 0

    def sweep(payload):
        nonlocal n_swap, n_swap_prop
        for k in range(C - 1):
            n_swap_prop += 1
            try:
                a = min(1.0, 0.5 * math.exp(min(709.0, payload[k + 1] - payload[k])))
            except OverflowError:
                a = 1.0
            if rng.uniform() < a:
                n_swap += 1
                w[[k, k + 1]] = w[[k + 1, k]]
                payload[[k, k + 1]] = payload[[k + 1, k]]

    for i in range(samples_per_chain - 1):
        if i == pt_cut:
            adapt[:] = 1.0
            ll, _ = cls_eval_chains(w, X_tr, y_tr, topo, adapt)
        lx = rng.uniform(size=C)
        use_l = np.zeros(C, bool) if not use_langevin else (lx < l_prob)
        sel = np.where(use_l)[0]
        w_gd = w.copy()
        if sel.size:
            w_gd[sel] = sgd_epoch_chains(w[sel], X_tr, T_tr, topo, lr)
        w_prop = rng.normal(w_gd, step_w)
        diff_prop = np.zeros(C)
        if sel.size:
            sq = step_w * step_w
            w_prop_gd = sgd_epoch_chains(w_prop[sel], X_tr, T_tr, topo, lr)
            first = -0.5 * np.sum((w[sel] - w_prop_gd) ** 2, axis=1) / sq
            second = -0.5 * np.sum((w_prop[sel] - w_gd[sel]) ** 2, axis=1) / sq
            diff_prop[sel] = (first - second) / adapt[sel]
        ll_prop, _ = cls_eval_chains(w_prop, X_tr, y_tr, topo, adapt)
        _, acc_te = cls_eval_chains(w_prop, X_te, y_te, topo, adapt)
        prior_prop = (
            -(prior_dim / 2) * np.log(25.0) - np.sum(np.square(w_prop), axis=1) / 50.0
        )
        with np.errstate(over="ignore"):
            mh = np.minimum(
                1.0,
                np.exp(np.minimum(709.0, (ll_prop - ll) + (prior_prop - prior) + diff_prop)),
            )
        accept = rng.uniform(size=C) < mh
        n_acc += accept
        ll = np.where(accept, ll_prop, ll)
        prior = np.where(accept, prior_prop, prior)
        w = np.where(accept[:, None], w_prop, w)
        acc_test[i + 1] = np.where(accept, acc_te, acc_test[i])
        if (i + 1) % swap_interval == 0:
            # payload is the carried (tempered) ll (:439); sweep() bubbles its
            # own copy — the chains' carried ll stays STALE (:448)
            sweep(ll.copy())
    sweep(ll.copy())  # the master's extra end-of-run sweep (denominator parity)

    b = int(samples_per_chain * burn_in)
    pooled = acc_test[b:, :].ravel()
    return {
        "acc_test_mean": float(pooled.mean()),
        "acc_test_best": float(pooled.max()),
        "accept_pct": float(100.0 * n_acc.sum() / (C * samples_per_chain)),
        "swap_pct": float(100.0 * n_swap / max(n_swap_prop, 1)),
    }
