"""Independent NumPy oracle for unit tests.

A from-the-math reimplementation of the reference's numerics (sigmoid FNN
with subtracted biases, multinomial/Gaussian likelihoods, delta-rule SGD
epoch) used to cross-check the JAX implementation. Written against the
formulas documented in SURVEY.md §2.1 — deliberately simple and loopy so a
bug in the vectorized JAX path can't be mirrored here.
"""

from __future__ import annotations

import numpy as np


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def split_w(w, topo):
    i, h, o = topo
    s1, s2 = i * h, i * h + h * o
    w1 = w[:s1].reshape(i, h)
    w2 = w[s1:s2].reshape(h, o)
    b1 = w[s2 : s2 + h]
    b2 = w[s2 + h :]
    return w1, b1, w2, b2


def forward_one(w, x, topo):
    w1, b1, w2, b2 = split_w(w, topo)
    hid = sigmoid(x @ w1 - b1)
    out = sigmoid(hid @ w2 - b2)
    return hid, out


def forward(w, X, topo):
    return np.stack([forward_one(w, X[n], topo)[1] for n in range(X.shape[0])])


def class_loglik(w, X, y, topo):
    lh = 0.0
    for n in range(X.shape[0]):
        _, out = forward_one(w, X[n], topo)
        prob = np.exp(out) / np.sum(np.exp(out))
        lh += np.log(prob[int(y[n])])
    return lh


def reg_loglik(w, X, y, tau_sq, topo):
    fx = forward(w, X, topo)[:, 0]
    return float(
        np.sum(-0.5 * np.log(2 * np.pi * tau_sq) - 0.5 * (y - fx) ** 2 / tau_sq)
    )


def class_prior(w, topo, sigma_sq=25.0):
    i, h, o = topo
    return -((i * h + h + o + h * o) / 2) * np.log(sigma_sq) - np.sum(w**2) / (
        2 * sigma_sq
    )


def reg_prior(w, tau_sq, topo, sigma_sq=25.0, nu1=0.0, nu2=0.0):
    i, h, _ = topo
    return (
        -((i * h + h + 2) / 2) * np.log(sigma_sq)
        - np.sum(w**2) / (2 * sigma_sq)
        - (1 + nu1) * np.log(tau_sq)
        - nu2 / tau_sq
    )


def sgd_epoch(w, X, T, topo, lr):
    """Per-sample delta-rule SGD epoch in dataset order. ``T``: (N, O)
    targets (one-hot rows for classification, y column for regression)."""
    w1, b1, w2, b2 = (a.copy() for a in split_w(np.asarray(w, float), topo))
    for n in range(X.shape[0]):
        x = X[n]
        hid = sigmoid(x @ w1 - b1)
        out = sigmoid(hid @ w2 - b2)
        od = (T[n] - out) * out * (1 - out)
        hd = (w2 @ od) * hid * (1 - hid)
        w2 = w2 + lr * np.outer(hid, od)
        b2 = b2 - lr * od
        w1 = w1 + lr * np.outer(x, hd)
        b1 = b1 - lr * hd
    return np.concatenate([w1.ravel(), w2.ravel(), b1, b2])


def beta_ladder_expected(ntemps, tmax):
    """Closed form of the geometric ladder for finite Tmax + given ntemps:
    betas = logspace(0, -log10(Tmax), ntemps)."""
    return np.logspace(0, -np.log10(tmax), ntemps)


def bubbling_sweep(ll, us):
    """Sequential adjacent-pair sweep with traveling payloads; returns the
    permutation (new[i] = old[perm[i]]) and number of accepted swaps."""
    ll = list(ll)
    perm = list(range(len(ll)))
    n_acc = 0
    for k in range(len(ll) - 1):
        a = min(1.0, 0.5 * np.exp(min(709.0, ll[k + 1] - ll[k])))
        if us[k] < a:
            ll[k], ll[k + 1] = ll[k + 1], ll[k]
            perm[k], perm[k + 1] = perm[k + 1], perm[k]
            n_acc += 1
    return perm, n_acc
