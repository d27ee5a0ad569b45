"""Tests for proposal="pcn" — preconditioned Crank-Nicolson within PT.

pCN's correctness hinges on one identity: the proposal is reversible w.r.t.
the N(0, sigma_sq I) weight prior, so the q-ratio must cancel the Gaussian
prior difference EXACTLY and the MH test reduces to the tempered likelihood
ratio. The sharpest end-to-end check: at an infinite-temperature rung the
likelihood term vanishes, rho adapts to 1 (independence sampler), and the
chain must emit IID draws from the prior — mean 0, per-coordinate variance
sigma_sq, zero lag-1 autocorrelation. Any sign/scale error in the
cancellation breaks all three.
"""

import numpy as np
import pytest

from ptnn import PTConfig, sample
from ptnn.data import load_regression


def pcn_cfg(**kw):
    base = dict(
        task="regression",
        topology=(4, 10, 1),
        num_samples=8 * 600,
        num_chains=8,
        maxtemp=5.0,
        swap_interval=50,
        swap_offset=0,
        swap_payload="tempered_times_T",
        proposal="pcn",
        step_w=0.1,
        chunk_steps=300,
    )
    base.update(kw)
    return PTConfig(**base).validate()


@pytest.fixture(scope="module")
def sunspot():
    p = load_regression("Sunspot")
    return p.train, p.test


def test_pcn_validation():
    with pytest.raises(ValueError, match="warmstart_frac needs gradients"):
        pcn_cfg(warmstart_frac=0.05)
    with pytest.raises(ValueError, match="adapt_step_size"):
        pcn_cfg(adapt_step_size=True)


def test_pcn_smoke_and_adaptation(sunspot):
    cfg = pcn_cfg()
    res = sample(cfg, *sunspot, seed=0)
    assert np.isfinite(res.traces["ll"][1:]).all()
    assert np.isfinite(res.traces["rmse_test"][1:]).all()
    # the likelihood term actually gates acceptance (not the all-accept
    # degenerate case), and chains move
    assert 5.0 < res.accept_ratio_per_chain.mean() < 95.0
    sig = np.exp(np.asarray(res.final_state.log_step_w))
    assert np.std(sig) > 0.0  # per-chain rho adapted apart
    # rho is meaningful (the proposal uses min(sig, 1)): cold chains should
    # adapt to small rho, hot chains larger
    assert sig[0] < sig[-1] * 10.0  # sanity: finite ordering, no blow-up
    # cold-chain quality improves over the 1.0-init row
    assert float(res.traces["rmse_test"][-1, 0]) < 0.2


def test_pcn_hot_rung_samples_prior_exactly():
    # beta = 0 rung: tempered-likelihood ratio vanishes; if (and only if)
    # the pCN prior-reversibility cancellation is exact, log_mh == 0, every
    # proposal is accepted, rho adapts to its cap 1, and the trace is IID
    # N(0, sigma_sq I)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(16, 2))
    y = (x[:, 0] > 0).astype(float)
    rows = np.concatenate([x, y[:, None]], axis=1)
    cfg = PTConfig(
        task="classification",
        topology=(2, 2, 2),
        num_samples=2 * 3000,
        num_chains=2,
        maxtemp=1e8,  # overridden by custom_ladder
        custom_ladder=(1.0, float("inf")),
        swap_interval=10**6,  # never swaps (no cold-draw contamination)
        swap_offset=0,
        proposal="pcn",
        step_w=0.5,
        pt_phase_frac=2.0,  # no 60% temper switch
        record_w=True,
        record_w_chains=0,  # trace ALL chains (we want the hot one)
        chunk_steps=1000,
    ).validate()
    res = sample(cfg, rows, rows, seed=1)
    w_hot = np.asarray(res.traces["w"])[:, 1, :]  # (steps, 12)
    burn = w_hot.shape[0] // 2
    d = w_hot[burn:]
    # acceptance at the beta=0 rung is identically 1
    n_steps = cfg.samples_per_chain - 1
    assert res.final_state.n_accept[1] == n_steps
    # rho hit its cap (independence sampler)
    assert float(np.exp(res.final_state.log_step_w[1])) >= 1.0
    # IID N(0, 25): per-coordinate variance, mean, and lag-1 autocorrelation
    var = d.var(axis=0)
    assert abs(float(var.mean()) / 25.0 - 1.0) < 0.05
    assert np.all(np.abs(var / 25.0 - 1.0) < 0.25)
    assert np.max(np.abs(d.mean(axis=0))) < 0.6
    a = d[:-1] - d[:-1].mean(0)
    b = d[1:] - d[1:].mean(0)
    acf1 = (a * b).sum(0) / np.sqrt((a * a).sum(0) * (b * b).sum(0))
    assert np.max(np.abs(acf1)) < 0.1
    # the cold chain, by contrast, is NOT prior-distributed (likelihood
    # bites): acceptance strictly below 100%
    assert res.final_state.n_accept[0] < n_steps


def test_pcn_dimension_robust_acceptance(sunspot):
    # the selling point: acceptance at a FIXED rho does not collapse with
    # dimension the way plain RW's does. Compare acceptance of the same
    # sampler on hidden=10 (61 params) vs hidden=40 (241 params) with
    # adaptation disabled by freezing before it starts (tiny run, burn-in
    # adaptation window near-empty).
    accs = {}
    for hid in (10, 40):
        cfg = pcn_cfg(
            topology=(4, hid, 1),
            num_samples=8 * 200,
            step_w=0.05,
            adapt_rate=0.0,  # freeze rho at its init
            chunk_steps=200,
        )
        res = sample(cfg, *sunspot, seed=2)
        accs[hid] = float(res.accept_ratio_per_chain.mean())
    # 4x the dimension costs less than half the acceptance (plain RW at
    # fixed step loses acceptance exponentially in d)
    assert accs[40] > 0.4 * accs[10]
    assert accs[40] > 5.0
