"""Statistical parity gates against the reference's committed baselines.

Full-budget parity runs live in scripts/parity.py (TPU); these are scaled-down
statistical gates cheap enough for CPU CI. Reference targets (BASELINE.md):
Sunspot RW (100k samples, 10 chains, maxtemp 5, swap 100): test RMSE
0.0239 ± 0.0050, swap% 44.5, accept% 18.3. RNG parity is distributional, not
bitwise (SURVEY.md §7 hard-part 4), so gates are tolerance bands.
"""

import dataclasses

import numpy as np
import pytest

from ptnn import regression_preset, sample
from ptnn.data import load_regression

pytestmark = pytest.mark.slow  # full-budget statistical gates (quick tier skips)


@pytest.fixture(scope="module")
def sunspot_rw_result():
    prob = load_regression("Sunspot")
    cfg = dataclasses.replace(
        regression_preset(
            num_samples=40_000,  # 4k steps/chain (reference: 10k) — CI budget
            num_chains=10,
            maxtemp=5.0,
            use_langevin_gradients=False,
        ),
        record_w=False,
    )
    return sample(cfg, prob.train, prob.test, seed=0), cfg


def test_sunspot_rw_posterior_quality(sunspot_rw_result):
    res, cfg = sunspot_rw_result
    burnin = cfg.samples_per_chain // 2
    rt = res.traces["rmse_test"][burnin:]
    # reference pooled mean 0.0239 (std 0.005) at 2.5x our step budget
    assert rt.mean() < 0.040, rt.mean()
    assert rt.min() < 0.028  # 0.0155 at full budget
    # cold chain settles at reference-level fits
    assert res.traces["rmse_test"][-1, 0] < 0.030


def test_sunspot_rw_accept_and_swap(sunspot_rw_result):
    res, _ = sunspot_rw_result
    acc = res.accept_ratio_per_chain.mean()
    assert 6.0 < acc < 40.0, acc  # reference 18.3
    assert 25.0 < res.swap_percent < 70.0, res.swap_percent  # reference 44.5


def test_temperature_ordering_of_acceptance(sunspot_rw_result):
    """Hotter chains accept more in the tempered phase (flatter target)."""
    res, _ = sunspot_rw_result
    acc = res.accept_ratio_per_chain
    assert acc[-1] > acc[0]
