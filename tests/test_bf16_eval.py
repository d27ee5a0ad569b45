"""Opt-in bfloat16 evaluation mode (eval_dtype="bfloat16").

Forward passes run in bf16 (half the HBM traffic for the eval path), while
every likelihood reduction, the prior, the MH decision, and the Langevin
drift stay float32. Parity with float32 runs is distributional, not bitwise.
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


def test_bf16_forward_close_to_f32():
    """Single forward pass: bf16 output within bf16 rounding of f32."""
    from ptnn.models import fnn

    topo = (4, 10, 1)
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (fnn.w_size(topo),), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 4), jnp.float32)
    f32 = fnn.forward(w, x, topo)
    bf = fnn.forward(
        w.astype(jnp.bfloat16),
        x.astype(jnp.bfloat16),
        topo,
        precision=jax.lax.Precision.DEFAULT,
    ).astype(jnp.float32)
    # sigmoid outputs in (0,1); bf16 relative error ~2^-8
    np.testing.assert_allclose(np.asarray(bf), np.asarray(f32), atol=2e-2)


@pytest.mark.slow
def test_bf16_sampler_matches_f32_statistically(sunspot):
    """End-to-end: the bf16-eval sampler reaches the same cold-chain fit
    quality as the f32 sampler (identical kernels, perturbed likelihoods)."""
    cfg = PTConfig(
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
        eval_dtype="bfloat16",
    ).validate()
    res = sample(cfg, *sunspot, seed=0)
    base = sample(
        dataclasses.replace(cfg, eval_dtype="float32"), *sunspot, seed=0
    )
    assert np.isfinite(res.traces["ll"][1:]).all()
    r_bf = float(res.traces["rmse_test"][-1, 0])
    r_f32 = float(base.traces["rmse_test"][-1, 0])
    assert r_bf < 0.2 and r_f32 < 0.2, (r_bf, r_f32)
    # likelihood levels agree to the bf16 fx-error scale
    tail_bf = res.traces["ll"][-100:, 0].mean()
    tail_f32 = base.traces["ll"][-100:, 0].mean()
    assert abs(tail_bf - tail_f32) < 0.15 * abs(tail_f32) + 20.0, (
        tail_bf,
        tail_f32,
    )


def test_bf16_rejects_unknown_dtype():
    with pytest.raises(ValueError):
        PTConfig(task="regression", topology=(4, 10, 1), eval_dtype="fp8").validate()
