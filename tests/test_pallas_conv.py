"""Tests for the fused conv1 stage kernel (ops/pallas_conv.py).

Runs in interpret mode on the CPU mesh (the real-chip measurements are in
cnn_conv_decision.md)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ptnn.models import cnn
from ptnn.ops import pallas_conv


@pytest.mark.parametrize("c,n", [(3, 19), (130, 8)])
def test_conv1_relu_pool_matches_xla(c, n):
    """Fused stage 1 == XLA conv+bias+relu+pool, including chain/image
    padding edges (c=130 crosses a lane block; n=19 is not a tile multiple)."""
    cfg = cnn.CnnConfig(image_hw=8, n_classes=10)
    rng = np.random.RandomState(0)
    w1 = jnp.asarray(rng.randn(c, 3, 3, 1, 8) * 0.3, jnp.float32)
    b1 = jnp.asarray(rng.randn(c, 8) * 0.1, jnp.float32)
    x = jnp.asarray(rng.rand(n, 64), jnp.float32)
    img = x.reshape(n, 8, 8, 1)
    ref = jax.vmap(lambda cw, cb: cnn._conv_stage(img, cw, cb))(w1, b1)
    got = pallas_conv.conv1_relu_pool(x, w1, b1, hw=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_fused_spec_forward_matches_plain():
    """digits_spec(fused_eval=True).batched_forward == vmapped plain forward."""
    spec_f = cnn.digits_spec(fused_eval=True)
    spec_p = cnn.digits_spec()
    assert spec_p.batched_forward is None
    rng = np.random.RandomState(1)
    ws = jnp.asarray(rng.randn(5, spec_f.w_size) * 0.2, jnp.float32)
    x = jnp.asarray(rng.rand(23, 64), jnp.float32)
    cfg = cnn.CnnConfig(image_hw=8, n_classes=10)
    ref = jax.vmap(lambda w: cnn.forward(w, x, cfg))(ws)
    params = jax.vmap(lambda w: cnn.unpack(w, cfg))(ws)
    h = pallas_conv.conv1_relu_pool(
        x, params[0], params[1], hw=8, interpret=True
    )
    got = jax.vmap(lambda p, hi: cnn._tail(p, hi, cfg, stage=1))(params, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_conv1_relu_pool_multichannel_input():
    """in_ch > 1: patch taps are channel-major (ic, kh, kw) in
    conv_general_dilated_patches — the weight transpose must match (a
    spatial-major reshape silently mismatches taps; regression test)."""
    rng = np.random.RandomState(3)
    c, n, hw, in_ch, out_ch = 4, 6, 8, 3, 8
    w1 = jnp.asarray(rng.randn(c, 3, 3, in_ch, out_ch) * 0.3, jnp.float32)
    b1 = jnp.asarray(rng.randn(c, out_ch) * 0.1, jnp.float32)
    x = jnp.asarray(rng.rand(n, hw * hw * in_ch), jnp.float32)
    img = x.reshape(n, hw, hw, in_ch)
    ref = jax.vmap(lambda cw, cb: cnn._conv_stage(img, cw, cb))(w1, b1)
    got = pallas_conv.conv1_relu_pool(
        x, w1, b1, hw=hw, in_ch=in_ch, out_ch=out_ch, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_fused_spec_batched_forward_interpret():
    """spec.batched_forward (the wired path) agrees with the plain forward
    when driven through batched_forward_fused in interpret mode."""
    cfg = cnn.CnnConfig(image_hw=8, n_classes=10)
    rng = np.random.RandomState(5)
    ws = jnp.asarray(rng.randn(3, cnn.w_size(cfg)) * 0.2, jnp.float32)
    x = jnp.asarray(rng.rand(11, 64), jnp.float32)
    ref = jax.vmap(lambda w: cnn.forward(w, x, cfg))(ws)
    got = cnn.batched_forward_fused(ws, x, cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
