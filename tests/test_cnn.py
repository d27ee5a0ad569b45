"""Tests for the Bayesian CNN model family on the PT kernel."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import ptnn
from ptnn.data import load_digits
from ptnn.models import cnn
from ptnn.models.api import grad_drift


@pytest.fixture(scope="module")
def digits():
    p = load_digits(0)
    # trim for CI speed
    return p.train[:128], p.test[:64]


def test_cnn_shapes_and_forward():
    spec = cnn.digits_spec()
    w = jax.random.normal(jax.random.PRNGKey(0), (spec.w_size,)) * 0.1
    x = jax.random.uniform(jax.random.PRNGKey(1), (5, 64))
    out = spec.forward(w, x)
    assert out.shape == (5, 10)
    logp = spec.log_probs(out)
    np.testing.assert_allclose(
        np.exp(np.asarray(logp)).sum(axis=1), 1.0, rtol=1e-5
    )


def test_cnn_drift_decreases_loss():
    spec = cnn.digits_spec()
    cfg = cnn.CnnConfig(image_hw=8, n_classes=10)
    w = jax.random.normal(jax.random.PRNGKey(0), (spec.w_size,)) * 0.1
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 64))
    y = jax.random.randint(jax.random.PRNGKey(2), (32,), 0, 10)
    t = jax.nn.one_hot(y, 10)

    def xent(wi):
        logp = jax.nn.log_softmax(cnn.forward(wi, x, cfg), axis=-1)
        return -jnp.sum(t * logp)

    w2 = spec.drift(w, x, t, 0.01)
    assert float(xent(w2)) < float(xent(w))


def test_cnn_pt_sampler_runs(digits):
    spec = cnn.digits_spec(channels=(4,), hidden=16)
    cfg = dataclasses.replace(
        ptnn.classification_preset(
            (64, 16, 10),
            num_samples=8 * 40,
            num_chains=8,
            maxtemp=3.0,
            use_langevin_gradients=True,
            learn_rate=0.02,
        ),
        swap_interval=10,
        record_w=False,
        chunk_steps=20,
    )
    res = ptnn.sample(cfg, *digits, seed=0, model_spec=spec)
    assert res.traces["ll"].shape == (40, 8)
    assert np.isfinite(res.traces["ll"][1:]).all()
    assert (res.traces["acc_test"] <= 100).all()


def test_cnn_pt_sharded(digits):
    from ptnn.parallel import mesh as mesh_mod

    spec = cnn.digits_spec(channels=(4,), hidden=16)
    cfg = dataclasses.replace(
        ptnn.classification_preset(
            (64, 16, 10),
            num_samples=8 * 20,
            num_chains=8,
            maxtemp=3.0,
            use_langevin_gradients=False,
        ),
        swap_interval=5,
        record_w=False,
        chunk_steps=19,
    )
    res = ptnn.sample(
        cfg, *digits, seed=0, mesh=mesh_mod.make_mesh(), model_spec=spec
    )
    assert np.isfinite(res.traces["ll"][1:]).all()


def test_grad_drift_is_deterministic():
    spec = cnn.digits_spec(channels=(4,), hidden=16)
    w = jax.random.normal(jax.random.PRNGKey(3), (spec.w_size,)) * 0.1
    x = jax.random.uniform(jax.random.PRNGKey(4), (16, 64))
    t = jax.nn.one_hot(jnp.zeros(16, jnp.int32), 10)
    d1 = spec.drift(w, x, t, 0.01)
    d2 = spec.drift(w, x, t, 0.01)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


def test_deep_mlp_spec_runs(digits):
    from ptnn.models import mlp

    spec = mlp.spec((64, 32, 16, 10), task="classification", act="relu")
    assert spec.w_size == 64 * 32 + 32 + 32 * 16 + 16 + 16 * 10 + 10
    cfg = dataclasses.replace(
        ptnn.classification_preset(
            (64, 32, 10), num_samples=8 * 30, num_chains=8, maxtemp=3.0,
            use_langevin_gradients=True, learn_rate=5e-5,
        ),
        swap_interval=10,
        step_w=0.01,
        record_w=False,
        chunk_steps=15,
    )
    res = ptnn.sample(cfg, *digits, seed=0, model_spec=spec)
    assert np.isfinite(res.traces["ll"][1:]).all()


def test_deep_mlp_regression():
    from ptnn.data import load_regression
    from ptnn.models import mlp

    p = load_regression("Sunspot")
    spec = mlp.spec((4, 16, 8, 1), task="regression", act="tanh")
    cfg = dataclasses.replace(
        ptnn.regression_preset(
            num_samples=8 * 50, num_chains=8, maxtemp=3.0,
            use_langevin_gradients=True, learn_rate=5e-5,
        ),
        step_w=0.01,
        record_w=False,
        chunk_steps=25,
    )
    res = ptnn.sample(cfg, p.train, p.test, seed=0, model_spec=spec)
    assert np.isfinite(res.traces["rmse_test"][1:]).all()


def test_drift_chain_microbatch_equivalent():
    """drift_chain_microbatch must not change the sampler's numerics, only
    its memory profile: traces identical to the full-vmap drift."""
    import dataclasses

    import numpy as np

    import ptnn
    from ptnn.data import load_digits
    from ptnn.models import cnn as cnn_mod

    prob = load_digits(0)
    spec = cnn_mod.digits_spec()
    base = dataclasses.replace(
        ptnn.classification_preset(
            prob.topology, num_samples=8 * 60, num_chains=8,
            use_langevin_gradients=True, learn_rate=0.00005,
        ),
        swap_interval=30, step_w=0.01, record_w=False, chunk_steps=30,
    ).validate()
    r1 = ptnn.sample(base, prob.train[:200], prob.test[:100], seed=0,
                     model_spec=spec)
    mb = dataclasses.replace(base, drift_chain_microbatch=4).validate()
    r2 = ptnn.sample(mb, prob.train[:200], prob.test[:100], seed=0,
                     model_spec=spec)
    np.testing.assert_allclose(
        np.asarray(r1.traces["acc_test"]), np.asarray(r2.traces["acc_test"]),
        rtol=1e-5, atol=1e-5,
    )


def test_mnist_idx_loader_synthetic(tmp_path):
    """The MNIST loader parses IDX files correctly (synthetic fixtures —
    real MNIST is blocked by the no-egress environment, VERDICT r1 #4)."""
    import gzip
    import struct

    import numpy as np

    from ptnn.experiments.cnn_digits import load_mnist

    rng = np.random.RandomState(0)
    imgs_tr = rng.randint(0, 256, (12, 28, 28), dtype=np.uint8)
    lab_tr = rng.randint(0, 10, (12,), dtype=np.uint8)
    imgs_te = rng.randint(0, 256, (5, 28, 28), dtype=np.uint8)
    lab_te = rng.randint(0, 10, (5,), dtype=np.uint8)

    def write_idx(path, arr, gz=False):
        dims = arr.shape
        hdr = struct.pack(">HBB", 0, 0x08, len(dims)) + struct.pack(
            f">{len(dims)}I", *dims
        )
        op = gzip.open if gz else open
        with op(path, "wb") as f:
            f.write(hdr + arr.tobytes())

    # train files raw, test files gzipped — both naming paths exercised
    write_idx(tmp_path / "train-images-idx3-ubyte", imgs_tr)
    write_idx(tmp_path / "train-labels-idx1-ubyte", lab_tr)
    write_idx(tmp_path / "t10k-images-idx3-ubyte.gz", imgs_te, gz=True)
    write_idx(tmp_path / "t10k-labels-idx1-ubyte.gz", lab_te, gz=True)

    prob = load_mnist(str(tmp_path))
    assert prob.train.shape == (12, 28 * 28 + 1)
    assert prob.test.shape == (5, 28 * 28 + 1)
    np.testing.assert_allclose(
        prob.train[:, :-1], imgs_tr.reshape(12, -1) / 255.0
    )
    np.testing.assert_array_equal(prob.train[:, -1], lab_tr)
    np.testing.assert_array_equal(prob.test[:, -1], lab_te)
    assert prob.topology == (28 * 28, 64, 10)
