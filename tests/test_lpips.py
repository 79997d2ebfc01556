"""LPIPS tests: metric axioms, feature-caching factorization, pretrained
lin-head loading (from the reference's small vgg.pth blob when present)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.losses import (
    lpips as L,
)

REF_LIN = "/root/reference/src/custom_lpips/weights/v0.1/vgg.pth"


@pytest.fixture(scope="module")
def params():
    return L.init_lpips_params(jax.random.PRNGKey(0))


def _img(key, b=2, s=64):
    return jax.random.uniform(jax.random.PRNGKey(key), (b, s, s, 3)) * 2 - 1


def test_identity_is_zero(params):
    x = _img(1)
    d = L.lpips(params, x, x)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)


def test_positive_and_symmetric(params):
    x, y = _img(1), _img(2)
    dxy = np.asarray(L.lpips(params, x, y))
    dyx = np.asarray(L.lpips(params, y, x))
    assert (dxy > 0).all()
    np.testing.assert_allclose(dxy, dyx, rtol=1e-5)
    assert dxy.shape == (2,)  # per-sample


def test_feature_caching_factorization(params):
    """lpips(x,y) == distance_from_features(extract(x), extract(y)) ---
    the identity the attribution solver exploits to halve VGG compute."""
    x, y = _img(3), _img(4)
    full = L.lpips(params, x, y)
    f0 = L.extract_features(params, x)
    f1 = L.extract_features(params, y)
    cached = L.distance_from_features(params, f0, f1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(cached), rtol=1e-6)


def test_feature_shapes(params):
    x = _img(5, b=1, s=64)
    feats = L.extract_features(params, x)
    shapes = [f.shape for f in feats]
    assert shapes == [
        (1, 64, 64, 64),
        (1, 32, 32, 128),
        (1, 16, 16, 256),
        (1, 8, 8, 512),
        (1, 4, 4, 512),
    ]
    # channel-unit-normalized
    norms = np.linalg.norm(np.asarray(feats[0]), axis=-1)
    nz = norms[norms > 1e-3]
    np.testing.assert_allclose(nz, 1.0, atol=1e-2)


def test_grad_flows_through_one_arg(params):
    x, y = _img(6, b=1), _img(7, b=1)
    g = jax.grad(lambda a: jnp.sum(L.lpips(params, a, y)))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_monotone_in_perturbation(params):
    x = _img(8, b=1)
    d1 = float(L.lpips(params, x, jnp.clip(x + 0.05, -1, 1))[0])
    d2 = float(L.lpips(params, x, jnp.clip(x + 0.4, -1, 1))[0])
    assert d2 > d1


def test_mse_per_sample():
    x, y = _img(9), _img(10)
    got = np.asarray(L.mse_per_sample(x, y))
    want = np.mean((np.asarray(x) - np.asarray(y)) ** 2, axis=(1, 2, 3))
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.skipif(not os.path.exists(REF_LIN), reason="reference lin weights not present")
def test_load_reference_lin_heads(params):
    lins = L.load_lin_weights_torch(REF_LIN)
    assert [w.shape[0] for w in lins] == list(L.LPIPS_CHANNELS)
    assert all((w >= 0).all() for w in lins)  # LPIPS heads are non-negative
    p2 = dict(params, lin=tuple(jnp.asarray(w) for w in lins))
    x, y = _img(11), _img(12)
    d = np.asarray(L.lpips(p2, x, y))
    assert (d >= 0).all() and np.isfinite(d).all()


def test_scaling_layer_constants():
    x = jnp.zeros((1, 4, 4, 3))
    y = np.asarray(L.scaling_layer(x))
    np.testing.assert_allclose(
        y[0, 0, 0], [0.030 / 0.458, 0.088 / 0.448, 0.188 / 0.450], rtol=1e-5
    )
