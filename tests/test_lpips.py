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


def test_fused_slice_distance_matches_unfused(params):
    """The fused analytic head (distance_from_raw_features) must equal the
    normalize_feat + distance_from_features composition in value and, on
    f32 features, in gradient."""
    imgs = _img(21, b=2, s=32)
    tgt = _img(22, b=2, s=32)
    raw = L.extract_raw_features(params, imgs)
    # broadcastable cached-target layout [B, 1, h, w, c] like the solver's
    tfeats = [f[:, None] for f in L.extract_features(params, tgt)]
    raw_b = [f[:, None] for f in raw]

    d_fused = L.distance_from_raw_features(params, raw_b, tfeats)
    d_ref = L.distance_from_features(
        params, tfeats, [L.normalize_feat(f) for f in raw_b]
    )
    np.testing.assert_allclose(
        np.asarray(d_fused), np.asarray(d_ref), rtol=1e-6, atol=1e-7
    )

    def loss_fused(fs):
        return jnp.sum(L.distance_from_raw_features(params, fs, tfeats))

    def loss_ref(fs):
        return jnp.sum(
            L.distance_from_features(
                params, tfeats, [L.normalize_feat(f) for f in fs]
            )
        )

    g_fused = jax.grad(loss_fused)(raw_b)
    g_ref = jax.grad(loss_ref)(raw_b)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=2e-4, atol=1e-7
        )


def test_fused_slice_distance_bf16_close(params):
    """bf16 features: fused head value must match the unfused composition
    and gradients agree to bf16 rounding."""
    imgs = _img(23, b=2, s=32).astype(jnp.bfloat16)
    tgt = _img(24, b=2, s=32).astype(jnp.bfloat16)
    p16 = jax.tree.map(lambda a: a, params)
    raw = L.extract_raw_features(p16, imgs)
    tfeats = [f[:, None] for f in L.extract_features(p16, tgt)]
    raw_b = [f[:, None] for f in raw]
    d_fused = L.distance_from_raw_features(p16, raw_b, tfeats)
    d_ref = L.distance_from_features(
        p16, tfeats, [L.normalize_feat(f) for f in raw_b]
    )
    np.testing.assert_allclose(
        np.asarray(d_fused), np.asarray(d_ref), rtol=1e-5, atol=1e-6
    )
    g_fused = jax.grad(lambda fs: jnp.sum(
        L.distance_from_raw_features(p16, fs, tfeats)).astype(jnp.float32))(raw_b)
    g_ref = jax.grad(lambda fs: jnp.sum(L.distance_from_features(
        p16, tfeats, [L.normalize_feat(f) for f in fs])).astype(jnp.float32))(raw_b)
    for gf, gr in zip(g_fused, g_ref):
        gf32, gr32 = np.asarray(gf, np.float32), np.asarray(gr, np.float32)
        scale = max(np.abs(gr32).max(), 1e-6)
        assert np.abs(gf32 - gr32).max() / scale < 0.05


REF_WEIGHTS = "/root/reference/src/custom_lpips/weights/v0.1"


@pytest.mark.skipif(
    not os.path.isdir(REF_WEIGHTS), reason="reference lin-head weights not on disk"
)
@pytest.mark.parametrize(
    "name,n_layers,chans",
    [
        ("vgg", 5, (64, 128, 256, 512, 512)),
        ("alex", 5, (64, 192, 384, 256, 256)),
        ("squeeze", 7, (64, 128, 256, 384, 384, 512, 512)),
    ],
)
def test_real_reference_lin_weights_convert(name, n_layers, chans):
    """Cross-validation of the torch-format lin-head converter against the
    REFERENCE'S OWN shipped weight files (custom_lpips/weights/v0.1/*.pth,
    loaded as data) — round 1 only exercised synthetic state dicts.  The
    trained heads must have the documented per-slice channel widths and
    the non-negative weighting LPIPS training enforces
    (networks_basic.py NetLinLayer 1x1 conv heads)."""
    lins = L.load_lin_weights_torch(f"{REF_WEIGHTS}/{name}.pth", n_layers=n_layers)
    assert tuple(l.shape[0] for l in lins) == chans
    for l in lins:
        assert np.isfinite(l).all()
        assert float(l.min()) >= 0.0
        assert float(l.max()) > 0.0  # trained, not dead


@pytest.mark.skipif(
    not os.path.isdir(REF_WEIGHTS), reason="reference lin-head weights not on disk"
)
def test_real_lin_weights_through_full_lpips():
    """build_lpips_params with the real vgg lin heads yields a working
    metric: d(x,x)=0, d(x,y)>0, and the real heads re-weight slice
    contributions differently from the uniform init."""
    p_uniform = L.init_lpips_params(jax.random.PRNGKey(0))
    p_real = L.build_lpips_params(
        jax.random.PRNGKey(0), lin_path=f"{REF_WEIGHTS}/vgg.pth"
    )
    x = _img(31, b=1, s=32)
    y = _img(32, b=1, s=32)
    d_same = float(L.lpips(p_real, x, x)[0])
    d_diff = float(L.lpips(p_real, x, y)[0])
    assert abs(d_same) < 1e-6
    assert d_diff > 0
    assert abs(d_diff - float(L.lpips(p_uniform, x, y)[0])) > 1e-9
