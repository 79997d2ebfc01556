"""Remaining DistModel metric modes (net / L2 / SSIM) + pipeline helper +
orbax round trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.losses import (
    lpips as L,
)


def _img(key, b=2, s=32):
    return jax.random.uniform(jax.random.PRNGKey(key), (b, s, s, 3)) * 2 - 1


def test_net_mode_axioms():
    p = L.init_lpips_params(jax.random.PRNGKey(0))
    x, y = _img(1), _img(2)
    d0 = np.asarray(L.lpips_net_mode(p, x, x))
    dxy = np.asarray(L.lpips_net_mode(p, x, y))
    np.testing.assert_allclose(d0, 0.0, atol=1e-5)
    assert (dxy > 0).all()


def test_dssim_axioms_and_monotonicity():
    x = _img(3, b=1)
    d_self = float(L.dssim_per_sample(x, x)[0])
    assert d_self == pytest.approx(0.0, abs=1e-5)
    d_small = float(L.dssim_per_sample(x, jnp.clip(x + 0.05, -1, 1))[0])
    d_big = float(L.dssim_per_sample(x, jnp.clip(x + 0.5, -1, 1))[0])
    # SSIM can dip slightly negative under strong perturbation, so DSSIM
    # may exceed 0.5 but stays in [0, 1]
    assert 0 < d_small < d_big <= 1.0


def test_get_watermarked_images():
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.config import (
        AttackConfig,
        FingerprintConfig,
        ModelConfig,
    )
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.fingerprint import (
        pipeline as pl,
    )

    mcfg = ModelConfig(img_size=16, channel_max=32, n_mlp=2, style_dim=32)
    fp = FingerprintConfig(key_len=4, shift=28, n_pca_samples=300)
    pipe = pl.build_pipeline(
        jax.random.PRNGKey(0), mcfg, fp, want_lpips=False,
        attack_cfg=AttackConfig(augmentation="Noise", noise_sigma=0.05),
    )
    orig, wm, pert = pl.get_watermarked_images(pipe, jax.random.PRNGKey(1), 2)
    assert orig.shape == wm.shape == pert.shape == (2, 16, 16, 3)
    # watermark changes the image; attack changes it further
    assert np.abs(np.asarray(orig) - np.asarray(wm)).max() > 1e-4
    assert np.abs(np.asarray(pert) - np.asarray(wm)).max() > 1e-4


def test_orbax_pytree_roundtrip(tmp_path):
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.checkpoints.state import (
        load_pytree_orbax,
        save_pytree_orbax,
    )

    tree = {"a": jnp.arange(6.0).reshape(2, 3), "b": {"c": jnp.ones(4)}}
    ok = save_pytree_orbax(str(tmp_path / "ckpt"), tree)
    if not ok:
        pytest.skip("orbax not importable")
    back = load_pytree_orbax(str(tmp_path / "ckpt"), tree)
    jax.tree.map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x), np.asarray(y)),
        tree,
        back,
    )
