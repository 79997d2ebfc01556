"""Attack transform tests: blur vs naive oracle, noise statistics, JPEG
spectral behavior + DCT round-trip identity, combination wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.attacks import (
    apply_attack,
    make_attack,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.attacks.blur import (
    gaussian_blur,
    gaussian_kernel_1d,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.attacks.diffjpeg import (
    _blocks,
    _dct8x8,
    _idct8x8,
    _merge,
    diff_round,
    jpeg_attack,
    jpeg_compress_decompress,
    quality_to_factor,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.attacks.noise import (
    gaussian_noise,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.config import (
    AttackConfig,
)


def _img(key=0, b=1, s=32):
    return jax.random.uniform(jax.random.PRNGKey(key), (b, s, s, 3)) * 2 - 1


# ------------------------------------------------------------------ blur


def test_gaussian_kernel_normalized():
    k = np.asarray(gaussian_kernel_1d(25, 0.5))
    assert k.shape == (25,)
    np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)
    assert k[12] == k.max()  # centered


def test_blur_matches_naive_reflect_conv():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 12, 12, 2)).astype(np.float32)
    size, sigma = 5, 1.2
    got = np.asarray(gaussian_blur(jnp.asarray(x), sigma=sigma, size=size))

    k = np.asarray(gaussian_kernel_1d(size, sigma), np.float64)
    pad = size // 2
    xp = np.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    want = np.zeros_like(x, np.float64)
    for i in range(12):
        for j in range(12):
            patch = xp[:, i : i + size, j : j + size, :]
            want[:, i, j, :] = np.einsum("bhwc,h,w->bc", patch, k, k)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_blur_preserves_constant_image():
    x = jnp.full((1, 16, 16, 3), 0.37)
    y = gaussian_blur(x, sigma=0.5, size=25)
    np.testing.assert_allclose(np.asarray(y), 0.37, rtol=1e-5)


# ------------------------------------------------------------------ noise


def test_noise_statistics_and_clamp():
    x = jnp.zeros((1, 64, 64, 3))
    y = np.asarray(gaussian_noise(x, jax.random.PRNGKey(0), std=0.1))
    assert abs(y.mean()) < 0.01
    assert abs(y.std() - 0.1) < 0.01
    big = np.asarray(gaussian_noise(jnp.ones((1, 8, 8, 3)), jax.random.PRNGKey(1), std=5.0))
    assert big.max() <= 1.0 and big.min() >= -1.0


# ------------------------------------------------------------------ jpeg


def test_quality_to_factor():
    assert quality_to_factor(50) == pytest.approx(1.0)
    assert quality_to_factor(80) == pytest.approx(0.4)
    assert quality_to_factor(25) == pytest.approx(2.0)


def test_diff_round_near_round_and_differentiable():
    x = jnp.asarray([0.1, 0.5, 0.9, 1.49])
    r = np.asarray(diff_round(x))
    # round-half-to-even (matching torch.round): round(0.5) == 0
    np.testing.assert_allclose(r, [0.001, 0.125, 0.999, 1.117649], atol=1e-4)
    g = jax.grad(lambda v: jnp.sum(diff_round(v)))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_dct_idct_roundtrip_identity():
    rng = np.random.default_rng(2)
    x = rng.uniform(0, 255, (1, 4, 8, 8)).astype(np.float32)
    y = np.asarray(_idct8x8(_dct8x8(jnp.asarray(x))))
    np.testing.assert_allclose(y, x, rtol=1e-3, atol=1e-2)


def test_block_split_merge_roundtrip():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 16, 24)).astype(np.float32)
    b = _blocks(jnp.asarray(x))
    assert b.shape == (2, (16 // 8) * (24 // 8), 8, 8)
    y = np.asarray(_merge(b, 16, 24))
    np.testing.assert_array_equal(y, x)


def test_jpeg_roundtrip_reduces_high_freq_keeps_low():
    # smooth gradient survives, checkerboard is destroyed at low quality
    s = 32
    yy, xx = np.mgrid[0:s, 0:s]
    smooth = (xx / s).astype(np.float32)
    checker = ((xx + yy) % 2).astype(np.float32)
    img = jnp.stack(
        [jnp.asarray(np.stack([smooth] * 3, -1)), jnp.asarray(np.stack([checker] * 3, -1))]
    )
    out = np.asarray(jpeg_compress_decompress(img, quality=10, differentiable=False))
    err_smooth = np.abs(out[0] - np.asarray(img[0])).mean()
    err_checker = np.abs(out[1] - np.asarray(img[1])).mean()
    assert err_smooth < 0.05
    assert err_checker > 0.03 and err_checker > 2 * err_smooth


def test_jpeg_high_quality_near_identity_on_smooth():
    x01 = (jnp.asarray(_img(4, s=32)) + 1) / 2
    x01 = jnp.asarray(gaussian_blur(x01 * 2 - 1, sigma=2.0, size=9) + 1) / 2
    out = np.asarray(jpeg_compress_decompress(x01, quality=95, differentiable=False))
    assert np.abs(out - np.asarray(x01)).mean() < 0.02


def test_jpeg_attack_range_and_grad():
    x = _img(5, s=16)
    y = jpeg_attack(x, quality=50, differentiable=False)
    arr = np.asarray(y)
    assert arr.min() >= -1.0 - 1e-5 and arr.max() <= 1.0 + 1e-5
    g = jax.grad(lambda a: jnp.sum(jpeg_attack(a, quality=50, differentiable=True)))(x)
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).max() > 0


# ---------------------------------------------------------- initializer


def test_make_attack_none_is_identity():
    atk = make_attack(AttackConfig(augmentation="None"))
    x = _img(6)
    np.testing.assert_array_equal(np.asarray(apply_attack(atk, x)), np.asarray(x))


def test_crop_attack():
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.attacks.crop import (
        center_crop,
        random_crop,
    )

    x = _img(20, s=32)
    y = center_crop(x, ratio=0.75)
    assert y.shape == x.shape
    assert np.abs(np.asarray(y) - np.asarray(x)).max() > 1e-3  # zoomed in
    # ratio 1.0 -> identity
    np.testing.assert_allclose(
        np.asarray(center_crop(x, ratio=1.0)), np.asarray(x), atol=1e-6
    )
    # random crop is jit-safe and differentiable
    f = jax.jit(lambda a, r: random_crop(a, r, 0.75))
    y2 = f(x, jax.random.PRNGKey(0))
    assert y2.shape == x.shape
    g = jax.grad(lambda a: jnp.sum(center_crop(a, 0.75) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.parametrize("name", ["Noise", "Blur", "Jpeg", "Crop", "Combination"])
def test_make_attack_eval_modes_run(name):
    cfg = AttackConfig(augmentation=name, blur_filter_size=25)
    atk = make_attack(cfg, is_train=False)
    x = _img(7, s=32)
    y = apply_attack(atk, x, jax.random.PRNGKey(0))
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
    # eval attacks must actually modify the image
    assert np.abs(np.asarray(y) - np.asarray(x)).max() > 1e-4


def test_combination_eval_applies_all():
    """Eval threshold is 0 (ref Combination.py:16) => every sub-attack runs;
    result must differ from any single attack alone."""
    cfg = AttackConfig(augmentation="Combination")
    comb = make_attack(cfg, is_train=False)
    x = _img(8, s=32)
    y = np.asarray(apply_attack(comb, x, jax.random.PRNGKey(1)))
    blur_only = np.asarray(apply_attack(make_attack(AttackConfig(augmentation="Blur")), x))
    assert np.abs(y - blur_only).max() > 1e-3


def test_unknown_attack_raises():
    with pytest.raises(ValueError, match="Not available"):
        make_attack(AttackConfig(augmentation="Rotate"))
