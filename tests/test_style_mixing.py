"""Style-mixing pipeline helper (ref GetGen.style_mixing, src/generator.py:92-95)."""

import jax
import numpy as np
import pytest

from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.config import (
    FingerprintConfig,
    ModelConfig,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.fingerprint import (
    pipeline as pl,
)

MCFG = ModelConfig(img_size=16, channel_max=32, n_mlp=2, style_dim=32)
FPCFG = FingerprintConfig(key_len=4, shift=28, n_pca_samples=300)


@pytest.fixture(scope="module")
def pipe():
    return pl.build_pipeline(jax.random.PRNGKey(0), MCFG, FPCFG, want_lpips=False)


def test_synthesize_mixed(pipe):
    _, w0, wx, _, _ = pl.generate_fingerprinted(pipe, jax.random.PRNGKey(1), 2)
    mixed = pl.synthesize_mixed(pipe, w0, wx)
    plain_w0 = pl.synthesize(pipe, w0)
    plain_wx = pl.synthesize(pipe, wx)
    assert mixed.shape == plain_w0.shape
    d0 = np.abs(np.asarray(mixed) - np.asarray(plain_w0)).max()
    dx = np.abs(np.asarray(mixed) - np.asarray(plain_wx)).max()
    assert d0 > 1e-4 and dx > 1e-4  # genuinely a mixture
    # the default matches the reference's inject_index = num_block - 1
    # = n_latent - 1 (src/generator.py:45,95): only the LAST style slot
    # carries the fingerprinted latent
    explicit = pl.synthesize_mixed(
        pipe, w0, wx, inject_index=MCFG.n_latent - 1
    )
    np.testing.assert_allclose(np.asarray(mixed), np.asarray(explicit))
    # inject at the last slot == almost entirely content style
    almost = pl.synthesize_mixed(pipe, w0, wx, inject_index=MCFG.n_latent)
    np.testing.assert_allclose(np.asarray(almost), np.asarray(plain_w0), atol=1e-5)


def test_synthesize_mixed_biggan_rejected(pipe):
    import jax.numpy as jnp

    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.fingerprint.pipeline import (
        Pipeline,
    )
    import dataclasses

    bg_pipe = dataclasses.replace(pipe, mcfg=ModelConfig(model="biggan", img_size=16))
    with pytest.raises(ValueError, match="sg2"):
        pl.synthesize_mixed(bg_pipe, jnp.zeros((1, 32)), jnp.zeros((1, 32)))
