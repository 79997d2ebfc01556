"""BigGAN end-to-end pipeline: build -> fingerprint -> attribute.

The reference's biggan path fingerprints the 128-d truncated-noise space
itself (src/PCA.py:76-84, src/generator.py:99-100).  Small random model;
this checks wiring + key recoverability, not visual quality.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.config import (
    AttributionConfig,
    FingerprintConfig,
    ModelConfig,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.fingerprint import (
    attribute as attr,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.fingerprint import (
    pipeline as pl,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.models import (
    biggan,
)

SMALL_BG = biggan.BigGANConfig(
    z_dim=16,
    class_embed_dim=8,
    channel_width=8,
    num_classes=10,
    output_dim=16,
    attention_layer_position=99,  # no attention for the test model
    layers=((False, 16, 16), (True, 16, 8), (True, 8, 4)),
    n_stats=3,
)
MCFG = ModelConfig(model="biggan", img_size=16, biggan_label="3")
FPCFG = FingerprintConfig(key_len=4, shift=12, sigma=0.2, n_pca_samples=500)


@pytest.fixture(scope="module")
def pipe():
    return pl.build_pipeline(
        jax.random.PRNGKey(0), MCFG, FPCFG, want_lpips=False,
        biggan_cfg=SMALL_BG, truncation=0.4,
    )


def test_biggan_pipeline_builds(pipe):
    assert pipe.basis.u_cap.shape == (12, 16)
    assert pipe.basis.v_cap.shape == (4, 16)
    assert pipe.class_onehot.shape == (1, SMALL_BG.num_classes)
    assert float(pipe.class_onehot[0, 3]) == 1.0


def test_biggan_generate_fingerprinted(pipe):
    imgs, w0, wx, bits, alpha = pl.generate_fingerprinted(pipe, jax.random.PRNGKey(1), 3)
    assert imgs.shape == (3, 16, 16, 3)
    assert bits.shape == (3, 4)
    re = pl.synthesize(pipe, wx)
    np.testing.assert_allclose(np.asarray(re), np.asarray(imgs), atol=1e-5)


def test_biggan_attribution_runs(pipe):
    acfg = AttributionConfig(steps=30, n_starts=2, lr=0.1, loss="mse")
    imgs, _, _, bits, _ = pl.generate_fingerprinted(pipe, jax.random.PRNGKey(2), 2)
    res = attr.attribute(
        pipe.gen_params, None, pipe.basis, pipe.noise, imgs,
        jax.random.PRNGKey(3), mcfg=MCFG, acfg=acfg,
        biggan_cfg=SMALL_BG, class_onehot=pipe.class_onehot,
        truncation=pipe.truncation,
    )
    assert res.key_bits.shape == (2, 4)
    assert np.isfinite(np.asarray(res.loss)).all()
