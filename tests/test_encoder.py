"""Amortized-encoder initializer (fingerprint/encoder.py).

The encoder has no reference counterpart (the reference solves from
random init only, /root/reference/src/main.py:45-89); these tests cover
the subsystem's own contract: shapes, training progress on the tiny
generator, init-array semantics, and the encoder-initialized solve
matching-or-beating the blind-LHS solve on the small invertible config.
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
    encoder as enc,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.fingerprint import (
    pipeline as pl,
)

MCFG = ModelConfig(img_size=32, channel_max=64, n_mlp=3, style_dim=64)
FPCFG = FingerprintConfig(
    key_len=8, shift=56, sigma=1.0, sd_moved=1.0, n_pca_samples=2000
)
# 1-core CPU budget: 400 Adam updates at batch 16 keep the module near
# ~10 min; the random-init tiny generator gives a weak but above-chance
# signal (real encoder quality is measured on TPU with trained
# generators, `make encoderinit`)
ECFG = enc.EncoderConfig(width=32, max_width=64, head_dim=64, steps=400, batch=16)


@pytest.fixture(scope="module")
def pipe():
    return pl.build_pipeline(jax.random.PRNGKey(0), MCFG, FPCFG, want_lpips=False)


@pytest.fixture(scope="module")
def trained(pipe):
    params, curve = enc.train_encoder(
        jax.random.PRNGKey(3), pipe.gen_params, pipe.basis, pipe.noise,
        mcfg=MCFG, ecfg=ECFG,
    )
    return params, np.asarray(curve)


def test_apply_shapes(pipe):
    params = enc.init_encoder(jax.random.PRNGKey(0), 32, 56, 8, ECFG)
    imgs = jnp.zeros((5, 32, 32, 3))
    a, k = enc.apply_encoder(params, imgs)
    assert a.shape == (5, 56)
    assert k.shape == (5, 8)


def test_training_reduces_loss(trained):
    _, curve = trained
    assert curve.shape == (400,)
    assert np.isfinite(curve).all()
    # supervised regression on an infinite self-generated dataset: the
    # loss (evaluated on each step's FRESH pre-update batch, so this is
    # held-out) must improve on the untrained head.  The tiny random-init
    # generator caps how far it can drop — the strong check is
    # test_encoder_decodes_bits_above_chance.
    assert curve[-20:].mean() < curve[:10].mean() - 0.05


def test_encoder_decodes_bits_above_chance(pipe, trained):
    params, _ = trained
    imgs, _, _, bits, _ = pl.generate_fingerprinted(
        pipe, jax.random.PRNGKey(11), 8
    )
    acc = np.asarray(enc.encoder_bit_accuracy(params, imgs, bits))
    assert acc.shape == (8,)
    assert acc.mean() > 0.55  # tiny net, tiny budget: above chance


def test_solve_init_shapes_and_center(pipe, trained):
    params, _ = trained
    imgs, _, _, _, _ = pl.generate_fingerprinted(pipe, jax.random.PRNGKey(12), 3)
    a0, k0 = enc.encoder_solve_init(
        params, pipe.basis, imgs, 4, jax.random.PRNGKey(13), jitter=0.25
    )
    assert a0.shape == (3, 4, 56)
    assert k0.shape == (3, 4, 8)
    # restart 0 is exactly the encoder's prediction
    a_white, k_logits = enc.apply_encoder(params, imgs)
    np.testing.assert_allclose(
        np.asarray(a0[:, 0]),
        np.asarray(a_white * pipe.basis.sigma_rest),
        rtol=1e-5, atol=1e-5,
    )
    assert np.abs(np.asarray(k0)).max() <= 2.0 + 1e-6
    # the cloud is centered on the prediction and bounded by the jitter
    dev = np.asarray(a0 - a0[:, :1])
    bound = 0.25 * np.asarray(pipe.basis.sigma_rest)
    assert (np.abs(dev) <= bound[None, None] + 1e-6).all()


def test_encoder_init_solve_matches_or_beats_lhs(pipe, trained):
    params, _ = trained
    acfg = AttributionConfig(steps=150, n_starts=4, lr=0.2, loss="mse")
    imgs, _, _, bits, _ = pl.generate_fingerprinted(
        pipe, jax.random.PRNGKey(21), 3
    )
    a0, k0 = enc.encoder_solve_init(
        params, pipe.basis, imgs, 4, jax.random.PRNGKey(22)
    )
    res_enc = attr.attribute(
        pipe.gen_params, None, pipe.basis, pipe.noise, imgs,
        jax.random.PRNGKey(23), mcfg=MCFG, acfg=acfg,
        alpha_init=a0, key_init=k0,
    )
    res_lhs = attr.attribute(
        pipe.gen_params, None, pipe.basis, pipe.noise, imgs,
        jax.random.PRNGKey(23), mcfg=MCFG, acfg=acfg,
    )
    ev_enc = attr.evaluate_attribution(res_enc, bits)
    ev_lhs = attr.evaluate_attribution(res_lhs, bits)
    # warm start must not hurt at matched budget on the easy config, and
    # the final losses should be no worse on average
    assert float(ev_enc["mean_bit_acc"]) >= float(ev_lhs["mean_bit_acc"]) - 1e-6
    assert float(np.asarray(res_enc.loss).mean()) <= float(
        np.asarray(res_lhs.loss).mean()
    ) * 1.5


def test_chunked_solve_slices_init_arrays(pipe, trained):
    """attribute_chunked must give each restart chunk its slice of the
    init arrays — results identical to the unchunked encoder-init solve."""
    params, _ = trained
    acfg = AttributionConfig(steps=60, n_starts=4, lr=0.2, loss="mse")
    imgs, _, _, _, _ = pl.generate_fingerprinted(pipe, jax.random.PRNGKey(31), 2)
    a0, k0 = enc.encoder_solve_init(
        params, pipe.basis, imgs, 4, jax.random.PRNGKey(32)
    )
    full = attr.attribute(
        pipe.gen_params, None, pipe.basis, pipe.noise, imgs,
        jax.random.PRNGKey(33), mcfg=MCFG, acfg=acfg,
        alpha_init=a0, key_init=k0,
    )
    chunked = attr.attribute_chunked(
        pipe.gen_params, None, pipe.basis, pipe.noise, imgs,
        jax.random.PRNGKey(33), mcfg=MCFG, acfg=acfg,
        chunk_starts=2, alpha_init=a0, key_init=k0,
    )
    np.testing.assert_allclose(
        np.asarray(full.loss), np.asarray(chunked.loss), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(full.key_bits), np.asarray(chunked.key_bits)
    )


def test_attack_channel_training_compiles(pipe):
    """Channel-trained encoder (deployment mode for attacked targets)."""
    params, curve = enc.train_encoder(
        jax.random.PRNGKey(5), pipe.gen_params, pipe.basis, pipe.noise,
        mcfg=MCFG,
        ecfg=enc.EncoderConfig(width=32, max_width=64, head_dim=64,
                               steps=10, batch=8),
        attack="Blur",
    )
    assert np.isfinite(np.asarray(curve)).all()


def test_chunked_training_is_chunk_size_invariant(pipe, monkeypatch):
    """The host loop over jitted scan segments is bit-identical to a
    single scan: same key sequence, same op order --- the chunk size is
    purely an execution-envelope knob (a 6000-step single scan crashed
    the TPU worker; see _TRAIN_CHUNK)."""
    small = enc.EncoderConfig(width=16, max_width=16, head_dim=16,
                              steps=10, batch=4)

    def run(chunk):
        monkeypatch.setattr(enc, "_TRAIN_CHUNK", chunk)
        return enc.train_encoder(
            jax.random.PRNGKey(5), pipe.gen_params, pipe.basis, pipe.noise,
            mcfg=MCFG, ecfg=small,
        )

    p_one, c_one = run(16)   # single segment covers all 10 steps
    p_4, c_4 = run(4)        # 4 + 4 + 2
    np.testing.assert_array_equal(np.asarray(c_one), np.asarray(c_4))
    for a, b in zip(jax.tree.leaves(p_one), jax.tree.leaves(p_4)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
