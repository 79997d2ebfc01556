"""GAN training subsystem (training/) — CPU smoke + checkpoint roundtrip.

Beyond-parity subsystem: the reference has no training code (it loads
pretrained checkpoints only, ref src/PCA.py:40); these tests pin the
train step's semantics (losses finite, lazy R1 fires on schedule, EMA
interpolates, params actually move) and that the exported .npz loads
back through the standard rosinality checkpoint path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.config import (
    ModelConfig,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.training import (
    TrainConfig,
    init_train_state,
    make_train_step,
    sample_batch,
)

MCFG = ModelConfig(
    model="sg2", img_size=16, style_dim=32, n_mlp=2, channel_max=32, ckpt=None
)
TCFG = TrainConfig(batch=4, d_reg_every=2, ema_decay=0.9)


def test_sample_batch_shape_range_determinism():
    k = jax.random.PRNGKey(3)
    x = sample_batch(k, 4, 16)
    assert x.shape == (4, 16, 16, 3)
    xn = np.asarray(x)
    assert np.isfinite(xn).all()
    assert xn.min() >= -1.0 and xn.max() <= 1.0
    # deterministic in the key; distinct across batch elements
    np.testing.assert_array_equal(np.asarray(sample_batch(k, 4, 16)), xn)
    assert np.abs(xn[0] - xn[1]).max() > 1e-3


def test_sample_batch_lowdim_caps_intrinsic_dimension():
    """latent_dim=d caps the data manifold's intrinsic dimension: the
    pre-tanh factor population (tanh(P @ eps) inverted) is EXACTLY rank
    d, while the full draw's 35 factors are full-rank.  This is the
    property the spectrum study relies on (make spectrum)."""
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.training.data import (
        _FACTOR_DIM,
        _lowdim_factors,
    )

    k = jax.random.PRNGKey(7)
    d = 3
    z = np.asarray(
        jax.vmap(lambda kk: _lowdim_factors(kk, d))(jax.random.split(k, 64))
    )  # [64, 35]
    assert z.shape == (64, _FACTOR_DIM)
    assert np.abs(z).max() < 1.0
    pre = np.arctanh(z)  # = P @ eps, exactly rank d
    s = np.linalg.svd(pre, compute_uv=False)
    assert s[d - 1] > 1e-3 and s[d] < 1e-4 * s[0], s[: d + 2]

    # image-level API: shape/range/determinism, and sharp+lowdim rejects
    low = np.asarray(sample_batch(k, 4, 16, latent_dim=d))
    assert low.shape == (4, 16, 16, 3) and np.isfinite(low).all()
    assert low.min() >= -1.0 and low.max() <= 1.0
    assert np.abs(low[0] - low[1]).max() > 1e-3  # distinct across batch
    np.testing.assert_array_equal(
        np.asarray(sample_batch(k, 4, 16, latent_dim=d)), low
    )
    # lowdim is a different distribution from the full draw
    assert np.abs(low - np.asarray(sample_batch(k, 4, 16))).max() > 1e-3
    with pytest.raises(ValueError):
        sample_batch(k, 2, 16, sharp=True, latent_dim=4)


def test_train_step_smoke_and_ema():
    step = make_train_step(MCFG, TCFG)
    state = init_train_state(jax.random.PRNGKey(0), MCFG, TCFG)
    g0 = jax.tree.map(np.asarray, state.g_params)

    jstep = jax.jit(step)
    metrics_hist = []
    for i in range(3):
        state, metrics = jstep(state, jax.random.PRNGKey(100 + i))
        metrics_hist.append({k: float(v) for k, v in metrics.items()})

    assert int(state.step) == 3
    for m in metrics_hist:
        assert np.isfinite(m["d_loss"]) and np.isfinite(m["g_loss"])
    # lazy R1: fires when step % d_reg_every == 0 (steps 0 and 2)
    assert metrics_hist[0]["r1"] > 0.0
    assert metrics_hist[1]["r1"] == 0.0
    assert metrics_hist[2]["r1"] > 0.0

    # generator moved; EMA sits strictly between init and current
    w_new = np.asarray(state.g_params["conv1"]["weight"])
    w_old = np.asarray(g0["conv1"]["weight"])
    assert np.abs(w_new - w_old).max() > 0
    w_ema = np.asarray(state.g_ema["conv1"]["weight"])
    assert np.abs(w_ema - w_old).max() < np.abs(w_new - w_old).max() + 1e-12
    assert np.abs(w_ema - w_old).max() > 0


def test_export_npz_roundtrip(tmp_path):
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.checkpoints.rosinality import (
        generator_params_from_state_dict,
        generator_state_dict_from_params,
    )
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.models import (
        stylegan2 as sg2,
    )

    state = init_train_state(jax.random.PRNGKey(1), MCFG, TCFG)
    sd = generator_state_dict_from_params(jax.tree.map(np.asarray, state.g_ema))
    path = str(tmp_path / "ema.npz")
    np.savez(path, **sd)

    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.checkpoints.rosinality import (
        load_generator,
    )

    loaded = load_generator(path, MCFG)

    # bit-exact roundtrip through the rosinality name mapping
    flat_a = jax.tree_util.tree_leaves(state.g_ema)
    flat_b = jax.tree_util.tree_leaves(jax.tree.map(jnp.asarray, loaded))
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)

    # and the loaded params synthesize identically
    w = jax.random.normal(jax.random.PRNGKey(2), (2, MCFG.style_dim))
    img_a, _ = sg2.generate(state.g_ema, [w], MCFG, fixed_noise=True)
    img_b, _ = sg2.generate(jax.tree.map(jnp.asarray, loaded), [w], MCFG, fixed_noise=True)
    np.testing.assert_allclose(np.asarray(img_a), np.asarray(img_b), rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_tiny_training_stays_stable():
    """~60 scanned steps on CPU: no divergence (losses finite and inside
    the logistic GAN's sane band; EMA synthesis produces finite, varied
    images).  Directional quality claims are left to the TPU selftrain
    quality run (BASELINE.md) — at GAN equilibrium the adversarial
    losses are non-monotonic by design."""
    from jax import lax

    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.models import (
        stylegan2 as sg2,
    )

    step = make_train_step(MCFG, TCFG)
    state = init_train_state(jax.random.PRNGKey(5), MCFG, TCFG)

    @jax.jit
    def run(state, key):
        def body(s, j):
            return step(s, jax.random.fold_in(key, j))
        return lax.scan(body, state, jnp.arange(60))

    state, metrics = run(state, jax.random.PRNGKey(6))
    d = np.asarray(metrics["d_loss"])
    g = np.asarray(metrics["g_loss"])
    assert np.isfinite(d).all() and np.isfinite(g).all()
    assert 0.05 < d[-10:].mean() < 4.0
    assert 0.05 < g[-10:].mean() < 8.0
    w = jax.random.normal(jax.random.PRNGKey(7), (2, MCFG.style_dim))
    img, _ = sg2.generate(state.g_ema, [w], MCFG, fixed_noise=True)
    im = np.asarray(img)
    assert np.isfinite(im).all() and im.std() > 1e-3


def test_sample_batch_sharp_variant():
    """sharp=True adds high-frequency content (rectangles/stripes) on top
    of the same smooth base; both stay in range."""
    k = jax.random.PRNGKey(4)
    smooth = np.asarray(sample_batch(k, 2, 32))
    sharp = np.asarray(sample_batch(k, 2, 32, sharp=True))
    assert np.isfinite(sharp).all()
    assert sharp.min() >= -1.0 and sharp.max() <= 1.0
    assert np.abs(sharp - smooth).max() > 1e-3  # the extra content exists

    def hf_energy(x):  # mean squared horizontal pixel diff = high-freq proxy
        return float(np.mean((x[:, :, 1:] - x[:, :, :-1]) ** 2))

    assert hf_energy(sharp) > hf_energy(smooth)
