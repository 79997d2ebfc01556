"""BigGAN-deep generator tests (small config; the real 256px config only
differs in widths/depth)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.models import (
    biggan,
)

SMALL = biggan.BigGANConfig(
    z_dim=16,
    class_embed_dim=16,
    channel_width=8,
    num_classes=10,
    output_dim=16,
    attention_layer_position=2,
    layers=(
        (False, 16, 16),
        (True, 16, 8),
        (True, 8, 4),  # attention before this layer (position 2)
    ),
    n_stats=5,
)


@pytest.fixture(scope="module")
def params():
    return biggan.init_biggan_params(jax.random.PRNGKey(0), SMALL)


def test_forward_shape_and_range(params):
    z = biggan.truncated_noise(jax.random.PRNGKey(1), 2, 0.4, SMALL.z_dim)
    onehot = jnp.asarray(biggan.one_hot_from_int(3, SMALL.num_classes, 2))
    img = biggan.generate(params, z, onehot, truncation=0.4, cfg=SMALL)
    assert img.shape == (2, 16, 16, 3)
    arr = np.asarray(img)
    assert arr.min() >= -1.0 and arr.max() <= 1.0
    assert np.isfinite(arr).all()


def test_truncated_noise_bounds():
    z = np.asarray(biggan.truncated_noise(jax.random.PRNGKey(2), 1000, 0.4, 16))
    assert np.abs(z).max() <= 0.8 + 1e-5  # |truncnorm(-2,2)| * 0.4
    assert z.std() > 0.1


def test_one_hot_helpers():
    oh = biggan.one_hot_from_name("golden retriever", batch_size=2)
    assert oh.shape == (2, 1000)
    assert (oh[:, 207] == 1).all() and oh.sum() == 2
    with pytest.raises(ValueError, match="unknown label"):
        biggan.one_hot_from_name("definitely not a class")


def test_stats_interpolation_endpoints():
    stats = jnp.asarray(np.stack([np.full(3, i, np.float32) for i in range(5)]))
    np.testing.assert_allclose(np.asarray(biggan._interp_stats(stats, 0.0, 5)), 0.0)
    np.testing.assert_allclose(np.asarray(biggan._interp_stats(stats, 1.0, 5)), 4.0)
    np.testing.assert_allclose(
        np.asarray(biggan._interp_stats(stats, 0.5, 5)), 2.0
    )  # midpoint
    np.testing.assert_allclose(
        np.asarray(biggan._interp_stats(stats, 0.375, 5)), 1.5
    )  # between stats 1 and 2
    # Asymmetric point pins the pytorch_pretrained_biggan quirk: the
    # package blends stats[start]*coef + stats[start+1]*(1-coef), i.e.
    # the NEARER gridpoint gets the SMALLER weight.  pos=1.25 ->
    # 1*0.25 + 2*0.75 = 1.75 (a standard lerp would give 1.25).
    np.testing.assert_allclose(
        np.asarray(biggan._interp_stats(stats, 0.3125, 5)), 1.75
    )


def test_truncation_changes_output(params):
    """Truncation interpolates the stored running stats; random init keeps
    identical stats per slot, so install varying stats first."""
    p = dict(params)
    bn = dict(p["bn_out"])
    c = bn["running_means"].shape[1]
    bn["running_means"] = jnp.asarray(
        np.linspace(0, 1, SMALL.n_stats)[:, None] * np.ones((1, c), np.float32)
    )
    p["bn_out"] = bn
    z = biggan.truncated_noise(jax.random.PRNGKey(3), 1, 0.4, SMALL.z_dim)
    onehot = jnp.asarray(biggan.one_hot_from_int(0, SMALL.num_classes, 1))
    a = biggan.generate(p, z, onehot, truncation=0.2, cfg=SMALL)
    b = biggan.generate(p, z, onehot, truncation=0.9, cfg=SMALL)
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6


def test_class_conditioning_changes_output(params):
    z = biggan.truncated_noise(jax.random.PRNGKey(4), 1, 0.4, SMALL.z_dim)
    a = biggan.generate(params, z, jnp.asarray(biggan.one_hot_from_int(0, 10, 1)), 0.4, SMALL)
    b = biggan.generate(params, z, jnp.asarray(biggan.one_hot_from_int(7, 10, 1)), 0.4, SMALL)
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-5


def test_grad_flows_to_z(params):
    onehot = jnp.asarray(biggan.one_hot_from_int(1, SMALL.num_classes, 1))

    def loss(z):
        img = biggan.generate(params, z, onehot, 0.4, SMALL)
        return jnp.mean(img**2)

    z = biggan.truncated_noise(jax.random.PRNGKey(5), 1, 0.4, SMALL.z_dim)
    g = jax.grad(loss)(z)
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).max() > 0


def test_spectral_norm_folding_and_conversion():
    """Converter folds weight_orig/u into the effective SN weight and maps
    names; build a synthetic state dict for a 1-layer config."""
    cfg = biggan.BigGANConfig(
        z_dim=4, class_embed_dim=4, channel_width=4, num_classes=6,
        output_dim=8, attention_layer_position=99, layers=((True, 16, 16),),
        n_stats=3,
    )
    rng = np.random.default_rng(0)
    ch = cfg.channel_width
    sd = {}

    def sn_linear(prefix, cin, cout):
        w = rng.standard_normal((cout, cin)).astype(np.float32)
        u = rng.standard_normal(cout).astype(np.float32)
        sd[f"{prefix}.weight_orig"] = w
        sd[f"{prefix}.weight_u"] = u
        sd[f"{prefix}.bias"] = rng.standard_normal(cout).astype(np.float32)
        return w, u

    def sn_conv(prefix, cin, cout, k):
        w = rng.standard_normal((cout, cin, k, k)).astype(np.float32)
        u = rng.standard_normal(cout).astype(np.float32)
        sd[f"{prefix}.weight_orig"] = w
        sd[f"{prefix}.weight_u"] = u
        sd[f"{prefix}.bias"] = rng.standard_normal(cout).astype(np.float32)

    def bn(prefix, c, conditional=True):
        sd[f"{prefix}.running_means"] = rng.standard_normal((cfg.n_stats, c)).astype(np.float32)
        sd[f"{prefix}.running_vars"] = np.abs(rng.standard_normal((cfg.n_stats, c))).astype(np.float32) + 0.5
        if conditional:
            sd[f"{prefix}.scale.weight_orig"] = rng.standard_normal((c, cfg.cond_dim)).astype(np.float32)
            sd[f"{prefix}.scale.weight_u"] = rng.standard_normal(c).astype(np.float32)
            sd[f"{prefix}.offset.weight_orig"] = rng.standard_normal((c, cfg.cond_dim)).astype(np.float32)
            sd[f"{prefix}.offset.weight_u"] = rng.standard_normal(c).astype(np.float32)
        else:
            sd[f"{prefix}.weight"] = np.ones(c, np.float32)
            sd[f"{prefix}.bias"] = np.zeros(c, np.float32)

    w_emb, u_emb = sn_linear("embeddings", cfg.num_classes, cfg.class_embed_dim)
    sd.pop("embeddings.bias")
    sn_linear("generator.gen_z", cfg.cond_dim, 4 * 4 * 16 * ch)
    cin, cout, mid = 16 * ch, 16 * ch, (16 * ch) // 4
    bn("generator.layers.0.bn_0", cin)
    sn_conv("generator.layers.0.conv_0", cin, mid, 1)
    bn("generator.layers.0.bn_1", mid)
    sn_conv("generator.layers.0.conv_1", mid, mid, 3)
    bn("generator.layers.0.bn_2", mid)
    sn_conv("generator.layers.0.conv_2", mid, mid, 3)
    bn("generator.layers.0.bn_3", mid)
    sn_conv("generator.layers.0.conv_3", mid, cout, 1)
    bn("generator.bn", ch * 16, conditional=False)
    sn_conv("generator.conv_to_rgb", ch * 16, ch * 16, 3)

    params = biggan.params_from_torch_state_dict(sd, cfg)

    # SN folding: sigma = u^T W v with v = W^T u / |W^T u|
    wm = w_emb.reshape(w_emb.shape[0], -1)
    v = wm.T @ u_emb
    v /= np.linalg.norm(v)
    sigma = u_emb @ (wm @ v)
    np.testing.assert_allclose(
        np.asarray(params["embeddings"]), (w_emb / sigma).T, rtol=1e-5
    )
    # rgb slice quirk: only 3 output channels kept
    assert params["conv_out"]["w"].shape[-1] == 3
    # converted generator runs
    z = biggan.truncated_noise(jax.random.PRNGKey(6), 1, 0.4, cfg.z_dim)
    onehot = jnp.asarray(biggan.one_hot_from_int(2, cfg.num_classes, 1))
    img = biggan.generate(jax.tree.map(jnp.asarray, params), z, onehot, 0.4, cfg)
    assert img.shape == (1, 8, 8, 3)
