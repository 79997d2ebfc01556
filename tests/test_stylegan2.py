"""StyleGAN2 model tests.

The key correctness risk of the TPU re-design is the batched modulated-conv
formulation (scaling identity instead of per-sample grouped weights,
ref src/model.py:265-300) and the dilated-conv realization of the
transposed conv.  These tests check both against naive per-sample numpy
oracles that form the modulated weights explicitly.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.config import (
    ModelConfig,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.models import (
    stylegan2 as sg2,
)
from oracles import (
    conv_transpose2d_np,
    equal_linear_np,
    modulated_conv_np,
    upfirdn2d_np,
)

RNG = np.random.default_rng(42)


def _rand(*shape):
    return RNG.standard_normal(shape).astype(np.float32)


def test_pixel_norm():
    x = jnp.asarray(_rand(3, 16))
    y = sg2.pixel_norm(x)
    want = np.asarray(x) / np.sqrt(np.mean(np.asarray(x) ** 2, -1, keepdims=True) + 1e-8)
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-5)


@pytest.mark.parametrize("lr_mul,act", [(1.0, False), (0.01, True)])
def test_equal_linear_matches_oracle(lr_mul, act):
    w_torch = _rand(8, 16)  # [out, in] torch layout
    b = _rand(8)
    x = _rand(4, 16)
    p = {"weight": jnp.asarray(w_torch.T), "bias": jnp.asarray(b)}
    got = sg2.equal_linear(jnp.asarray(x), p, lr_mul=lr_mul, activation=act)
    want = equal_linear_np(x, w_torch, b, lr_mul=lr_mul, activation=act)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def _mk_modconv_params(cin, cout, k, style_dim, upsample=False):
    """Build params + the torch-layout weight for the oracle."""
    w_torch = _rand(cout, cin, k, k)  # [O, I, kh, kw]
    stored = np.transpose(w_torch, (2, 3, 1, 0))  # [kh, kw, I, O]
    if upsample:
        stored = stored[::-1, ::-1]  # pre-flipped storage convention
    mod_w_torch = _rand(cin, style_dim)
    mod_b = np.ones(cin, np.float32) + 0.1 * _rand(cin)
    p = {
        "weight": jnp.asarray(stored.copy()),
        "mod": {"weight": jnp.asarray(mod_w_torch.T), "bias": jnp.asarray(mod_b)},
    }
    return p, w_torch, mod_w_torch, mod_b


def test_modulated_conv_matches_per_sample_oracle():
    B, cin, cout, k, sd = 3, 6, 5, 3, 12
    p, w_torch, mw, mb = _mk_modconv_params(cin, cout, k, sd)
    x = _rand(B, 8, 8, cin)
    wl = _rand(B, sd)
    got = sg2.modulated_conv2d(jnp.asarray(x), jnp.asarray(wl), p)
    style = equal_linear_np(wl, mw, mb)  # [B, cin]
    scale = 1.0 / math.sqrt(cin * k * k)
    w_hwio = np.transpose(w_torch, (2, 3, 1, 0)) * scale
    want = modulated_conv_np(x, w_hwio, style, demodulate=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_modulated_conv_no_demod():
    B, cin, cout, k, sd = 2, 4, 3, 1, 8
    p, w_torch, mw, mb = _mk_modconv_params(cin, cout, k, sd)
    x = _rand(B, 5, 5, cin)
    wl = _rand(B, sd)
    got = sg2.modulated_conv2d(jnp.asarray(x), jnp.asarray(wl), p, demodulate=False)
    style = equal_linear_np(wl, mw, mb)
    scale = 1.0 / math.sqrt(cin * k * k)
    w_hwio = np.transpose(w_torch, (2, 3, 1, 0)) * scale
    want = modulated_conv_np(x, w_hwio, style, demodulate=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_modulated_conv_upsample_matches_conv_transpose_oracle():
    """Upsample path == per-sample demodulated conv_transpose2d + blur,
    ref src/model.py:269-282 + Blur pad (1,1) gain 4."""
    B, cin, cout, k, sd = 2, 4, 3, 3, 8
    p, w_torch, mw, mb = _mk_modconv_params(cin, cout, k, sd, upsample=True)
    x = _rand(B, 4, 4, cin)
    wl = _rand(B, sd)
    got = sg2.modulated_conv2d(
        jnp.asarray(x), jnp.asarray(wl), p, upsample=True
    )

    style = equal_linear_np(wl, mw, mb)
    scale = 1.0 / math.sqrt(cin * k * k)
    blur_k = np.outer([1, 3, 3, 1], [1, 3, 3, 1]).astype(np.float64)
    blur_k = blur_k / blur_k.sum() * 4.0
    outs = []
    for b in range(B):
        wmod = w_torch * scale * style[b][None, :, None, None]  # [O,I,k,k]
        d = 1.0 / np.sqrt(np.sum(wmod**2, axis=(1, 2, 3)) + 1e-8)
        wmod = wmod * d[:, None, None, None]
        # conv_transpose oracle wants [kh,kw,Cout,Cin]
        w_np = np.transpose(wmod, (2, 3, 0, 1))
        y = conv_transpose2d_np(x[b : b + 1], w_np, stride=2)
        y = upfirdn2d_np(y, blur_k, pad=((1, 1), (1, 1)))
        outs.append(y)
    want = np.concatenate(outs, 0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_polyphase_fused_upsample_equals_reference_path():
    """conv_transpose+blur folded into one dense conv (2x2 polyphase) must
    be numerically identical to the dilated-conv + upfirdn2d path."""
    B, cin, cout, sd = 2, 6, 5, 12
    p = {
        "weight": jnp.asarray(_rand(3, 3, cin, cout)),
        "mod": {
            "weight": jnp.asarray(_rand(sd, cin)),
            "bias": jnp.asarray(np.ones(cin, np.float32)),
        },
    }
    x = jnp.asarray(_rand(B, 8, 8, cin))
    wl = jnp.asarray(_rand(B, sd))
    for demod in (True, False):
        a = sg2.modulated_conv2d(x, wl, p, upsample=True, demodulate=demod, fused_upsample=False)
        b = sg2.modulated_conv2d(x, wl, p, upsample=True, demodulate=demod, fused_upsample=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_generator_forward_shapes_and_finiteness():
    cfg = ModelConfig(img_size=32)
    params = sg2.init_generator_params(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.style_dim))
    img, lat = sg2.generate(params, [z], cfg, fixed_noise=True, return_latents=True)
    assert img.shape == (2, 32, 32, 3)
    assert lat.shape == (2, sg2.n_latent(32), cfg.style_dim)
    assert np.isfinite(np.asarray(img)).all()


def test_generator_input_is_latent_and_jit():
    cfg = ModelConfig(img_size=16)
    params = sg2.init_generator_params(jax.random.PRNGKey(0), cfg)
    w = jax.random.normal(jax.random.PRNGKey(2), (3, cfg.style_dim))

    @jax.jit
    def f(p, w):
        img, _ = sg2.generate(p, [w], cfg, input_is_latent=True, fixed_noise=True)
        return img

    img = f(params, w)
    assert img.shape == (3, 16, 16, 3)
    # same w twice -> identical images (deterministic with fixed noise)
    img2 = f(params, w)
    np.testing.assert_array_equal(np.asarray(img), np.asarray(img2))


def test_style_mixing_inject_index():
    cfg = ModelConfig(img_size=32)
    params = sg2.init_generator_params(jax.random.PRNGKey(0), cfg)
    w1 = jax.random.normal(jax.random.PRNGKey(3), (1, cfg.style_dim))
    w2 = jax.random.normal(jax.random.PRNGKey(4), (1, cfg.style_dim))
    _, lat = sg2.generate(
        params, [w1, w2], cfg, input_is_latent=True, inject_index=3,
        fixed_noise=True, return_latents=True,
    )
    lat = np.asarray(lat)
    np.testing.assert_allclose(lat[:, :3], np.repeat(np.asarray(w1)[:, None], 3, 1))
    np.testing.assert_allclose(
        lat[:, 3:], np.repeat(np.asarray(w2)[:, None], sg2.n_latent(32) - 3, 1)
    )


def test_truncation_only_applies_to_z_inputs():
    """Reference quirk: truncation is inside `if not input_is_latent`
    (src/model.py:521-530)."""
    cfg = ModelConfig(img_size=16)
    params = sg2.init_generator_params(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(5), (1, cfg.style_dim))
    trunc_lat = sg2.mean_latent(params, jax.random.PRNGKey(6), 64, cfg)
    _, lat_full = sg2.generate(
        params, [z], cfg, truncation=1.0, fixed_noise=True, return_latents=True
    )
    _, lat_tr = sg2.generate(
        params, [z], cfg, truncation=0.5, truncation_latent=trunc_lat,
        fixed_noise=True, return_latents=True,
    )
    w_full = np.asarray(lat_full)[:, 0]
    w_tr = np.asarray(lat_tr)[:, 0]
    np.testing.assert_allclose(
        w_tr, np.asarray(trunc_lat) + 0.5 * (w_full - np.asarray(trunc_lat)),
        rtol=1e-5, atol=1e-6,
    )


def test_mapping_network_matches_stacked_oracle():
    cfg = ModelConfig(img_size=16, n_mlp=3)
    params = sg2.init_generator_params(jax.random.PRNGKey(7), cfg)
    z = _rand(2, cfg.style_dim)
    got = sg2.mapping_network(params, jnp.asarray(z), cfg.lr_mlp)
    x = z / np.sqrt(np.mean(z**2, -1, keepdims=True) + 1e-8)
    for layer in params["style"]:
        w_torch = np.asarray(layer["weight"]).T
        x = equal_linear_np(x, w_torch, np.asarray(layer["bias"]), lr_mul=cfg.lr_mlp, activation=True)
    np.testing.assert_allclose(np.asarray(got), x, rtol=2e-3, atol=1e-4)


def test_noise_shapes_match_reference_layout():
    # ref src/model.py:446-449: noise_l has res 2^((l+5)//2)
    shapes = sg2.noise_shapes(64)
    assert shapes[0] == (1, 4, 4, 1)
    assert shapes[1] == (1, 8, 8, 1) and shapes[2] == (1, 8, 8, 1)
    assert shapes[-1] == (1, 64, 64, 1)
    assert len(shapes) == sg2.num_noise_layers(64) == 9


def test_discriminator_forward():
    cfg = ModelConfig(img_size=32)
    params = sg2.init_discriminator_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    out = sg2.discriminator_apply(params, x, cfg)
    assert out.shape == (4, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_generator_grad_flows():
    cfg = ModelConfig(img_size=16)
    params = sg2.init_generator_params(jax.random.PRNGKey(0), cfg)
    w = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.style_dim))

    def loss(w):
        img, _ = sg2.generate(params, [w], cfg, input_is_latent=True, fixed_noise=True)
        return jnp.mean(img**2)

    g = jax.grad(loss)(w)
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).max() > 0


def test_generate_noise_modes():
    """Noise-mode contract per ref src/model.py:513-520: explicit list,
    buffers (randomize_noise=False), fresh-per-key (randomize_noise=True),
    or none."""
    import jax

    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.config import (
        ModelConfig,
    )
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.models import (
        stylegan2 as sg2,
    )

    cfg = ModelConfig(img_size=16, channel_max=32, n_mlp=2, style_dim=32)
    params = sg2.init_generator_params(jax.random.PRNGKey(0), cfg)
    # noise strength inits to 0 (ref NoiseInjection src/model.py:308-309);
    # make injection visible
    import jax.numpy as jnp

    params["conv1"] = dict(params["conv1"], noise_weight=jnp.ones(()))
    params["convs"] = tuple(
        dict(p, noise_weight=jnp.ones(())) for p in params["convs"]
    )
    w = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.style_dim))

    none_img, _ = sg2.generate(params, [w], cfg, input_is_latent=True)
    buf_img, _ = sg2.generate(params, [w], cfg, input_is_latent=True, fixed_noise=True)
    r1, _ = sg2.generate(
        params, [w], cfg, input_is_latent=True, noise_rng=jax.random.PRNGKey(2)
    )
    r1b, _ = sg2.generate(
        params, [w], cfg, input_is_latent=True, noise_rng=jax.random.PRNGKey(2)
    )
    r2, _ = sg2.generate(
        params, [w], cfg, input_is_latent=True, noise_rng=jax.random.PRNGKey(3)
    )
    import numpy as np

    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r1b))  # same key
    assert np.abs(np.asarray(r1) - np.asarray(r2)).max() > 1e-6  # fresh per key
    assert np.abs(np.asarray(r1) - np.asarray(none_img)).max() > 1e-6
    assert np.abs(np.asarray(buf_img) - np.asarray(none_img)).max() >= 0  # buffers init zero or random


class TestPackedTail:
    """The phase-packed tail blocks (enable_packed_tail) must be
    numerically identical to the default synthesis path --- same taps,
    same pad semantics, only the layout changes."""

    def _setup(self, img_size=32, channel_max=32, n_pack=1):
        cfg = ModelConfig(img_size=img_size, channel_max=channel_max,
                          n_mlp=2, style_dim=32)
        params = sg2.init_generator_params(jax.random.PRNGKey(0), cfg)
        # make noise injection + all biases active so every packed
        # epilogue term is exercised
        params["convs"] = tuple(
            dict(p, noise_weight=jnp.asarray(0.7)) for p in params["convs"]
        )
        nl = sg2.n_latent(cfg.img_size)
        w = jax.random.normal(jax.random.PRNGKey(1), (2, nl, cfg.style_dim))
        return cfg, params, w

    def _noise_for(self, cfg):
        # same construction as fingerprint.pipeline: one map per layer,
        # resolution doubling every 2 layers starting at 4
        shapes = []
        log = int(np.log2(cfg.img_size))
        for layer in range(2 * log - 2):
            res = 2 ** ((layer + 5) // 2)
            shapes.append((1, res, res, 1))
        return tuple(
            jax.random.normal(jax.random.PRNGKey(100 + i), s)
            for i, s in enumerate(shapes)
        )

    @pytest.mark.parametrize("n_pack", [1, 2])
    def test_forward_matches_default(self, n_pack):
        cfg, params, w = self._setup()
        noise = self._noise_for(cfg)
        try:
            sg2.enable_packed_tail(0)
            want = sg2.synthesis(params, w, noise)
            sg2.enable_packed_tail(n_pack)
            got = sg2.synthesis(params, w, noise)
        finally:
            sg2.enable_packed_tail(0)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=0, atol=2e-5
        )

    def test_grad_matches_default(self):
        cfg, params, w = self._setup()
        noise = self._noise_for(cfg)

        def loss(w):
            img = sg2.synthesis(params, w, noise)
            return jnp.mean(img ** 2)

        try:
            sg2.enable_packed_tail(0)
            g_want = np.asarray(jax.grad(loss)(w))
            sg2.enable_packed_tail(1)
            g_got = np.asarray(jax.grad(loss)(w))
        finally:
            sg2.enable_packed_tail(0)
        np.testing.assert_allclose(g_got, g_want, rtol=0, atol=3e-5)

    def test_channel_cap_leaves_wide_blocks_default(self):
        """Blocks wider than _PACKED_TAIL_MAX_CH must take the default
        path even inside the packed tail window (identical output is
        trivially true; assert the dispatch logic via a narrow cap)."""
        cfg, params, w = self._setup(channel_max=32)
        noise = self._noise_for(cfg)
        try:
            old = sg2._PACKED_TAIL_MAX_CH
            sg2._PACKED_TAIL_MAX_CH = 1  # nothing qualifies
            sg2.enable_packed_tail(2)
            got = sg2.synthesis(params, w, noise)
            sg2._PACKED_TAIL_MAX_CH = old
            sg2.enable_packed_tail(0)
            want = sg2.synthesis(params, w, noise)
        finally:
            sg2._PACKED_TAIL_MAX_CH = old
            sg2.enable_packed_tail(0)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_packed_output_host_unpack_matches_default(self):
        """enable_packed_output returns the final block's RGB phase-packed
        ([B, H/2, W/2, 12]); the host unpacker (utils.image.unpack_phases)
        must reproduce the default path's image exactly (same packed
        numerics as packed_tail, only the layout shuffle moves to host)."""
        from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.utils.image import (
            unpack_phases,
        )

        cfg, params, w = self._setup()
        noise = self._noise_for(cfg)
        try:
            sg2.enable_packed_tail(1)
            want = np.asarray(sg2.synthesis(params, w, noise))
            sg2.enable_packed_output(True)
            packed = np.asarray(sg2.synthesis(params, w, noise))
        finally:
            sg2.enable_packed_output(False)
            sg2.enable_packed_tail(0)
        s = cfg.img_size
        assert packed.shape == (2, s // 2, s // 2, 12), packed.shape
        np.testing.assert_array_equal(unpack_phases(packed), want)
        # without packed_tail the flag is inert: default fine-layout output
        try:
            sg2.enable_packed_output(True)
            plain = np.asarray(sg2.synthesis(params, w, noise))
        finally:
            sg2.enable_packed_output(False)
        assert plain.shape == (2, s, s, 3)

    def test_remat_packed(self):
        cfg, params, w = self._setup()
        noise = self._noise_for(cfg)

        def loss(w):
            img = sg2.synthesis(params, w, noise, remat=True)
            return jnp.mean(img ** 2)

        try:
            sg2.enable_packed_tail(1)
            g = np.asarray(jax.grad(loss)(w))
        finally:
            sg2.enable_packed_tail(0)
        assert np.isfinite(g).all() and np.abs(g).max() > 0
