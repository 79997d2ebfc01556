"""Cross-implementation parity against the ACTUAL reference PyTorch model.

Round-1 golden tests compared against self-written numpy oracles; this
module closes the loop by importing the reference implementation itself
(/root/reference/src/model.py) under CPU torch and asserting that, given
the same rosinality checkpoint, the two frameworks produce near-identical
mappings, images, and gradients.

The reference's op package JIT-compiles CUDA at import
(src/op/upfirdn2d.py:11-17, src/op/fused_act.py:11-17) but every op has a
complete pure-torch CPU fallback selected by device type
(src/op/upfirdn2d.py:158-163, src/op/fused_act.py:111-122), so stubbing
``torch.utils.cpp_extension.load`` is sufficient to run the whole model
on CPU.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.checkpoints.rosinality import (  # noqa: E402
    generator_params_from_state_dict,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.config import (  # noqa: E402
    ModelConfig,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.models import (  # noqa: E402
    stylegan2 as sg2,
)

REF_SRC = "/root/reference/src"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_SRC), reason="reference checkout not available"
)

SIZE = 64
CFG = ModelConfig(img_size=SIZE)


@pytest.fixture(scope="module")
def ref_model():
    """Import the reference model.py with the CUDA extension loader stubbed."""
    import torch.utils.cpp_extension as cppext

    orig_load = cppext.load
    cppext.load = lambda *a, **k: None  # ops route to CPU fallbacks by device
    sys.path.insert(0, REF_SRC)
    try:
        import importlib

        mod = importlib.import_module("model")
    finally:
        cppext.load = orig_load
    yield mod
    sys.path.remove(REF_SRC)


@pytest.fixture(scope="module")
def pair(ref_model):
    """(reference Generator, converted JAX pytree) sharing one random init."""
    torch.manual_seed(7)
    g = ref_model.Generator(SIZE, 512, 8, channel_multiplier=2)
    g.eval()
    sd = {k: np.asarray(v.detach().float().numpy()) for k, v in g.state_dict().items()}
    params = generator_params_from_state_dict(sd, CFG)
    return g, params


def _noise_lists(seed: int = 3):
    """Per-layer fixed noise as (torch NCHW list, jax NHWC list)."""
    rng = np.random.default_rng(seed)
    t_list, j_list = [], []
    for layer_idx in range(sg2.num_noise_layers(SIZE)):
        res = 2 ** ((layer_idx + 5) // 2)
        n = rng.standard_normal((1, 1, res, res)).astype(np.float32)
        t_list.append(torch.from_numpy(n))
        j_list.append(jnp.asarray(np.transpose(n, (0, 2, 3, 1))))
    return t_list, j_list


def _rel_close(ours: np.ndarray, ref: np.ndarray, tol: float):
    scale = max(float(np.abs(ref).max()), 1e-3)
    diff = float(np.abs(ours - ref).max())
    assert diff <= tol * scale, f"max|diff|={diff:.3e} vs scale {scale:.3e}"


def test_mapping_network_parity(pair):
    """Same z -> same w through the 8-layer mapping MLP (ref model.py:407-416)."""
    g, params = pair
    z = np.random.default_rng(0).standard_normal((4, 512)).astype(np.float32)
    with torch.no_grad():
        w_ref = g.style(torch.from_numpy(z)).numpy()
    w_ours = np.asarray(sg2.mapping_network(params, jnp.asarray(z), CFG.lr_mlp))
    _rel_close(w_ours, w_ref, 2e-5)


def test_synthesis_pixel_parity(pair):
    """Same w + same noise -> pixel-near-identical image (ref model.py:499-572)."""
    g, params = pair
    w = np.random.default_rng(1).standard_normal((2, 512)).astype(np.float32)
    t_noise, j_noise = _noise_lists()
    with torch.no_grad():
        img_ref, _ = g([torch.from_numpy(w)], input_is_latent=True, noise=t_noise)
    img_ref = img_ref.numpy().transpose(0, 2, 3, 1)
    img_ours, _ = sg2.generate(
        params, [jnp.asarray(w)], CFG, input_is_latent=True, noise=j_noise
    )
    assert img_ours.shape == img_ref.shape == (2, SIZE, SIZE, 3)
    _rel_close(np.asarray(img_ours), img_ref, 1e-4)


def test_full_forward_z_with_truncation_parity(pair):
    """z -> mapping -> truncation -> synthesis matches end to end
    (truncation path ref model.py:522-530)."""
    g, params = pair
    z = np.random.default_rng(2).standard_normal((2, 512)).astype(np.float32)
    trunc_lat = np.random.default_rng(22).standard_normal((1, 512)).astype(np.float32)
    t_noise, j_noise = _noise_lists()
    with torch.no_grad():
        img_ref, _ = g(
            [torch.from_numpy(z)],
            truncation=0.7,
            truncation_latent=torch.from_numpy(trunc_lat),
            noise=t_noise,
        )
    img_ref = img_ref.numpy().transpose(0, 2, 3, 1)
    img_ours, _ = sg2.generate(
        params,
        [jnp.asarray(z)],
        CFG,
        truncation=0.7,
        truncation_latent=jnp.asarray(trunc_lat),
        noise=j_noise,
    )
    _rel_close(np.asarray(img_ours), img_ref, 1e-4)


def test_style_mixing_parity(pair):
    """Two styles + inject_index mix identically (ref model.py:540-548)."""
    g, params = pair
    rng = np.random.default_rng(4)
    w1 = rng.standard_normal((1, 512)).astype(np.float32)
    w2 = rng.standard_normal((1, 512)).astype(np.float32)
    t_noise, j_noise = _noise_lists()
    with torch.no_grad():
        img_ref, _ = g(
            [torch.from_numpy(w1), torch.from_numpy(w2)],
            input_is_latent=True,
            inject_index=3,
            noise=t_noise,
        )
    img_ref = img_ref.numpy().transpose(0, 2, 3, 1)
    img_ours, _ = sg2.generate(
        params,
        [jnp.asarray(w1), jnp.asarray(w2)],
        CFG,
        input_is_latent=True,
        inject_index=3,
        noise=j_noise,
    )
    _rel_close(np.asarray(img_ours), img_ref, 1e-4)


def test_gradient_parity(pair):
    """d(mse(G(w), target))/dw matches the reference backward --- the
    quantity the attribution solver actually consumes (ref main.py:69)."""
    g, params = pair
    rng = np.random.default_rng(5)
    w = rng.standard_normal((1, 512)).astype(np.float32)
    target = rng.standard_normal((1, SIZE, SIZE, 3)).astype(np.float32)
    t_noise, j_noise = _noise_lists()

    w_t = torch.from_numpy(w).requires_grad_(True)
    img_t, _ = g([w_t], input_is_latent=True, noise=t_noise)
    loss_t = ((img_t.permute(0, 2, 3, 1) - torch.from_numpy(target)) ** 2).mean()
    loss_t.backward()
    grad_ref = w_t.grad.numpy()

    def loss_fn(w_j):
        img, _ = sg2.generate(params, [w_j], CFG, input_is_latent=True, noise=j_noise)
        return jnp.mean((img - jnp.asarray(target)) ** 2)

    grad_ours = np.asarray(jax.grad(loss_fn)(jnp.asarray(w)))
    _rel_close(grad_ours, grad_ref, 2e-4)


def test_upfirdn2d_op_parity(ref_model):
    """Our op vs the reference op package directly (CPU fallback path,
    src/op/upfirdn2d.py:168-209), over the configs synthesis uses."""
    sys.path.insert(0, REF_SRC)
    try:
        from op import upfirdn2d as ref_upfirdn2d
    finally:
        sys.path.remove(REF_SRC)
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.ops.upfirdn2d import (
        make_kernel,
        upfirdn2d_nchw,
    )

    rng = np.random.default_rng(6)
    k = make_kernel((1, 3, 3, 1))
    for up, down, pad in [(1, 1, (2, 1)), (2, 1, (2, 1)), (1, 2, (1, 1)), (2, 1, (3, 1))]:
        x = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
        ref = ref_upfirdn2d(
            torch.from_numpy(x), torch.from_numpy(np.asarray(k)), up=up, down=down, pad=pad
        ).numpy()
        ours = np.asarray(
            upfirdn2d_nchw(jnp.asarray(x), k, up=up, down=down, pad=pad)
        )
        np.testing.assert_allclose(ours, ref, atol=1e-6, rtol=1e-5)

    # randomized property sweep: arbitrary (up, down, pads, ksize incl.
    # non-separable), the reference op as the oracle
    for trial in range(25):
        trng = np.random.default_rng(100 + trial)
        up = int(trng.integers(1, 4))
        down = int(trng.integers(1, 4))
        kh, kw = int(trng.integers(1, 6)), int(trng.integers(1, 6))
        kern = trng.standard_normal((kh, kw)).astype(np.float32)
        h, w = int(trng.integers(4, 12)), int(trng.integers(4, 12))
        lim_h, lim_w = max(kh - h * up, 0), max(kw - w * up, 0)
        pad = (
            int(trng.integers(lim_w, 4)), int(trng.integers(0, 4)),
            int(trng.integers(lim_h, 4)), int(trng.integers(0, 4)),
        )
        x = trng.standard_normal((1, 3, h, w)).astype(np.float32)
        ref = ref_upfirdn2d(
            torch.from_numpy(x), torch.from_numpy(kern), up=up, down=down,
            pad=pad,
        ).numpy()
        ours = np.asarray(
            upfirdn2d_nchw(jnp.asarray(x), kern, up=up, down=down, pad=pad)
        )
        np.testing.assert_allclose(
            ours, ref, atol=1e-5, rtol=1e-4,
            err_msg=f"trial {trial}: up={up} down={down} k=({kh},{kw}) pad={pad}",
        )


def test_fused_leaky_relu_parity(ref_model):
    """Our fused bias+LeakyReLU vs the reference op (CPU fallback,
    src/op/fused_act.py:111-122), NCHW bias broadcast semantics."""
    sys.path.insert(0, REF_SRC)
    try:
        from op import fused_leaky_relu as ref_flrelu
    finally:
        sys.path.remove(REF_SRC)
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.ops.fused_act import (
        fused_leaky_relu,
    )

    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 5, 6, 6)).astype(np.float32)  # NCHW
    b = rng.standard_normal((5,)).astype(np.float32)
    ref = ref_flrelu(torch.from_numpy(x), torch.from_numpy(b)).numpy()
    # ours is NHWC-native (bias over the trailing channel axis)
    ours = np.asarray(
        fused_leaky_relu(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(b))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, atol=1e-6, rtol=1e-5)


def test_synthesis_pixel_parity_128px(ref_model):
    """Pixel parity at a second resolution (exercises one more upsample
    stage + the 128-res channel-map entry)."""
    cfg = ModelConfig(img_size=128)
    torch.manual_seed(11)
    g = ref_model.Generator(128, 512, 8, channel_multiplier=2)
    g.eval()
    sd = {k: np.asarray(v.detach().float().numpy()) for k, v in g.state_dict().items()}
    params = generator_params_from_state_dict(sd, cfg)

    rng = np.random.default_rng(12)
    w = rng.standard_normal((1, 512)).astype(np.float32)
    t_noise, j_noise = [], []
    for layer_idx in range(sg2.num_noise_layers(128)):
        res = 2 ** ((layer_idx + 5) // 2)
        n = rng.standard_normal((1, 1, res, res)).astype(np.float32)
        t_noise.append(torch.from_numpy(n))
        j_noise.append(jnp.asarray(np.transpose(n, (0, 2, 3, 1))))
    with torch.no_grad():
        img_ref, _ = g([torch.from_numpy(w)], input_is_latent=True, noise=t_noise)
    img_ref = img_ref.numpy().transpose(0, 2, 3, 1)
    img_ours, _ = sg2.generate(
        params, [jnp.asarray(w)], cfg, input_is_latent=True, noise=j_noise
    )
    assert img_ours.shape == (1, 128, 128, 3)
    _rel_close(np.asarray(img_ours), img_ref, 1e-4)
