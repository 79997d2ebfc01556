"""Pallas VGG conv3x3+ReLU kernel vs the XLA oracle (interpret mode on CPU).

The kernel (ops/vgg_pallas.py) accelerates the LPIPS backbone's square
3x3 convs (reference runs these through stock cuDNN,
/root/reference/src/custom_lpips/pretrained_networks.py:121-135); its
functional spec is ``relu(conv2d(x, w, stride 1, pad 1) + b)``.
"""

import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.ops import (
    vgg_pallas as vp,
)

lpips_mod = importlib.import_module(
    "attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.losses.lpips"
)

RNG = np.random.default_rng(11)


def _case(n, h, w, c, dtype=np.float32):
    x = jnp.asarray(RNG.standard_normal((n, h, w, c)).astype(dtype))
    wgt = jnp.asarray(
        (RNG.standard_normal((3, 3, c, c)) / (3.0 * np.sqrt(c))).astype(dtype)
    )
    b = jnp.asarray(RNG.standard_normal((c,)).astype(np.float32))
    return x, wgt, b


@pytest.mark.parametrize(
    "shape",
    [
        (1, 16, 16, 64),   # paired-tap C=64 path
        (2, 8, 16, 128),   # 9-pass path
        (1, 24, 8, 64),    # multi-row-tile geometry (th divides h)
    ],
)
def test_conv3x3_relu_matches_xla(shape):
    x, w, b = _case(*shape)
    with pltpu.force_tpu_interpret_mode():
        got = vp.conv3x3_relu(x, w, b)
    want = vp.conv3x3_relu_reference(x, w, b)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )


def test_conv3x3_relu_grads_match_xla():
    """dx, dw, db must all match the XLA conv's VJP (the weight/bias
    cotangents come from the XLA linearization inside vp._bwd; they are
    dead-code-eliminated on frozen-backbone hot paths but must be CORRECT
    whenever someone differentiates through backbone weights)."""
    x, w, b = _case(1, 16, 16, 64)

    def loss(fn, a, ww, bb):
        return jnp.sum(fn(a, ww, bb) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g, gw, gb = jax.grad(lambda a, ww, bb: loss(vp.conv3x3_relu, a, ww, bb),
                             argnums=(0, 1, 2))(x, w, b)
    g_ref, gw_ref, gb_ref = jax.grad(
        lambda a, ww, bb: loss(vp.conv3x3_relu_reference, a, ww, bb),
        argnums=(0, 1, 2),
    )(x, w, b)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g_ref), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(gw), np.asarray(gw_ref), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(gb), np.asarray(gb_ref), rtol=1e-3, atol=1e-4
    )


def test_conv3x3_relu_bf16():
    x, w, b = _case(1, 16, 16, 64, dtype=jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        got = vp.conv3x3_relu(x, w, b)
    want = vp.conv3x3_relu_reference(x, w, b)
    g32 = np.asarray(got, np.float32)
    w32 = np.asarray(want, np.float32)
    scale = max(np.abs(w32).max(), 1e-6)
    assert np.abs(g32 - w32).max() / scale < 0.03


def test_eligibility_gate():
    assert vp.eligible((1, 16, 16, 64), (3, 3, 64, 64))
    assert vp.eligible((2, 64, 64, 512), (3, 3, 512, 512))
    assert not vp.eligible((1, 16, 16, 3), (3, 3, 3, 64))     # input conv (Ci!=Co)
    assert not vp.eligible((1, 16, 16, 64), (3, 3, 64, 128))  # widening conv
    assert not vp.eligible((1, 16, 16, 64), (1, 1, 64, 64))   # 1x1 lin head
    assert not vp.eligible((1, 15, 16, 64), (3, 3, 64, 64))   # odd H
    assert not vp.eligible((1, 16, 12, 64), (3, 3, 64, 64))   # W % 8 != 0


def test_lpips_dispatcher_routes_and_matches(monkeypatch):
    """enable_vgg_pallas must actually route the backbone's square convs
    through the kernel (spy on conv3x3_relu), and the slice features must
    match the XLA spelling."""
    params = lpips_mod.init_lpips_params(jax.random.PRNGKey(0))
    img = jnp.asarray(RNG.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))
    want = [np.asarray(f) for f in lpips_mod.extract_raw_features(params, img)]

    routed = []
    orig = vp.conv3x3_relu

    def spy(*a, **kw):
        routed.append(True)
        return orig(*a, **kw)

    monkeypatch.setattr(vp, "conv3x3_relu", spy)
    try:
        lpips_mod.enable_vgg_pallas(True)
        with pltpu.force_tpu_interpret_mode():
            got = [
                np.asarray(f) for f in lpips_mod.extract_raw_features(params, img)
            ]
    finally:
        lpips_mod.enable_vgg_pallas(False)

    # VGG16 has 13 convs; the square (Ci==Co) ones are 8.  At a 32px input
    # the slice-4/5 maps are 4px/2px, under the h,w >= 8 gate, so exactly
    # four route: conv2 (64@32px), conv4 (128@16px), convs 6-7 (256@8px).
    assert len(routed) == 4, f"expected 4 square convs routed, got {len(routed)}"
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-4, atol=1e-5)
