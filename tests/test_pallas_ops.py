"""Pallas upfirdn2d kernels vs the XLA path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.ops import (
    make_kernel,
    upfirdn2d,
)
import importlib

# the module (ops/__init__ shadows the name with the same-named function)
uf = importlib.import_module(
    "attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.ops.upfirdn2d"
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.ops.upfirdn2d_pallas import (
    blur4,
    split_symmetric_4tap,
    upblur4,
)

RNG = np.random.default_rng(0)


def test_split_symmetric_4tap():
    k = make_kernel([1, 3, 3, 1])
    k1 = split_symmetric_4tap(k)
    assert k1 is not None
    np.testing.assert_allclose(np.outer(k1, k1), k, rtol=1e-6)
    k4 = make_kernel([1, 3, 3, 1]) * 4.0
    k1 = split_symmetric_4tap(k4)
    np.testing.assert_allclose(np.outer(k1, k1), k4, rtol=1e-6)
    assert split_symmetric_4tap(np.eye(4, dtype=np.float32)) is None  # rank 4
    assert split_symmetric_4tap(make_kernel([1, 2, 1])) is None  # 3x3


@pytest.mark.parametrize("pads", [((1, 1), (1, 1)), ((2, 2), (2, 2)), ((2, 1), (2, 1))])
def test_blur4_matches_xla(pads):
    x = jnp.asarray(RNG.standard_normal((2, 16, 16, 8)).astype(np.float32))
    k = make_kernel([1, 3, 3, 1])
    k1 = split_symmetric_4tap(k)
    (py0, py1), (px0, px1) = pads
    with pltpu.force_tpu_interpret_mode():
        got = blur4(x, k1, k1, (py0, py1), (px0, px1))
    want = upfirdn2d(x, k, pad=(px0, px1, py0, py1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_upblur4_matches_xla():
    x = jnp.asarray(RNG.standard_normal((2, 8, 8, 4)).astype(np.float32))
    k = make_kernel([1, 3, 3, 1]) * 4.0
    k1 = split_symmetric_4tap(k)
    with pltpu.force_tpu_interpret_mode():
        got = upblur4(x, k1)
    want = upfirdn2d(x, k, up=2, pad=(2, 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_upblur4_non_palindromic_kernel():
    """Regression: the polyphase slots take REVERSED taps; with the taps
    passed unflipped a non-palindromic kernel (1,2,3,4) produced ~50%
    error vs the upfirdn oracle (palindromic defaults masked it)."""
    x = jnp.asarray(RNG.standard_normal((1, 8, 8, 4)).astype(np.float32))
    k = make_kernel([1, 2, 3, 4]) * 4.0
    k1 = split_symmetric_4tap(k)
    assert k1 is not None
    with pltpu.force_tpu_interpret_mode():
        got = upblur4(x, k1)
    want = upfirdn2d(x, k, up=2, pad=(2, 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_xla_polyphase_upsample_matches_conv_lowering():
    """enable_polyphase_upsample routes the ToRGB-skip case through the
    shifted-add spelling; it must equal the conv lowering for palindromic
    AND non-palindromic separable kernels (the pre-fix gate was dead and
    the taps unflipped)."""
    x = jnp.asarray(RNG.standard_normal((2, 8, 8, 4)).astype(np.float32))
    for taps in ([1, 3, 3, 1], [1, 2, 3, 4]):
        k = make_kernel(taps) * 4.0
        want = upfirdn2d(x, k, up=2, pad=(2, 1))
        routed = []
        orig = uf._upblur2x_polyphase

        def spy(xx, kk):
            routed.append(kk)
            return orig(xx, kk)

        uf.enable_polyphase_upsample(True)
        uf._upblur2x_polyphase = spy
        try:
            got = upfirdn2d(x, k, up=2, pad=(2, 1))
        finally:
            uf._upblur2x_polyphase = orig
            uf.enable_polyphase_upsample(False)
        assert routed, f"polyphase path did not fire for taps {taps}"
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
        )


def test_dispatcher_routes_and_matches(monkeypatch):
    """Eligible shapes (C=128, out dims sublane-aligned) MUST take the
    Pallas route --- asserted by spying on _try_pallas, so this test fails
    if dispatch silently falls back to XLA (round-1 bug: a C=4 input was
    rejected by the lane gate and the test compared XLA with itself)."""
    routed = []
    orig = uf._try_pallas

    def spy(*a, **kw):
        out = orig(*a, **kw)
        routed.append(out is not None)
        return out

    monkeypatch.setattr(uf, "_try_pallas", spy)
    x = jnp.asarray(RNG.standard_normal((1, 9, 9, 128)).astype(np.float32))
    k = make_kernel([1, 3, 3, 1])
    want = upfirdn2d(x, k, pad=(1, 1))  # out 8x8, sublane-aligned
    xu = jnp.asarray(RNG.standard_normal((1, 8, 8, 128)).astype(np.float32))
    want_up = upfirdn2d(xu, k * 4.0, up=2, pad=(2, 1))
    assert routed == []  # pallas disabled: dispatcher not even consulted
    try:
        uf.enable_pallas(True)
        assert uf.pallas_enabled()
        with pltpu.force_tpu_interpret_mode():
            got = upfirdn2d(x, k, pad=(1, 1))
            got_up = upfirdn2d(xu, k * 4.0, up=2, pad=(2, 1))
    finally:
        uf.enable_pallas(False)
    assert routed == [True, True], f"pallas dispatch not taken: {routed}"
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_up), np.asarray(want_up), rtol=1e-4, atol=1e-5)


def test_dispatcher_falls_back_on_ineligible():
    """down=2 and negative pads must silently use the XLA path."""
    x = jnp.asarray(RNG.standard_normal((1, 8, 8, 4)).astype(np.float32))
    k = make_kernel([1, 3, 3, 1])
    try:
        uf.enable_pallas(True)
        down = upfirdn2d(x, k, down=2, pad=(2, 2))  # no interpret ctx: must not hit pallas
        neg = upfirdn2d(x, k, pad=(-1, 1))
    finally:
        uf.enable_pallas(False)
    np.testing.assert_allclose(
        np.asarray(down), np.asarray(upfirdn2d(x, k, down=2, pad=(2, 2))), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(neg), np.asarray(upfirdn2d(x, k, pad=(-1, 1))), rtol=1e-5
    )


def test_blur4_grad():
    x = jnp.asarray(RNG.standard_normal((1, 8, 8, 2)).astype(np.float32))
    k1 = split_symmetric_4tap(make_kernel([1, 3, 3, 1]))
    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(lambda a: jnp.sum(blur4(a, k1, k1, (1, 1), (1, 1)) ** 2))(x)
    k = make_kernel([1, 3, 3, 1])
    g_ref = jax.grad(lambda a: jnp.sum(upfirdn2d(a, k, pad=(1, 1)) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-3, atol=1e-4)


def test_upblur4_grad():
    x = jnp.asarray(RNG.standard_normal((1, 8, 8, 2)).astype(np.float32))
    k = make_kernel([1, 3, 3, 1]) * 4.0
    k1 = split_symmetric_4tap(k)
    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(lambda a: jnp.sum(upblur4(a, k1) ** 2))(x)
    g_ref = jax.grad(lambda a: jnp.sum(upfirdn2d(a, k, up=2, pad=(2, 1)) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-3, atol=1e-4)
