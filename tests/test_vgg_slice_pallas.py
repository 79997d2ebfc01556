"""Fused VGG slice-1 Pallas kernel vs the XLA oracle (interpret mode).

The kernel (ops/vgg_slice_pallas.py) fuses conv(3->64)+ReLU+conv(64->64)
+ReLU in VMEM --- the LPIPS backbone's slice 1, which the reference runs
through stock cuDNN (/root/reference/src/custom_lpips/
pretrained_networks.py:121-135).  Functional spec: two chained
relu(conv2d(pad=1)+b) ops; the backward must equal the XLA VJP even
though the kernel never stores `relu1_1` (it recomputes the mask from x
in-kernel).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.ops import (
    vgg_slice_pallas as vs,
)

RNG = np.random.default_rng(23)


def _case(n, h, w, dtype=np.float32):
    x = jnp.asarray(RNG.standard_normal((n, h, w, 3)).astype(dtype))
    w1 = jnp.asarray((RNG.standard_normal((3, 3, 3, 64)) / 5.0).astype(np.float32))
    b1 = jnp.asarray(RNG.standard_normal((64,)).astype(np.float32) * 0.1)
    w2 = jnp.asarray((RNG.standard_normal((3, 3, 64, 64)) / 24.0).astype(np.float32))
    b2 = jnp.asarray(RNG.standard_normal((64,)).astype(np.float32) * 0.1)
    return x, w1, b1, w2, b2


@pytest.mark.parametrize(
    "shape,tile_h",
    [
        ((1, 16, 16, 3), None),   # single tile
        ((2, 16, 8, 3), 4),       # 4 row-tiles: interior + both edges
        ((1, 24, 16, 3), 8),      # 3 tiles, wider rows
    ],
)
def test_slice1_forward_matches_oracle(shape, tile_h):
    x, w1, b1, w2, b2 = _case(*shape[:3])
    with pltpu.force_tpu_interpret_mode():
        got = vs._slice1_fwd_call(x, w1, b1, w2, b2, tile_h=tile_h)
    want = vs.vgg_slice1_reference(x, w1, b1, w2, b2)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("tile_h", [None, 4])
def test_slice1_backward_matches_oracle(tile_h):
    x, w1, b1, w2, b2 = _case(1, 16, 8)
    g = jnp.asarray(RNG.standard_normal((1, 16, 8, 64)).astype(np.float32))

    # oracle dx via VJP of the reference
    _, vjp = jax.vjp(lambda a: vs.vgg_slice1_reference(a, w1, b1, w2, b2), x)
    (dx_ref,) = vjp(g)

    a2 = vs.vgg_slice1_reference(x, w1, b1, w2, b2)
    with pltpu.force_tpu_interpret_mode():
        dx = vs._slice1_bwd_call(g, a2, x, w1, b1, w2, tile_h=tile_h)
    np.testing.assert_allclose(
        np.asarray(dx), np.asarray(dx_ref), rtol=1e-4, atol=1e-4
    )


def test_slice1_custom_vjp_full():
    """End-to-end custom_vjp: dx AND weight/bias cotangents vs XLA."""
    x, w1, b1, w2, b2 = _case(1, 16, 16)

    def loss(fn, *args):
        return jnp.sum(fn(*args) ** 2)

    with pltpu.force_tpu_interpret_mode():
        grads = jax.grad(
            lambda *a: loss(vs.vgg_slice1, *a), argnums=(0, 1, 2, 3, 4)
        )(x, w1, b1, w2, b2)
    grads_ref = jax.grad(
        lambda *a: loss(vs.vgg_slice1_reference, *a), argnums=(0, 1, 2, 3, 4)
    )(x, w1, b1, w2, b2)
    for got, want, name in zip(grads, grads_ref, "x w1 b1 w2 b2".split()):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3,
            err_msg=f"cotangent mismatch: {name}",
        )


def test_slice1_bf16():
    x, w1, b1, w2, b2 = _case(1, 16, 16, dtype=np.float32)
    xb = x.astype(jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(vs.vgg_slice1(xb, w1, b1, w2, b2), np.float32)
    want = np.asarray(vs.vgg_slice1_reference(xb, w1, b1, w2, b2), np.float32)
    scale = max(np.abs(want).max(), 1e-6)
    assert np.abs(got - want).max() / scale < 0.03


def test_eligibility():
    assert vs.eligible((1, 64, 64, 3))
    assert not vs.eligible((1, 64, 64, 64))  # not an RGB input
    assert not vs.eligible((1, 63, 64, 3))   # odd H
    assert not vs.eligible((1, 64, 4, 3))    # W < 8


def test_lpips_routes_fused_slice(monkeypatch):
    """enable_fused_slice must route slice 1 through the fused kernel
    (spied) and produce features identical to the XLA spelling, both in
    value and in the solver's gradient w.r.t. the image."""
    import importlib

    lpips_mod = importlib.import_module(
        "attributing_image_generative_models_using_latent_fingerprints_sg2_tpu"
        ".losses.lpips"
    )
    params = lpips_mod.init_lpips_params(jax.random.PRNGKey(0))
    img = jnp.asarray(RNG.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))
    tfeats = tuple(
        jax.lax.stop_gradient(f) for f in lpips_mod.extract_features(params, img)
    )

    def loss(x):
        raws = lpips_mod.extract_raw_features(params, x)
        return jnp.sum(lpips_mod.distance_from_raw_features(params, raws, tfeats))

    x0 = img * 0.9
    want_feats = [np.asarray(f) for f in lpips_mod.extract_raw_features(params, x0)]
    want_grad = np.asarray(jax.grad(loss)(x0))

    routed = []
    orig = vs.vgg_slice1

    def spy(*a, **kw):
        routed.append(True)
        return orig(*a, **kw)

    monkeypatch.setattr(vs, "vgg_slice1", spy)
    try:
        lpips_mod.enable_fused_slice(True)
        with pltpu.force_tpu_interpret_mode():
            got_feats = [
                np.asarray(f) for f in lpips_mod.extract_raw_features(params, x0)
            ]
            got_grad = np.asarray(jax.grad(loss)(x0))
    finally:
        lpips_mod.enable_fused_slice(False)

    assert routed, "fused slice kernel was not routed"
    for g, w in zip(got_feats, want_feats):
        np.testing.assert_allclose(g, w, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got_grad, want_grad, rtol=1e-3, atol=1e-4)
