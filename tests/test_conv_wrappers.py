"""conv2d / conv_transpose2d functional wrappers vs numpy oracles,
including the double-backward the reference's gradfix existed for."""

import jax
import jax.numpy as jnp
import numpy as np

from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.ops import (
    conv2d,
    conv_transpose2d,
)
from oracles import conv2d_np, conv_transpose2d_np

RNG = np.random.default_rng(0)


def test_conv2d_matches_oracle():
    x = RNG.standard_normal((2, 7, 7, 3)).astype(np.float32)
    w = RNG.standard_normal((3, 3, 3, 5)).astype(np.float32)
    b = RNG.standard_normal(5).astype(np.float32)
    got = conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=2, padding=1)
    want = conv2d_np(x, w, stride=2, pad=1) + b
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_conv_transpose2d_matches_oracle():
    x = RNG.standard_normal((1, 5, 5, 4)).astype(np.float32)
    w = RNG.standard_normal((3, 3, 6, 4)).astype(np.float32)  # [kh,kw,O,I]
    got = conv_transpose2d(jnp.asarray(x), jnp.asarray(w), stride=2, padding=0)
    want = conv_transpose2d_np(x, w, stride=2)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_double_backward_works():
    """The whole reason conv2d_gradfix exists in the reference
    (src/op/conv2d_gradfix.py): second derivatives through conv."""
    x = jnp.asarray(RNG.standard_normal((1, 5, 5, 2)).astype(np.float32))
    w = jnp.asarray(RNG.standard_normal((3, 3, 2, 2)).astype(np.float32))

    def f(w):
        return jnp.sum(jnp.sin(conv2d(x, w, padding=1)))

    g = jax.grad(f)(w)
    h = jax.grad(lambda ww: jnp.sum(jax.grad(f)(ww) ** 2))(w)
    assert np.isfinite(np.asarray(g)).all()
    assert np.isfinite(np.asarray(h)).all() and np.abs(np.asarray(h)).max() > 0


def test_grouped_conv():
    x = RNG.standard_normal((1, 6, 6, 4)).astype(np.float32)
    w = RNG.standard_normal((3, 3, 2, 4)).astype(np.float32)  # groups=2
    got = conv2d(jnp.asarray(x), jnp.asarray(w), padding=1, groups=2)
    # oracle: split channels
    w1, w2 = w[..., :2], w[..., 2:]
    want = np.concatenate(
        [conv2d_np(x[..., :2], w1, pad=1), conv2d_np(x[..., 2:], w2, pad=1)], -1
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
