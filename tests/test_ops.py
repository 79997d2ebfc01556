"""Golden-value tests for the ops layer vs independent numpy oracles.

Covers the configurations actually used by StyleGAN2 (SURVEY.md section 2):
up=2/down=1/k=4 (Upsample + post-conv_transpose blur), up=1/down=2/k=4
(Downsample), up=down=1/k=3,4 (Blur), including the negative-pad corner and
gradient checks (the reference hand-writes backward/double-backward,
src/op/upfirdn2d.py:20-146; here JAX autodiff must match numerics).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.ops import (
    fused_leaky_relu,
    make_kernel,
    upfirdn2d,
    upsample2x,
    downsample2x,
)
from oracles import upfirdn2d_np

RNG = np.random.default_rng(0)


def _rand(*shape):
    return RNG.standard_normal(shape).astype(np.float32)


CASES = [
    # (up, down, pad(y0,y1,x0,x1), kernel_1d, separable)
    ((2, 2), (1, 1), ((2, 1), (2, 1)), [1, 3, 3, 1], None),  # Upsample, model.py:41-46
    ((1, 1), (2, 2), ((2, 2), (2, 2)), [1, 3, 3, 1], None),  # Downsample, model.py:62-67
    ((1, 1), (1, 1), ((1, 1), (1, 1)), [1, 3, 3, 1], None),  # Blur after convT k3, model.py:191-197
    ((1, 1), (1, 1), ((2, 2), (2, 2)), [1, 3, 3, 1], None),  # Blur before down conv k3
    ((2, 2), (1, 1), ((1, 1), (1, 1)), [1, 2, 1], None),  # odd kernel
    ((1, 1), (1, 1), ((-1, 1), (1, -1)), [1, 3, 3, 1], None),  # negative pad (crop)
    ((2, 1), (1, 2), ((1, 0), (2, 1)), [1, 3, 3, 1], None),  # anisotropic factors
    ((2, 2), (1, 1), ((2, 1), (2, 1)), [1, 3, 3, 1], False),  # force non-separable path
]


@pytest.mark.parametrize("up,down,pad,k1d,sep", CASES)
def test_upfirdn2d_matches_oracle(up, down, pad, k1d, sep):
    x = _rand(2, 7, 9, 3)
    k = make_kernel(k1d)
    (py0, py1), (px0, px1) = pad
    got = upfirdn2d(
        jnp.asarray(x), k, up=up, down=down, pad=(px0, px1, py0, py1), separable=sep
    )
    want = upfirdn2d_np(x, k, up=up, down=down, pad=pad)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_upfirdn2d_nonsquare_kernel():
    x = _rand(1, 6, 8, 2)
    k = RNG.standard_normal((3, 5)).astype(np.float32)  # rank > 1, non-square
    got = upfirdn2d(jnp.asarray(x), k, up=2, down=1, pad=(1, 1))
    want = upfirdn2d_np(x, k, up=(2, 2), down=(1, 1), pad=((1, 1), (1, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_separable_equals_general():
    x = _rand(2, 8, 8, 4)
    k = make_kernel([1, 3, 3, 1])
    a = upfirdn2d(jnp.asarray(x), k, up=2, pad=(2, 1), separable=True)
    b = upfirdn2d(jnp.asarray(x), k, up=2, pad=(2, 1), separable=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_upsample_downsample_shapes():
    x = jnp.zeros((1, 16, 16, 8))
    assert upsample2x(x).shape == (1, 32, 32, 8)
    assert downsample2x(x).shape == (1, 8, 8, 8)


def test_upfirdn2d_grad_matches_numerical():
    x = _rand(1, 5, 5, 2).astype(np.float64)
    k = make_kernel([1, 3, 3, 1])

    def f(xx):
        return jnp.sum(upfirdn2d(xx, k, up=2, down=1, pad=(2, 1)) ** 2)

    g = jax.grad(f)(jnp.asarray(x, jnp.float32))
    # central differences
    eps = 1e-3
    num = np.zeros_like(x)
    for idx in np.ndindex(*x.shape):
        xp = x.copy()
        xp[idx] += eps
        xm = x.copy()
        xm[idx] -= eps
        num[idx] = (float(f(jnp.asarray(xp, jnp.float32))) - float(f(jnp.asarray(xm, jnp.float32)))) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g), num, rtol=2e-2, atol=2e-2)


def test_upfirdn2d_downsample_grad_matches_numerical():
    """down=2 gradient (the Downsample/blur-before-strided-conv path)."""
    x = _rand(1, 6, 6, 1).astype(np.float64)
    k = make_kernel([1, 3, 3, 1])

    def f(xx):
        return jnp.sum(upfirdn2d(xx, k, up=1, down=2, pad=(2, 2)) ** 2)

    g = jax.grad(f)(jnp.asarray(x, jnp.float32))
    eps = 1e-3
    num = np.zeros_like(x)
    for idx in np.ndindex(*x.shape):
        xp = x.copy(); xp[idx] += eps
        xm = x.copy(); xm[idx] -= eps
        num[idx] = (float(f(jnp.asarray(xp, jnp.float32))) - float(f(jnp.asarray(xm, jnp.float32)))) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g), num, rtol=2e-2, atol=2e-2)


def test_upfirdn2d_double_backward_exists():
    """Reference implements double-backward by hand (upfirdn2d.py:20-86);
    JAX must differentiate twice without error and give a finite result."""
    x = jnp.asarray(_rand(1, 4, 4, 1))
    k = make_kernel([1, 3, 3, 1])

    def f(xx):
        return jnp.sum(jnp.sin(upfirdn2d(xx, k, up=2, pad=(2, 1))))

    h = jax.grad(lambda xx: jnp.sum(jax.grad(f)(xx) ** 2))(x)
    assert np.isfinite(np.asarray(h)).all()


def test_fused_leaky_relu_matches_formula():
    """Spec: sqrt(2) * leaky_relu(x + b, 0.2), ref fused_act.py:111-122."""
    x = _rand(2, 4, 4, 3)
    b = _rand(3)
    got = fused_leaky_relu(jnp.asarray(x), jnp.asarray(b))
    z = x + b[None, None, None, :]
    want = np.where(z >= 0, z, 0.2 * z) * np.sqrt(2.0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)
    # no-bias and 2-D (linear output) forms
    x2 = _rand(5, 7)
    got2 = fused_leaky_relu(jnp.asarray(x2))
    want2 = np.where(x2 >= 0, x2, 0.2 * x2) * np.sqrt(2.0)
    np.testing.assert_allclose(np.asarray(got2), want2, rtol=1e-6)


def test_fused_leaky_relu_grad():
    x = jnp.asarray(_rand(3, 3))
    b = jnp.asarray(_rand(3))
    g = jax.grad(lambda a: jnp.sum(fused_leaky_relu(a, b)))(x)
    want = np.where(np.asarray(x + b) >= 0, 1.0, 0.2) * np.sqrt(2.0)
    np.testing.assert_allclose(np.asarray(g), want, rtol=1e-6)


def test_negative_pads_nonseparable_deterministic():
    """Regression: negative pads on the non-separable path previously
    lowered to an XLA conv with negative window padding, which returned
    nondeterministic garbage on some backends; now they lower through
    lax.pad (crop). Must match the separable path and be stable across
    runs."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
    k = make_kernel([1, 3, 3, 1])
    want = upfirdn2d(x, k, pad=(-1, 1), separable=True)
    outs = [
        np.asarray(upfirdn2d(x, k, pad=(-1, 1), separable=False))
        for _ in range(3)
    ]
    for o in outs:
        np.testing.assert_allclose(o, np.asarray(want), rtol=1e-5, atol=1e-6)
    # up>1 with a negative pad exercises the dilation-in-lax.pad fold
    want_up = upfirdn2d(x, k, up=2, pad=(-1, 2), separable=True)
    got_up = upfirdn2d(x, k, up=2, pad=(-1, 2), separable=False)
    np.testing.assert_allclose(
        np.asarray(got_up), np.asarray(want_up), rtol=1e-5, atol=1e-6
    )


def test_maxpool2x2_matches_reduce_window():
    """ops/pool.maxpool2x2 (the SelectAndScatter-free spelling used by the
    LPIPS VGG slices and BigGAN attention) must be bit-identical to the
    reduce_window reference in the forward and match its gradient on
    tie-free input."""
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.ops.pool import (
        maxpool2x2,
    )

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 5)).astype(np.float32))

    def ref_pool(v):
        return jax.lax.reduce_window(
            v, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        )

    np.testing.assert_array_equal(
        np.asarray(maxpool2x2(x)), np.asarray(ref_pool(x))
    )
    g_new = jax.grad(lambda v: jnp.sum(jnp.sin(maxpool2x2(v))))(x)
    g_ref = jax.grad(lambda v: jnp.sum(jnp.sin(ref_pool(v))))(x)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref), rtol=1e-6)


# --- pack_upsample2x: the packed-tail ToRGB skip fusion ---------------------


def _space_to_depth_np(x):
    """[N, 2H, 2W, C] -> [N, H, W, 4C] phase-major (matches
    models.stylegan2._space_to_depth2)."""
    n, h2, w2, c = x.shape
    y = x.reshape(n, h2 // 2, 2, w2 // 2, 2, c)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(n, h2 // 2, w2 // 2, 4 * c)


@pytest.mark.parametrize("kernel", [(1, 3, 3, 1), (1, 2, 2, 1), (1, 1)])
def test_pack_upsample2x_matches_fine_path(kernel):
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.ops import (
        pack_upsample2x,
    )

    x = jnp.asarray(_rand(2, 7, 5, 3))
    got = pack_upsample2x(x, kernel)
    if len(kernel) != 4:
        assert got is None  # ineligible -> caller falls back
        return
    want = _space_to_depth_np(np.asarray(upsample2x(x, kernel)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=2e-6)


def test_pack_upsample2x_rejects_nonseparable():
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.ops import (
        pack_upsample2x,
    )

    x = jnp.asarray(_rand(1, 4, 4, 3))
    # make_kernel of a 2-D non-rank-1 kernel stays non-separable
    assert pack_upsample2x(x, np.eye(4, dtype=np.float32)) is None
