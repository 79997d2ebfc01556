"""Gaussian blur attack.

Spec: torchvision ``T.GaussianBlur(filter_size, sigma)`` as used by the
reference (/root/reference/src/attack_methods/Gaussian_blur.py:16-31):
eval mode always uses the largest filter (size 25) with --blur_sigma.
torchvision semantics: 1-D kernel k[i] = exp(-((i - (n-1)/2)^2) / (2 s^2)),
normalized, applied separably with reflect padding.

TPU realization: two depthwise 1-D convolutions on NHWC; reflect padding
via jnp.pad (symmetric-without-edge).  Train mode's random filter size
(ref filter_size in [3,5,25]) is handled with a masked max-size kernel:
zero taps outside the chosen size give bit-identical results to the small
kernel because reflect padding is read-symmetric.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def gaussian_kernel_1d(size: int, sigma: float) -> jax.Array:
    half = (size - 1) / 2.0
    x = jnp.arange(size, dtype=jnp.float32) - half
    k = jnp.exp(-(x**2) / (2.0 * float(sigma) ** 2))
    return k / jnp.sum(k)


def _blur_with_kernel(img: jax.Array, k: jax.Array) -> jax.Array:
    """Separable depthwise blur with reflect padding; k: [size]."""
    size = k.shape[0]
    pad = (size - 1) // 2
    c = img.shape[-1]
    x = jnp.pad(img, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    kv = jnp.broadcast_to(k[:, None, None, None], (size, 1, 1, c))
    x = lax.conv_general_dilated(
        x, kv, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
    kh = jnp.broadcast_to(k[None, :, None, None], (1, size, 1, c))
    return lax.conv_general_dilated(
        x, kh, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )


@partial(jax.jit, static_argnames=("sigma", "size"))
def gaussian_blur(img: jax.Array, sigma: float = 0.5, size: int = 25) -> jax.Array:
    """Eval-mode blur: fixed (size, sigma), ref Gaussian_blur.py:16-20."""
    return _blur_with_kernel(img, gaussian_kernel_1d(size, sigma))


def gaussian_blur_random(
    img: jax.Array,
    rng: jax.Array,
    sigmas=(0.5,),
    sizes=(3, 5, 25),
) -> jax.Array:
    """Train-mode blur: random (size, sigma) choice per call
    (ref Gaussian_blur.py:22-31).  Uses a masked max-size kernel so the
    traced shape is static."""
    max_size = max(sizes)
    idx = jax.random.randint(rng, (), 0, len(sizes))
    sigma = jnp.asarray(sigmas)[jnp.minimum(idx, len(sigmas) - 1)]
    half = (max_size - 1) // 2
    x = jnp.arange(max_size, dtype=jnp.float32) - half
    k = jnp.exp(-(x**2) / (2.0 * sigma**2))
    # mask taps outside the selected size (centered)
    chosen = jnp.asarray(sizes)[idx]
    mask = jnp.abs(x) <= (chosen - 1) / 2.0
    k = jnp.where(mask, k, 0.0)
    k = k / jnp.sum(k)
    return _blur_with_kernel(img, k)
