"""Crop attack: random crop + bilinear resize back.

Not present in the reference's attack_methods (its initializer covers
Noise/Blur/Jpeg/Combination, attack_initializer.py:12-35), but the
project's benchmark config 4 lists crop among the robustness perturbations
(BASELINE.json), so it ships as a first-class differentiable transform:
crop a random axis-aligned window of ``ratio`` x the image and resize back
to the original resolution (jax.image bilinear; jit/grad-safe, static
output shape).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def center_crop(img: jax.Array, ratio: float = 0.9) -> jax.Array:
    """Deterministic center crop + resize back (eval mode)."""
    b, h, w, c = img.shape
    ch, cw = max(1, int(h * ratio)), max(1, int(w * ratio))
    y0, x0 = (h - ch) // 2, (w - cw) // 2
    patch = jax.lax.dynamic_slice(img, (0, y0, x0, 0), (b, ch, cw, c))
    return jax.image.resize(patch, (b, h, w, c), "bilinear")


def random_crop(img: jax.Array, rng: jax.Array, ratio: float = 0.9) -> jax.Array:
    """Random-offset crop of fixed ``ratio`` + resize back (train mode).
    The crop size is static (jit-safe); only the offset is random."""
    b, h, w, c = img.shape
    ch, cw = max(1, int(h * ratio)), max(1, int(w * ratio))
    ky, kx = jax.random.split(rng)
    y0 = jax.random.randint(ky, (), 0, h - ch + 1)
    x0 = jax.random.randint(kx, (), 0, w - cw + 1)
    patch = jax.lax.dynamic_slice(img, (0, y0, x0, 0), (b, ch, cw, c))
    return jax.image.resize(patch, (b, h, w, c), "bilinear")
