"""Additive Gaussian noise attack.

Spec: /root/reference/src/attack_methods/Gaussian_noise.py:22-43 ---
image + N(0, std^2), clamped to [-1, 1].  (The reference names its config
"variance_range" but fills torch's ``normal_(mean, std)``, i.e. the value
is a standard deviation; eval mode always uses the last/strongest value.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gaussian_noise(img: jax.Array, rng: jax.Array, std: float = 0.1) -> jax.Array:
    noise = std * jax.random.normal(rng, img.shape, img.dtype)
    return jnp.clip(img + noise, -1.0, 1.0)
