"""Procedural synthetic image distribution for self-contained GAN training.

Scenes are built from smooth, globally-correlated factors of variation
(background gradient colors, blob positions/scales/orientations/colors)
so a trained generator's w-space has a meaningful variance spectrum ---
the property the fingerprinting scheme exploits (low-variance principal
axes as key carriers, ref src/generator.py:212-217).  Everything is a
pure jit-able function of a PRNG key: no files, no host RNG, no I/O.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

N_BLOBS = 3


def _scene(key: jax.Array, size: int) -> jax.Array:
    """One [size, size, 3] image in [-1, 1]."""
    kbg, kpos, kscale, kang, kcol, kamp = jax.random.split(key, 6)

    yy, xx = jnp.meshgrid(
        jnp.linspace(-1.0, 1.0, size), jnp.linspace(-1.0, 1.0, size), indexing="ij"
    )

    # background: oriented linear gradient between two random colors
    c0, c1 = jax.random.uniform(kbg, (2, 3), minval=-0.8, maxval=0.8)
    gdir = jax.random.normal(kbg, (2,))
    gdir = gdir / (jnp.linalg.norm(gdir) + 1e-6)
    t = (yy * gdir[0] + xx * gdir[1]) * 0.5 + 0.5
    img = c0 * (1.0 - t[..., None]) + c1 * t[..., None]

    # additive anisotropic Gaussian blobs
    pos = jax.random.uniform(kpos, (N_BLOBS, 2), minval=-0.7, maxval=0.7)
    scale = jax.random.uniform(kscale, (N_BLOBS, 2), minval=0.08, maxval=0.45)
    ang = jax.random.uniform(kang, (N_BLOBS,), minval=0.0, maxval=jnp.pi)
    col = jax.random.uniform(kcol, (N_BLOBS, 3), minval=-1.0, maxval=1.0)
    amp = jax.random.uniform(kamp, (N_BLOBS,), minval=0.6, maxval=1.4)

    ca, sa = jnp.cos(ang), jnp.sin(ang)
    dy = yy[None] - pos[:, 0, None, None]
    dx = xx[None] - pos[:, 1, None, None]
    u = ca[:, None, None] * dy + sa[:, None, None] * dx
    v = -sa[:, None, None] * dy + ca[:, None, None] * dx
    g = jnp.exp(
        -0.5 * (jnp.square(u / scale[:, 0, None, None]) + jnp.square(v / scale[:, 1, None, None]))
    )  # [K, S, S]
    img = img + jnp.einsum("kij,k,kc->ijc", g, amp, col)
    return jnp.tanh(img)


def sample_batch(key: jax.Array, batch: int, size: int) -> jax.Array:
    """[batch, size, size, 3] images in [-1, 1], NHWC, f32."""
    return jax.vmap(lambda k: _scene(k, size))(jax.random.split(key, batch))
