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
N_RECTS = 2

# flattened factor count of the smooth scene: c0/c1 colors (6) + gradient
# direction (2) + blob pos (6) + scale (6) + angle (3) + color (9) + amp (3)
_FACTOR_DIM = 35


def _render_smooth(
    yy: jax.Array, xx: jax.Array,
    c0: jax.Array, c1: jax.Array, gdir: jax.Array,
    pos: jax.Array, scale: jax.Array, ang: jax.Array,
    col: jax.Array, amp: jax.Array,
) -> jax.Array:
    """Pre-tanh smooth scene (gradient background + Gaussian blobs) from
    explicit factors.  Shared by the full-dimensional draw (``_scene``)
    and the rank-limited draw (``_scene_lowdim``)."""
    gdir = gdir / (jnp.linalg.norm(gdir) + 1e-6)
    t = (yy * gdir[0] + xx * gdir[1]) * 0.5 + 0.5
    img = c0 * (1.0 - t[..., None]) + c1 * t[..., None]

    ca, sa = jnp.cos(ang), jnp.sin(ang)
    dy = yy[None] - pos[:, 0, None, None]
    dx = xx[None] - pos[:, 1, None, None]
    u = ca[:, None, None] * dy + sa[:, None, None] * dx
    v = -sa[:, None, None] * dy + ca[:, None, None] * dx
    g = jnp.exp(
        -0.5 * (jnp.square(u / scale[:, 0, None, None]) + jnp.square(v / scale[:, 1, None, None]))
    )  # [K, S, S]
    return img + jnp.einsum("kij,k,kc->ijc", g, amp, col)


def _lowdim_factors(key: jax.Array, latent_dim: int) -> jax.Array:
    """(-1, 1)^35 factor vector driven by ``latent_dim`` Gaussian latents
    through a FIXED random projection: tanh(P @ eps), so the pre-tanh
    factor population is exactly rank ``latent_dim`` (tested)."""
    eps = jax.random.normal(key, (latent_dim,))
    proj = jax.random.normal(
        jax.random.PRNGKey(0x5EED), (_FACTOR_DIM, latent_dim)
    ) / jnp.sqrt(float(latent_dim))
    return jnp.tanh(proj @ eps)


def _scene_lowdim(key: jax.Array, size: int, latent_dim: int) -> jax.Array:
    """Smooth scene whose 35 factors are driven by only ``latent_dim``
    Gaussian latents through a FIXED random projection — the data
    manifold's intrinsic dimension is capped at ``latent_dim``.

    Why this exists: the round-3 scaling study measured that generators
    trained on the full 35-factor distribution develop a FLAT w-spectrum
    (key-band sigma only ~3.5-4x below the content median), which is what
    limits key_len=64 recovery in-env; production FFHQ models have a far
    steeper spectrum.  Capping the data's intrinsic dimension forces the
    trained generator to concentrate its w-variance on ~latent_dim
    principal axes, reproducing the steep-spectrum regime with zero
    external data (study: ``make spectrum``).
    """
    z = _lowdim_factors(key, latent_dim)  # (-1, 1)^35
    u = z * 0.5 + 0.5  # (0, 1)^35 for the uniform-range factors

    yy, xx = jnp.meshgrid(
        jnp.linspace(-1.0, 1.0, size), jnp.linspace(-1.0, 1.0, size), indexing="ij"
    )
    # map each slot into the same native range _scene draws it from
    c01 = (-0.8 + u[0:6] * 1.6).reshape(2, 3)
    gdir = z[6:8]
    pos = (-0.7 + u[8:14] * 1.4).reshape(N_BLOBS, 2)
    scale = (0.08 + u[14:20] * 0.37).reshape(N_BLOBS, 2)
    ang = u[20:23] * jnp.pi
    col = z[23:32].reshape(N_BLOBS, 3)
    amp = 0.6 + u[32:35] * 0.8
    img = _render_smooth(yy, xx, c01[0], c01[1], gdir, pos, scale, ang, col, amp)
    return jnp.tanh(img)


def _scene(key: jax.Array, size: int, sharp: bool = False) -> jax.Array:
    """One [size, size, 3] image in [-1, 1].

    ``sharp=False`` (default): gradient background + Gaussian blobs.
    ``sharp=True`` additionally paints hard-edged rotated rectangles and
    an oriented stripe patch.  Measured on the selftrain quality loop
    (BASELINE.md): the SMOOTH distribution yields the more attributable
    generator (mean bit acc 0.89 vs 0.84 at the same budget) --- sharp
    content makes the inversion loss landscape spikier, which costs more
    (stuck restarts) than the better-conditioned Jacobian buys."""
    (kbg, kdir, kpos, kscale, kang, kcol, kamp, krect,
     kstripe) = jax.random.split(key, 9)

    yy, xx = jnp.meshgrid(
        jnp.linspace(-1.0, 1.0, size), jnp.linspace(-1.0, 1.0, size), indexing="ij"
    )

    # background: oriented linear gradient between two random colors
    # (kept INLINE in the original draw/compute interleaving --- not via
    # _render_smooth --- so the traced HLO, and therefore the persistent
    # compile-cache key of every training program, is unchanged from
    # previous releases; _scene_lowdim shares _render_smooth instead)
    c0, c1 = jax.random.uniform(kbg, (2, 3), minval=-0.8, maxval=0.8)
    gdir = jax.random.normal(kdir, (2,))
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

    if not sharp:
        return jnp.tanh(img)

    # hard-edged rotated rectangles (steep-sigmoid membership; edge width
    # ~1.5px so the edge is sharp yet anti-aliased/differentiable)
    edge = 1.5 * (2.0 / size)
    kr1, kr2, kr3, kr4 = jax.random.split(krect, 4)
    rpos = jax.random.uniform(kr1, (N_RECTS, 2), minval=-0.6, maxval=0.6)
    rhalf = jax.random.uniform(kr2, (N_RECTS, 2), minval=0.1, maxval=0.4)
    rang = jax.random.uniform(kr3, (N_RECTS,), minval=0.0, maxval=jnp.pi)
    rcol = jax.random.uniform(kr4, (N_RECTS, 3), minval=-1.0, maxval=1.0)
    rca, rsa = jnp.cos(rang), jnp.sin(rang)
    rdy = yy[None] - rpos[:, 0, None, None]
    rdx = xx[None] - rpos[:, 1, None, None]
    ru = rca[:, None, None] * rdy + rsa[:, None, None] * rdx
    rv = -rsa[:, None, None] * rdy + rca[:, None, None] * rdx
    inside = (
        jax.nn.sigmoid((rhalf[:, 0, None, None] - jnp.abs(ru)) / edge)
        * jax.nn.sigmoid((rhalf[:, 1, None, None] - jnp.abs(rv)) / edge)
    )  # [R, S, S]
    # paint-over (not additive): rectangles occlude what is below them
    for r in range(N_RECTS):
        img = img * (1.0 - inside[r][..., None]) + rcol[r] * inside[r][..., None]

    # one oriented stripe patch (high-frequency texture, Gaussian window)
    ks1, ks2, ks3, ks4 = jax.random.split(kstripe, 4)
    spos = jax.random.uniform(ks1, (2,), minval=-0.5, maxval=0.5)
    sang = jax.random.uniform(ks2, (), minval=0.0, maxval=jnp.pi)
    freq = jax.random.uniform(ks3, (), minval=4.0, maxval=10.0) * jnp.pi
    scol = jax.random.uniform(ks4, (3,), minval=-1.0, maxval=1.0)
    sdy, sdx = yy - spos[0], xx - spos[1]
    proj = jnp.cos(sang) * sdy + jnp.sin(sang) * sdx
    win = jnp.exp(-0.5 * (sdy**2 + sdx**2) / (0.25**2))
    stripes = jnp.sin(freq * proj) * win
    img = img + 0.5 * stripes[..., None] * scol

    return jnp.tanh(img)


def sample_batch(
    key: jax.Array, batch: int, size: int, sharp: bool = False,
    latent_dim: int = 0,
) -> jax.Array:
    """[batch, size, size, 3] images in [-1, 1], NHWC, f32.

    ``latent_dim > 0`` switches to the rank-limited smooth distribution
    (``_scene_lowdim``): every image is a deterministic function of
    ``latent_dim`` Gaussian latents, capping the data manifold's
    intrinsic dimension.  ``latent_dim=0`` (default) keeps the full
    35-factor draw bit-identical to previous releases (cached study
    models depend on the stream).  ``sharp`` applies only to the full
    draw."""
    if latent_dim > 0:
        if sharp:
            raise ValueError("sharp data variant has no lowdim mode")
        return jax.vmap(lambda k: _scene_lowdim(k, size, latent_dim))(
            jax.random.split(key, batch)
        )
    return jax.vmap(lambda k: _scene(k, size, sharp))(jax.random.split(key, batch))
