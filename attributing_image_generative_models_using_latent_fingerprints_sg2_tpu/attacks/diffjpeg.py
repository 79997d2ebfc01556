"""Differentiable JPEG compression/decompression as pure JAX functions.

Spec: the vendored DiffJPEG stack
(/root/reference/src/attack_methods/DiffJPEG_master/modules/compression.py
and decompression.py, tables/rounding in DiffJPEG_master/utils.py):

  RGB*255 -> YCbCr (+[0,128,128]) -> 2x chroma avg-pool -> 8x8 blocks
  -> DCT (8x8x8x8 tensordot, scale alpha/4, input -128)
  -> quantize by (table * factor) with differentiable rounding
     round(x) + (x - round(x))^3   [train]  /  round(x)  [eval]
  -> dequantize -> iDCT -> merge blocks -> 2x chroma nearest-upsample
  -> RGB, clamp [0,255], /255.

TPU notes: the 8x8 DCT is expressed as one einsum over [B, nblocks, 8, 8]
-- a batched 64x64 matmul on the MXU; block split/merge are reshapes and
transposes XLA fuses away.  Everything is shape-static and jit/vmap/grad
safe (the straight-through cubic rounding gives usable gradients).

Layout: NHWC in [-1,1] at the attack boundary (ref Jpeg wrapper rescales
[-1,1]<->[0,1], attack_methods/Jpeg_compression.py:14-18).
"""

from __future__ import annotations

import itertools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# Standard JPEG luminance / chrominance quantization tables (Annex K),
# stored transposed like the reference (DiffJPEG_master/utils.py).
_Y_TABLE = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float32,
).T

_C_TABLE = np.full((8, 8), 99, dtype=np.float32)
_C_TABLE[:4, :4] = np.array(
    [[17, 18, 24, 47], [18, 21, 26, 66], [24, 26, 56, 99], [47, 66, 99, 99]],
    dtype=np.float32,
).T


def _dct_tensor() -> np.ndarray:
    t = np.zeros((8, 8, 8, 8), np.float32)
    for x, y, u, v in itertools.product(range(8), repeat=4):
        t[x, y, u, v] = np.cos((2 * x + 1) * u * np.pi / 16) * np.cos(
            (2 * y + 1) * v * np.pi / 16
        )
    return t


def _idct_tensor() -> np.ndarray:
    t = np.zeros((8, 8, 8, 8), np.float32)
    for x, y, u, v in itertools.product(range(8), repeat=4):
        t[x, y, u, v] = np.cos((2 * u + 1) * x * np.pi / 16) * np.cos(
            (2 * v + 1) * y * np.pi / 16
        )
    return t


_ALPHA = np.outer(np.array([1.0 / np.sqrt(2)] + [1] * 7), np.array([1.0 / np.sqrt(2)] + [1] * 7)).astype(np.float32)
_DCT_T = _dct_tensor()
_IDCT_T = _idct_tensor()

_RGB2YCC = np.array(
    [[0.299, 0.587, 0.114], [-0.168736, -0.331264, 0.5], [0.5, -0.418688, -0.081312]],
    np.float32,
).T
_YCC2RGB = np.array(
    [[1.0, 0.0, 1.402], [1.0, -0.344136, -0.714136], [1.0, 1.772, 0.0]], np.float32
).T


def quality_to_factor(quality: float) -> float:
    """Ref DiffJPEG_master/utils.py (quality_to_factor)."""
    if quality < 50:
        q = 5000.0 / quality
    else:
        q = 200.0 - quality * 2
    return q / 100.0


def diff_round(x: jax.Array) -> jax.Array:
    """round(x) + (x - round(x))^3 --- differentiable rounding."""
    r = jnp.round(x)
    return r + (x - r) ** 3


def _blocks(x: jax.Array) -> jax.Array:
    """[B,H,W] -> [B, H//8 * W//8, 8, 8]."""
    b, h, w = x.shape
    x = x.reshape(b, h // 8, 8, w // 8, 8)
    return jnp.transpose(x, (0, 1, 3, 2, 4)).reshape(b, -1, 8, 8)


def _merge(x: jax.Array, h: int, w: int) -> jax.Array:
    b = x.shape[0]
    x = x.reshape(b, h // 8, w // 8, 8, 8)
    return jnp.transpose(x, (0, 1, 3, 2, 4)).reshape(b, h, w)


def _dct8x8(x: jax.Array) -> jax.Array:
    x = x - 128.0
    return jnp.asarray(_ALPHA * 0.25) * jnp.einsum("bnxy,xyuv->bnuv", x, jnp.asarray(_DCT_T))


def _idct8x8(x: jax.Array) -> jax.Array:
    x = x * jnp.asarray(_ALPHA)
    return 0.25 * jnp.einsum("bnxy,xyuv->bnuv", x, jnp.asarray(_IDCT_T)) + 128.0


def _avgpool2(x: jax.Array) -> jax.Array:
    b, h, w = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2).mean(axis=(2, 4))


def _upsample2(x: jax.Array) -> jax.Array:
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


@partial(jax.jit, static_argnames=("quality", "differentiable"))
def jpeg_compress_decompress(
    img01: jax.Array, quality: int = 80, differentiable: bool = True
) -> jax.Array:
    """Full JPEG round trip on a [0,1] NHWC image batch."""
    factor = quality_to_factor(quality)
    rounding = diff_round if differentiable else jnp.round

    x = img01 * 255.0
    ycc = jnp.einsum("bhwc,cd->bhwd", x, jnp.asarray(_RGB2YCC)) + jnp.asarray(
        [0.0, 128.0, 128.0]
    )
    y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
    cb, cr = _avgpool2(cb), _avgpool2(cr)

    h, w = y.shape[1], y.shape[2]

    def channel(v, table, hh, ww):
        q = rounding(_dct8x8(_blocks(v)) / (jnp.asarray(table) * factor))
        return _merge(_idct8x8(q * (jnp.asarray(table) * factor)), hh, ww)

    y = channel(y, _Y_TABLE, h, w)
    cb = channel(cb, _C_TABLE, h // 2, w // 2)
    cr = channel(cr, _C_TABLE, h // 2, w // 2)

    ycc = jnp.stack([y, _upsample2(cb), _upsample2(cr)], axis=-1)
    rgb = jnp.einsum(
        "bhwc,cd->bhwd", ycc + jnp.asarray([0.0, -128.0, -128.0]), jnp.asarray(_YCC2RGB)
    )
    return jnp.clip(rgb, 0.0, 255.0) / 255.0


def jpeg_attack(img: jax.Array, quality: int = 50, differentiable: bool = False) -> jax.Array:
    """[-1,1] NHWC -> [-1,1], ref Jpeg wrapper (Jpeg_compression.py:14-18).
    Eval mode (the pipelines' mode, attack_initializer is_train=False) uses
    hard rounding."""
    x01 = (img + 1.0) / 2.0
    y01 = jpeg_compress_decompress(x01, quality=quality, differentiable=differentiable)
    return y01 * 2.0 - 1.0
