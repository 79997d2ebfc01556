"""Pallas TPU kernel for the LPIPS backbone's square 3x3 conv + ReLU.

Why this exists: profiling the 256px attribution step (BASELINE.md) shows
the VGG slice-1 convolutions ([B,256,256,64] feature maps, C_in = C_out =
64) running at ~14% MFU under XLA:TPU's conv emitter --- 5.7 ms of a 41 ms
step --- because a 64-channel NHWC conv leaves half the MXU lanes idle in
BOTH the contraction and output dimensions and the emitter's windowed
iteration adds further overhead.  (The reference instead pays this cost in
CUDA; its custom ops cover only upfirdn2d/bias-act,
/root/reference/src/op/, while VGG runs through stock cuDNN ---
/root/reference/src/custom_lpips/pretrained_networks.py.)

Kernel design (TPU-first):

- the 3x3/stride-1/pad-1 convolution is computed as a sum of 9 shifted
  [M, C] x [C, C] matmuls over a row band held in VMEM, M = tile_h * W;
- activations live as [rows, W + 8, C] in VMEM: H shifts are free (major
  dim), W shifts are cyclic ``pltpu.roll``s whose wrap-around lands in the
  zeroed right-pad columns --- exactly the conv's zero padding;
- for C = 64 the taps are PAIRED along the contraction: two shifted
  activations are lane-concatenated into [M, 128] and multiplied by the
  stacked [128, 64] tap weights --- filling the MXU's 128-deep contraction
  (4 paired passes + 1 single), which the XLA emitter never does;
- bias + ReLU fuse into the accumulator epilogue (f32 accumulation,
  output cast back to the activation dtype);
- the H halo rows arrive as a second, caller-gathered input ([N, tiles,
  2, W, C], one row above / below each tile) delivered through the
  normal BlockSpec pipeline.  Manual ``make_async_copy`` row slices are
  NOT used: Mosaic requires HBM memref slices to be lane-tile (128)
  aligned, which a C=64 feature map can never satisfy; Block-pipelined
  inputs have no such restriction.  Edge tiles overwrite their out-of-
  range halo row with zeros, matching XLA's zero padding (torch
  Conv2d(pad=1)).

The backward has the same structure: dx = correlation of the masked
cotangent with the spatially-flipped, io-transposed taps, so the VJP
reuses the kernel with transformed weights.  Weight/bias cotangents are
computed TRUE (via the XLA linearization of the conv's linear part, see
``_bwd``); on the LPIPS hot path --- which freezes the backbone (the
reference trains only the lin heads / ranking layer,
dist_model.py:88-99) --- they are dead-code-eliminated under jit, so
they cost nothing there while keeping backbone fine-tuning correct.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_WPAD = 8  # right-pad columns; must be >= 1 each side's halo and 8-aligned


def _pick_tile(h: int, target: int) -> int:
    t = max(1, min(h, target))
    while h % t:
        t -= 1
    return t


def _taps_from_hwio(w_hwio: jax.Array) -> jax.Array:
    """[3,3,C,C] HWIO -> [9,C,C] taps ordered (dy, dx) row-major."""
    return w_hwio.reshape(9, w_hwio.shape[2], w_hwio.shape[3])


def _conv3x3_kernel(x_ref, halo_ref, taps_ref, bias_ref, o_ref, band, *, th, h, w, c, relu):
    """One [th, w, c] output tile of conv3x3(pad=1) + bias (+ ReLU).

    band: [th+2, w+_WPAD, c] VMEM scratch; image columns live at [0, w),
    columns [w, w+_WPAD) stay zero so cyclic W-rolls wrap zeros in.
    """
    jt = pl.program_id(1)
    nt = pl.num_programs(1)

    # zero the right-pad columns (scratch persists across grid steps)
    band[:, pl.ds(w, _WPAD), :] = jnp.zeros((th + 2, _WPAD, c), band.dtype)
    first = jt == 0
    last = jt == nt - 1

    # tile rows + the caller-gathered halo rows (see module docstring)
    band[pl.ds(1, th), pl.ds(0, w), :] = x_ref[0]
    band[0, pl.ds(0, w), :] = halo_ref[0, 0, 0]
    band[th + 1, pl.ds(0, w), :] = halo_ref[0, 0, 1]

    @pl.when(first)
    def _zero_top():
        band[0, :, :] = jnp.zeros((w + _WPAD, c), band.dtype)

    @pl.when(last)
    def _zero_bot():
        band[th + 1, :, :] = jnp.zeros((w + _WPAD, c), band.dtype)

    # --- 9-tap matmul accumulation ---------------------------------------
    # W-shifts act on the flattened [th*(w+_WPAD), c] view: a +-1 row
    # rotation is exactly the zero-padded column shift (the wrap and the
    # cross-row boundary both land in the zeroed pad columns).  Mosaic
    # cannot rotate bf16 vectors, so the rotation is spelled as a
    # two-slice concat.  The matmul runs over the padded width (3% extra
    # M); pad rows are discarded when the tile is written.
    wp = w + _WPAD
    m = th * wp

    def shifted(dy, dx):
        flat = band[pl.ds(dy, th), :, :].reshape(m, c)
        if dx == 0:  # needs x[j-1]: rotate down by one row
            return jnp.concatenate([flat[m - 1 :], flat[: m - 1]], axis=0)
        if dx == 2:  # needs x[j+1]: rotate up by one row
            return jnp.concatenate([flat[1:], flat[:1]], axis=0)
        return flat

    order = [(dy, dx) for dy in range(3) for dx in range(3)]
    acc = jnp.zeros((m, c), jnp.float32)
    if c == 64:
        for a, b in ((0, 1), (2, 3), (4, 5), (6, 7)):
            pair = jnp.concatenate(
                [shifted(*order[a]), shifted(*order[b])], axis=-1
            )  # [M, 128]
            acc = acc + jnp.dot(
                pair, taps_ref[a // 2], preferred_element_type=jnp.float32
            )
        acc = acc + jnp.dot(
            shifted(*order[8]),
            taps_ref[4, pl.ds(0, c), :],
            preferred_element_type=jnp.float32,
        )
    else:
        for i, (dy, dx) in enumerate(order):
            acc = acc + jnp.dot(
                shifted(dy, dx), taps_ref[i], preferred_element_type=jnp.float32
            )
    acc = acc + bias_ref[0].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    o_ref[0] = acc.reshape(th, wp, c)[:, 0:w, :].astype(o_ref.dtype)


def _pack_taps_c64(taps: jax.Array) -> jax.Array:
    """[9,64,64] -> [5,128,64]: taps stacked pairwise along the
    contraction; the 9th tap zero-padded."""
    t = jnp.concatenate([taps, jnp.zeros_like(taps[:1])], axis=0)  # [10,64,64]
    return t.reshape(5, 2 * t.shape[1], t.shape[2])


def _tile_h(h: int, w: int, c: int, itemsize: int) -> int:
    # live VMEM ~ band + x/out blocks (x2 buffering) + pair + f32 acc
    per_row = (w + _WPAD) * c * itemsize * 14
    return _pick_tile(h, max(8, (10 << 20) // max(1, per_row)))


def _halo_rows(x: jax.Array, th: int) -> jax.Array:
    """[N,H,W,C] -> [N, H//th, 2, W, C]: the input row just above / below
    each th-row tile (clamped at the image edge; edge tiles zero their
    out-of-range halo row inside the kernel)."""
    n, h, w, c = x.shape
    nt = h // th
    starts = np.arange(nt) * th
    top = x[:, np.maximum(starts - 1, 0)]       # [N, nt, W, C]
    bot = x[:, np.minimum(starts + th, h - 1)]  # [N, nt, W, C]
    return jnp.stack([top, bot], axis=2)


def _conv3x3_call(x, taps_packed, bias, *, relu, th):
    n, h, w, c = x.shape
    kernel = functools.partial(
        _conv3x3_kernel, th=th, h=h, w=w, c=c, relu=relu
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), x.dtype),
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 2, w, c), lambda i, j: (i, j, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w, c), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((th + 2, w + _WPAD, c), x.dtype),
        ],
    )(x, _halo_rows(x, th), taps_packed, bias.reshape(1, -1))


def eligible(x_shape: Tuple[int, ...], w_shape: Tuple[int, ...]) -> bool:
    """Same-channel 3x3 with even geometry; the C=64 pairing needs lanes
    aligned, larger C works via the 9-pass path."""
    if len(x_shape) != 4 or len(w_shape) != 4:
        return False
    n, h, w, c = x_shape
    kh, kw, ci, co = w_shape
    return (
        kh == 3 and kw == 3 and ci == c and co == c
        and c in (64, 128, 256, 512)
        and h >= 8 and w >= 8 and w % 8 == 0 and h % 8 == 0
    )


def _prep(w_hwio, c, dtype):
    taps = _taps_from_hwio(w_hwio.astype(dtype))
    return _pack_taps_c64(taps) if c == 64 else taps


def _flip_transpose(w_hwio):
    """Adjoint weights: spatial flip + swap I/O."""
    return jnp.transpose(w_hwio[::-1, ::-1], (0, 1, 3, 2))


@jax.custom_vjp
def conv3x3_relu(x: jax.Array, w_hwio: jax.Array, bias: jax.Array) -> jax.Array:
    """relu(conv2d(x, w, stride 1, pad 1) + b) on NHWC, C_in == C_out.

    Matches ``jax.nn.relu(lax.conv_general_dilated(...) + b)`` to float
    tolerance (bias adds in f32 here, in the activation dtype there).
    Fully differentiable: dx runs through the Pallas kernel, (dw, db)
    through the XLA linearization (DCE'd when the backbone is frozen) ---
    see module docstring.
    """
    n, h, w, c = x.shape
    th = _tile_h(h, w, c, x.dtype.itemsize)
    return _conv3x3_call(x, _prep(w_hwio, c, x.dtype), bias, relu=True, th=th)


def _fwd(x, w_hwio, bias):
    y = conv3x3_relu(x, w_hwio, bias)
    return y, (x, w_hwio, bias, y)


def _bwd(res, g):
    x, w_hwio, bias, y = res
    # dz = g * relu'(z);  relu'(z) = [y > 0]  (jax.nn.relu convention)
    dz = jnp.where(y > 0, g, jnp.zeros_like(g))
    n, h, w, c = x.shape
    th = _tile_h(h, w, c, x.dtype.itemsize)
    dx = _conv3x3_call(
        dz, _prep(_flip_transpose(w_hwio), c, dz.dtype), jnp.zeros_like(bias),
        relu=False, th=th,
    )
    # True weight/bias cotangents via the XLA linearization of the conv's
    # linear part (the Pallas kernel only accelerates the activation path).
    # Under jit these are dead-code-eliminated whenever the caller does not
    # differentiate w.r.t. the backbone weights (the LPIPS hot path), so
    # they cost nothing there while making e.g. lin-head fine-tuning that
    # reaches the backbone correct instead of silently zero.
    def _linear(wv, bv):
        out = lax.conv_general_dilated(
            x, wv.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + bv.astype(x.dtype)

    _, lin_vjp = jax.vjp(_linear, w_hwio, bias)
    dw, db = lin_vjp(dz)
    return (dx, dw, db)


conv3x3_relu.defvjp(_fwd, _bwd)


def conv3x3_relu_reference(x, w_hwio, bias):
    """XLA oracle with identical semantics (for tests/dispatch fallback)."""
    y = lax.conv_general_dilated(
        x, w_hwio.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.nn.relu(y + bias.astype(y.dtype))
