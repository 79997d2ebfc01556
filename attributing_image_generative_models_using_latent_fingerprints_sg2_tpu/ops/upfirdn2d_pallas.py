"""Pallas TPU kernels for the hot upfirdn2d specializations.

The reference ships six tiled CUDA specializations of upfirdn2d picked by
(up, down, ksize) (/root/reference/src/op/upfirdn2d_kernel.cu:245-309).
The TPU equivalents here cover the two cases the synthesis network
actually executes per layer:

- ``blur4``:   up=1, down=1, 4x4 separable FIR (the post-conv-transpose
               Blur, src/model.py:191-197) with arbitrary (pad0, pad1);
- ``upblur4``: up=2, down=1, 4x4 separable FIR, pad=(2,1) (the ToRGB
               skip Upsample, src/model.py:33-51) --- realized as its
               polyphase decomposition: each output parity row/col is a
               2-tap filter of the input, so the zero-stuffed convolution
               never materializes.

Design (one pass through VMEM instead of two XLA depthwise convs):
the input is zero-padded by XLA (fused, cheap), so every grid step can
DMA a statically-sized row band HBM->VMEM, apply the vertical taps, the
horizontal taps, and write one output tile.  All tap arithmetic is
VPU-shaped ([rows, W, C] with C on lanes); the kernel weights are
compile-time constants.

Numerics match the XLA path to float tolerance; `upfirdn2d` dispatches
here automatically when enabled (ops.upfirdn2d.enable_pallas) and the
case/shape is eligible, falling back to XLA otherwise.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(out_h: int, target: int = 64) -> int:
    """Largest divisor of out_h that is <= target."""
    t = max(1, min(out_h, target))
    while out_h % t:
        t -= 1
    return t


def _tile_for_budget(out_h: int, row_bytes: int, live_factor: int, budget: int = 10 << 20) -> int:
    """Tile height so that live_factor copies of the band fit in VMEM
    (Mosaic stack-allocates every live temporary, double-buffered)."""
    target = max(8, budget // max(1, row_bytes * live_factor))
    return _pick_tile(out_h, min(64, target))


# ---------------------------------------------------------------------------
# blur4: up=down=1, 4-tap separable kernel
# ---------------------------------------------------------------------------


def _blur4_kernel(x_hbm, o_ref, scratch, sem, *, th, out_w, c, kyf, kxf):
    n = pl.program_id(0)
    jt = pl.program_id(1)
    rows = th + 3
    dma = pltpu.make_async_copy(
        x_hbm.at[n, pl.ds(jt * th, rows), :, :], scratch, sem
    )
    dma.start()
    dma.wait()
    x = scratch[:]  # [rows, out_w + 3, C]
    # vertical taps -> [th, out_w+3, C]
    v = (
        kyf[0] * x[0:th]
        + kyf[1] * x[1 : th + 1]
        + kyf[2] * x[2 : th + 2]
        + kyf[3] * x[3 : th + 3]
    )
    # horizontal taps -> [th, out_w, C]
    o_ref[0] = (
        kxf[0] * v[:, 0:out_w]
        + kxf[1] * v[:, 1 : out_w + 1]
        + kxf[2] * v[:, 2 : out_w + 2]
        + kxf[3] * v[:, 3 : out_w + 3]
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
@functools.partial(
    jax.jit, static_argnames=("ky", "kx", "pad_y", "pad_x")
)
def blur4(
    x: jax.Array,
    ky: Tuple[float, ...],
    kx: Tuple[float, ...],
    pad_y: Tuple[int, int],
    pad_x: Tuple[int, int],
) -> jax.Array:
    """4x4 separable FIR on NHWC; out = H + pad0 + pad1 - 3 per axis.

    Differentiable via custom VJP (Pallas kernels with manual DMA have no
    JVP rule): the adjoint of correlate-with-K under pads (p0, p1) is
    correlate-with-flip(K) under pads (3-p0, 3-p1) --- the same rule the
    reference hand-codes at src/op/upfirdn2d.py:112-117,129-136 --- and is
    evaluated through the XLA path, which keeps double-backward intact.
    """
    n, h, w, c = x.shape
    out_h = h + pad_y[0] + pad_y[1] - 3
    out_w = w + pad_x[0] + pad_x[1] - 3
    # zero-pad so in-kernel reads are static "valid" windows; the padded
    # width additionally rounds up to a multiple of 8 (Mosaic requires DMA
    # slab second-minor dims aligned to the sublane tiling)
    wp = -(-(out_w + 3) // 8) * 8
    xp = jnp.pad(
        x,
        (
            (0, 0),
            (pad_y[0], pad_y[1]),
            (pad_x[0], pad_x[1] + (wp - (out_w + 3))),
            (0, 0),
        ),
    )
    th = _tile_for_budget(out_h, wp * c * x.dtype.itemsize, live_factor=8)
    kyf = tuple(reversed(ky))  # correlation with flipped kernel
    kxf = tuple(reversed(kx))
    kernel = functools.partial(
        _blur4_kernel, th=th, out_w=out_w, c=c, kyf=kyf, kxf=kxf
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, out_h, out_w, c), x.dtype),
        grid=(n, out_h // th),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, th, out_w, c), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((th + 3, wp, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(xp)


def _blur4_fwd(x, ky, kx, pad_y, pad_x):
    return blur4(x, ky, kx, pad_y, pad_x), None


def _blur4_bwd(ky, kx, pad_y, pad_x, _, g):
    from .upfirdn2d import upfirdn2d as _xla_upfirdn

    kern = np.outer(
        np.asarray(ky, np.float32)[::-1], np.asarray(kx, np.float32)[::-1]
    )
    dx = _xla_upfirdn(
        g,
        kern,
        pad=(3 - pad_x[0], 3 - pad_x[1], 3 - pad_y[0], 3 - pad_y[1]),
    )
    return (dx,)


blur4.defvjp(_blur4_fwd, _blur4_bwd)


# ---------------------------------------------------------------------------
# upblur4: up=2, down=1, 4-tap separable kernel, pad=(2,1)  (polyphase)
# ---------------------------------------------------------------------------


def _upblur4_kernel(x_hbm, o_ref, scratch, sem, *, th, w, c, k):
    """th input rows -> 2*th output rows; w input cols -> 2*w output cols.

    Polyphase: with xp pre-padded by 1 on each side and q = reversed(k)
    (correlation with the flipped kernel, as in blur4),
      out[2i]   = q0*xp[i]   + q2*xp[i+1]
      out[2i+1] = q1*xp[i+1] + q3*xp[i+2]
    applied vertically then horizontally.  ``k`` here is already the
    reversed taps (the caller flips once).
    """
    n = pl.program_id(0)
    jt = pl.program_id(1)
    rows = th + 2
    dma = pltpu.make_async_copy(
        x_hbm.at[n, pl.ds(jt * th, rows), :, :], scratch, sem
    )
    dma.start()
    dma.wait()
    x = scratch[:]  # [th+2, w+2, C]
    k0, k1, k2, k3 = k
    # vertical polyphase -> [2*th, w+2, C]
    v_even = k0 * x[0:th] + k2 * x[1 : th + 1]
    v_odd = k1 * x[1 : th + 1] + k3 * x[2 : th + 2]
    v = jnp.stack([v_even, v_odd], axis=1).reshape(2 * th, x.shape[1], x.shape[2])
    # horizontal polyphase -> [2*th, 2*w, C]
    h_even = k0 * v[:, 0:w] + k2 * v[:, 1 : w + 1]
    h_odd = k1 * v[:, 1 : w + 1] + k3 * v[:, 2 : w + 2]
    o_ref[0] = jnp.stack([h_even, h_odd], axis=2).reshape(2 * th, 2 * w, v.shape[2])


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
@functools.partial(jax.jit, static_argnames=("k",))
def upblur4(x: jax.Array, k: Tuple[float, float, float, float]) -> jax.Array:
    """upfirdn2d(x, outer(k,k), up=2, pad=(2,1)) for separable 4-tap k.

    ``k`` is the per-axis kernel *including* the per-axis gain (the ToRGB
    Upsample uses make_kernel([1,3,3,1]) * 4 => per-axis [1,3,3,1]/8*2).
    Correct for any taps: the polyphase slots take the REVERSED taps
    (correlation with the flipped kernel); for palindromic kernels
    (every stock StyleGAN2 blur) the flip is the identity.
    """
    n, h, w, c = x.shape
    wp = -(-(w + 2) // 8) * 8  # align DMA slab width to sublane tiling
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1 + (wp - (w + 2))), (0, 0)))
    th = _tile_for_budget(h, wp * c * x.dtype.itemsize, live_factor=14)
    kernel = functools.partial(
        _upblur4_kernel, th=th, w=w, c=c, k=tuple(reversed(k))
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 2 * h, 2 * w, c), x.dtype),
        grid=(n, h // th),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 2 * th, 2 * w, c), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((th + 2, wp, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(xp)


def _upblur4_fwd(x, k):
    return upblur4(x, k), None


def _upblur4_bwd(k, _, g):
    """Adjoint of up=2/pad=(2,1): down=2 with flipped kernel and g_pad=(1,1)
    (ref backward rule src/op/upfirdn2d.py:112-117)."""
    from .upfirdn2d import upfirdn2d as _xla_upfirdn

    kern = np.outer(np.asarray(k, np.float32)[::-1], np.asarray(k, np.float32)[::-1])
    dx = _xla_upfirdn(g, kern, down=2, pad=(1, 1))
    return (dx,)


upblur4.defvjp(_upblur4_fwd, _upblur4_bwd)


# ---------------------------------------------------------------------------
# Eligibility helpers used by the dispatcher in ops.upfirdn2d
# ---------------------------------------------------------------------------


def split_symmetric_4tap(kernel_np: np.ndarray):
    """If kernel is outer(k, k) with len(k) == 4, return k (with per-axis
    gain folded as sqrt of total), else None."""
    if kernel_np.shape != (4, 4):
        return None
    u, s, vt = np.linalg.svd(kernel_np.astype(np.float64))
    # f32-appropriate thresholds: kernels arrive as float32 outer
    # products whose taps are rarely exactly representable (the default
    # (1,3,3,1)/16 IS exact, which masked this), so rank-1-ness and
    # symmetry only hold to ~f32 eps, not 1e-12.
    if s[1] > 1e-6 * max(s[0], 1e-30):
        return None
    ky = u[:, 0] * np.sqrt(s[0])
    kx = vt[0, :] * np.sqrt(s[0])
    if not np.allclose(ky, kx, atol=1e-6):
        # only square-symmetric kernels (all StyleGAN2 kernels are)
        if np.allclose(ky, -kx, atol=1e-6):
            ky, kx = -ky, -kx
        else:
            return None
    if ky.sum() < 0:
        ky = -ky
    return tuple(float(v) for v in ky)
