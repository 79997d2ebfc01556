"""Upsample-FIR-downsample 2D resampling (``upfirdn2d``) for TPU.

This is the workhorse of all StyleGAN2 up/down-sampling.  Functional spec is
the reference's pure-PyTorch fallback ``upfirdn2d_native``
(/root/reference/src/op/upfirdn2d.py:168-209):

    1. zero-stuff the input by ``up`` along H and W (each sample followed by
       ``up-1`` zeros),
    2. pad (or crop, for negative pads) by ``(pad0, pad1)`` per axis,
    3. correlate with the spatially flipped FIR kernel (i.e. convolve),
    4. keep every ``down``-th output sample.

The CUDA kernel being replaced lives at
/root/reference/src/op/upfirdn2d_kernel.cu:49-207 with six tiled
specializations picked at :245-309.  On TPU none of that machinery is
needed for a correct baseline: ``lax.conv_general_dilated`` expresses the
whole op in one fused XLA convolution --- ``lhs_dilation`` is the zero
stuffing, explicit (possibly negative) padding is step 2, window strides
are the down-sampling.  XLA pads *after* dilation to ``(H-1)*up+1``
elements, i.e. ``up-1`` trailing zeros short of the reference layout, so we
fold those into the high padding.

Because every kernel used by StyleGAN2 is an outer product of a 1-D kernel
(``make_kernel``, /root/reference/src/model.py:22-30), a separable two-pass
path (H then W) is used automatically when the kernel is rank-1; it does
O(k) work per output instead of O(k^2).

Gradients (including double-backward, which the reference implements by
hand at /root/reference/src/op/upfirdn2d.py:20-146) come for free from JAX
autodiff of the conv primitive.

Layout note: this framework is NHWC-native (TPU lane dim = channels).  A
``upfirdn2d_nchw`` wrapper is provided for reference-layout callers.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Pad = Union[Tuple[int, int], Tuple[int, int, int, int]]


def _pair(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        a, b = v
        return int(a), int(b)
    return int(v), int(v)


def _pad4(pad: Pad) -> Tuple[int, int, int, int]:
    """Normalize to (pad_x0, pad_x1, pad_y0, pad_y1), ref upfirdn2d.py:156-157."""
    if len(pad) == 2:
        p0, p1 = pad
        return int(p0), int(p1), int(p0), int(p1)
    p = tuple(int(v) for v in pad)
    return p  # type: ignore[return-value]


def make_kernel(k: Sequence[float]) -> np.ndarray:
    """Normalized FIR kernel; 1-D input becomes its outer product.

    Ref: /root/reference/src/model.py:22-30.
    """
    k = np.asarray(k, dtype=np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    k = k / k.sum()
    return k


def _is_separable(kernel: np.ndarray) -> bool:
    if kernel.ndim != 2:
        return False
    if 1 in kernel.shape:
        return False  # already 1-D; nothing to split
    # f32-appropriate threshold: kernels arrive as float32 outer products,
    # so rank-1-ness only holds to ~f32 eps (the default (1,3,3,1)/16 is
    # exactly representable, which masked this for non-stock kernels)
    s = np.linalg.svd(np.asarray(kernel, np.float64), compute_uv=False)
    return bool(s[1] <= 1e-6 * max(s[0], 1e-30))


def _split_separable(kernel: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """kernel = outer(ky, kx), gain split EVENLY (sqrt(s0) per axis) so a
    square-symmetric kernel yields ky == kx; signs normalized so blur
    kernels (positive mass) come out positive on both axes."""
    u, s, vt = np.linalg.svd(np.asarray(kernel, np.float64))
    r = np.sqrt(s[0])
    ky = u[:, 0] * r
    kx = vt[0, :] * r
    if ky.sum() < 0 and kx.sum() < 0:  # outer(-a,-b) == outer(a,b)
        ky, kx = -ky, -kx
    return ky.astype(kernel.dtype), kx.astype(kernel.dtype)


def _upfirdn1d(
    x: jax.Array,
    kernel: jax.Array,
    axis: int,  # 1 (H) or 2 (W) of NHWC
    up: int,
    down: int,
    pad0: int,
    pad1: int,
) -> jax.Array:
    """One-axis upfirdn as a depthwise conv along a single spatial axis."""
    c = x.shape[-1]
    klen = kernel.shape[0]
    k = jnp.flip(kernel, 0).astype(x.dtype)
    if axis == 1:
        rhs = jnp.broadcast_to(k[:, None, None, None], (klen, 1, 1, c))
        strides = (down, 1)
        padding = ((pad0, pad1 + up - 1), (0, 0))
        lhs_dilation = (up, 1)
    else:
        rhs = jnp.broadcast_to(k[None, :, None, None], (1, klen, 1, c))
        strides = (1, down)
        padding = ((0, 0), (pad0, pad1 + up - 1))
        lhs_dilation = (1, up)
    return lax.conv_general_dilated(
        x,
        rhs,
        window_strides=strides,
        padding=padding,
        lhs_dilation=lhs_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


# --- optional Pallas backend ------------------------------------------------
# Covers the hot per-layer specializations (4x4 separable blur and the
# polyphase 2x upsample-blur); everything else stays on the XLA path.
_PALLAS_ENABLED = False


def enable_pallas(on: bool = True) -> None:
    """Route eligible upfirdn2d calls through the Pallas TPU kernels.

    The switch is read at TRACE time, so flipping it invalidates jit
    caches --- otherwise a previously compiled executable (built under
    the other setting) would silently keep running."""
    global _PALLAS_ENABLED
    if bool(on) != _PALLAS_ENABLED:
        jax.clear_caches()
    _PALLAS_ENABLED = bool(on)


# One-pass (non-separable) blur lowering: the separable path is 2
# depthwise convs = 2 HBM round trips of the feature map; one 4x4 pass
# does 2x the tap math but half the traffic. Measured on v5e: +13% imgs/s
# at 1024px generation (late layers C=32/64 are bandwidth-bound AND
# lane-starved, so the extra taps are free), neutral at 256px (C>=128).
# Auto policy below: separable only when C >= 128; global override via
# enable_one_pass_blur / bench.py --blur_one_pass.
_FORCE_ONE_PASS = False
_SEPARABLE_MIN_LANES = 128


def enable_one_pass_blur(on: bool = True) -> None:
    global _FORCE_ONE_PASS
    if bool(on) != _FORCE_ONE_PASS:
        jax.clear_caches()  # trace-time switch; see enable_pallas
    _FORCE_ONE_PASS = bool(on)


_POLYPHASE_UPSAMPLE = False


def enable_polyphase_upsample(on: bool = True) -> None:
    """Route the ToRGB-skip 2x upsample through the shifted-add polyphase
    spelling instead of the lhs-dilated conv (A/B knob; see the gate in
    ``upfirdn2d``)."""
    global _POLYPHASE_UPSAMPLE
    if bool(on) != _POLYPHASE_UPSAMPLE:
        jax.clear_caches()
    _POLYPHASE_UPSAMPLE = bool(on)


def pallas_enabled() -> bool:
    return _PALLAS_ENABLED


def _try_pallas(x, kernel_np, up, down, pads):
    from . import upfirdn2d_pallas as pk

    up_y, up_x = up
    down_y, down_x = down
    pad_x0, pad_x1, pad_y0, pad_y1 = pads
    if down != (1, 1) or kernel_np.shape != (4, 4) or x.ndim != 4:
        return None
    if min(pad_x0, pad_x1, pad_y0, pad_y1) < 0:
        return None
    if x.shape[3] % 128:
        return None  # DMA slab lane dim must be 128-aligned (Mosaic tiling)
    k1d = pk.split_symmetric_4tap(kernel_np)
    if k1d is None:
        return None
    if up == (1, 1):
        out_h = x.shape[1] + pad_y0 + pad_y1 - 3
        out_w = x.shape[2] + pad_x0 + pad_x1 - 3
        # Mosaic wants the output width sublane-aligned; realistic synthesis
        # shapes (powers of two >= 8) all qualify.
        if out_h < 8 or out_w < 8 or out_h % 8 or out_w % 8:
            return None
        return pk.blur4(x, k1d, k1d, (pad_y0, pad_y1), (pad_x0, pad_x1))
    if up == (2, 2) and pads == (2, 1, 2, 1):
        if x.shape[1] < 8 or x.shape[2] < 8 or x.shape[1] % 4 or x.shape[2] % 4:
            return None
        return pk.upblur4(x, k1d)
    return None


def upfirdn2d(
    x: jax.Array,
    kernel,
    up: Union[int, Tuple[int, int]] = 1,
    down: Union[int, Tuple[int, int]] = 1,
    pad: Pad = (0, 0),
    separable: Union[bool, None] = None,
) -> jax.Array:
    """upfirdn2d on NHWC input.

    Args:
      x: [N, H, W, C].
      kernel: 2-D FIR kernel (numpy or jax array; concrete at trace time for
        the separability check).
      up/down: int or (y, x) factor.
      pad: (pad0, pad1) applied to both axes, or (x0, x1, y0, y1)
        (reference convention, src/op/upfirdn2d.py:156-157).  May be
        negative (crop).
      separable: force (True) / forbid (False) the two-pass separable path;
        None = auto-detect rank-1 kernels.

    Returns: [N, out_h, out_w, C] with
      out_h = (H*up_y + pad_y0 + pad_y1 - kh) // down_y + 1.
    """
    up_y, up_x = _pair(up)
    down_y, down_x = _pair(down)
    pad_x0, pad_x1, pad_y0, pad_y1 = _pad4(pad)

    kernel_np = np.asarray(kernel, dtype=np.float32)
    if kernel_np.ndim == 1:
        kernel_np = np.outer(kernel_np, kernel_np)

    if _PALLAS_ENABLED:
        out = _try_pallas(
            x, kernel_np, (up_y, up_x), (down_y, down_x),
            (pad_x0, pad_x1, pad_y0, pad_y1),
        )
        if out is not None:
            return out

    # Polyphase spelling of the ToRGB-skip upsample case (up=2, 4-tap
    # separable, pad (2,1)): each output parity is a 2-tap blend of the
    # input --- pure shifted adds on the VPU, no zero-stuffed convolution.
    # OPT-IN (enable_polyphase_upsample): an earlier gate here was dead
    # (the pre-fix _split_separable folded the whole gain into ky, so
    # ky == kx never held) --- every measured BASELINE.md number runs the
    # conv lowering below, so the shifted-add spelling stays off until
    # the A/B on real hardware says otherwise.
    if (
        _POLYPHASE_UPSAMPLE
        and (up_y, up_x) == (2, 2)
        and (down_y, down_x) == (1, 1)
        and (pad_x0, pad_x1, pad_y0, pad_y1) == (2, 1, 2, 1)
        and kernel_np.shape == (4, 4)
        and x.ndim == 4
        and _is_separable(kernel_np)
    ):
        ky, kx = _split_separable(kernel_np)
        if np.allclose(ky, kx, atol=1e-6):
            # taps enter the polyphase slots REVERSED (correlation with
            # the flipped kernel); identity for palindromic kernels
            return _upblur2x_polyphase(x, tuple(float(v) for v in ky[::-1]))

    # Negative pads: XLA's convolution treats negative window padding as
    # undefined on some backends (observed nondeterministic garbage on
    # CPU), so lower the zero-stuffing AND the signed pads through
    # lax.pad (interior = up-1, negative edges crop — the reference's
    # pad-then-slice semantics, src/op/upfirdn2d.py:203-209) and continue
    # with a plain convolution.
    if min(pad_x0, pad_x1, pad_y0, pad_y1) < 0:
        x = lax.pad(
            x,
            jnp.zeros((), x.dtype),
            (
                (0, 0, 0),
                (pad_y0, pad_y1 + up_y - 1, up_y - 1),
                (pad_x0, pad_x1 + up_x - 1, up_x - 1),
                (0, 0, 0),
            ),
        )
        up_y = up_x = 1
        pad_x0 = pad_x1 = pad_y0 = pad_y1 = 0

    if separable is None:
        separable = (
            not _FORCE_ONE_PASS
            and x.shape[-1] >= _SEPARABLE_MIN_LANES
            and _is_separable(kernel_np)
        )

    if separable:
        ky, kx = _split_separable(kernel_np)
        y = _upfirdn1d(x, jnp.asarray(ky), 1, up_y, down_y, pad_y0, pad_y1)
        y = _upfirdn1d(y, jnp.asarray(kx), 2, up_x, down_x, pad_x0, pad_x1)
        return y

    c = x.shape[-1]
    kh, kw = kernel_np.shape
    k = jnp.flip(jnp.asarray(kernel_np), (0, 1)).astype(x.dtype)
    rhs = jnp.broadcast_to(k[:, :, None, None], (kh, kw, 1, c))
    return lax.conv_general_dilated(
        x,
        rhs,
        window_strides=(down_y, down_x),
        padding=((pad_y0, pad_y1 + up_y - 1), (pad_x0, pad_x1 + up_x - 1)),
        lhs_dilation=(up_y, up_x),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def _upblur2x_polyphase(x: jax.Array, k: Tuple[float, float, float, float]) -> jax.Array:
    """upfirdn2d(x, outer(q,q), up=2, pad=(2,1)) via 2x2 polyphase, where
    ``k`` = reversed(q) (the caller flips once; correlation-with-flipped):
        out[2i]   = k0*xp[i]   + k2*xp[i+1]
        out[2i+1] = k1*xp[i+1] + k3*xp[i+2]     (xp = x zero-padded by 1)
    per axis.  Shifted adds only --- VPU-shaped, conv-free."""
    n, h, w, c = x.shape
    k0, k1, k2, k3 = k
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ve = k0 * xp[:, 0:h] + k2 * xp[:, 1 : h + 1]
    vo = k1 * xp[:, 1 : h + 1] + k3 * xp[:, 2 : h + 2]
    v = jnp.stack([ve, vo], axis=2).reshape(n, 2 * h, w + 2, c)
    he = k0 * v[:, :, 0:w] + k2 * v[:, :, 1 : w + 1]
    ho = k1 * v[:, :, 1 : w + 1] + k3 * v[:, :, 2 : w + 2]
    return jnp.stack([he, ho], axis=3).reshape(n, 2 * h, 2 * w, c)


def pack_upsample2x(x: jax.Array, kernel=(1, 3, 3, 1)) -> Optional[jax.Array]:
    """Phase-packed 2x upsample: ``space_to_depth(upsample2x(x, kernel))``
    computed entirely at COARSE resolution.

    Returns [N, H, W, 4C] phase-major (packed channel (p*2+q)*C + c holds
    fine pixel (2u+p, 2v+q, c) of the reference Upsample module's output,
    src/model.py:33-51) via the 2x2 polyphase decomposition: each output
    phase is a 2-tap-per-axis blend of the zero-padded input --- shifted
    adds on the VPU, no zero-stuffed fine-resolution convolution and no
    fine-layout intermediate.  Used by the phase-packed tail blocks to
    fold the ToRGB skip sum into the packed epilogue (the default path's
    ``upsample2x`` runs a lane-starved C=3 FIR at FINE resolution --- the
    single largest non-conv cost in the measured 1024px block roofline).

    Returns None when the kernel is not an eligible 4-tap separable
    square kernel (caller falls back to the fine-resolution spelling).
    """
    k = make_kernel(kernel) * 4.0
    if k.shape != (4, 4) or not _is_separable(k):
        return None
    ky, kx = _split_separable(k)
    if not np.allclose(ky, kx, atol=1e-6):
        return None
    # taps enter the polyphase slots REVERSED (correlation with the
    # flipped kernel), exactly as in _upblur2x_polyphase
    k0, k1, k2, k3 = (float(v) for v in ky[::-1])
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    r0 = k0 * xp[:, 0:h] + k2 * xp[:, 1 : h + 1]  # fine rows 2u   [n,h,w+2,c]
    r1 = k1 * xp[:, 1 : h + 1] + k3 * xp[:, 2 : h + 2]  # fine rows 2u+1

    def _cols(v):
        e = k0 * v[:, :, 0:w] + k2 * v[:, :, 1 : w + 1]
        o = k1 * v[:, :, 1 : w + 1] + k3 * v[:, :, 2 : w + 2]
        return e, o

    p00, p01 = _cols(r0)
    p10, p11 = _cols(r1)
    return jnp.concatenate([p00, p01, p10, p11], axis=-1)


def upfirdn2d_nchw(x, kernel, up=1, down=1, pad=(0, 0), separable=None):
    """Reference-layout ([N, C, H, W]) wrapper, API-compatible with
    /root/reference/src/op/upfirdn2d.py:149-165."""
    y = jnp.transpose(x, (0, 2, 3, 1))
    y = upfirdn2d(y, kernel, up=up, down=down, pad=pad, separable=separable)
    return jnp.transpose(y, (0, 3, 1, 2))


# ---------------------------------------------------------------------------
# Derived resampling helpers (pad arithmetic per reference model.py)
# ---------------------------------------------------------------------------


def upsample2x(x: jax.Array, kernel=(1, 3, 3, 1)) -> jax.Array:
    """2x upsample, ref Upsample module (src/model.py:33-51): kernel gain
    factor**2, pad0=(p+1)//2+factor-1, pad1=p//2 with p=len(k)-factor."""
    k = make_kernel(kernel) * 4.0
    p = k.shape[0] - 2
    pad0 = (p + 1) // 2 + 1
    pad1 = p // 2
    return upfirdn2d(x, k, up=2, down=1, pad=(pad0, pad1))


def downsample2x(x: jax.Array, kernel=(1, 3, 3, 1)) -> jax.Array:
    """2x downsample, ref Downsample module (src/model.py:54-72)."""
    k = make_kernel(kernel)
    p = k.shape[0] - 2
    pad0 = (p + 1) // 2
    pad1 = p // 2
    return upfirdn2d(x, k, up=1, down=2, pad=(pad0, pad1))


def blur(x: jax.Array, kernel, pad: Tuple[int, int], upsample_factor: int = 1) -> jax.Array:
    """Plain FIR blur, ref Blur module (src/model.py:75-91)."""
    k = make_kernel(kernel)
    if upsample_factor > 1:
        k = k * (upsample_factor**2)
    return upfirdn2d(x, k, pad=pad)
