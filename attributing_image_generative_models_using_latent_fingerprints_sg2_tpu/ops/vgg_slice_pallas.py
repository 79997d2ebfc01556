"""Fused VGG slice-1 Pallas kernel: conv(3->64)+ReLU+conv(64->64)+ReLU
in one VMEM-resident pass, with a backward kernel that recomputes the
first ReLU mask in-kernel instead of saving `relu1_1`.

Why (BASELINE.md roofline): the LPIPS segment of the attribution step is
the measured bandwidth/emitter wall past 405 chain-steps/s at 256px.
Slice 1 is its largest contributor: two C=64 convs over the full-res
[B,256,256,*] maps, whose intermediate activation (`relu1_1`,
8.4 MB/chain bf16) XLA must materialize twice in the forward (write +
read --- convs never fuse into convs) and once more as the backward's
ReLU residual.  This kernel is the multi-op fusion the round-2 per-op
experiments (ops/vgg_pallas.py, five C=64 conv spellings, all measured
slower) pointed to as the only remaining shape that can win: the same
fuse-the-whole-pipeline ethos as the reference's single-pass CUDA
upfirdn2d (/root/reference/src/op/upfirdn2d_kernel.cu:107-207), applied
to the LPIPS backbone the reference runs through stock cuDNN
(/root/reference/src/custom_lpips/pretrained_networks.py:121-135).

Traffic accounting per chain at 256px bf16 (counting conv operands,
which TPU XLA materializes in HBM):

  forward   XLA: read x(0.4) + write a1(8.4) + read a1(8.4) + write a2(8.4)
            fused: read x(0.4) + write a2(8.4)          saves 16.8 MB
  backward  XLA: g/a2 reads + dz2 w+r + a1 residual read + da1 w+r
                 + dz1 w+r + dx write           ~= 59 MB
            fused: read g(8.4) + read a2(8.4) + read x(0.4) + write dx(0.4)
                                                          saves ~41 MB
            (a1 is never stored at all: the backward kernel recomputes
             conv1(x) --- 1/21 of the slice FLOPs --- for its sign only)

The catch, and the honest A/B criterion: the in-kernel C=64 matmuls run
at the paired-tap rate measured in round 2 (~25 TF/s) vs the XLA conv
emitter's 36.7 TF/s, so the fusion trades ~1.9 ms of extra compute
against ~0.9 ms of saved traffic per 16-chain step --- the measured
numbers live in BASELINE.md next to the `--fused_slice` bench flag.

Kernel structure (both directions):
- grid (N, H/TH); row-band processing with halo rows delivered as a
  caller-gathered side input (Mosaic cannot DMA-slice HBM at lane<128,
  see ops/vgg_pallas.py docstring);
- W shifts via the flattened-view rotation trick with zeroed pad
  columns (pad columns re-zeroed between the two convs so the chained
  conv sees true zero padding);
- conv(3->64) as ONE [M,27]x[27,64] matmul (9 taps lane-concatenated
  along the contraction); conv(64->64) as 4 paired [M,128]x[128,64]
  matmuls + 1 single (the round-2 paired-tap spelling); the backward's
  conv_T(64->3) as 4 paired + 1 single [M,128]x[128,3];
- band edge rows zeroed per the zero-padding semantics (a1 pad rows in
  the forward; dz1 pad rows in the backward).
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

from .vgg_pallas import _WPAD, _pick_tile

# ---------------------------------------------------------------------------
# weight packing
# ---------------------------------------------------------------------------


def _pack27(w_hwio: jax.Array) -> jax.Array:
    """[3,3,3,64] -> [27,64] taps ordered (dy, dx, cin) row-major."""
    kh, kw, ci, co = w_hwio.shape
    return w_hwio.reshape(kh * kw * ci, co)


def _pack_pairs(w_hwio: jax.Array) -> jax.Array:
    """[3,3,C,Co] -> [5, 2C, Co]: 9 taps paired along the contraction,
    the 10th slot zero (ops/vgg_pallas._pack_taps_c64 generalized to any
    output width Co)."""
    kh, kw, ci, co = w_hwio.shape
    taps = w_hwio.reshape(kh * kw, ci, co)
    t = jnp.concatenate([taps, jnp.zeros_like(taps[:1])], axis=0)  # [10,C,Co]
    return t.reshape(5, 2 * ci, co)


def _flip_io(w_hwio: jax.Array) -> jax.Array:
    """Adjoint conv weights: spatial flip + swap in/out channels."""
    return jnp.transpose(w_hwio[::-1, ::-1], (0, 1, 3, 2))


# ---------------------------------------------------------------------------
# in-kernel helpers
# ---------------------------------------------------------------------------


def _rot(flat: jax.Array, m: int, dx: int) -> jax.Array:
    """Zero-padded W shift on the flattened [M, C] band view (the wrap
    rows land in the zeroed pad columns)."""
    if dx == 0:  # needs x[j-1]: rotate down one flat row
        return jnp.concatenate([flat[m - 1 :], flat[: m - 1]], axis=0)
    if dx == 2:  # needs x[j+1]: rotate up one flat row
        return jnp.concatenate([flat[1:], flat[:1]], axis=0)
    return flat


def _conv_from_band(band_ref, rows: int, wp: int, c: int, taps_pairs, bias, relu):
    """rows x wp output rows of conv3x3 from a (rows+2) x wp x c band.

    taps_pairs: [5, 2c, co] paired taps.  Returns f32 [rows*wp, co]."""
    m = rows * wp

    def shifted(dy, dx):
        flat = band_ref[pl.ds(dy, rows), :, :].reshape(m, c)
        return _rot(flat, m, dx)

    order = [(dy, dx) for dy in range(3) for dx in range(3)]
    co = taps_pairs.shape[-1]
    acc = jnp.zeros((m, co), jnp.float32)
    for a, b in ((0, 1), (2, 3), (4, 5), (6, 7)):
        pair = jnp.concatenate([shifted(*order[a]), shifted(*order[b])], axis=-1)
        acc = acc + jnp.dot(pair, taps_pairs[a // 2], preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(
        shifted(*order[8]), taps_pairs[4, pl.ds(0, c), :],
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        acc = acc + bias
    if relu:
        acc = jnp.maximum(acc, 0.0)
    return acc


def _conv1_from_band(xband_ref, rows: int, wp: int, taps27, bias, relu):
    """rows x wp output rows of the 3-channel conv as ONE [M,27]x[27,64]
    matmul from a (rows+2) x wp x 3 band."""
    m = rows * wp

    def shifted(dy, dx):
        flat = xband_ref[pl.ds(dy, rows), :, :].reshape(m, 3)
        return _rot(flat, m, dx)

    xcat = jnp.concatenate(
        [shifted(dy, dx) for dy in range(3) for dx in range(3)], axis=-1
    )  # [M, 27]
    acc = jnp.dot(xcat, taps27, preferred_element_type=jnp.float32)
    if bias is not None:
        acc = acc + bias
    if relu:
        acc = jnp.maximum(acc, 0.0)
    return acc


def _fill_band(band, tile, halo, rows, w, c, first, last, n_halo):
    """Assemble a (rows + 2*n_halo) x (w+_WPAD) x c VMEM band: zero pad
    columns, tile rows in the middle, halo rows around, out-of-range halo
    rows zeroed at the image edges."""
    total = rows + 2 * n_halo
    band[:, pl.ds(w, _WPAD), :] = jnp.zeros((total, _WPAD, c), band.dtype)
    band[pl.ds(n_halo, rows), pl.ds(0, w), :] = tile
    for i in range(n_halo):
        band[i, pl.ds(0, w), :] = halo[i]
        band[n_halo + rows + i, pl.ds(0, w), :] = halo[n_halo + i]

    @pl.when(first)
    def _zt():
        band[pl.ds(0, n_halo), :, :] = jnp.zeros((n_halo, w + _WPAD, c), band.dtype)

    @pl.when(last)
    def _zb():
        band[pl.ds(n_halo + rows, n_halo), :, :] = jnp.zeros(
            (n_halo, w + _WPAD, c), band.dtype
        )


def _halo_rows_k(x: jax.Array, th: int, n_halo: int) -> jax.Array:
    """[N,H,W,C] -> [N, H//th, 2*n_halo, W, C]: the n_halo rows above and
    below each tile (clamped at the edge; edge tiles zero them in-kernel)."""
    n, h, w, c = x.shape
    nt = h // th
    starts = np.arange(nt) * th
    rows = []
    for i in range(n_halo):
        rows.append(np.maximum(starts - n_halo + i, 0))
    for i in range(n_halo):
        rows.append(np.minimum(starts + th + i, h - 1))
    idx = np.stack(rows, axis=1)  # [nt, 2*n_halo]
    return x[:, idx]  # [N, nt, 2*n_halo, W, C]


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _slice1_fwd_kernel(
    x_ref, xh_ref, t27_ref, b1_ref, t2_ref, b2_ref, o_ref, xband, a1band,
    *, th, w, relu2,
):
    jt = pl.program_id(1)
    first = jt == 0
    last = jt == pl.num_programs(1) - 1
    wp = w + _WPAD

    # x band: th+4 rows (2-row halos), 3 channels
    _fill_band(xband, x_ref[0], xh_ref[0, 0], th, w, 3, first, last, 2)

    # a1 band rows 0..th+2 = relu(conv1(x band)) ; band row r is global
    # row (t0 - 1 + r)
    a1 = _conv1_from_band(xband, th + 2, wp, t27_ref[:], b1_ref[0].astype(jnp.float32), True)
    a1band[:, :, :] = a1.reshape(th + 2, wp, 64).astype(a1band.dtype)
    # restore conv2's zero padding: the pad columns hold relu(b1) after
    # the matmul (conv of zeroed x plus bias), and the out-of-range edge
    # rows hold relu(conv(0)+b1) = relu(b1) as well
    a1band[:, pl.ds(w, _WPAD), :] = jnp.zeros((th + 2, _WPAD, 64), a1band.dtype)

    @pl.when(first)
    def _():
        a1band[0, :, :] = jnp.zeros((wp, 64), a1band.dtype)

    @pl.when(last)
    def _():
        a1band[th + 1, :, :] = jnp.zeros((wp, 64), a1band.dtype)

    a2 = _conv_from_band(
        a1band, th, wp, 64, t2_ref, b2_ref[0].astype(jnp.float32), relu2
    )
    o_ref[0] = a2.reshape(th, wp, 64)[:, 0:w, :].astype(o_ref.dtype)


def _tile_h_fused(h: int, w: int, itemsize: int) -> int:
    # live VMEM ~ a1 band (th+2) + dz2/acc f32 (x4) + in/out blocks x2buf
    per_row = (w + _WPAD) * 64 * itemsize * 18
    return _pick_tile(h, max(8, (10 << 20) // max(1, per_row)))


# The backward's matmul operand staging exceeds the compiler's default
# 16M scoped-vmem limit at bench shapes (measured: 24.08M at
# [16,256,256,*] bf16, th=16); the chip has 128M VMEM, so raise the cap
# instead of shrinking tiles (smaller tiles = more recomputed halo rows).
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _slice1_fwd_call(x, w1, b1, w2, b2, *, relu2=True, tile_h=None):
    n, h, w, _ = x.shape
    th = tile_h or _tile_h_fused(h, w, x.dtype.itemsize)
    kernel = functools.partial(_slice1_fwd_kernel, th=th, w=w, relu2=relu2)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, w, 64), x.dtype),
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec((1, th, w, 3), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 4, w, 3), lambda i, j: (i, j, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # taps27 [27,64]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1 [1,64]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # taps2 [5,128,64]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b2 [1,64]
        ],
        out_specs=pl.BlockSpec(
            (1, th, w, 64), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((th + 4, w + _WPAD, 3), x.dtype),
            pltpu.VMEM((th + 2, w + _WPAD, 64), x.dtype),
        ],
        compiler_params=_COMPILER_PARAMS,
    )(
        x,
        _halo_rows_k(x, th, 2),
        _pack27(w1.astype(x.dtype)),
        b1.reshape(1, -1),
        _pack_pairs(w2.astype(x.dtype)),
        b2.reshape(1, -1),
    )


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------


def _slice1_bwd_kernel(
    g_ref, gh_ref, a2_ref, a2h_ref, x_ref, xh_ref,
    t2f_ref, t27_ref, b1_ref, t1f_ref, o_ref,
    dz2band, xband, dz1band,
    *, th, w,
):
    """dx tile from (g, a2, x) bands.

    chain: dz2 = g * [a2>0]           (rows t0-2 .. t0+th+2)
           da1 = conv_T(dz2, w2)      (rows t0-1 .. t0+th+1)
           dz1 = da1 * [conv1(x)+b1 > 0]   (same rows; conv1 recomputed)
           dx  = conv_T(dz1, w1)      (rows t0 .. t0+th)
    """
    jt = pl.program_id(1)
    first = jt == 0
    last = jt == pl.num_programs(1) - 1
    wp = w + _WPAD

    # dz2 band: th+4 rows.  The out-of-range edge rows zero themselves
    # through the a2>0 mask only if the halos were in range; force-zero
    # via _fill_band's edge zeroing on BOTH inputs.
    _fill_band(dz2band, g_ref[0], gh_ref[0, 0], th, w, 64, first, last, 2)
    # overwrite in place with the masked cotangent (a2 tile + halos).
    # masks compare in f32: Mosaic rejects vector cmpf on packed bf16
    # ("Target does not support this comparison", v5e)
    mask_mid = (a2_ref[0].astype(jnp.float32) > 0).astype(dz2band.dtype)
    dz2band[pl.ds(2, th), pl.ds(0, w), :] = dz2band[pl.ds(2, th), pl.ds(0, w), :] * mask_mid
    for i in range(2):
        mh_top = (a2h_ref[0, 0, i].astype(jnp.float32) > 0).astype(dz2band.dtype)
        dz2band[i, pl.ds(0, w), :] = dz2band[i, pl.ds(0, w), :] * mh_top
        mh_bot = (a2h_ref[0, 0, 2 + i].astype(jnp.float32) > 0).astype(dz2band.dtype)
        dz2band[2 + th + i, pl.ds(0, w), :] = (
            dz2band[2 + th + i, pl.ds(0, w), :] * mh_bot
        )

    # x band for the mask recompute: th+4 rows, 3 channels
    _fill_band(xband, x_ref[0], xh_ref[0, 0], th, w, 3, first, last, 2)

    # da1 rows t0-1 .. t0+th+1 (th+2 rows) via conv_T(dz2) = conv(flipped)
    da1 = _conv_from_band(dz2band, th + 2, wp, 64, t2f_ref, None, False)

    # recomputed pre-activation sign of conv1 over the same th+2 rows
    z1 = _conv1_from_band(xband, th + 2, wp, t27_ref[:], b1_ref[0].astype(jnp.float32), False)
    dz1 = jnp.where(z1 > 0, da1, 0.0)
    dz1band[:, :, :] = dz1.reshape(th + 2, wp, 64).astype(dz1band.dtype)
    # re-zero pad columns (the rotations above wrapped real data into
    # them) and the out-of-range pad rows (their mask is b1>0, not 0)
    dz1band[:, pl.ds(w, _WPAD), :] = jnp.zeros((th + 2, _WPAD, 64), dz1band.dtype)

    @pl.when(first)
    def _():
        dz1band[0, :, :] = jnp.zeros((wp, 64), dz1band.dtype)

    @pl.when(last)
    def _():
        dz1band[th + 1, :, :] = jnp.zeros((wp, 64), dz1band.dtype)

    dx = _conv_from_band(dz1band, th, wp, 64, t1f_ref, None, False)
    o_ref[0] = dx.reshape(th, wp, 3)[:, 0:w, :].astype(o_ref.dtype)


def _slice1_bwd_call(g, a2, x, w1, b1, w2, *, tile_h=None):
    n, h, w, _ = x.shape
    th = tile_h or _tile_h_fused(h, w, x.dtype.itemsize)
    kernel = functools.partial(_slice1_bwd_kernel, th=th, w=w)
    dt = g.dtype
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, w, 3), x.dtype),
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec((1, th, w, 64), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 4, w, 64), lambda i, j: (i, j, 0, 0, 0)),
            pl.BlockSpec((1, th, w, 64), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 4, w, 64), lambda i, j: (i, j, 0, 0, 0)),
            pl.BlockSpec((1, th, w, 3), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 4, w, 3), lambda i, j: (i, j, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2 flipped pairs [5,128,64]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # taps27 [27,64]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1 [1,64]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1 flipped pairs [5,128,3]
        ],
        out_specs=pl.BlockSpec(
            (1, th, w, 3), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((th + 4, w + _WPAD, 64), dt),
            pltpu.VMEM((th + 4, w + _WPAD, 3), x.dtype),
            pltpu.VMEM((th + 2, w + _WPAD, 64), dt),
        ],
        compiler_params=_COMPILER_PARAMS,
    )(
        g,
        _halo_rows_k(g, th, 2),
        a2,
        _halo_rows_k(a2, th, 2),
        x,
        _halo_rows_k(x, th, 2),
        _pack_pairs(_flip_io(w2).astype(dt)),
        _pack27(w1.astype(x.dtype)),
        b1.reshape(1, -1),
        _pack_pairs(_flip_io(w1).astype(dt)),
    )


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------


def eligible(x_shape: Tuple[int, ...]) -> bool:
    if len(x_shape) != 4:
        return False
    n, h, w, c = x_shape
    return c == 3 and h >= 8 and w >= 8 and h % 8 == 0 and w % 8 == 0


@jax.custom_vjp
def vgg_slice1(x, w1, b1, w2, b2):
    """relu(conv2(relu(conv1(x)+b1))+b2), NHWC, 3->64->64 channels ---
    VGG16 slice 1 (relu1_2) in one fused pass.  The intermediate
    `relu1_1` never touches HBM in either direction."""
    return _slice1_fwd_call(x, w1, b1, w2, b2)


def _vjp_fwd(x, w1, b1, w2, b2):
    a2 = vgg_slice1(x, w1, b1, w2, b2)
    return a2, (x, w1, b1, w2, b2, a2)


def _vjp_bwd(res, g):
    x, w1, b1, w2, b2, a2 = res
    dx = _slice1_bwd_call(g, a2, x, w1, b1, w2)
    # true weight/bias cotangents via the XLA linearization; DCE'd on the
    # frozen-backbone hot path (same policy as ops/vgg_pallas._bwd)
    def _ref(w1v, b1v, w2v, b2v):
        return vgg_slice1_reference(x, w1v, b1v, w2v, b2v)

    _, lin_vjp = jax.vjp(_ref, w1, b1, w2, b2)
    dw1, db1, dw2, db2 = lin_vjp(g)
    return (dx, dw1, db1, dw2, db2)


vgg_slice1.defvjp(_vjp_fwd, _vjp_bwd)


def vgg_slice1_reference(x, w1, b1, w2, b2):
    """XLA oracle with identical semantics."""
    def conv(v, wgt, bias):
        y = lax.conv_general_dilated(
            v, wgt.astype(v.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jax.nn.relu(y + bias.astype(y.dtype))

    return conv(conv(x, w1, b1), w2, b2)
