"""StyleGAN2 generator + discriminator in pure functional JAX (NHWC).

Re-design of the reference PyTorch model (/root/reference/src/model.py) for
TPU:

- **NHWC layout** everywhere: channels ride the TPU lane dimension (128
  wide), so the 512/256/128-channel feature maps tile the MXU/VPU directly.
- **Batched modulated convolution without grouped convs.**  The reference
  reshapes the batch into convolution groups to give every sample its own
  modulated weight (src/model.py:265-300).  On TPU that defeats MXU
  batching.  Since convolution is linear in both operands, input-channel
  modulation commutes to scaling the input and output-channel
  demodulation commutes to scaling the output:

      conv(x, W * s_i * d_o)  ==  d_o * conv(x * s_i, W)

  so a single *shared-weight* conv serves the whole batch — exactly what
  the MXU wants — with the demodulation coefficient computed in closed
  form: d[b,o] = rsqrt( sum_i s[b,i]^2 * sum_{k,l} (scale*W[k,l,i,o])^2 + eps ).
  (The reference's own non-fused branch, src/model.py:229-256, validates
  this algebra; here it is the only path.)
- **Transposed conv as dilated conv.**  The upsampling modulated conv
  (src/model.py:269-282) becomes `lax.conv_general_dilated` with
  `lhs_dilation=2`; upsample-layer weights are stored pre-flipped
  spatially so the dilated convolution *is* the transposed convolution.
- **Equalized learning rate** is applied at use-time from static shape
  info (scale = 1/sqrt(fan_in), src/model.py:103,148,208) — weights are
  stored raw so rosinality checkpoints map 1:1.
- Parameters are a plain pytree of nested dicts/tuples; everything here
  is jit/vmap/grad-compatible and free of Python-level state.

Reference architecture facts mirrored exactly: channel map
(src/model.py:418-428), blur pad arithmetic (src/model.py:191-205,
:41-46, :62-67), mapping MLP with lr_mul=0.01 and fused-lrelu
(src/model.py:407-416), noise injection (src/model.py:305-316), skip-sum
ToRGB (src/model.py:369-388), style broadcast / mixing / truncation
semantics (src/model.py:499-548), minibatch-stddev discriminator
(src/model.py:641-699).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..config import ModelConfig
from ..ops.fused_act import fused_leaky_relu
from ..ops.upfirdn2d import make_kernel, pack_upsample2x, upfirdn2d, upsample2x

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Static architecture helpers
# ---------------------------------------------------------------------------


def channel_map(channel_multiplier: int = 2, channel_max: int = 512) -> Dict[int, int]:
    """Per-resolution channel counts, ref src/model.py:418-428.

    ``channel_max`` caps every entry (512 reproduces the reference; lower
    values give cheap test-scale models)."""
    base = {
        4: 512,
        8: 512,
        16: 512,
        32: 512,
        64: 256 * channel_multiplier,
        128: 128 * channel_multiplier,
        256: 64 * channel_multiplier,
        512: 32 * channel_multiplier,
        1024: 16 * channel_multiplier,
    }
    return {k: min(v, channel_max) for k, v in base.items()}


def n_latent(size: int) -> int:
    return int(math.log2(size)) * 2 - 2


def num_noise_layers(size: int) -> int:
    return (int(math.log2(size)) - 2) * 2 + 1


def noise_shapes(size: int) -> List[Tuple[int, int, int, int]]:
    """NHWC noise buffer shapes, ref src/model.py:446-449."""
    shapes = []
    for layer_idx in range(num_noise_layers(size)):
        res = 2 ** ((layer_idx + 5) // 2)
        shapes.append((1, res, res, 1))
    return shapes


# ---------------------------------------------------------------------------
# Primitive layers (pure functions over param dicts)
# ---------------------------------------------------------------------------


def pixel_norm(x: jax.Array, eps: float = 1e-8) -> jax.Array:
    """x / rms(x) over the feature axis, ref src/model.py:14-19."""
    return x * lax.rsqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True) + eps)


def equal_linear(
    x: jax.Array,
    p: Params,
    lr_mul: float = 1.0,
    activation: bool = False,
) -> jax.Array:
    """Equalized-LR linear. p['weight']: [in, out] (JAX layout), p['bias']: [out].

    scale = (1/sqrt(in)) * lr_mul applied at use; bias scaled by lr_mul.
    Ref src/model.py:132-161.
    """
    in_dim = p["weight"].shape[0]
    scale = (1.0 / math.sqrt(in_dim)) * lr_mul
    out = jnp.dot(x, p["weight"] * scale)
    bias = p.get("bias")
    if activation:
        return fused_leaky_relu(out, None if bias is None else bias * lr_mul)
    if bias is not None:
        out = out + bias * lr_mul
    return out


def equal_conv2d(
    x: jax.Array,
    p: Params,
    stride: int = 1,
    padding: int = 0,
) -> jax.Array:
    """Equalized-LR conv. p['weight']: [kh, kw, in, out]. Ref src/model.py:94-123."""
    kh, kw, cin, _ = p["weight"].shape
    scale = 1.0 / math.sqrt(cin * kh * kw)
    out = lax.conv_general_dilated(
        x,
        p["weight"] * scale,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if p.get("bias") is not None:
        out = out + p["bias"]
    return out


def _compose_polyphase_up_kernel(w_stored: jax.Array, blur_kernel: Sequence[int]) -> jax.Array:
    """Fuse (stride-2 conv_transpose, k=3) + (4-tap FIR blur, pad (1,1))
    into ONE dense 3x3 convolution with 4x output channels (2x2 polyphase).

    Derivation: with T the transposed-conv taps and B the blur taps,
        y[t] = sum_i x[i] C[t - 2i],   C[r] = sum_s B[s] T[r + s - 1]
    (r in [-2, 3]); splitting t = 2u + p gives, per parity p,
        y_p[u] = sum_{a in -1..1} C[p - 2a] x[u + a]
    i.e. a 3-tap correlation per output phase.  In 2D each (p, q) phase is
    a 3x3 kernel; stacking the 4 phases as extra output channels turns the
    whole upsample+blur into one MXU-dense conv at *input* resolution
    followed by a depth-to-space reshuffle --- replacing the reference's
    conv_transpose + upfirdn2d pair (src/model.py:269-282,191-197).

    Measured on v5e: the depth-to-space relayout costs more than XLA's
    native lhs_dilation lowering saves (56 vs 40 ms/attribution-step at
    256px bf16), so this path is OFF by default (``fused_upsample=False``)
    and kept as a verified alternative for other hardware generations.

    w_stored: [3, 3, I, O] in this framework's pre-flipped storage (the
    dilated-conv convention); returns [3, 3, I, 4*O] with phases ordered
    (p, q) row-major.
    """
    kh = w_stored.shape[0]
    assert kh == 3 and w_stored.shape[1] == 3
    # unflip storage to recover the conv_transpose taps T
    T = w_stored[::-1, ::-1]
    B = np.asarray(make_kernel(blur_kernel), np.float32) * 4.0  # gain factor^2
    # C[r1+2, r2+2] for r in [-2..3]: 6x6 composed taps
    C = jnp.zeros((6, 6) + T.shape[2:], T.dtype)
    for s1 in range(4):
        for s2 in range(4):
            b = float(B[s1, s2])
            if b == 0.0:
                continue
            # T[r+s-1] valid when 0 <= r+s-1 <= 2  ->  r in [1-s, 3-s]
            r1_lo, r1_hi = max(-2, 1 - s1), min(3, 3 - s1)
            r2_lo, r2_hi = max(-2, 1 - s2), min(3, 3 - s2)
            C = C.at[
                r1_lo + 2 : r1_hi + 3, r2_lo + 2 : r2_hi + 3
            ].add(b * T[r1_lo + s1 - 1 : r1_hi + s1, r2_lo + s2 - 1 : r2_hi + s2])
    # phase kernels: D_pq[a, b] = C[p - 2(a-1), q - 2(b-1)], a,b in 0..2
    phases = []
    for p_ in range(2):
        for q_ in range(2):
            idx1 = [p_ - 2 * (a - 1) + 2 for a in range(3)]  # within [0..5]
            idx2 = [q_ - 2 * (b - 1) + 2 for b in range(3)]
            phases.append(C[jnp.asarray(idx1)][:, jnp.asarray(idx2)])
    # [4][3,3,I,O] -> [3,3,I,4,O] -> [3,3,I,4*O]
    D = jnp.stack(phases, axis=3)
    return D.reshape(D.shape[0], D.shape[1], D.shape[2], -1)


def _depth_to_space2(y4: jax.Array, out_ch: int) -> jax.Array:
    """[B, H, W, 4*O] (phase-major) -> [B, 2H, 2W, O]."""
    b, h, w, _ = y4.shape
    y = y4.reshape(b, h, w, 2, 2, out_ch)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
    return y.reshape(b, 2 * h, 2 * w, out_ch)


def _space_to_depth2(x: jax.Array, in_ch: int) -> jax.Array:
    """[B, 2H, 2W, I] -> [B, H, W, 4*I] (phase-major; inverse of
    :func:`_depth_to_space2`): packed channel (p*2+q)*I + i holds fine
    pixel (2u+p, 2v+q, i)."""
    b, h2, w2, _ = x.shape
    y = x.reshape(b, h2 // 2, 2, w2 // 2, 2, in_ch)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
    return y.reshape(b, h2 // 2, w2 // 2, 4 * in_ch)


def _compose_packed_conv3x3_kernel(w_stored: jax.Array) -> jax.Array:
    """Respell a 3x3 SAME conv at fine resolution as one conv over the
    phase-packed coarse layout: [3, 3, I, O] -> [3, 3, 4I, 4O].

    Fine output pixel (2u+p, 2v+q) tap (a, b) reads fine row
    2u + p + a - 1 = 2(u + A) + p_in with A = floor((p+a-1)/2) and
    p_in = (p+a-1) mod 2 --- i.e. coarse offset A in {-1, 0, 1} and an
    input PHASE channel, so the whole stencil is a 3x3 conv over the
    packed [.., 4I] tensor (quarter-dense: 36 of the 144 (tap, phase_in,
    phase_out) cells are nonzero; the zeros are issued as MACs, which is
    the point --- at C=32 the MXU pads both channel dims to 128 lanes
    and runs at ~6% utilization (measured 8.8 TF/s on the 1024px tail
    block, bench.py --preset gen_roofline), so trading 4x issued FLOPs
    for 16x lane utilization is still a ~4x net win on the MXU rate,
    plus the layout savings).  Boundary exact: padded coarse cells
    expand to exactly the fine zero-pad rows the unpacked conv reads.
    """
    kh, kw, cin, cout = w_stored.shape
    assert kh == 3 and kw == 3
    K = jnp.zeros((3, 3, 4 * cin, 4 * cout), w_stored.dtype)
    for p in range(2):
        for q in range(2):
            for a in range(3):
                for b in range(3):
                    A, pi = divmod(p + a - 1, 2)
                    B, qi = divmod(q + b - 1, 2)
                    K = K.at[
                        A + 1, B + 1,
                        (pi * 2 + qi) * cin : (pi * 2 + qi + 1) * cin,
                        (p * 2 + q) * cout : (p * 2 + q + 1) * cout,
                    ].add(w_stored[a, b])
    return K


def _tile_phase(v: jax.Array, reps: int = 4) -> jax.Array:
    """[..., C] -> [..., reps*C] phase-major (phase index outermost)."""
    return jnp.concatenate([v] * reps, axis=-1)


def _add_packed_noise(
    y4: jax.Array,
    noise: Optional[jax.Array],
    noise_weight: jax.Array,
    out_ch: int,
) -> jax.Array:
    """Add a fine noise map [1, 2H, 2W, 1] to the packed [B, H, W, 4*O]
    activation: space-to-depth the noise to [1, H, W, 4] and broadcast it
    across each phase's channel block via a free minor-dim reshape ---
    no [.., 4*O] noise tensor is ever materialized (the repeat spelling
    wrote a full activation-sized buffer at 1024px)."""
    if noise is None:
        return y4
    n4 = _space_to_depth2(noise, noise.shape[-1])  # [1, H, W, 4]
    b, h, w, c4 = y4.shape
    y = y4.reshape(b, h, w, 4, out_ch)
    y = y + (noise_weight.astype(y4.dtype) * n4.astype(y4.dtype))[..., None]
    return y.reshape(b, h, w, c4)


# Process-global switch for the polyphase fused upsample path (see
# _compose_polyphase_up_kernel): measured slower at 256px attribution
# (depth-to-space relayout), re-measurable per workload via
# enable_fused_upsample / bench.py --fused_upsample.
_FUSED_UPSAMPLE = False


def enable_fused_upsample(on: bool = True) -> None:
    global _FUSED_UPSAMPLE
    if bool(on) != _FUSED_UPSAMPLE:
        jax.clear_caches()  # trace-time switch: stale executables must not outlive it
    _FUSED_UPSAMPLE = bool(on)


def modulated_conv2d(
    x: jax.Array,
    w_latent: jax.Array,
    p: Params,
    *,
    upsample: bool = False,
    downsample: bool = False,
    demodulate: bool = True,
    blur_kernel: Sequence[int] = (1, 3, 3, 1),
    eps: float = 1e-8,
    fused_upsample: Optional[bool] = None,
) -> jax.Array:
    """Style-modulated convolution, batched via the scaling identity.

    p['weight']: [kh, kw, I, O]  (upsample layers store it pre-flipped
    spatially: the dilated conv below then equals torch's
    conv_transpose2d(stride=2, padding=0), ref src/model.py:269-282).
    p['mod']: EqualLinear params mapping style_dim -> I (bias_init=1,
    ref src/model.py:215).

    Math per src/model.py:258-263:
        s      = mod(w)                              [B, I]
        w_eff  = scale * W * s_i         (per sample)
        d[b,o] = rsqrt(sum_{i,k,l} w_eff^2 + eps)    (if demodulate)
        y      = d_o * conv(x * s_i, scale * W)
    """
    weight = p["weight"]
    kh, kw, cin, cout = weight.shape
    scale = 1.0 / math.sqrt(cin * kh * kw)

    style = equal_linear(w_latent, p["mod"])  # [B, I]

    xs = x * style[:, None, None, :].astype(x.dtype)
    w = (weight * scale).astype(x.dtype)

    if fused_upsample is None:
        fused_upsample = _FUSED_UPSAMPLE
    if upsample:
        if fused_upsample and kh == 3 and len(blur_kernel) == 4:
            # polyphase: conv_transpose + blur folded into one dense conv
            # at input resolution (see _compose_polyphase_up_kernel)
            D = (_compose_polyphase_up_kernel(weight, blur_kernel) * scale).astype(x.dtype)
            y4 = lax.conv_general_dilated(
                xs,
                D,
                window_strides=(1, 1),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            y = _depth_to_space2(y4, cout)
        else:
            y = lax.conv_general_dilated(
                xs,
                w,
                window_strides=(1, 1),
                padding=((kh - 1, kh - 1), (kw - 1, kw - 1)),
                lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            # post-transpose blur: pad per src/model.py:191-197, gain factor^2
            factor = 2
            pp = (len(blur_kernel) - factor) - (kh - 1)
            pad0 = (pp + 1) // 2 + factor - 1
            pad1 = pp // 2 + 1
            k = make_kernel(blur_kernel) * (factor**2)
            y = upfirdn2d(y, k, pad=(pad0, pad1))
    elif downsample:
        # pre-conv blur: pad per src/model.py:199-205
        factor = 2
        pp = (len(blur_kernel) - factor) + (kh - 1)
        pad0 = (pp + 1) // 2
        pad1 = pp // 2
        xs = upfirdn2d(xs, make_kernel(blur_kernel), pad=(pad0, pad1))
        y = lax.conv_general_dilated(
            xs,
            w,
            window_strides=(2, 2),
            padding=((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    else:
        pad = kh // 2
        y = lax.conv_general_dilated(
            xs,
            w,
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    if demodulate:
        # sum_{k,l} (scale*W)^2 -> [I, O]; then [B,I] @ [I,O] -> [B,O]
        w2 = jnp.sum(jnp.square(weight * scale), axis=(0, 1))
        denom = jnp.dot(jnp.square(style), w2) + eps
        y = y * lax.rsqrt(denom)[:, None, None, :].astype(y.dtype)
    return y


def styled_conv(
    x: jax.Array,
    w_latent: jax.Array,
    p: Params,
    noise: Optional[jax.Array],
    *,
    upsample: bool = False,
    blur_kernel: Sequence[int] = (1, 3, 3, 1),
) -> jax.Array:
    """ModulatedConv + noise injection + fused bias/LeakyReLU.

    Ref StyledConv (src/model.py:332-366) and NoiseInjection
    (src/model.py:305-316).
    """
    y = modulated_conv2d(
        x, w_latent, p, upsample=upsample, demodulate=True, blur_kernel=blur_kernel
    )
    if noise is not None:
        y = y + p["noise_weight"].astype(y.dtype) * noise.astype(y.dtype)
    return fused_leaky_relu(y, p["act_bias"].astype(y.dtype))


def to_rgb(
    x: jax.Array,
    w_latent: jax.Array,
    p: Params,
    skip: Optional[jax.Array] = None,
    *,
    blur_kernel: Sequence[int] = (1, 3, 3, 1),
) -> jax.Array:
    """1x1 modulated conv (no demod) + bias + upsampled skip sum.

    Ref ToRGB (src/model.py:369-388); skip upsample pad per Upsample
    (src/model.py:41-46).
    """
    y = modulated_conv2d(x, w_latent, p, demodulate=False)
    y = y + p["bias"].astype(y.dtype)
    if skip is not None:
        y = y + upsample2x(skip, blur_kernel)
    return y


# ---------------------------------------------------------------------------
# Packed-phases tail blocks (the 1024px lane-starvation fix)
# ---------------------------------------------------------------------------
# Measured (bench.py --preset gen_roofline, v5e, batch 8 bf16): the final
# 1024px block (C=32) is 71% of generation time at 8.8 TF/s --- 16x above
# its HBM floor and ~23x below the MXU roof, because a C=32 conv fills
# 32/128 lanes on BOTH the contraction and output dims ((32/128)^2 ~ 6%
# of the array).  The fix is to never materialize the lane-starved fine
# layout: run the whole block at coarse resolution with the 4 output
# phases packed into channels (C_eff = 4C = 128 lanes exactly at C=32):
#
#   up conv + blur   one dense [3,3,I,4O] conv (the verified polyphase
#                    compose, _compose_polyphase_up_kernel) --- the blur
#                    pass disappears into the weights;
#   3x3 conv         one [3,3,4I,4O] conv over the packed layout
#                    (_compose_packed_conv3x3_kernel, quarter-dense);
#   noise/bias/act   exact per-phase equivalents (space-to-depth of the
#                    noise buffer, channel-tiled bias/demod);
#   ToRGB            block-diagonal [1,1,4I,12] conv, skip-sum after one
#                    cheap depth-to-space of the 12-channel RGB.
#
# Numerics are exactly the default path's (same taps, same pad semantics;
# golden-tested in tests/test_stylegan2.py) --- only the layout changes.
_PACKED_TAIL = 0  # number of trailing upsample blocks to run packed
_PACKED_TAIL_MAX_CH = 128  # pack only where 4*C stays MXU-sized
# When the FINAL block runs packed, optionally skip its depth-to-space and
# return the phase-packed RGB [B, H/2, W/2, 12] --- the one remaining
# fine-layout materialization in the packed pipeline.  Consumers unpack on
# host (utils.image.unpack_phases / np reshape-transpose, ~free inside the
# PNG writer's row loop) or feed packed targets to a packed-space loss
# (mse is permutation-invariant).  Trace-time switch, bench `--packed_output`.
_PACKED_OUTPUT = False


def enable_packed_tail(n_blocks: int = 1) -> None:
    """Run the last ``n_blocks`` upsample blocks in the phase-packed
    layout (0 = default path everywhere).  Trace-time switch."""
    global _PACKED_TAIL
    if int(n_blocks) != _PACKED_TAIL:
        jax.clear_caches()
    _PACKED_TAIL = int(n_blocks)


def enable_packed_output(on: bool = True) -> None:
    """Return the final packed block's RGB in phase-packed layout
    ([B, H/2, W/2, 12]) instead of depth-to-spacing it on device.  Only
    takes effect when the final block actually runs packed
    (enable_packed_tail > 0 and its width is under the channel cap) AND
    the blur is the separable 4-tap default (the fallback fine-layout
    path always unpacks).  Trace-time switch."""
    global _PACKED_OUTPUT
    if bool(on) != _PACKED_OUTPUT:
        jax.clear_caches()
    _PACKED_OUTPUT = bool(on)


def _modulated_conv2d_packed(
    x4: jax.Array,
    w_latent: jax.Array,
    p: Params,
    kernel4: jax.Array,
    *,
    demodulate: bool,
    eps: float = 1e-8,
) -> jax.Array:
    """Modulated conv on the phase-packed layout.

    ``kernel4`` is the composed packed kernel built from the ORIGINAL
    stored weight (already including the equalized-LR scale); style
    modulation and demodulation are computed from the original weight
    exactly as in :func:`modulated_conv2d` and tiled phase-major, which
    is exact because every phase block of the composed kernel is a
    permutation of the original taps (same per-(i, o) energy).
    """
    weight = p["weight"]
    kh, kw, cin, cout = weight.shape
    scale = 1.0 / math.sqrt(cin * kh * kw)
    style = equal_linear(w_latent, p["mod"])  # [B, I]
    reps = x4.shape[-1] // cin
    xs4 = x4 * _tile_phase(style, reps)[:, None, None, :].astype(x4.dtype)
    pad_h = kernel4.shape[0] // 2
    pad_w = kernel4.shape[1] // 2
    y4 = lax.conv_general_dilated(
        xs4,
        kernel4.astype(x4.dtype),
        window_strides=(1, 1),
        padding=((pad_h, pad_h), (pad_w, pad_w)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if demodulate:
        w2 = jnp.sum(jnp.square(weight * scale), axis=(0, 1))  # [I, O]
        denom = jnp.dot(jnp.square(style), w2) + eps  # [B, O]
        d4 = _tile_phase(lax.rsqrt(denom))  # [B, 4O] phase-major
        y4 = y4 * d4[:, None, None, :].astype(y4.dtype)
    return y4


def _to_rgb_packed_kernel(weight: jax.Array) -> jax.Array:
    """[1, 1, I, 3] -> block-diagonal [1, 1, 4I, 12] (phase p reads only
    phase p's input block and writes phase p's RGB block)."""
    _, _, cin, cout = weight.shape
    K = jnp.zeros((1, 1, 4 * cin, 4 * cout), weight.dtype)
    for ph in range(4):
        K = K.at[0, 0, ph * cin : (ph + 1) * cin,
                 ph * cout : (ph + 1) * cout].set(weight[0, 0])
    return K


def _packed_tail_block(
    out: jax.Array,
    skip: Optional[jax.Array],
    lat_a: jax.Array,
    lat_b: jax.Array,
    lat_rgb: jax.Array,
    n1: Optional[jax.Array],
    n2: Optional[jax.Array],
    p_up: Params,
    p_conv: Params,
    p_rgb: Params,
    blur_kernel: Sequence[int],
    *,
    unpack_out: bool,
) -> Tuple[Optional[jax.Array], jax.Array]:
    """One upsample block (StyledConv(up) + StyledConv + ToRGB-skip) in
    the phase-packed coarse layout.  Input ``out`` is the unpacked coarse
    feature map; returns (next ``out`` in fine layout if ``unpack_out``
    else None, fine skip).  Numerically identical to :func:`synthesis`'s
    default block (tests/test_stylegan2.py::test_packed_tail_*)."""
    kh, kw, cin, cout = p_up["weight"].shape
    scale_up = 1.0 / math.sqrt(cin * kh * kw)
    D = (_compose_polyphase_up_kernel(p_up["weight"], blur_kernel)
         * scale_up)
    # up conv consumes the UNPACKED coarse map (reps=1 style tiling)
    y4 = _modulated_conv2d_packed(out, lat_a, p_up, D, demodulate=True)
    y4 = _add_packed_noise(y4, n1, p_up["noise_weight"], cout)
    y4 = fused_leaky_relu(y4, _tile_phase(p_up["act_bias"]).astype(y4.dtype))

    kh2, kw2, cin2, cout2 = p_conv["weight"].shape
    scale2 = 1.0 / math.sqrt(cin2 * kh2 * kw2)
    K2 = _compose_packed_conv3x3_kernel(p_conv["weight"] * scale2)
    z4 = _modulated_conv2d_packed(y4, lat_b, p_conv, K2, demodulate=True)
    z4 = _add_packed_noise(z4, n2, p_conv["noise_weight"], cout2)
    z4 = fused_leaky_relu(z4, _tile_phase(p_conv["act_bias"]).astype(z4.dtype))

    _, _, cin_r, cout_r = p_rgb["weight"].shape
    scale_r = 1.0 / math.sqrt(cin_r)
    KR = _to_rgb_packed_kernel(p_rgb["weight"] * scale_r)
    rgb4 = _modulated_conv2d_packed(z4, lat_rgb, p_rgb, KR, demodulate=False)
    rgb4 = rgb4 + _tile_phase(p_rgb["bias"]).astype(rgb4.dtype)
    if skip is not None:
        # Fold the ToRGB skip sum into the packed epilogue: the skip's 2x
        # upsample-blur is a 2x2 polyphase (pack_upsample2x), so the sum
        # happens at COARSE resolution and the block does exactly ONE
        # fine-layout materialization (the depth-to-space below).  The
        # default path's spelling (depth-to-space, then a lane-starved
        # C=3 zero-stuffed FIR at fine resolution, then a fine-layout
        # add) was the largest non-conv term in the measured 1024px
        # packed-block roofline (BASELINE.md round 4).
        skip4 = pack_upsample2x(skip, blur_kernel)
        if skip4 is not None:
            rgb4 = rgb4 + skip4.astype(rgb4.dtype)
            if _PACKED_OUTPUT and not unpack_out:
                return None, rgb4  # phase-packed RGB [B, H/2, W/2, 12]
            rgb = _depth_to_space2(rgb4, cout_r)
        else:  # non-separable / non-4-tap blur: fine-resolution fallback
            rgb = _depth_to_space2(rgb4, cout_r) + upsample2x(skip, blur_kernel)
    else:
        if _PACKED_OUTPUT and not unpack_out:
            return None, rgb4
        rgb = _depth_to_space2(rgb4, cout_r)
    nxt = _depth_to_space2(z4, cout2) if unpack_out else None
    return nxt, rgb


# ---------------------------------------------------------------------------
# Mapping network & synthesis
# ---------------------------------------------------------------------------


def mapping_network(params: Params, z: jax.Array, lr_mlp: float = 0.01) -> jax.Array:
    """z -> w: PixelNorm then n_mlp EqualLinear+fused-lrelu layers.

    Ref src/model.py:407-416 (the reference's ``g_ema.style``).
    """
    x = pixel_norm(z)
    for layer in params["style"]:
        x = equal_linear(x, layer, lr_mul=lr_mlp, activation=True)
    return x


def synthesis(
    params: Params,
    latent: jax.Array,
    noise: Optional[Sequence[Optional[jax.Array]]],
    *,
    blur_kernel: Sequence[int] = (1, 3, 3, 1),
    remat: bool = False,
    max_blocks: Optional[int] = None,
) -> jax.Array:
    """W+ -> image. latent: [B, n_latent, style_dim]. Returns [B, H, W, 3].

    Ref synthesis loop src/model.py:551-566.  ``max_blocks`` truncates
    the skip pyramid after that many upsample blocks (the running skip
    IS a valid RGB image at every stage) --- used by the per-resolution
    generation roofline in bench.py, not by any pipeline.
    """
    n_layers = 1 + 2 * len(params["to_rgbs"])
    if noise is None:
        noise = [None] * n_layers

    batch = latent.shape[0]
    const = params["input"]
    out = jnp.broadcast_to(const, (batch,) + const.shape[1:]).astype(latent.dtype)

    out = styled_conv(out, latent[:, 0], params["conv1"], noise[0], blur_kernel=blur_kernel)
    skip = to_rgb(out, latent[:, 1], params["to_rgb1"], None, blur_kernel=blur_kernel)

    def block(out, skip, lat_a, lat_b, lat_rgb, n1, n2, p_up, p_conv, p_rgb):
        out = styled_conv(out, lat_a, p_up, n1, upsample=True, blur_kernel=blur_kernel)
        out = styled_conv(out, lat_b, p_conv, n2, blur_kernel=blur_kernel)
        skip = to_rgb(out, lat_rgb, p_rgb, skip, blur_kernel=blur_kernel)
        return out, skip

    def block_packed_keep(out, skip, lat_a, lat_b, lat_rgb, n1, n2, p_up, p_conv, p_rgb):
        return _packed_tail_block(
            out, skip, lat_a, lat_b, lat_rgb, n1, n2, p_up, p_conv, p_rgb,
            blur_kernel, unpack_out=True,
        )

    def block_packed_last(out, skip, lat_a, lat_b, lat_rgb, n1, n2, p_up, p_conv, p_rgb):
        return _packed_tail_block(
            out, skip, lat_a, lat_b, lat_rgb, n1, n2, p_up, p_conv, p_rgb,
            blur_kernel, unpack_out=False,
        )

    if remat:
        block = jax.checkpoint(block, static_argnums=())
        block_packed_keep = jax.checkpoint(block_packed_keep, static_argnums=())
        block_packed_last = jax.checkpoint(block_packed_last, static_argnums=())

    i = 1
    n_blocks = len(params["to_rgbs"])
    if max_blocks is not None:
        n_blocks = max(0, min(n_blocks, max_blocks))
    for idx in range(n_blocks):
        p_up = params["convs"][2 * idx]
        # phase-packed tail (see enable_packed_tail): only where the
        # packed width 4*C stays MXU-sized --- larger blocks already run
        # lane-full on the default path
        packed = (
            _PACKED_TAIL > 0
            and idx >= n_blocks - _PACKED_TAIL
            and p_up["weight"].shape[3] <= _PACKED_TAIL_MAX_CH
        )
        fn = (
            (block_packed_last if idx == n_blocks - 1 else block_packed_keep)
            if packed else block
        )
        out, skip = fn(
            out,
            skip,
            latent[:, i],
            latent[:, i + 1],
            latent[:, i + 2],
            noise[1 + 2 * idx],
            noise[2 + 2 * idx],
            p_up,
            params["convs"][2 * idx + 1],
            params["to_rgbs"][idx],
        )
        i += 2
    return skip


def prepare_latent(
    params: Params,
    styles: Sequence[jax.Array],
    cfg: ModelConfig,
    *,
    input_is_latent: bool = False,
    inject_index: Optional[int] = None,
    truncation: float = 1.0,
    truncation_latent: Optional[jax.Array] = None,
) -> jax.Array:
    """Broadcast / mix / truncate styles into a [B, n_latent, D] tensor.

    Mirrors the style handling of the reference forward
    (src/model.py:511-548), including its quirk that truncation only
    applies when the inputs are z (not w).
    """
    nl = n_latent(cfg.img_size)
    if not input_is_latent:
        styles = [mapping_network(params, s, cfg.lr_mlp) for s in styles]
        if truncation < 1:
            assert truncation_latent is not None
            styles = [
                truncation_latent + truncation * (s - truncation_latent)
                for s in styles
            ]

    if len(styles) < 2:
        s = styles[0]
        if s.ndim < 3:
            latent = jnp.repeat(s[:, None, :], nl, axis=1)
        else:
            latent = s
    else:
        if inject_index is None:
            inject_index = nl - 2
        l1 = jnp.repeat(styles[0][:, None, :], inject_index, axis=1)
        l2 = jnp.repeat(styles[1][:, None, :], nl - inject_index, axis=1)
        latent = jnp.concatenate([l1, l2], axis=1)
    return latent


def generate(
    params: Params,
    styles: Sequence[jax.Array],
    cfg: ModelConfig,
    *,
    noise: Optional[Sequence[Optional[jax.Array]]] = None,
    input_is_latent: bool = False,
    inject_index: Optional[int] = None,
    truncation: float = 1.0,
    truncation_latent: Optional[jax.Array] = None,
    fixed_noise: bool = False,
    noise_rng: Optional[jax.Array] = None,
    return_latents: bool = False,
    remat: bool = False,
):
    """Full generator forward, contract per ref src/model.py:499-572.

    Noise selection mirrors the reference's three modes
    (src/model.py:513-520): an explicit ``noise`` list wins;
    ``fixed_noise=True`` uses the checkpoint's noise buffers
    (randomize_noise=False); ``noise_rng`` draws fresh per-call noise
    (randomize_noise=True, but from an explicit key --- this framework has
    no hidden RNG state); all unset means no injection."""
    latent = prepare_latent(
        params,
        styles,
        cfg,
        input_is_latent=input_is_latent,
        inject_index=inject_index,
        truncation=truncation,
        truncation_latent=truncation_latent,
    )
    if noise is None and fixed_noise:
        noise = params["noises"]
    elif noise is None and noise_rng is not None:
        noise = make_noise(noise_rng, cfg.img_size)
    img = synthesis(params, latent, noise, blur_kernel=cfg.blur_kernel, remat=remat)
    if return_latents:
        return img, latent
    return img, None


def mean_latent(params: Params, key: jax.Array, n: int, cfg: ModelConfig) -> jax.Array:
    """Mean w over n random z, ref src/model.py:488-494."""
    z = jax.random.normal(key, (n, cfg.style_dim))
    return jnp.mean(mapping_network(params, z, cfg.lr_mlp), axis=0, keepdims=True)


def make_noise(key: jax.Array, size: int) -> List[jax.Array]:
    """Fresh per-layer noise maps [1,res,res,1], ref src/model.py:477-486."""
    keys = jax.random.split(key, num_noise_layers(size))
    return [
        jax.random.normal(k, shape) for k, shape in zip(keys, noise_shapes(size))
    ]


# ---------------------------------------------------------------------------
# Initialization (random weights, same distributions as reference ctor)
# ---------------------------------------------------------------------------


def _init_equal_linear(key, in_dim, out_dim, lr_mul=1.0, bias_init=0.0) -> Params:
    # torch: weight = randn(out,in)/lr_mul (src/model.py:138); ours [in,out].
    return {
        "weight": jax.random.normal(key, (in_dim, out_dim)) / lr_mul,
        "bias": jnp.full((out_dim,), float(bias_init)),
    }


def _init_mod_conv(key, in_ch, out_ch, k, style_dim) -> Params:
    kw, km = jax.random.split(key)
    return {
        "weight": jax.random.normal(kw, (k, k, in_ch, out_ch)),
        "mod": _init_equal_linear(km, style_dim, in_ch, bias_init=1.0),
    }


def _init_styled_conv(key, in_ch, out_ch, k, style_dim) -> Params:
    p = _init_mod_conv(key, in_ch, out_ch, k, style_dim)
    p["noise_weight"] = jnp.zeros(())
    p["act_bias"] = jnp.zeros((out_ch,))
    return p


def _init_to_rgb(key, in_ch, style_dim) -> Params:
    p = _init_mod_conv(key, in_ch, 3, 1, style_dim)
    p["bias"] = jnp.zeros((3,))
    return p


def init_generator_params(key: jax.Array, cfg: ModelConfig) -> Params:
    """Random-init generator pytree (distributions per reference ctor)."""
    chans = channel_map(cfg.channel_multiplier, cfg.channel_max)
    log_size = int(math.log2(cfg.img_size))
    keys = iter(jax.random.split(key, 4 * (log_size * 2) + 16))

    style = tuple(
        _init_equal_linear(next(keys), cfg.style_dim, cfg.style_dim, lr_mul=cfg.lr_mlp)
        for _ in range(cfg.n_mlp)
    )
    params: Params = {
        "style": style,
        "input": jax.random.normal(next(keys), (1, 4, 4, chans[4])),
        "conv1": _init_styled_conv(next(keys), chans[4], chans[4], 3, cfg.style_dim),
        "to_rgb1": _init_to_rgb(next(keys), chans[4], cfg.style_dim),
    }
    convs = []
    to_rgbs = []
    in_ch = chans[4]
    for i in range(3, log_size + 1):
        out_ch = chans[2**i]
        convs.append(_init_styled_conv(next(keys), in_ch, out_ch, 3, cfg.style_dim))
        convs.append(_init_styled_conv(next(keys), out_ch, out_ch, 3, cfg.style_dim))
        to_rgbs.append(_init_to_rgb(next(keys), out_ch, cfg.style_dim))
        in_ch = out_ch
    params["convs"] = tuple(convs)
    params["to_rgbs"] = tuple(to_rgbs)
    params["noises"] = tuple(
        jax.random.normal(next(keys), s) for s in noise_shapes(cfg.img_size)
    )
    return params


# ---------------------------------------------------------------------------
# Discriminator (unused by the pipelines, kept for parity; ref src/model.py:641-699)
# ---------------------------------------------------------------------------


def conv_layer(
    x: jax.Array,
    p: Params,
    *,
    downsample: bool = False,
    activate: bool = True,
    blur_kernel: Sequence[int] = (1, 3, 3, 1),
) -> jax.Array:
    """Blur(+stride-2) equalized conv + optional fused lrelu, ref src/model.py:575-617."""
    kh = p["weight"].shape[0]
    if downsample:
        factor = 2
        pp = (len(blur_kernel) - factor) + (kh - 1)
        x = upfirdn2d(x, make_kernel(blur_kernel), pad=((pp + 1) // 2, pp // 2))
        out = equal_conv2d(x, {"weight": p["weight"], "bias": None}, stride=2, padding=0)
    else:
        out = equal_conv2d(x, {"weight": p["weight"], "bias": None}, stride=1, padding=kh // 2)
    if activate:
        out = fused_leaky_relu(out, p.get("act_bias"))
    elif p.get("bias") is not None:
        out = out + p["bias"]
    return out


def res_block(x: jax.Array, p: Params, blur_kernel=(1, 3, 3, 1)) -> jax.Array:
    """Ref src/model.py:620-638."""
    out = conv_layer(x, p["conv1"], blur_kernel=blur_kernel)
    out = conv_layer(out, p["conv2"], downsample=True, blur_kernel=blur_kernel)
    skip = conv_layer(x, p["skip"], downsample=True, activate=False, blur_kernel=blur_kernel)
    return (out + skip) / math.sqrt(2.0)


def minibatch_stddev(x: jax.Array, group_size: int = 4, eps: float = 1e-8) -> jax.Array:
    """Append per-group stddev feature map, ref src/model.py:684-692."""
    b, h, w, c = x.shape
    group = min(b, group_size)
    y = x.reshape(group, -1, h, w, c)
    var = jnp.var(y, axis=0)
    std = jnp.sqrt(var + eps)
    std = jnp.mean(std, axis=(1, 2, 3), keepdims=True)  # [b//group,1,1,1]
    std = jnp.tile(std, (group, h, w, 1))
    return jnp.concatenate([x, std], axis=-1)


def discriminator_apply(params: Params, x: jax.Array, cfg: ModelConfig) -> jax.Array:
    """Full discriminator forward, ref src/model.py:681-699."""
    out = conv_layer(x, params["from_rgb"])
    for rb in params["blocks"]:
        out = res_block(out, rb, cfg.blur_kernel)
    out = minibatch_stddev(out)
    out = conv_layer(out, params["final_conv"])
    out = out.reshape(out.shape[0], -1)
    out = equal_linear(out, params["final_linear0"], activation=True)
    return equal_linear(out, params["final_linear1"])


def init_discriminator_params(key: jax.Array, cfg: ModelConfig) -> Params:
    chans = channel_map(cfg.channel_multiplier, cfg.channel_max)
    log_size = int(math.log2(cfg.img_size))
    keys = iter(jax.random.split(key, 4 * log_size + 8))

    def conv_p(k, cin, cout, ksize, activate=True):
        p = {"weight": jax.random.normal(k, (ksize, ksize, cin, cout))}
        if activate:
            p["act_bias"] = jnp.zeros((cout,))
        return p

    params: Params = {"from_rgb": conv_p(next(keys), 3, chans[cfg.img_size], 1)}
    blocks = []
    in_ch = chans[cfg.img_size]
    for i in range(log_size, 2, -1):
        out_ch = chans[2 ** (i - 1)]
        blocks.append(
            {
                "conv1": conv_p(next(keys), in_ch, in_ch, 3),
                "conv2": conv_p(next(keys), in_ch, out_ch, 3),
                "skip": conv_p(next(keys), in_ch, out_ch, 1, activate=False),
            }
        )
        in_ch = out_ch
    params["blocks"] = tuple(blocks)
    params["final_conv"] = conv_p(next(keys), in_ch + 1, chans[4], 3)
    params["final_linear0"] = _init_equal_linear(next(keys), chans[4] * 4 * 4, chans[4])
    params["final_linear1"] = _init_equal_linear(next(keys), chans[4], 1)
    return params
