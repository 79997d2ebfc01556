"""Independent numpy oracles for golden-value tests.

These are written directly from the mathematical definitions (zero-stuff ->
pad -> correlate-with-flipped-kernel -> downsample; equalized-lr linear;
modulated conv), NOT copied from the reference implementation.  They are
deliberately naive (loops) and only used at small sizes.
"""

from __future__ import annotations

import numpy as np


def upfirdn2d_np(x, kernel, up=(1, 1), down=(1, 1), pad=((0, 0), (0, 0))):
    """Naive upfirdn2d. x: [N, H, W, C]; kernel [kh, kw];
    pad = ((pad_y0, pad_y1), (pad_x0, pad_x1)), may be negative."""
    x = np.asarray(x, np.float64)
    kernel = np.asarray(kernel, np.float64)
    up_y, up_x = up
    down_y, down_x = down
    (py0, py1), (px0, px1) = pad
    n, h, w, c = x.shape
    kh, kw = kernel.shape

    # 1. zero-stuff: each sample followed by up-1 zeros -> H*up
    z = np.zeros((n, h * up_y, w * up_x, c))
    z[:, ::up_y, ::up_x, :] = x

    # 2. pad / crop
    def padcrop(a, axis, p0, p1):
        pads = [(0, 0)] * a.ndim
        pads[axis] = (max(p0, 0), max(p1, 0))
        a = np.pad(a, pads)
        sl = [slice(None)] * a.ndim
        sl[axis] = slice(max(-p0, 0), a.shape[axis] - max(-p1, 0))
        return a[tuple(sl)]

    z = padcrop(z, 1, py0, py1)
    z = padcrop(z, 2, px0, px1)

    # 3. correlate with flipped kernel (= convolution), valid mode
    ph, pw = z.shape[1], z.shape[2]
    oh, ow = ph - kh + 1, pw - kw + 1
    kf = kernel[::-1, ::-1]
    out = np.zeros((n, oh, ow, c))
    for i in range(oh):
        for j in range(ow):
            patch = z[:, i : i + kh, j : j + kw, :]
            out[:, i, j, :] = np.einsum("nhwc,hw->nc", patch, kf)

    # 4. downsample
    return out[:, ::down_y, ::down_x, :]


def equal_linear_np(x, weight, bias, lr_mul=1.0, activation=False):
    """Equalized-LR linear, ref semantics src/model.py:132-161.
    weight: torch layout [out, in]; x: [B, in]."""
    in_dim = weight.shape[1]
    scale = (1.0 / np.sqrt(in_dim)) * lr_mul
    out = x @ (weight * scale).T
    if activation:
        out = out + bias * lr_mul
        out = np.where(out >= 0, out, 0.2 * out) * np.sqrt(2.0)
    else:
        out = out + bias * lr_mul
    return out


def conv2d_np(x, w, stride=1, pad=0):
    """Plain cross-correlation. x: [N,H,W,C_in], w: [kh,kw,C_in,C_out]."""
    x = np.asarray(x, np.float64)
    w = np.asarray(w, np.float64)
    if pad > 0:
        x = np.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    n, h, ww_, ci = x.shape
    kh, kw, _, co = w.shape
    oh = (h - kh) // stride + 1
    ow = (ww_ - kw) // stride + 1
    out = np.zeros((n, oh, ow, co))
    for i in range(oh):
        for j in range(ow):
            patch = x[:, i * stride : i * stride + kh, j * stride : j * stride + kw, :]
            out[:, i, j, :] = np.einsum("nhwc,hwco->no", patch, w)
    return out


def conv_transpose2d_np(x, w, stride=2):
    """Transposed conv with padding=0 (torch semantics).
    x: [N,H,W,C_in]; w: [kh,kw,C_out,C_in] 'gathering' layout, i.e.
    out[p] += sum_k x[q] w[k] where p = q*stride + k.
    Matches torch.conv_transpose2d(weight[C_in, C_out, kh, kw])."""
    x = np.asarray(x, np.float64)
    w = np.asarray(w, np.float64)
    n, h, ww_, ci = x.shape
    kh, kw, co, _ = w.shape
    oh = (h - 1) * stride + kh
    ow = (ww_ - 1) * stride + kw
    out = np.zeros((n, oh, ow, co))
    for i in range(h):
        for j in range(ww_):
            # x[:, i, j, :] : [N, C_in]; w: [kh, kw, C_out, C_in]
            contrib = np.einsum("nc,hwoc->nhwo", x[:, i, j, :], w)
            out[:, i * stride : i * stride + kh, j * stride : j * stride + kw, :] += contrib
    return out


def modulated_conv_np(x, weight, style, demodulate=True, eps=1e-8):
    """Modulated conv (no resampling), per-sample weights formed explicitly.
    x: [N,H,W,Ci]; weight: [kh,kw,Ci,Co] ALREADY including the equalized-lr
    scale; style: [N, Ci].  Ref math: src/model.py:258-263."""
    n = x.shape[0]
    kh = weight.shape[0]
    outs = []
    for b in range(n):
        wb = weight * style[b][None, None, :, None]
        if demodulate:
            d = 1.0 / np.sqrt(np.sum(wb**2, axis=(0, 1, 2)) + eps)
            wb = wb * d[None, None, None, :]
        outs.append(conv2d_np(x[b : b + 1], wb, pad=kh // 2))
    return np.concatenate(outs, 0)
