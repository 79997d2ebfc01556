"""Functional conv wrappers (the ``conv2d_gradfix`` API surface).

The reference ships a 227-line custom-autograd workaround
(/root/reference/src/op/conv2d_gradfix.py) because torch 1.7/1.8 cuDNN
mishandled double-backward through conv weight gradients.  JAX autodiff of
``lax.conv_general_dilated`` is correct to arbitrary order, so these are
thin NHWC conveniences that keep the reference's call surface
(conv2d / conv_transpose2d with torch semantics) for porting code.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax


def _pair(v) -> Tuple[int, int]:
    return (int(v), int(v)) if not isinstance(v, (tuple, list)) else (int(v[0]), int(v[1]))


def conv2d(
    x: jax.Array,
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
    stride: Union[int, Tuple[int, int]] = 1,
    padding: Union[int, Tuple[int, int]] = 0,
    dilation: Union[int, Tuple[int, int]] = 1,
    groups: int = 1,
) -> jax.Array:
    """torch.nn.functional.conv2d semantics on NHWC / HWIO tensors."""
    sy, sx = _pair(stride)
    py, px = _pair(padding)
    dy, dx = _pair(dilation)
    y = lax.conv_general_dilated(
        x,
        weight,
        (sy, sx),
        ((py, py), (px, px)),
        rhs_dilation=(dy, dx),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if bias is not None:
        y = y + bias
    return y


def conv_transpose2d(
    x: jax.Array,
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
    stride: Union[int, Tuple[int, int]] = 2,
    padding: Union[int, Tuple[int, int]] = 0,
) -> jax.Array:
    """torch.nn.functional.conv_transpose2d semantics.

    weight: [kh, kw, O, I] ("gathering" layout: matches torch's
    [in, out, kh, kw] transposed to HWOI) --- out[p] += x[q] w[p - s q].
    """
    kh, kw = weight.shape[0], weight.shape[1]
    sy, sx = _pair(stride)
    py, px = _pair(padding)
    # equivalent dilated conv: flip spatial, swap I/O, pad k-1-p
    w = jnp.swapaxes(weight[::-1, ::-1], 2, 3)
    return conv2d_dilated_lhs(x, w, bias, (sy, sx), (kh - 1 - py, kw - 1 - px))


def conv2d_dilated_lhs(x, w, bias, lhs_dilation, pad):
    y = lax.conv_general_dilated(
        x,
        w,
        (1, 1),
        ((pad[0], pad[0]), (pad[1], pad[1])),
        lhs_dilation=lhs_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + bias
    return y
