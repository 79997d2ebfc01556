"""Pooling ops shaped for TPU autodiff.

The obvious spelling of max-pooling, ``lax.reduce_window(..., lax.max)``,
has a hidden performance trap on TPU: its reverse-mode derivative lowers
to ``SelectAndScatter``, which XLA:TPU executes as a slow, mostly-scalar
windowed scatter.  Inside the attribution hot loop the LPIPS VGG slices
are differentiated every step (reference recomputes two VGG forwards per
step, /root/reference/src/custom_lpips/dist_model.py:109-117), so the
pool gradient sits on the critical path.

All pools used by the supported backbones' hot paths are NON-OVERLAPPING
2x2 stride-2 windows (torchvision VGG16 ``MaxPool2d(2, 2)``; BigGAN
attention's ``max_pool2d(2)``), so the window reduction can be written as
a reshape + ``jnp.max`` over the two in-window axes.  Forward values are
bit-identical; the VJP becomes a fused elementwise compare/select instead
of SelectAndScatter.  (Tie-breaking differs --- reshape-max splits the
cotangent evenly across tied maxima while SelectAndScatter picks one ---
which is measure-zero for real-valued activations and irrelevant to the
reference's semantics, which never differentiates through torch's own
choice either.)

Overlapping pools (AlexNet/SqueezeNet's 3x3 stride-2) cannot use the
reshape trick and keep the ``reduce_window`` spelling in losses/lpips.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pool(x: jax.Array) -> jax.Array:
    b, h, w, c = x.shape
    if h % 2 or w % 2:
        raise ValueError(
            f"maxpool2x2 requires even H and W (non-overlapping 2x2/2 "
            f"windows); got H={h}, W={w}. Pad or use the reduce_window "
            f"pool for odd sizes."
        )
    return jnp.max(x.reshape(b, h // 2, 2, w // 2, 2, c), axis=(2, 4))


@jax.custom_vjp
def maxpool2x2(x: jax.Array) -> jax.Array:
    """2x2 stride-2 max pool, NHWC, H and W even (VALID).

    Custom VJP: the stock ``jnp.max`` gradient materializes the window
    indicator, re-reads it for the tie count, and reads it once more for
    the cotangent multiply --- three full-resolution passes.  Here the
    backward recomputes the indicator from the saved (input, output) pair
    in the passes that need it, matching ``jnp.max``'s even-split-on-ties
    convention (the reference's torch MaxPool2d routes ties to one
    element; ties are measure-zero on real activations and the relu
    behind every pooled feature zeroes the plateau gradients anyway).
    """
    return _pool(x)


def _fwd(x):
    y = _pool(x)
    return y, (x, y)


def _bwd(res, g):
    x, y = res
    b, h2, w2, c = y.shape
    xr = x.reshape(b, h2, 2, w2, 2, c)
    mask = (xr == y[:, :, None, :, None, :]).astype(g.dtype)
    cnt = jnp.sum(mask, axis=(2, 4))  # [b,h2,w2,c] tie counts (>=1)
    df = mask * (g / cnt)[:, :, None, :, None, :]
    return (df.reshape(x.shape),)


maxpool2x2.defvjp(_fwd, _bwd)
