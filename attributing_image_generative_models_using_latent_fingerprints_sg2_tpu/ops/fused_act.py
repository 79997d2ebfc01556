"""Fused bias + LeakyReLU activation.

Functional spec: ``y = scale * leaky_relu(x + bias)`` with slope 0.2 and
scale sqrt(2) --- the reference's CPU fallback at
/root/reference/src/op/fused_act.py:110-127 and CUDA kernel at
/root/reference/src/op/fused_bias_act_kernel.cu:18-65.

On TPU this is a single VPU expression that XLA fuses into the producing
matmul/conv; a hand-written kernel would only re-derive what the compiler
already does.  The bias broadcasts over the *channel* axis, which in this
framework's NHWC layout is the last axis (the reference broadcasts over
dim 1 of NCHW, src/op/fused_act.py:113-116).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

SQRT2 = math.sqrt(2.0)


def fused_leaky_relu(
    x: jax.Array,
    bias: Optional[jax.Array] = None,
    negative_slope: float = 0.2,
    scale: float = SQRT2,
) -> jax.Array:
    """scale * leaky_relu(x + bias), bias broadcast over the last axis."""
    if bias is not None:
        x = x + bias
    return jnp.where(x >= 0, x, negative_slope * x) * scale


def leaky_relu(x: jax.Array, negative_slope: float = 0.2) -> jax.Array:
    return jnp.where(x >= 0, x, negative_slope * x)
