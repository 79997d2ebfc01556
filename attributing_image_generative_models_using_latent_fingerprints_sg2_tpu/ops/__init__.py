"""TPU-native ops layer.

Replaces the reference's CUDA op directory (/root/reference/src/op/):

- ``upfirdn2d``       -> XLA dilated-conv formulation (+ Pallas kernel in
                         ``upfirdn2d_pallas`` for the hot 2x specializations)
- ``fused_leaky_relu``-> fused XLA expression
- ``conv2d_gradfix``  -> unnecessary: JAX autodiff of
                         ``lax.conv_general_dilated`` provides first and
                         second derivatives (ref src/op/conv2d_gradfix.py
                         only exists to work around torch 1.7/1.8 cuDNN
                         double-backward)
"""

from .conv import conv2d, conv_transpose2d  # noqa: F401
from .fused_act import fused_leaky_relu, leaky_relu  # noqa: F401
from .upfirdn2d import (  # noqa: F401
    blur,
    downsample2x,
    enable_pallas,
    make_kernel,
    pallas_enabled,
    upfirdn2d,
    upfirdn2d_nchw,
    pack_upsample2x,
    upsample2x,
)
