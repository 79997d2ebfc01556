"""Discriminator-feature perceptual loss (the in-environment answer to
the reference's LPIPS solver objective).

The reference's attribution solver minimizes LPIPS over *pretrained*
VGG16 features (/root/reference/src/main.py:63, src/utils.py:44-50).  In
this zero-egress environment no pretrained VGG exists, and the round-2
finding was that RANDOM-init VGG LPIPS is a measurably *worse* solver
loss than plain mse (BASELINE.md).  This module supplies a perceptual
backbone that IS trained in-environment: the StyleGAN2 discriminator
from the self-training subsystem (training/gan.py).  Its feature stack
is a natural self-supervised perceptual embedding of exactly the image
distribution the fingerprinted generator produces --- the same idea as
GAN "perceptual discriminator features" losses, here applied to make the
reference's perceptual solver mode meaningful without any downloaded
weights.

The returned parameter dict plugs into the SAME machinery as LPIPS
(losses/lpips.py): ``extract_raw_features`` dispatches on the ``"disc"``
key, and the fused distance head / solver hot path are reused unchanged,
so ``--loss perceptual`` works identically with a VGG or a discriminator
backbone.

Feature taps: the from_rgb conv output plus every residual block output
(resolutions img_size, img_size/2, ..., 4 --- e.g. five maps at 64px,
mirroring LPIPS's five slices).  The minibatch-stddev head and final
logit layers are excluded: they are batch-coupled and carry no spatial
perceptual signal.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import stylegan2 as sg2


def disc_features(
    d_params: Dict[str, Any],
    x: jax.Array,
    blur_kernel: Sequence[int] = (1, 3, 3, 1),
) -> List[jax.Array]:
    """[-1,1] NHWC image -> list of discriminator feature maps
    (from_rgb + each res_block output, ref src/model.py:641-699).

    Weights follow the image dtype (the bf16 solver hot path feeds bf16
    images; the exported discriminator is f32)."""
    if x.dtype != jax.tree_util.tree_leaves(d_params)[0].dtype:
        d_params = jax.tree.map(lambda t: t.astype(x.dtype), d_params)
    out = sg2.conv_layer(x, d_params["from_rgb"])
    feats = [out]
    for rb in d_params["blocks"]:
        out = sg2.res_block(out, rb, blur_kernel)
        feats.append(out)
    return feats


def disc_feature_channels(d_params: Dict[str, Any]) -> Tuple[int, ...]:
    chans = [d_params["from_rgb"]["weight"].shape[-1]]
    for rb in d_params["blocks"]:
        chans.append(rb["conv2"]["weight"].shape[-1])
    return tuple(chans)


def build_disc_percept_params(d_params: Dict[str, Any]) -> Dict[str, Any]:
    """LPIPS-compatible params dict: trained D backbone + uniform 1/C lin
    heads (the lin heads can be re-fit with losses/lpips_train.py's 2AFC
    machinery; uniform weighting is the zero-data default)."""
    lin = tuple(
        jnp.full((c,), 1.0 / c, jnp.float32) for c in disc_feature_channels(d_params)
    )
    return {"disc": d_params, "lin": lin}


def load_disc_percept(path: str) -> Dict[str, Any]:
    """Load a discriminator exported by cli.train (flat .npz, see
    checkpoints/flat.py) and wrap it as perceptual-loss params."""
    from ..checkpoints.flat import unflatten_params

    flat = dict(np.load(path))
    return build_disc_percept_params(
        jax.tree.map(jnp.asarray, unflatten_params(flat))
    )
