"""InceptionV3 pool3 feature extractor (NHWC, functional) for FID.

The reference carries a dead InceptionV3 at
/root/reference/src/unused_code_backup/inception.py (never imported); the
paper's evaluation uses FID, so this framework wires it as a real
subsystem (SURVEY.md section 5).  Architecture follows torchvision
inception_v3 up to the global average pool (2048-d "pool3" features), the
standard FID feature layer.  Weight layout converts from a torchvision /
pytorch-fid state dict (``params_from_torch_state_dict``); random init is
available for pipeline tests (features are meaningless for real FID
without pretrained weights, which this zero-egress environment lacks).

Everything is jit/vmap-safe: plain conv + frozen batch-norm + relu,
avg/max pools via ``lax.reduce_window``.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Params = Dict[str, Any]


def _conv_bn(x, p, stride=1, padding=0):
    """BasicConv2d: conv (no bias) + frozen BN (eps=1e-3) + relu."""
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    y = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    scale = (p["gamma"] / jnp.sqrt(p["var"] + 1e-3)).astype(y.dtype)
    bias = (p["beta"] - p["mean"] * p["gamma"] / jnp.sqrt(p["var"] + 1e-3)).astype(y.dtype)
    return jax.nn.relu(y * scale + bias)


def _avgpool(x, k=3, s=1, pad=1, count_include_pad=True):
    pads = ((pad, pad), (pad, pad))
    summed = lax.reduce_window(
        x, 0.0, lax.add, (1, k, k, 1), (1, s, s, 1),
        ((0, 0),) + pads + ((0, 0),),
    )
    if count_include_pad:
        return summed / (k * k)
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = lax.reduce_window(
        ones, 0.0, lax.add, (1, k, k, 1), (1, s, s, 1),
        ((0, 0),) + pads + ((0, 0),),
    )
    return summed / counts


def _maxpool(x, k=3, s=2):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, k, k, 1), (1, s, s, 1), "VALID"
    )


def _inception_a(x, p):
    b1 = _conv_bn(x, p["b1x1"])
    b5 = _conv_bn(_conv_bn(x, p["b5_1"]), p["b5_2"], padding=2)
    b3 = _conv_bn(_conv_bn(_conv_bn(x, p["b3_1"]), p["b3_2"], padding=1), p["b3_3"], padding=1)
    bp = _conv_bn(_avgpool(x, count_include_pad=False), p["bpool"])
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(x, p):
    b3 = _conv_bn(x, p["b3"], stride=2)
    bd = _conv_bn(_conv_bn(_conv_bn(x, p["bd_1"]), p["bd_2"], padding=1), p["bd_3"], stride=2)
    bp = _maxpool(x)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _inception_c(x, p):
    b1 = _conv_bn(x, p["b1x1"])
    b7 = _conv_bn(x, p["b7_1"])
    b7 = _conv_bn(b7, p["b7_2"], padding=((0, 0), (3, 3)))
    b7 = _conv_bn(b7, p["b7_3"], padding=((3, 3), (0, 0)))
    bd = _conv_bn(x, p["bd_1"])
    bd = _conv_bn(bd, p["bd_2"], padding=((3, 3), (0, 0)))
    bd = _conv_bn(bd, p["bd_3"], padding=((0, 0), (3, 3)))
    bd = _conv_bn(bd, p["bd_4"], padding=((3, 3), (0, 0)))
    bd = _conv_bn(bd, p["bd_5"], padding=((0, 0), (3, 3)))
    bp = _conv_bn(_avgpool(x, count_include_pad=False), p["bpool"])
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(x, p):
    b3 = _conv_bn(_conv_bn(x, p["b3_1"]), p["b3_2"], stride=2)
    b7 = _conv_bn(x, p["b7_1"])
    b7 = _conv_bn(b7, p["b7_2"], padding=((0, 0), (3, 3)))
    b7 = _conv_bn(b7, p["b7_3"], padding=((3, 3), (0, 0)))
    b7 = _conv_bn(b7, p["b7_4"], stride=2)
    bp = _maxpool(x)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _inception_e(x, p, pool: str):
    b1 = _conv_bn(x, p["b1x1"])
    b3 = _conv_bn(x, p["b3_1"])
    b3 = jnp.concatenate(
        [
            _conv_bn(b3, p["b3_2a"], padding=((0, 0), (1, 1))),
            _conv_bn(b3, p["b3_2b"], padding=((1, 1), (0, 0))),
        ],
        axis=-1,
    )
    bd = _conv_bn(_conv_bn(x, p["bd_1"]), p["bd_2"], padding=1)
    bd = jnp.concatenate(
        [
            _conv_bn(bd, p["bd_3a"], padding=((0, 0), (1, 1))),
            _conv_bn(bd, p["bd_3b"], padding=((1, 1), (0, 0))),
        ],
        axis=-1,
    )
    if pool == "max":  # pytorch-fid's FIDInceptionE_2
        bp = _maxpool_same(x)
    else:
        bp = _avgpool(x, count_include_pad=False)
    bp = _conv_bn(bp, p["bpool"])
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def _maxpool_same(x, k=3):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, k, k, 1), (1, 1, 1, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def inception_features(params: Params, x: jax.Array) -> jax.Array:
    """x: [B, 299, 299, 3] in [-1, 1] -> [B, 2048] pool3 features."""
    y = _conv_bn(x, params["c1a"], stride=2)
    y = _conv_bn(y, params["c2a"])
    y = _conv_bn(y, params["c2b"], padding=1)
    y = _maxpool(y)
    y = _conv_bn(y, params["c3b"])
    y = _conv_bn(y, params["c4a"])
    y = _maxpool(y)
    y = _inception_a(y, params["m5b"])
    y = _inception_a(y, params["m5c"])
    y = _inception_a(y, params["m5d"])
    y = _inception_b(y, params["m6a"])
    y = _inception_c(y, params["m6b"])
    y = _inception_c(y, params["m6c"])
    y = _inception_c(y, params["m6d"])
    y = _inception_c(y, params["m6e"])
    y = _inception_d(y, params["m7a"])
    y = _inception_e(y, params["m7b"], pool="avg")
    y = _inception_e(y, params["m7c"], pool="max")
    return jnp.mean(y, axis=(1, 2))  # global average pool -> [B, 2048]


def preprocess(images: jax.Array, size: int = 299) -> jax.Array:
    """[-1,1] NHWC any-res -> bilinear-resized 299x299 (pytorch-fid recipe:
    resize in [0,1], rescale to [-1,1])."""
    x01 = (images + 1.0) / 2.0
    x01 = jax.image.resize(x01, (images.shape[0], size, size, 3), "bilinear")
    return x01 * 2.0 - 1.0


# ---------------------------------------------------------------------------
# init / conversion
# ---------------------------------------------------------------------------

# (name, cin, cout, k) per BasicConv2d; spatial kernels may be tuples.
def _bc(key, cin, cout, k):
    kh, kw = (k, k) if isinstance(k, int) else k
    return {
        "w": jax.random.normal(key, (kh, kw, cin, cout)) * math.sqrt(2.0 / (cin * kh * kw)),
        "gamma": jnp.ones((cout,)),
        "beta": jnp.zeros((cout,)),
        "mean": jnp.zeros((cout,)),
        "var": jnp.ones((cout,)),
    }


def init_inception_params(key: jax.Array) -> Params:
    ks = iter(jax.random.split(key, 128))

    def a_block(cin, pool_feat):
        return {
            "b1x1": _bc(next(ks), cin, 64, 1),
            "b5_1": _bc(next(ks), cin, 48, 1),
            "b5_2": _bc(next(ks), 48, 64, 5),
            "b3_1": _bc(next(ks), cin, 64, 1),
            "b3_2": _bc(next(ks), 64, 96, 3),
            "b3_3": _bc(next(ks), 96, 96, 3),
            "bpool": _bc(next(ks), cin, pool_feat, 1),
        }

    def c_block(c7):
        return {
            "b1x1": _bc(next(ks), 768, 192, 1),
            "b7_1": _bc(next(ks), 768, c7, 1),
            "b7_2": _bc(next(ks), c7, c7, (1, 7)),
            "b7_3": _bc(next(ks), c7, 192, (7, 1)),
            "bd_1": _bc(next(ks), 768, c7, 1),
            "bd_2": _bc(next(ks), c7, c7, (7, 1)),
            "bd_3": _bc(next(ks), c7, c7, (1, 7)),
            "bd_4": _bc(next(ks), c7, c7, (7, 1)),
            "bd_5": _bc(next(ks), c7, 192, (1, 7)),
            "bpool": _bc(next(ks), 768, 192, 1),
        }

    def e_block(cin):
        return {
            "b1x1": _bc(next(ks), cin, 320, 1),
            "b3_1": _bc(next(ks), cin, 384, 1),
            "b3_2a": _bc(next(ks), 384, 384, (1, 3)),
            "b3_2b": _bc(next(ks), 384, 384, (3, 1)),
            "bd_1": _bc(next(ks), cin, 448, 1),
            "bd_2": _bc(next(ks), 448, 384, 3),
            "bd_3a": _bc(next(ks), 384, 384, (1, 3)),
            "bd_3b": _bc(next(ks), 384, 384, (3, 1)),
            "bpool": _bc(next(ks), cin, 192, 1),
        }

    return {
        "c1a": _bc(next(ks), 3, 32, 3),
        "c2a": _bc(next(ks), 32, 32, 3),
        "c2b": _bc(next(ks), 32, 64, 3),
        "c3b": _bc(next(ks), 64, 80, 1),
        "c4a": _bc(next(ks), 80, 192, 3),
        "m5b": a_block(192, 32),
        "m5c": a_block(256, 64),
        "m5d": a_block(288, 64),
        "m6a": {
            "b3": _bc(next(ks), 288, 384, 3),
            "bd_1": _bc(next(ks), 288, 64, 1),
            "bd_2": _bc(next(ks), 64, 96, 3),
            "bd_3": _bc(next(ks), 96, 96, 3),
        },
        "m6b": c_block(128),
        "m6c": c_block(160),
        "m6d": c_block(160),
        "m6e": c_block(192),
        "m7a": {
            "b3_1": _bc(next(ks), 768, 192, 1),
            "b3_2": _bc(next(ks), 192, 320, 3),
            "b7_1": _bc(next(ks), 768, 192, 1),
            "b7_2": _bc(next(ks), 192, 192, (1, 7)),
            "b7_3": _bc(next(ks), 192, 192, (7, 1)),
            "b7_4": _bc(next(ks), 192, 192, 3),
        },
        "m7b": e_block(1280),
        "m7c": e_block(2048),
    }


_TORCH_BLOCK_MAP = {
    "c1a": "Conv2d_1a_3x3", "c2a": "Conv2d_2a_3x3", "c2b": "Conv2d_2b_3x3",
    "c3b": "Conv2d_3b_1x1", "c4a": "Conv2d_4a_3x3",
    "m5b": "Mixed_5b", "m5c": "Mixed_5c", "m5d": "Mixed_5d",
    "m6a": "Mixed_6a", "m6b": "Mixed_6b", "m6c": "Mixed_6c",
    "m6d": "Mixed_6d", "m6e": "Mixed_6e",
    "m7a": "Mixed_7a", "m7b": "Mixed_7b", "m7c": "Mixed_7c",
}

def _branch_names(short: str) -> Dict[str, str]:
    """Per-block (pytree leaf -> torchvision branch) name mapping."""
    if short in ("m5b", "m5c", "m5d"):
        return {
            "b1x1": "branch1x1", "b5_1": "branch5x5_1", "b5_2": "branch5x5_2",
            "b3_1": "branch3x3dbl_1", "b3_2": "branch3x3dbl_2",
            "b3_3": "branch3x3dbl_3", "bpool": "branch_pool",
        }
    if short == "m6a":
        return {
            "b3": "branch3x3", "bd_1": "branch3x3dbl_1",
            "bd_2": "branch3x3dbl_2", "bd_3": "branch3x3dbl_3",
        }
    if short in ("m6b", "m6c", "m6d", "m6e"):
        return {
            "b1x1": "branch1x1", "b7_1": "branch7x7_1", "b7_2": "branch7x7_2",
            "b7_3": "branch7x7_3", "bd_1": "branch7x7dbl_1",
            "bd_2": "branch7x7dbl_2", "bd_3": "branch7x7dbl_3",
            "bd_4": "branch7x7dbl_4", "bd_5": "branch7x7dbl_5",
            "bpool": "branch_pool",
        }
    if short == "m7a":
        return {
            "b3_1": "branch3x3_1", "b3_2": "branch3x3_2",
            "b7_1": "branch7x7x3_1", "b7_2": "branch7x7x3_2",
            "b7_3": "branch7x7x3_3", "b7_4": "branch7x7x3_4",
        }
    return {  # m7b, m7c
        "b1x1": "branch1x1", "b3_1": "branch3x3_1",
        "b3_2a": "branch3x3_2a", "b3_2b": "branch3x3_2b",
        "bd_1": "branch3x3dbl_1", "bd_2": "branch3x3dbl_2",
        "bd_3a": "branch3x3dbl_3a", "bd_3b": "branch3x3dbl_3b",
        "bpool": "branch_pool",
    }


def torch_name_pairs(template: Params):
    """Yield (short_block, leaf_key_or_None, torch_prefix) for every
    BasicConv2d in the network --- the single source of truth shared by
    the converter and its tests."""
    for short, tname in _TORCH_BLOCK_MAP.items():
        tpl = template[short]
        if "w" in tpl:
            yield short, None, tname
        else:
            names = _branch_names(short)
            for leaf in tpl:
                yield short, leaf, f"{tname}.{names[leaf]}"


def params_from_torch_state_dict(sd: Dict[str, np.ndarray], template: Params) -> Params:
    """Map torchvision/pytorch-fid inception_v3 names onto the pytree.

    Branch-name mapping for the blocks whose short names are ambiguous is
    resolved per block type below; conv weights transpose OIHW -> HWIO.
    """

    def conv(prefix):
        return {
            "w": np.transpose(np.asarray(sd[f"{prefix}.conv.weight"], np.float32), (2, 3, 1, 0)),
            "gamma": np.asarray(sd[f"{prefix}.bn.weight"], np.float32),
            "beta": np.asarray(sd[f"{prefix}.bn.bias"], np.float32),
            "mean": np.asarray(sd[f"{prefix}.bn.running_mean"], np.float32),
            "var": np.asarray(sd[f"{prefix}.bn.running_var"], np.float32),
        }

    out: Params = {}
    for short, leaf, prefix in torch_name_pairs(template):
        if leaf is None:
            out[short] = conv(prefix)
        else:
            out.setdefault(short, {})[leaf] = conv(prefix)
    return out
