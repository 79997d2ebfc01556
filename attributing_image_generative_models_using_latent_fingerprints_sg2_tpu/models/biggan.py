"""BigGAN-deep generator in functional JAX (NHWC).

The reference's optional second model family loads
``pytorch_pretrained_biggan.BigGAN.from_pretrained('biggan-deep-256')``
(/root/reference/src/generator.py:53-64) and fingerprints its 128-d
truncated-noise latent space (PCA over truncated noise samples,
/root/reference/src/PCA.py:76-84).  This module re-implements that
package's BigGAN-deep architecture TPU-first so its checkpoints convert
directly (``params_from_torch_state_dict``); random init covers tests in
this zero-egress environment.

Architecture (pytorch_pretrained_biggan conventions):
- cond_vector = concat(z, class_embedding)  [B, 256]
- gen_z: linear -> [4, 4, 16*ch]
- a stack of deep residual GenBlocks (bottleneck 1x1 -> 3x3 -> 3x3 -> 1x1
  with conditional batch-norm before each conv; nearest 2x upsample inside;
  skip drops channels when in > out), one self-attention block at 64x64;
- BigGAN batch-norm stores running stats at several truncation values and
  linearly interpolates them by the truncation in use;
- final standard BN -> relu -> 3x3 conv -> tanh.

Spectral-norm weight parametrizations are folded (u/v vectors consumed at
conversion; inference uses the effective weight).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.pool import maxpool2x2

Params = Dict[str, Any]

# biggan-deep-256 configuration (pytorch_pretrained_biggan config.json)
BIGGAN_DEEP_256 = dict(
    z_dim=128,
    class_embed_dim=128,
    channel_width=128,
    num_classes=1000,
    output_dim=256,
    attention_layer_position=8,
    # (up_sample, in_mult, out_mult) per layer
    layers=(
        (False, 16, 16),
        (True, 16, 16),
        (False, 16, 16),
        (True, 16, 8),
        (False, 8, 8),
        (True, 8, 8),
        (False, 8, 8),
        (True, 8, 4),
        (False, 4, 4),  # attention sits between index 7 and this per position 8
        (True, 4, 2),
        (False, 2, 2),
        (True, 2, 1),
    ),
    n_stats=51,  # running stats stored for truncations linspace(0, 1, 51)
)


@dataclasses.dataclass(frozen=True)
class BigGANConfig:
    z_dim: int = 128
    class_embed_dim: int = 128
    channel_width: int = 128
    num_classes: int = 1000
    output_dim: int = 256
    attention_layer_position: int = 8
    layers: Tuple[Tuple[bool, int, int], ...] = BIGGAN_DEEP_256["layers"]
    n_stats: int = 51

    @property
    def cond_dim(self) -> int:
        return self.z_dim + self.class_embed_dim


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------


def _interp_stats(stats: jax.Array, truncation: float, n_stats: int) -> jax.Array:
    """Per-truncation running-stat lookup, matching pytorch_pretrained_biggan's
    BigGANBatchNorm exactly --- including its quirk.

    stats: [n_stats, C]; stored at truncations linspace(0, 1, n_stats).
    The package computes ``coef, start = math.modf(truncation/step)`` and
    blends ``stats[start]*coef + stats[start+1]*(1-coef)`` --- i.e. the
    NEARER gridpoint gets the SMALLER weight (inverted vs a standard
    lerp).  The pretrained checkpoints are used with that formula, so
    faithful conversion means reproducing it, not fixing it."""
    pos = truncation * (n_stats - 1)
    lo = int(math.floor(pos))
    frac = pos - lo
    if frac == 0.0 or lo >= n_stats - 1:
        return stats[min(lo, n_stats - 1)]
    return stats[lo] * frac + stats[lo + 1] * (1.0 - frac)


def cond_batch_norm(
    x: jax.Array, cond: jax.Array, p: Params, truncation: float, n_stats: int,
    eps: float = 1e-4,
) -> jax.Array:
    """Conditional BN: running stats interpolated by truncation, gain/bias
    affine in the condition vector (scale has +1 offset)."""
    mean = _interp_stats(p["running_means"], truncation, n_stats)
    var = _interp_stats(p["running_vars"], truncation, n_stats)
    gain = 1.0 + cond @ p["scale_w"]  # [B, C]
    bias = cond @ p["offset_w"]
    inv = lax.rsqrt(var + eps)
    y = (x - mean) * inv
    return y * gain[:, None, None, :].astype(x.dtype) + bias[:, None, None, :].astype(x.dtype)


def batch_norm(x: jax.Array, p: Params, truncation: float, n_stats: int, eps: float = 1e-4) -> jax.Array:
    mean = _interp_stats(p["running_means"], truncation, n_stats)
    var = _interp_stats(p["running_vars"], truncation, n_stats)
    y = (x - mean) * lax.rsqrt(var + eps)
    return y * p["weight"].astype(x.dtype) + p["bias"].astype(x.dtype)


def _conv(x: jax.Array, p: Params, padding: int = 0) -> jax.Array:
    y = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (1, 1),
        ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def _upsample2x_nearest(x: jax.Array) -> jax.Array:
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def gen_block(
    x: jax.Array, cond: jax.Array, p: Params, *, up: bool, drop_to: Optional[int],
    truncation: float, n_stats: int,
) -> jax.Array:
    h = cond_batch_norm(x, cond, p["bn0"], truncation, n_stats)
    h = jax.nn.relu(h)
    h = _conv(h, p["conv0"])  # 1x1 reduce
    h = jax.nn.relu(cond_batch_norm(h, cond, p["bn1"], truncation, n_stats))
    if up:
        h = _upsample2x_nearest(h)
    h = _conv(h, p["conv1"], padding=1)
    h = jax.nn.relu(cond_batch_norm(h, cond, p["bn2"], truncation, n_stats))
    h = _conv(h, p["conv2"], padding=1)
    h = jax.nn.relu(cond_batch_norm(h, cond, p["bn3"], truncation, n_stats))
    h = _conv(h, p["conv3"])  # 1x1 expand
    skip = x
    if drop_to is not None:
        skip = skip[..., :drop_to]
    if up:
        skip = _upsample2x_nearest(skip)
    return h + skip


def self_attention(x: jax.Array, p: Params) -> jax.Array:
    """SAGAN-style attention (theta/phi/g 1x1 convs, phi/g max-pooled 2x)."""
    b, h, w, c = x.shape
    theta = _conv(x, p["theta"])  # [B,H,W,C/8]
    phi = _conv(x, p["phi"])
    g = _conv(x, p["g"])  # [B,H,W,C/2]

    # reshape-max pool: avoids the SelectAndScatter gradient (ops/pool.py)
    phi = maxpool2x2(phi).reshape(b, (h // 2) * (w // 2), -1)
    g = maxpool2x2(g).reshape(b, (h // 2) * (w // 2), -1)
    theta = theta.reshape(b, h * w, -1)
    attn = jax.nn.softmax(
        jnp.einsum("bnd,bmd->bnm", theta, phi).astype(jnp.float32), axis=-1
    ).astype(x.dtype)
    o = jnp.einsum("bnm,bmd->bnd", attn, g).reshape(b, h, w, -1)
    o = _conv(o, p["o_conv"])
    return x + p["gamma"].astype(x.dtype) * o


# ---------------------------------------------------------------------------
# generator forward
# ---------------------------------------------------------------------------


def class_embedding(params: Params, class_onehot: jax.Array) -> jax.Array:
    """one-hot [B, num_classes] -> [B, embed_dim] (linear, no bias)."""
    return class_onehot @ params["embeddings"]


def generate(
    params: Params,
    z: jax.Array,
    class_onehot: jax.Array,
    truncation: float,
    cfg: BigGANConfig = BigGANConfig(),
) -> jax.Array:
    """z: [B, 128] truncated noise; returns [B, out, out, 3] in [-1, 1].

    Mirrors the reference call ``g_ema(new_latent, class_vector,
    truncation)`` (src/generator.py:100).
    """
    embed = class_embedding(params, class_onehot)
    cond = jnp.concatenate([z, embed], axis=1)

    ch = cfg.channel_width
    h = cond @ params["gen_z"]["w"] + params["gen_z"]["b"]
    h = h.reshape(z.shape[0], 4, 4, 16 * ch)

    layer_i = 0
    for i, (up, in_m, out_m) in enumerate(cfg.layers):
        if i == cfg.attention_layer_position:
            h = self_attention(h, params["attn"])
        p = params["layers"][layer_i]
        drop_to = out_m * ch if in_m != out_m else None
        h = gen_block(
            h, cond, p, up=up, drop_to=drop_to,
            truncation=truncation, n_stats=cfg.n_stats,
        )
        layer_i += 1

    h = batch_norm(h, params["bn_out"], truncation, cfg.n_stats)
    h = jax.nn.relu(h)
    h = _conv(h, params["conv_out"], padding=1)
    return jnp.tanh(h)


def truncated_noise(key: jax.Array, batch: int, truncation: float, dim: int = 128) -> jax.Array:
    """Truncated normal scaled by truncation (the pip package's
    ``truncated_noise_sample``: truncnorm(-2, 2) * truncation)."""
    return jax.random.truncated_normal(key, -2.0, 2.0, (batch, dim)) * truncation


# A compact label resolver replacing ``one_hot_from_names`` (the pip
# package resolves via nltk wordnet; offline here).  Extend as needed or
# pass integer class ids directly.
IMAGENET_LABELS = {
    "golden retriever": 207,
    "labrador retriever": 208,
    "tabby": 281,
    "tabby cat": 281,
    "egyptian cat": 285,
    "samoyed": 258,
    "pembroke": 263,
    "corgi": 263,
    "siberian husky": 250,
    "beagle": 162,
    "pug": 254,
    "lion": 291,
    "tiger": 292,
    "zebra": 340,
    "giant panda": 388,
    "panda": 388,
    "goldfish": 1,
    "daisy": 985,
    "coffee mug": 504,
    "sports car": 817,
    "pizza": 963,
    "volcano": 980,
}


def one_hot_from_name(name: str, num_classes: int = 1000, batch_size: int = 1) -> np.ndarray:
    """Label -> one-hot batch, ref usage src/generator.py:63.  Accepts an
    integer-valued string as a direct class id."""
    key = name.strip().lower()
    if key.lstrip("-").isdigit():
        idx = int(key)
    elif key in IMAGENET_LABELS:
        idx = IMAGENET_LABELS[key]
    else:
        raise ValueError(
            f"unknown label {name!r}; pass an integer class id or extend IMAGENET_LABELS"
        )
    return one_hot_from_int(idx, num_classes, batch_size)


def one_hot_from_int(idx: int, num_classes: int = 1000, batch_size: int = 1) -> np.ndarray:
    if not 0 <= int(idx) < num_classes:
        raise ValueError(f"class id {idx} out of range for {num_classes} classes")
    out = np.zeros((batch_size, num_classes), np.float32)
    out[:, int(idx)] = 1.0
    return out


# ---------------------------------------------------------------------------
# init / conversion
# ---------------------------------------------------------------------------


def _init_bn(key, c, cond_dim, n_stats, conditional=True) -> Params:
    p = {
        "running_means": jnp.zeros((n_stats, c)),
        "running_vars": jnp.ones((n_stats, c)),
    }
    if conditional:
        k1, k2 = jax.random.split(key)
        p["scale_w"] = jax.random.normal(k1, (cond_dim, c)) * 0.02
        p["offset_w"] = jax.random.normal(k2, (cond_dim, c)) * 0.02
    else:
        p["weight"] = jnp.ones((c,))
        p["bias"] = jnp.zeros((c,))
    return p


def _init_conv(key, cin, cout, k) -> Params:
    fan_in = cin * k * k
    return {
        "w": jax.random.normal(key, (k, k, cin, cout)) * math.sqrt(2.0 / fan_in),
        "b": jnp.zeros((cout,)),
    }


def init_biggan_params(key: jax.Array, cfg: BigGANConfig = BigGANConfig()) -> Params:
    ch = cfg.channel_width
    ks = iter(jax.random.split(key, 16 + 16 * len(cfg.layers)))
    params: Params = {
        "embeddings": jax.random.normal(next(ks), (cfg.num_classes, cfg.class_embed_dim)) * 0.02,
        "gen_z": {
            "w": jax.random.normal(next(ks), (cfg.cond_dim, 4 * 4 * 16 * ch)) * 0.02,
            "b": jnp.zeros((4 * 4 * 16 * ch,)),
        },
    }
    layers = []
    for up, in_m, out_m in cfg.layers:
        cin, cout = in_m * ch, out_m * ch
        mid = cin // 4
        layers.append(
            {
                "bn0": _init_bn(next(ks), cin, cfg.cond_dim, cfg.n_stats),
                "conv0": _init_conv(next(ks), cin, mid, 1),
                "bn1": _init_bn(next(ks), mid, cfg.cond_dim, cfg.n_stats),
                "conv1": _init_conv(next(ks), mid, mid, 3),
                "bn2": _init_bn(next(ks), mid, cfg.cond_dim, cfg.n_stats),
                "conv2": _init_conv(next(ks), mid, mid, 3),
                "bn3": _init_bn(next(ks), mid, cfg.cond_dim, cfg.n_stats),
                "conv3": _init_conv(next(ks), mid, cout, 1),
            }
        )
    params["layers"] = tuple(layers)
    # channels at the attention position: output of the layer preceding it
    pre = cfg.layers[: cfg.attention_layer_position]
    attn_ch = (pre[-1][2] if pre else 16) * ch
    params["attn"] = {
        "theta": {"w": jax.random.normal(next(ks), (1, 1, attn_ch, attn_ch // 8)) * 0.02},
        "phi": {"w": jax.random.normal(next(ks), (1, 1, attn_ch, attn_ch // 8)) * 0.02},
        "g": {"w": jax.random.normal(next(ks), (1, 1, attn_ch, attn_ch // 2)) * 0.02},
        "o_conv": {"w": jax.random.normal(next(ks), (1, 1, attn_ch // 2, attn_ch)) * 0.02},
        "gamma": jnp.zeros(()),
    }
    out_ch = cfg.layers[-1][2] * ch
    params["bn_out"] = _init_bn(next(ks), out_ch, cfg.cond_dim, cfg.n_stats, conditional=False)
    params["conv_out"] = _init_conv(next(ks), out_ch, 3, 3)
    return params


def params_from_torch_state_dict(
    sd: Dict[str, np.ndarray], cfg: BigGANConfig = BigGANConfig()
) -> Params:
    """Convert a ``pytorch_pretrained_biggan`` state dict.

    Spectral-norm parametrizations store ``weight_orig/weight_u/weight_v``;
    the effective inference weight is weight_orig / sigma(u, W, v), folded
    here.  Conv weights transpose OIHW -> HWIO; linear weights [out, in] ->
    [in, out].
    """

    def eff_weight(prefix):
        if f"{prefix}.weight" in sd:
            return np.asarray(sd[f"{prefix}.weight"], np.float32)
        w = np.asarray(sd[f"{prefix}.weight_orig"], np.float32)
        u = np.asarray(sd[f"{prefix}.weight_u"], np.float32)
        wm = w.reshape(w.shape[0], -1)
        v = wm.T @ u
        v = v / (np.linalg.norm(v) + 1e-12)
        sigma = float(u @ (wm @ v))
        return w / sigma

    def linear(prefix):
        w = eff_weight(prefix)
        p = {"w": np.ascontiguousarray(w.T)}
        if f"{prefix}.bias" in sd:
            p["b"] = np.asarray(sd[f"{prefix}.bias"], np.float32)
        return p

    def conv(prefix):
        w = eff_weight(prefix)
        p = {"w": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))}
        if f"{prefix}.bias" in sd:
            p["b"] = np.asarray(sd[f"{prefix}.bias"], np.float32)
        return p

    def bn(prefix, conditional):
        p = {
            "running_means": np.asarray(sd[f"{prefix}.running_means"], np.float32),
            "running_vars": np.asarray(sd[f"{prefix}.running_vars"], np.float32),
        }
        if conditional:
            p["scale_w"] = np.ascontiguousarray(eff_weight(f"{prefix}.scale").T)
            p["offset_w"] = np.ascontiguousarray(eff_weight(f"{prefix}.offset").T)
        else:
            p["weight"] = np.asarray(sd[f"{prefix}.weight"], np.float32)
            p["bias"] = np.asarray(sd[f"{prefix}.bias"], np.float32)
        return p

    params: Params = {
        "embeddings": np.ascontiguousarray(eff_weight("embeddings").T),
        "gen_z": linear("generator.gen_z"),
    }
    layers = []
    li = 0
    for i in range(len(cfg.layers) + 1):  # +1: attention occupies one slot
        base = f"generator.layers.{i}"
        if f"{base}.theta.weight_orig" in sd or f"{base}.theta.weight" in sd:
            params["attn"] = {
                "theta": conv(f"{base}.theta"),
                "phi": conv(f"{base}.phi"),
                "g": conv(f"{base}.g"),
                "o_conv": conv(f"{base}.o_conv"),
                "gamma": np.asarray(sd[f"{base}.gamma"], np.float32).reshape(()),
            }
            continue
        if f"{base}.conv_0.weight_orig" not in sd and f"{base}.conv_0.weight" not in sd:
            break
        layers.append(
            {
                "bn0": bn(f"{base}.bn_0", True),
                "conv0": conv(f"{base}.conv_0"),
                "bn1": bn(f"{base}.bn_1", True),
                "conv1": conv(f"{base}.conv_1"),
                "bn2": bn(f"{base}.bn_2", True),
                "conv2": conv(f"{base}.conv_2"),
                "bn3": bn(f"{base}.bn_3", True),
                "conv3": conv(f"{base}.conv_3"),
            }
        )
        li += 1
    params["layers"] = tuple(layers)
    params["bn_out"] = bn("generator.bn", False)
    params["conv_out"] = conv("generator.conv_to_rgb")
    # the package's conv_to_rgb outputs channel_width maps; only the first
    # 3 are the image (BigGANDeep quirk) --- slice at conversion.
    if params["conv_out"]["w"].shape[-1] > 3:
        params["conv_out"]["w"] = params["conv_out"]["w"][..., :3]
        if "b" in params["conv_out"]:
            params["conv_out"]["b"] = params["conv_out"]["b"][:3]
    return params
