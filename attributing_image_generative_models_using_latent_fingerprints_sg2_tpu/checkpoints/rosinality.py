"""Rosinality-format StyleGAN2 checkpoint conversion.

The reference loads pretrained generators from rosinality ``.pt`` files via
``torch.load(path)["g_ema"]`` with ``strict=False``
(/root/reference/src/PCA.py:40, /root/reference/src/generator.py:50).
This module maps that state-dict naming onto this framework's NHWC pytree:

torch name                                   -> pytree path / transform
--------------------------------------------------------------------------
style.{i}.weight        [out,in]             -> style[i-1].weight   (transpose)
style.{i}.bias          [out]                -> style[i-1].bias
input.input             [1,C,4,4]            -> input               (NCHW->NHWC)
conv1.conv.weight       [1,O,I,k,k]          -> conv1.weight        ([k,k,I,O])
conv1.conv.modulation.{weight,bias}          -> conv1.mod.{weight^T,bias}
conv1.noise.weight      [1]                  -> conv1.noise_weight  (scalar)
conv1.activate.bias     [O]                  -> conv1.act_bias
to_rgb1.conv.weight / .conv.modulation.* / .bias [1,3,1,1] -> to_rgb1.*
convs.{2j}.*                                 -> convs[2j] (upsample layer:
                                                weight additionally spatially
                                                FLIPPED — this framework
                                                realizes the stride-2
                                                conv_transpose as a dilated
                                                conv, see
                                                models/stylegan2.py)
convs.{2j+1}.*                               -> convs[2j+1]
to_rgbs.{j}.*                                -> to_rgbs[j]
noises.noise_{l}        [1,1,r,r]            -> noises[l]           (NHWC)

Blur kernels are architecture constants recomputed at use
(ref src/model.py:22-30) and are ignored if present in the state dict.
Equalized-lr scales / lr_mul are static use-time factors in both codebases,
so weights transfer value-for-value.

The loader accepts either a real torch ``.pt`` file (torch is only imported
when needed) or an already-materialized ``{name: np.ndarray}`` dict, which
is what the tests use.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Mapping

import numpy as np

from ..config import ModelConfig
from ..models.stylegan2 import channel_map, noise_shapes


def load_torch_state_dict(path: str, key: str = "g_ema") -> Dict[str, np.ndarray]:
    """Read a rosinality checkpoint into {name: float32 ndarray}.

    Accepts either a torch ``.pt`` (the reference format, loaded with
    torch) or a portable ``.npz`` with the same tensor names (the format
    ``cli/train.py`` exports — loadable without torch)."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: np.asarray(z[k], dtype=np.float32) for k in z.files}

    import torch  # local import: torch is optional at runtime

    blob = torch.load(path, map_location="cpu", weights_only=False)
    state = blob[key] if key and key in blob else blob
    return {k: np.asarray(v.detach().float().numpy()) for k, v in state.items()}


def _conv_weight(w: np.ndarray, flip: bool) -> np.ndarray:
    """[1,O,I,kh,kw] (or [O,I,kh,kw]) -> [kh,kw,I,O], optional spatial flip."""
    if w.ndim == 5:
        w = w[0]
    w = np.transpose(w, (2, 3, 1, 0))
    if flip:
        w = w[::-1, ::-1]
    return np.ascontiguousarray(w, dtype=np.float32)


def _styled_conv(sd: Mapping[str, np.ndarray], prefix: str, flip: bool) -> Dict[str, Any]:
    return {
        "weight": _conv_weight(sd[f"{prefix}.conv.weight"], flip),
        "mod": {
            "weight": np.ascontiguousarray(sd[f"{prefix}.conv.modulation.weight"].T, np.float32),
            "bias": sd[f"{prefix}.conv.modulation.bias"].astype(np.float32),
        },
        "noise_weight": np.float32(sd[f"{prefix}.noise.weight"].reshape(())),
        "act_bias": sd[f"{prefix}.activate.bias"].astype(np.float32),
    }


def _to_rgb(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    return {
        "weight": _conv_weight(sd[f"{prefix}.conv.weight"], flip=False),
        "mod": {
            "weight": np.ascontiguousarray(sd[f"{prefix}.conv.modulation.weight"].T, np.float32),
            "bias": sd[f"{prefix}.conv.modulation.bias"].astype(np.float32),
        },
        "bias": sd[f"{prefix}.bias"].reshape(-1).astype(np.float32),
    }


def generator_params_from_state_dict(
    sd: Mapping[str, np.ndarray], cfg: ModelConfig
) -> Dict[str, Any]:
    """Build the generator pytree from a rosinality g_ema state dict."""
    log_size = int(math.log2(cfg.img_size))
    n_tor = log_size - 2  # number of upsampling blocks

    style = []
    i = 1
    while f"style.{i}.weight" in sd:
        style.append(
            {
                "weight": np.ascontiguousarray(sd[f"style.{i}.weight"].T, np.float32),
                "bias": sd[f"style.{i}.bias"].astype(np.float32),
            }
        )
        i += 1
    if len(style) != cfg.n_mlp:
        raise ValueError(f"expected {cfg.n_mlp} mapping layers, found {len(style)}")

    params: Dict[str, Any] = {
        "style": tuple(style),
        "input": np.ascontiguousarray(
            np.transpose(sd["input.input"], (0, 2, 3, 1)), np.float32
        ),
        "conv1": _styled_conv(sd, "conv1", flip=False),
        "to_rgb1": _to_rgb(sd, "to_rgb1"),
        "convs": tuple(
            _styled_conv(sd, f"convs.{j}", flip=(j % 2 == 0)) for j in range(2 * n_tor)
        ),
        "to_rgbs": tuple(_to_rgb(sd, f"to_rgbs.{j}") for j in range(n_tor)),
    }

    noises = []
    for l, shape in enumerate(noise_shapes(cfg.img_size)):
        name = f"noises.noise_{l}"
        if name in sd:
            noises.append(
                np.ascontiguousarray(np.transpose(sd[name], (0, 2, 3, 1)), np.float32)
            )
        else:
            noises.append(np.zeros(shape, np.float32))
    params["noises"] = tuple(noises)

    _validate_shapes(params, cfg)
    return params


def _validate_shapes(params: Dict[str, Any], cfg: ModelConfig) -> None:
    chans = channel_map(cfg.channel_multiplier, cfg.channel_max)
    log_size = int(math.log2(cfg.img_size))
    c4 = chans[4]
    assert params["input"].shape == (1, 4, 4, c4), params["input"].shape
    assert params["conv1"]["weight"].shape == (3, 3, c4, c4)
    in_ch = c4
    for i in range(3, log_size + 1):
        out_ch = chans[2**i]
        j = 2 * (i - 3)
        assert params["convs"][j]["weight"].shape == (3, 3, in_ch, out_ch), (
            i,
            params["convs"][j]["weight"].shape,
        )
        assert params["convs"][j + 1]["weight"].shape == (3, 3, out_ch, out_ch)
        assert params["to_rgbs"][i - 3]["weight"].shape == (1, 1, out_ch, 3)
        in_ch = out_ch


def load_generator(path: str, cfg: ModelConfig) -> Dict[str, Any]:
    """One-call loader: .pt file -> generator pytree (numpy leaves)."""
    return generator_params_from_state_dict(load_torch_state_dict(path), cfg)


def generator_state_dict_from_params(params: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse mapping (pytree -> rosinality names) for round-trip tests
    and for exporting back to the reference ecosystem."""
    sd: Dict[str, np.ndarray] = {}
    for i, layer in enumerate(params["style"]):
        sd[f"style.{i+1}.weight"] = np.asarray(layer["weight"]).T
        sd[f"style.{i+1}.bias"] = np.asarray(layer["bias"])
    sd["input.input"] = np.transpose(np.asarray(params["input"]), (0, 3, 1, 2))

    def put_styled(prefix, p, flip):
        w = np.asarray(p["weight"])
        if flip:
            w = w[::-1, ::-1]
        sd[f"{prefix}.conv.weight"] = np.transpose(w, (3, 2, 0, 1))[None]
        sd[f"{prefix}.conv.modulation.weight"] = np.asarray(p["mod"]["weight"]).T
        sd[f"{prefix}.conv.modulation.bias"] = np.asarray(p["mod"]["bias"])
        sd[f"{prefix}.noise.weight"] = np.asarray(p["noise_weight"]).reshape(1)
        sd[f"{prefix}.activate.bias"] = np.asarray(p["act_bias"])

    def put_rgb(prefix, p):
        sd[f"{prefix}.conv.weight"] = np.transpose(np.asarray(p["weight"]), (3, 2, 0, 1))[None]
        sd[f"{prefix}.conv.modulation.weight"] = np.asarray(p["mod"]["weight"]).T
        sd[f"{prefix}.conv.modulation.bias"] = np.asarray(p["mod"]["bias"])
        sd[f"{prefix}.bias"] = np.asarray(p["bias"]).reshape(1, 3, 1, 1)

    put_styled("conv1", params["conv1"], flip=False)
    put_rgb("to_rgb1", params["to_rgb1"])
    for j, p in enumerate(params["convs"]):
        put_styled(f"convs.{j}", p, flip=(j % 2 == 0))
    for j, p in enumerate(params["to_rgbs"]):
        put_rgb(f"to_rgbs.{j}", p)
    for l, nz in enumerate(params["noises"]):
        sd[f"noises.noise_{l}"] = np.transpose(np.asarray(nz), (0, 3, 1, 2))
    return sd
