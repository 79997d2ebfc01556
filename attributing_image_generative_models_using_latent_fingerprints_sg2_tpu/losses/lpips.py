"""LPIPS perceptual distance in pure JAX (NHWC).

Re-implementation of the reference's vendored ``custom_lpips`` stack
(/root/reference/src/custom_lpips/):

- input scaling layer (shift/scale constants,
  networks_basic.py ScalingLayer),
- VGG16 feature slices relu1_2 / relu2_2 / relu3_3 / relu4_3 / relu5_3
  (pretrained_networks.py vgg16: features[0:4], [4:9], [9:16], [16:23],
  [23:30]),
- per-channel unit normalization (eps added to the norm),
- squared differences -> 1x1 linear heads -> spatial mean -> sum over the
  5 layers (networks_basic.py PNetLin.forward:63-91).

TPU-first design choices:

- **Feature caching**: the distance factors into
  ``extract_features(x)`` (two VGG16 forwards in the reference, *every*
  optimization step, dist_model.py:109-117) and a cheap comparison head.
  The attribution solver extracts target features once per sample and
  reuses them for all steps x restarts --- halving VGG compute.
- Per-sample outputs [B] (the reference returns [B,1,1,1] and sums across
  a DataParallel wrapper); batch elements stay independent so vmapped
  restarts don't mix.

Weights: the linear-head weights load from the reference's small
``vgg.pth`` blob when available (``load_lin_weights_torch``); the VGG16
backbone converts from a torchvision-format state dict
(``vgg16_params_from_torch_state_dict``).  This environment has no
torchvision download, so ``init_lpips_params`` falls back to a
deterministic random backbone: still a valid perceptual metric family
(random-feature LPIPS) and the documented degraded mode for tests/bench.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.pool import maxpool2x2

# VGG16 "features" conv plan: channel widths per conv, "M" = 2x2 maxpool.
VGG16_PLAN: Tuple[Any, ...] = (
    64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512
)
# After which conv (0-based index into the conv list) each LPIPS slice ends.
SLICE_END_CONV = (1, 3, 6, 9, 12)  # relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
LPIPS_CHANNELS = (64, 128, 256, 512, 512)

# ScalingLayer constants, ref networks_basic.py (ScalingLayer buffers).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv3x3(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b.astype(y.dtype)


# Pallas routing for the backbone's square 3x3+ReLU convs (see
# ops/vgg_pallas.py).  OFF by default: the A/B (BASELINE.md) measured the
# per-conv kernel SLOWER in context (325 vs 405 chain-steps/s) --- kept as
# a verified opt-in for future fused-slice work.  Weight/bias cotangents
# on the routed path are computed via an XLA linearization of the conv
# (vgg_pallas._bwd) --- correct if anything differentiates backbone
# weights, dead-code-eliminated on the frozen hot paths here (solver
# optimizes latents, LPIPS training optimizes lin heads only, ref
# dist_model.py:88-99).
_VGG_PALLAS = False


def enable_vgg_pallas(on: bool = True) -> None:
    global _VGG_PALLAS
    if bool(on) != _VGG_PALLAS:
        jax.clear_caches()  # trace-time switch: drop stale executables
    _VGG_PALLAS = bool(on)


def _conv3x3_relu(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    if _VGG_PALLAS:
        from ..ops import vgg_pallas

        if vgg_pallas.eligible(x.shape, w.shape):
            return vgg_pallas.conv3x3_relu(x, w.astype(x.dtype), b)
    return jax.nn.relu(_conv3x3(x, w, b))


# Fused slice-1 Pallas kernel (conv 3->64 + relu + conv 64->64 + relu in
# one VMEM pass, ops/vgg_slice_pallas.py) --- the round-3 multi-op fusion
# experiment targeting the measured LPIPS bandwidth wall; A/B measured via
# ``bench.py --fused_slice`` (results in BASELINE.md).
_VGG_SLICE_FUSED = False


def enable_fused_slice(on: bool = True) -> None:
    global _VGG_SLICE_FUSED
    if bool(on) != _VGG_SLICE_FUSED:
        jax.clear_caches()  # trace-time switch: drop stale executables
    _VGG_SLICE_FUSED = bool(on)


def _maxpool2(x: jax.Array) -> jax.Array:
    # reshape-max, not reduce_window: the latter's gradient lowers to the
    # slow TPU SelectAndScatter (see ops/pool.py), and this pool sits in
    # the differentiated hot path of every attribution step.
    return maxpool2x2(x)


def vgg16_features(
    params: Sequence[Dict[str, jax.Array]], x: jax.Array, n_slices: int = 5
) -> List[jax.Array]:
    """x: [B,H,W,3] (already scaled) -> first ``n_slices`` post-ReLU
    feature maps (5 = the full LPIPS stack; smaller values truncate the
    backbone, used by the per-slice roofline in bench.py)."""
    feats = []
    conv_i = 0
    slice_ends = set(SLICE_END_CONV[:n_slices])
    last_conv = SLICE_END_CONV[n_slices - 1]
    if _VGG_SLICE_FUSED:
        from ..ops import vgg_slice_pallas

        if vgg_slice_pallas.eligible(x.shape):
            x = vgg_slice_pallas.vgg_slice1(
                x, params[0]["weight"], params[0]["bias"],
                params[1]["weight"], params[1]["bias"],
            )
            feats.append(x)  # conv 1 == SLICE_END_CONV[0] (relu1_2)
            if last_conv <= 1:
                return feats
            conv_i = 2
    plan_pos = 0 if conv_i == 0 else 2  # skip the two fused convs
    for item in VGG16_PLAN[plan_pos:]:
        if item == "M":
            x = _maxpool2(x)
        else:
            p = params[conv_i]
            x = _conv3x3_relu(x, p["weight"], p["bias"])
            if conv_i in slice_ends:
                feats.append(x)
            if conv_i >= last_conv:
                break
            conv_i += 1
    return feats


def scaling_layer(x: jax.Array) -> jax.Array:
    """(x - shift) / scale on [-1,1] RGB input, channels last."""
    return (x - jnp.asarray(_SHIFT, x.dtype)) / jnp.asarray(_SCALE, x.dtype)


# ---------------------------------------------------------------------------
# Alternative backbones: AlexNet and SqueezeNet1.1
# (ref custom_lpips/pretrained_networks.py alexnet/squeezenet slices)
# ---------------------------------------------------------------------------

ALEX_CHANNELS = (64, 192, 384, 256, 256)
SQUEEZE_CHANNELS = (64, 128, 256, 384, 384, 512, 512)
# torchvision alexnet .features conv specs: (cout, k, stride, pad)
_ALEX_CONVS = ((64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1), (256, 3, 1, 1), (256, 3, 1, 1))
# squeezenet1_1 fire module plans: (squeeze, expand1x1, expand3x3);
# fires live at features indices 3,4, 6,7, 9,10,11,12
_SQUEEZE_FIRES = (
    (16, 64, 64), (16, 64, 64),
    (32, 128, 128), (32, 128, 128),
    (48, 192, 192), (48, 192, 192),
    (64, 256, 256), (64, 256, 256),
)


def _conv2d(x: jax.Array, p: Dict[str, jax.Array], stride: int = 1, pad: int = 0) -> jax.Array:
    y = lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype), (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["bias"].astype(y.dtype)


def _maxpool(x: jax.Array, k: int = 3, stride: int = 2, ceil_mode: bool = False) -> jax.Array:
    """kxk/stride max pool; ceil_mode pads the high side with -inf
    (squeezenet1_1 uses ceil_mode=True)."""
    ph = pw = 0
    if ceil_mode:
        h, w = x.shape[1], x.shape[2]
        ph = (-(-(h - k) // stride)) * stride + k - h
        pw = (-(-(w - k) // stride)) * stride + k - w
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, k, k, 1), (1, stride, stride, 1),
        ((0, 0), (0, max(0, ph)), (0, max(0, pw)), (0, 0)),
    )


def alexnet_features(params: Sequence[Dict[str, jax.Array]], x: jax.Array) -> List[jax.Array]:
    """AlexNet .features slices relu1..relu5
    (ref pretrained_networks.py alexnet: [0:2],[2:5],[5:8],[8:10],[10:12]).
    Conv strides/pads come from _ALEX_CONVS (single source of truth);
    maxpools sit before convs 1 and 2."""
    feats = []
    for i, (_, _, stride, pad) in enumerate(_ALEX_CONVS):
        if i in (1, 2):
            x = _maxpool(x)
        x = jax.nn.relu(_conv2d(x, params[i], stride=stride, pad=pad))
        feats.append(x)
    return feats


def _fire(x: jax.Array, p: Dict[str, Any]) -> jax.Array:
    """SqueezeNet Fire: 1x1 squeeze -> relu -> (1x1 expand || 3x3 expand)
    -> relu -> channel concat."""
    s = jax.nn.relu(_conv2d(x, p["squeeze"]))
    e1 = jax.nn.relu(_conv2d(s, p["expand1x1"]))
    e3 = jax.nn.relu(_conv2d(s, p["expand3x3"], pad=1))
    return jnp.concatenate([e1, e3], axis=-1)


def squeezenet_features(params: Dict[str, Any], x: jax.Array) -> List[jax.Array]:
    """SqueezeNet1.1 .features slices relu1..relu7
    (ref pretrained_networks.py squeezenet: [0:2],[2:5],[5:8],[8:10],
    [10:11],[11:12],[12:13]; pools are ceil_mode)."""
    feats = []
    x = jax.nn.relu(_conv2d(x, params["conv0"], stride=2))
    feats.append(x)
    fires = params["fires"]
    x = _fire(_fire(_maxpool(x, ceil_mode=True), fires[0]), fires[1])
    feats.append(x)
    x = _fire(_fire(_maxpool(x, ceil_mode=True), fires[2]), fires[3])
    feats.append(x)
    x = _fire(_maxpool(x, ceil_mode=True), fires[4])
    feats.append(x)
    x = _fire(x, fires[5])
    feats.append(x)
    x = _fire(x, fires[6])
    feats.append(x)
    x = _fire(x, fires[7])
    feats.append(x)
    return feats


def normalize_feat(f: jax.Array, eps: float = 1e-10) -> jax.Array:
    """Unit-normalize over channels; eps added to the norm (lpips util).
    The norm accumulates in f32 regardless of the feature dtype."""
    sq = jnp.sum(jnp.square(f.astype(jnp.float32)), axis=-1, keepdims=True)
    norm = jnp.sqrt(sq)
    return (f.astype(jnp.float32) / (norm + eps)).astype(f.dtype)


def extract_raw_features(
    params: Dict[str, Any], img: jax.Array, n_slices: int = 5
) -> List[jax.Array]:
    """[-1,1] NHWC image -> list of UN-normalized backbone feature maps.

    Dispatches on the params STRUCTURE (not a string leaf --- the params
    pytree is a traced jit argument, so it may only hold arrays): a 'vgg'
    key selects VGG16; otherwise 'net' holds either the SqueezeNet dict
    (has 'fires') or the AlexNet conv tuple. Covers all three reference
    backbones (custom_lpips/pretrained_networks.py), plus the in-env
    trained-discriminator backbone (losses/disc_percept.py, 'disc' key
    --- no VGG scaling layer: D consumes [-1,1] natively).  ``n_slices
    < 5`` truncates the VGG backbone (per-slice roofline support)."""
    if "disc" in params:
        from .disc_percept import disc_features

        return disc_features(params["disc"], img)
    x = scaling_layer(img)
    if "vgg" in params:
        return vgg16_features(params["vgg"], x, n_slices=n_slices)
    net = params["net"]
    if isinstance(net, dict) and "fires" in net:
        return squeezenet_features(net, x)
    return alexnet_features(net, x)


def extract_features(params: Dict[str, Any], img: jax.Array) -> List[jax.Array]:
    """[-1,1] NHWC image -> list of channel-normalized feature maps."""
    return [normalize_feat(f) for f in extract_raw_features(params, img)]


def distance_from_features(
    params: Dict[str, Any],
    feats0: Sequence[jax.Array],
    feats1: Sequence[jax.Array],
    ret_per_layer: bool = False,
):
    """Per-sample LPIPS distance [B] from pre-normalized features.

    ``ret_per_layer=True`` additionally returns the per-layer distances
    (ref PNetLin.forward retPerLayer, networks_basic.py:88-91)."""
    total = None
    per_layer = []
    for f0, f1, lin_w in zip(feats0, feats1, params["lin"]):
        # Subtract in the FEATURE dtype, square/accumulate in f32.  Both
        # inputs are already rounded to the feature dtype, so a bf16
        # subtraction loses at most 1 ulp on the diff --- while converting
        # to f32 *before* the broadcasting subtraction makes XLA
        # materialize the [S, n, h, w, c] target broadcast at twice the
        # bytes (measured 1-2 ms/step at 256px x 16 chains, trace
        # broadcast.4052).
        diff = f0 - f1
        diff2 = jnp.square(diff.astype(jnp.float32))
        # 1x1 conv head == channel-weighted sum; then spatial mean.
        d = jnp.mean(jnp.sum(diff2 * lin_w, axis=-1), axis=(-2, -1))  # [...]
        per_layer.append(d)
        total = d if total is None else total + d
    if ret_per_layer:
        return total, per_layer
    return total


def lpips(params: Dict[str, Any], img0: jax.Array, img1: jax.Array) -> jax.Array:
    """Per-sample LPIPS distance between two [-1,1] NHWC batches -> [B]."""
    return distance_from_features(
        params, extract_features(params, img0), extract_features(params, img1)
    )


# ---------------------------------------------------------------------------
# Fused per-slice distance head (solver hot path)
# ---------------------------------------------------------------------------
#
# The solver differentiates  mean_hw sum_c lin_c (normalize(f) - t)^2  with
# respect to the raw backbone feature f EVERY optimization step.  Spelled as
# normalize_feat + distance_from_features, autodiff saves/materializes the
# norm, the normalized map, and the diff per slice --- several extra HBM
# round trips over maps as large as [16,256,256,64].  The head below has a
# hand-derived VJP that recomputes the cheap elementwise chain from the raw
# feature (which the conv backward keeps alive anyway) + the tiny saved
# norm, in one fused pass.  Measured A/B (bench.py, 256px x 16 chains):
# 405.3 vs 394.8 chain-steps/s, i.e. -0.65 ms per 16-chain program step.
#
# The target is treated as a CONSTANT (zero cotangent): the reference
# detaches the attacked target before optimizing (src/main.py:124), so no
# gradient ever flows into it; likewise the lin heads are frozen weights
# (dist_model.py net-lin eval mode).


def _fsd_value(f, t, lin, eps):
    f32 = f.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(jnp.square(f32), axis=-1, keepdims=True))
    fn = (f32 / (norm + eps)).astype(f.dtype)  # == normalize_feat(f)
    diff2 = jnp.square((fn - t).astype(jnp.float32))
    d = jnp.mean(jnp.sum(diff2 * lin, axis=-1), axis=(-2, -1))
    return d, norm


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_slice_distance(f, t, lin, eps):
    return _fsd_value(f, t, lin, eps)[0]


def _fsd_fwd(f, t, lin, eps):
    d, norm = _fsd_value(f, t, lin, eps)
    return d, (f, t, lin, norm)


def _fsd_bwd(eps, res, g):
    f, t, lin, norm = res
    f32 = f.astype(jnp.float32)
    denom = norm + eps
    fn32 = f32 / denom
    # match the forward's rounding: the diff uses the feature-dtype fn
    e = (fn32.astype(f.dtype) - t).astype(jnp.float32)
    hw = f.shape[-3] * f.shape[-2]
    u = e * (lin * (2.0 / hw)) * g[..., None, None, None].astype(jnp.float32)
    # VJP of fn = f32/ (||f32|| + eps):
    #   df = u/denom - f32 * (sum_c u*f32) / (norm * denom^2)
    s = jnp.sum(u * f32, axis=-1, keepdims=True)
    df = u / denom - f32 * (s / (norm * jnp.square(denom)))
    return (df.astype(f.dtype), jnp.zeros_like(t), jnp.zeros_like(lin))


_fused_slice_distance.defvjp(_fsd_fwd, _fsd_bwd)


def distance_from_raw_features(
    params: Dict[str, Any],
    raw_feats: Sequence[jax.Array],
    target_norm_feats: Sequence[jax.Array],
    eps: float = 1e-10,
) -> jax.Array:
    """LPIPS distance of RAW features against cached NORMALIZED target
    features, with the fused analytic backward (see above).  Numerically
    equal to ``distance_from_features(params, target_norm_feats,
    [normalize_feat(f) for f in raw_feats])``; gradients equal up to the
    feature dtype's rounding of the normalized map."""
    total = None
    for f, t, lin_w in zip(raw_feats, target_norm_feats, params["lin"]):
        d = _fused_slice_distance(f, t, lin_w, eps)
        total = d if total is None else total + d
    return total


# ---------------------------------------------------------------------------
# Parameter construction / conversion
# ---------------------------------------------------------------------------


def init_lpips_params(key: jax.Array, seed_scale: float = 1.0) -> Dict[str, Any]:
    """Random-backbone LPIPS (He-init convs, uniform lin heads).

    Degraded-but-valid mode when no pretrained VGG16 weights are on disk;
    exact parity requires ``vgg16_params_from_torch_state_dict`` +
    ``load_lin_weights_torch``.
    """
    vgg = []
    cin = 3
    keys = jax.random.split(key, len([c for c in VGG16_PLAN if c != "M"]) + 1)
    ki = 0
    for item in VGG16_PLAN:
        if item == "M":
            continue
        cout = int(item)
        fan_in = cin * 9
        w = jax.random.normal(keys[ki], (3, 3, cin, cout)) * seed_scale * math.sqrt(2.0 / fan_in)
        vgg.append({"weight": w, "bias": jnp.zeros((cout,))})
        cin = cout
        ki += 1
    lin = tuple(jnp.ones((c,)) / c for c in LPIPS_CHANNELS)
    return {"vgg": tuple(vgg), "lin": lin}


def _he_conv(key, k, cin, cout):
    w = jax.random.normal(key, (k, k, cin, cout)) * math.sqrt(2.0 / (cin * k * k))
    return {"weight": w, "bias": jnp.zeros((cout,))}


def init_alex_params(key: jax.Array) -> Tuple[Dict[str, jax.Array], ...]:
    """Random-init AlexNet backbone (degraded mode; see init_lpips_params)."""
    keys = jax.random.split(key, len(_ALEX_CONVS))
    convs, cin = [], 3
    for kk, (cout, ksz, _, _) in zip(keys, _ALEX_CONVS):
        convs.append(_he_conv(kk, ksz, cin, cout))
        cin = cout
    return tuple(convs)


def init_squeeze_params(key: jax.Array) -> Dict[str, Any]:
    """Random-init SqueezeNet1.1 backbone (degraded mode)."""
    keys = jax.random.split(key, 1 + 3 * len(_SQUEEZE_FIRES))
    fires, cin = [], 64
    for i, (s, e1, e3) in enumerate(_SQUEEZE_FIRES):
        fires.append(
            {
                "squeeze": _he_conv(keys[1 + 3 * i], 1, cin, s),
                "expand1x1": _he_conv(keys[2 + 3 * i], 1, s, e1),
                "expand3x3": _he_conv(keys[3 + 3 * i], 3, s, e3),
            }
        )
        cin = e1 + e3
    return {"conv0": _he_conv(keys[0], 3, 3, 64), "fires": tuple(fires)}


def alexnet_params_from_torch_state_dict(
    sd: Dict[str, np.ndarray],
) -> Tuple[Dict[str, np.ndarray], ...]:
    """torchvision alexnet ``features.{0,3,6,8,10}`` convs -> HWIO pytree."""
    convs = []
    for li in (0, 3, 6, 8, 10):
        w = np.asarray(sd[f"features.{li}.weight"], np.float32)
        convs.append(
            {"weight": np.transpose(w, (2, 3, 1, 0)).copy(),
             "bias": np.asarray(sd[f"features.{li}.bias"], np.float32)}
        )
    return tuple(convs)


def squeezenet_params_from_torch_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """torchvision squeezenet1_1 ``features.*`` -> pytree (fires at
    indices 3,4,6,7,9,10,11,12)."""
    def conv(prefix):
        w = np.asarray(sd[f"{prefix}.weight"], np.float32)
        return {"weight": np.transpose(w, (2, 3, 1, 0)).copy(),
                "bias": np.asarray(sd[f"{prefix}.bias"], np.float32)}

    fires = tuple(
        {
            "squeeze": conv(f"features.{i}.squeeze"),
            "expand1x1": conv(f"features.{i}.expand1x1"),
            "expand3x3": conv(f"features.{i}.expand3x3"),
        }
        for i in (3, 4, 6, 7, 9, 10, 11, 12)
    )
    return {"conv0": conv("features.0"), "fires": fires}


def vgg16_params_from_torch_state_dict(sd: Dict[str, np.ndarray]) -> Tuple[Dict[str, np.ndarray], ...]:
    """torchvision vgg16 ``features.{i}.weight`` [O,I,3,3] -> HWIO pytree."""
    conv_layer_indices = []
    i = 0
    for item in VGG16_PLAN:
        if item == "M":
            i += 1  # pool layer occupies one slot
        else:
            conv_layer_indices.append(i)
            i += 2  # conv + relu
    vgg = []
    for li in conv_layer_indices:
        w = np.asarray(sd[f"features.{li}.weight"], np.float32)
        b = np.asarray(sd[f"features.{li}.bias"], np.float32)
        vgg.append({"weight": np.transpose(w, (2, 3, 1, 0)).copy(), "bias": b})
    return tuple(vgg)


def lin_weights_from_torch_state_dict(
    sd: Dict[str, np.ndarray], n_layers: int = 5
) -> Tuple[np.ndarray, ...]:
    """Reference lin-head blob (custom_lpips/weights/v0.1/{vgg,alex,squeeze}.pth):
    keys ``lin{k}.model.1.weight`` with shape [1, C, 1, 1] -> [C] vectors."""
    lins = []
    for k in range(n_layers):
        w = np.asarray(sd[f"lin{k}.model.1.weight"], np.float32).reshape(-1)
        lins.append(w)
    return tuple(lins)


def load_lin_weights_torch(path: str, n_layers: int = 5) -> Tuple[np.ndarray, ...]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    return lin_weights_from_torch_state_dict(
        {k: v.detach().numpy() for k, v in sd.items()}, n_layers=n_layers
    )


def load_vgg_backbone_torch(path: str) -> Tuple[Dict[str, np.ndarray], ...]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return vgg16_params_from_torch_state_dict(
        {k: np.asarray(v.detach().float().numpy()) for k, v in sd.items()}
    )


def build_lpips_params(
    key: jax.Array,
    vgg_path: str | None = None,
    lin_path: str | None = None,
    net: str = "vgg",
) -> Dict[str, Any]:
    """Assemble LPIPS params, loading pretrained pieces where available.

    ``net``: 'vgg' | 'alex' | 'squeeze' (ref DistModel.initialize net arg,
    dist_model.py:28-73).  ``vgg_path`` is the backbone state-dict path for
    whichever net is selected; ``lin_path`` the matching lin-head blob
    (custom_lpips/weights/v0.1/{vgg,alex,squeeze}.pth)."""
    if net in ("vgg", "vgg16"):
        params = init_lpips_params(key)
        if vgg_path is not None:
            params = dict(
                params, vgg=jax.tree.map(jnp.asarray, load_vgg_backbone_torch(vgg_path))
            )
        chans = LPIPS_CHANNELS
    elif net == "alex":
        params = {
            "net": init_alex_params(key),
            "lin": tuple(jnp.ones((c,)) / c for c in ALEX_CHANNELS),
        }
        if vgg_path is not None:
            sd = _load_torch_sd(vgg_path)
            params["net"] = jax.tree.map(
                jnp.asarray, alexnet_params_from_torch_state_dict(sd)
            )
        chans = ALEX_CHANNELS
    elif net == "squeeze":
        params = {
            "net": init_squeeze_params(key),
            "lin": tuple(jnp.ones((c,)) / c for c in SQUEEZE_CHANNELS),
        }
        if vgg_path is not None:
            sd = _load_torch_sd(vgg_path)
            params["net"] = jax.tree.map(
                jnp.asarray, squeezenet_params_from_torch_state_dict(sd)
            )
        chans = SQUEEZE_CHANNELS
    else:
        raise ValueError(f"unknown LPIPS net {net!r} (vgg | alex | squeeze)")
    if lin_path is not None:
        lins = load_lin_weights_torch(path=lin_path, n_layers=len(chans))
        params = dict(params, lin=tuple(jnp.asarray(w) for w in lins))
    return params


def _load_torch_sd(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: np.asarray(v.detach().float().numpy()) for k, v in sd.items()}


# ---------------------------------------------------------------------------
# Alternative distance modes of the reference's DistModel
# (dist_model.py:61-84: net-lin [above], "net", L2, SSIM)
# ---------------------------------------------------------------------------


def mse_per_sample(img0: jax.Array, img1: jax.Array) -> jax.Array:
    """"L2" mode / ref src/utils.py:44-50 loss_func="mse"."""
    return jnp.mean(jnp.square(img0 - img1), axis=(1, 2, 3))


def lpips_net_mode(params: Dict[str, Any], img0: jax.Array, img1: jax.Array) -> jax.Array:
    """"net" mode: squared feature diffs summed over channels, spatially
    averaged, summed over layers --- no learned lin heads
    (networks_basic.py:77-86, lpips=False branch)."""
    f0 = extract_features(params, img0)
    f1 = extract_features(params, img1)
    total = None
    for a, b in zip(f0, f1):
        d = jnp.mean(
            jnp.sum(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)), axis=-1),
            axis=(-2, -1),
        )
        total = d if total is None else total + d
    return total


def dssim_per_sample(
    img0: jax.Array, img1: jax.Array, data_range: float = 2.0, win: int = 7
) -> jax.Array:
    """(1 - SSIM)/2 on [-1,1] images --- the reference's "SSIM" DistModel
    mode (dist_model.py:80-84 via skimage; uniform window variant)."""
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2

    def avg(v):
        k = jnp.ones((win, win, 1, 1), v.dtype) / (win * win)
        c = v.shape[-1]
        kk = jnp.broadcast_to(k, (win, win, 1, c))
        return lax.conv_general_dilated(
            v, kk, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        )

    mu0, mu1 = avg(img0), avg(img1)
    s00 = avg(img0 * img0) - mu0 * mu0
    s11 = avg(img1 * img1) - mu1 * mu1
    s01 = avg(img0 * img1) - mu0 * mu1
    ssim_map = ((2 * mu0 * mu1 + c1) * (2 * s01 + c2)) / (
        (mu0**2 + mu1**2 + c1) * (s00 + s11 + c2)
    )
    ssim = jnp.mean(ssim_map, axis=(1, 2, 3))
    return (1.0 - ssim) / 2.0
