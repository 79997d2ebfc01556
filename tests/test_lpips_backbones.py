"""AlexNet / SqueezeNet LPIPS backbones vs hand-built torch oracles.

The reference supports three backbones (custom_lpips/pretrained_networks.py:
vgg16, alexnet, squeezenet1_1 slices).  torchvision is not installed here,
so the oracles replicate the exact torchvision `.features` module structure
in plain torch, random-init it, export a state dict with torchvision key
names, convert through our loaders, and compare every slice output.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.losses import (  # noqa: E402
    lpips as lp,
)


def _alex_features_torch():
    """torchvision alexnet .features clone (convs at 0,3,6,8,10)."""
    return nn.Sequential(
        nn.Conv2d(3, 64, 11, stride=4, padding=2), nn.ReLU(inplace=False),
        nn.MaxPool2d(3, 2),
        nn.Conv2d(64, 192, 5, padding=2), nn.ReLU(inplace=False),
        nn.MaxPool2d(3, 2),
        nn.Conv2d(192, 384, 3, padding=1), nn.ReLU(inplace=False),
        nn.Conv2d(384, 256, 3, padding=1), nn.ReLU(inplace=False),
        nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(inplace=False),
    )


class _Fire(nn.Module):
    """torchvision squeezenet Fire clone (key names squeeze/expand1x1/expand3x3)."""

    def __init__(self, cin, s, e1, e3):
        super().__init__()
        self.squeeze = nn.Conv2d(cin, s, 1)
        self.expand1x1 = nn.Conv2d(s, e1, 1)
        self.expand3x3 = nn.Conv2d(s, e3, 3, padding=1)

    def forward(self, x):
        x = F.relu(self.squeeze(x))
        return torch.cat(
            [F.relu(self.expand1x1(x)), F.relu(self.expand3x3(x))], dim=1
        )


def _squeeze_features_torch():
    """torchvision squeezenet1_1 .features clone (fires at 3,4,6,7,9-12)."""
    return nn.Sequential(
        nn.Conv2d(3, 64, 3, stride=2), nn.ReLU(inplace=False),
        nn.MaxPool2d(3, 2, ceil_mode=True),
        _Fire(64, 16, 64, 64), _Fire(128, 16, 64, 64),
        nn.MaxPool2d(3, 2, ceil_mode=True),
        _Fire(128, 32, 128, 128), _Fire(256, 32, 128, 128),
        nn.MaxPool2d(3, 2, ceil_mode=True),
        _Fire(256, 48, 192, 192), _Fire(384, 48, 192, 192),
        _Fire(384, 64, 256, 256), _Fire(512, 64, 256, 256),
    )


def _sd_numpy(module):
    return {k: np.asarray(v.detach().float().numpy()) for k, v in module.state_dict().items()}


def _run_slices_torch(feats, x, slice_ends):
    outs, h = [], x
    for i, layer in enumerate(feats):
        h = layer(h)
        if i in slice_ends:
            outs.append(h.detach().numpy().transpose(0, 2, 3, 1))
    return outs


def test_alexnet_backbone_parity():
    torch.manual_seed(0)
    feats = _alex_features_torch().eval()
    # Sequential state_dict keys are "0.weight" etc -> torchvision prefix
    sd = {("features." + k): v for k, v in _sd_numpy(feats).items()}
    params = jax.tree.map(jnp.asarray, lp.alexnet_params_from_torch_state_dict(sd))

    x = np.random.default_rng(1).standard_normal((2, 3, 64, 64)).astype(np.float32)
    # slice ends after ReLU layers at indices 1, 4, 7, 9, 11 of the Sequential
    want = _run_slices_torch(feats, torch.from_numpy(x), {1, 4, 7, 9, 11})
    got = lp.alexnet_features(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(got) == len(want) == 5
    assert tuple(g.shape[-1] for g in got) == lp.ALEX_CHANNELS
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-4, atol=1e-5)


def test_squeezenet_backbone_parity():
    torch.manual_seed(0)
    feats = _squeeze_features_torch().eval()
    sd = {("features." + k): v for k, v in _sd_numpy(feats).items()}
    params = jax.tree.map(jnp.asarray, lp.squeezenet_params_from_torch_state_dict(sd))

    x = np.random.default_rng(2).standard_normal((2, 3, 65, 65)).astype(np.float32)
    # slice boundaries per pretrained_networks.py squeezenet: after modules
    # 1, 4, 7, 9, 10, 11, 12
    want = _run_slices_torch(feats, torch.from_numpy(x), {1, 4, 7, 9, 10, 11, 12})
    got = lp.squeezenet_features(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(got) == len(want) == 7
    assert tuple(g.shape[-1] for g in got) == lp.SQUEEZE_CHANNELS
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("net", ["alex", "squeeze"])
def test_lpips_distance_with_alt_backbone(net):
    """End-to-end lpips() with the alternative backbones: positive,
    zero on identical images, differentiable."""
    params = lp.build_lpips_params(jax.random.PRNGKey(0), net=net)
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    d = lp.lpips(params, a, b)
    assert d.shape == (2,)
    assert (np.asarray(d) > 0).all()
    np.testing.assert_allclose(np.asarray(lp.lpips(params, a, a)), 0.0, atol=1e-6)
    g = jax.grad(lambda im: jnp.sum(lp.lpips(params, im, b)))(a)
    assert np.isfinite(np.asarray(g)).all()


def test_build_lpips_params_rejects_unknown_net():
    with pytest.raises(ValueError, match="unknown LPIPS net"):
        lp.build_lpips_params(jax.random.PRNGKey(0), net="resnet")


@pytest.mark.parametrize("net", ["alex", "squeeze"])
def test_alt_backbone_usable_in_jitted_attribution(net):
    """Regression: the backbone params pytree must contain only arrays
    (a string net_type leaf crashed the jitted attribute()); the alt
    backbones must drive the actual solver."""
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.config import (
        AttributionConfig,
        FingerprintConfig,
        ModelConfig,
    )
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.fingerprint import (
        attribute as attr,
    )
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.fingerprint import (
        pipeline as lpl,
    )

    mcfg = ModelConfig(img_size=64, channel_max=64, n_mlp=2, style_dim=64)
    fpcfg = FingerprintConfig(key_len=8, shift=56, n_pca_samples=300)
    acfg = AttributionConfig(steps=2, n_starts=2, lr=0.2, loss="perceptual")
    pipe = lpl.build_pipeline(jax.random.PRNGKey(0), mcfg, fpcfg, want_lpips=False)
    params = lp.build_lpips_params(jax.random.PRNGKey(1), net=net)
    imgs, *_ = lpl.generate_fingerprinted(pipe, jax.random.PRNGKey(2), 2)
    res = attr.attribute(
        pipe.gen_params, params, pipe.basis, pipe.noise, imgs,
        jax.random.PRNGKey(3), mcfg=mcfg, acfg=acfg,
    )
    assert np.isfinite(np.asarray(res.loss)).all()
