"""Robustness attacks as pure jittable functions (NHWC, [-1,1]).

Replaces /root/reference/src/attack_methods/: each attack is a pure
function (image, rng) -> image usable inside jit, instead of stateful
nn.Modules re-instantiated per call (ref src/generator.py:163-168).

``make_attack`` mirrors ``attack_initializer``
(/root/reference/src/attack_methods/attack_initializer.py:12-35): eval
mode (is_train=False) applies the strongest setting deterministically per
attack; train mode randomizes strengths / application probability.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..config import AttackConfig
from .blur import gaussian_blur, gaussian_blur_random
from .diffjpeg import (  # noqa: F401  (public re-exports)
    diff_round,
    jpeg_attack,
    jpeg_compress_decompress,
    quality_to_factor,
)
from .crop import center_crop, random_crop  # noqa: F401
from .noise import gaussian_noise

AttackFn = Callable[[jax.Array, Optional[jax.Array]], jax.Array]


def make_attack(cfg: AttackConfig, is_train: bool = False) -> Optional[AttackFn]:
    """Build (img, rng) -> img for cfg.augmentation; None for "None"."""
    name = cfg.augmentation
    if name == "None":
        return None

    if name == "Noise":

        def fn(img, rng):
            if rng is None:  # apply_attack declares rng Optional; same
                rng = jax.random.PRNGKey(0)  # convention as Combination
            return gaussian_noise(img, rng, std=cfg.noise_sigma)

        return fn

    if name == "Blur":
        if is_train:

            def fn(img, rng):
                return gaussian_blur_random(img, rng, sigmas=(cfg.blur_sigma,), sizes=(3, 5, cfg.blur_filter_size))

            return fn

        def fn(img, rng):
            return gaussian_blur(img, sigma=cfg.blur_sigma, size=cfg.blur_filter_size)

        return fn

    if name == "Crop":
        # benchmark config 4 extra (no reference equivalent): eval = fixed
        # center crop; train = random offset
        if is_train:

            def fn(img, rng):
                return random_crop(img, rng, ratio=cfg.crop_ratio)

            return fn

        def fn(img, rng):
            return center_crop(img, ratio=cfg.crop_ratio)

        return fn

    if name == "Jpeg":

        def fn(img, rng):
            return jpeg_attack(img, quality=cfg.jpeg_quality, differentiable=is_train)

        return fn

    if name == "Combination":
        # Ref Combination.py:13-16: each sub-attack applied with probability
        # 0.5 in train mode, always (threshold 0) in eval mode.
        threshold = 0.5 if is_train else 0.0

        def fn(img, rng):
            if rng is None:
                rng = jax.random.PRNGKey(0)
            k_blur, k_noise, k_apply = jax.random.split(rng, 3)
            probs = jax.random.uniform(k_apply, (3,))

            blurred = gaussian_blur(img, sigma=cfg.blur_sigma, size=cfg.blur_filter_size)
            img = jnp.where(probs[0] > threshold, blurred, img)
            noised = gaussian_noise(img, k_noise, std=cfg.noise_sigma)
            img = jnp.where(probs[1] > threshold, noised, img)
            jpeged = jpeg_attack(img, quality=cfg.jpeg_quality, differentiable=is_train)
            img = jnp.where(probs[2] > threshold, jpeged, img)
            return img

        return fn

    raise ValueError(f"Not available attack: {name!r}")


def make_solver_attack(
    cfg: AttackConfig, name: str
) -> Optional[Callable[[jax.Array], jax.Array]]:
    """Deterministic, differentiable channel model for ATTACK-AWARE
    attribution (beyond-parity; no reference equivalent).

    When the target is known to have passed through a channel A, the
    sound objective is ``loss(A(G(w)), A(G(w*)))`` --- push the solver's
    estimate through the same channel --- rather than asking the
    generator to reproduce attack artifacts it cannot produce
    (the reference always compares raw G(w) to the attacked target,
    /root/reference/src/main.py:62-63).  Requirements inside the scan:
    shape-preserving, rng-free, and differentiable, so

    - Jpeg uses the vendored DiffJPEG's differentiable rounding (the
      reference's own train-mode path, DiffJPEG.py:20-27) --- eval-mode
      hard rounding has zero gradient almost everywhere;
    - Noise maps to the identity: the channel is zero-mean, so the
      attacked target is an unbiased observation of G(w*) and modeling
      any specific draw would bias the fit;
    - Combination composes its deterministic members (blur then jpeg;
      eval mode applies each w.p. 1, ref Combination.py:16).
    """
    if name == "None":
        return None
    if name == "Noise":
        return lambda img: img
    if name == "Blur":
        return lambda img: gaussian_blur(
            img, sigma=cfg.blur_sigma, size=cfg.blur_filter_size
        )
    if name == "Crop":
        return lambda img: center_crop(img, ratio=cfg.crop_ratio)
    if name == "Jpeg":
        return lambda img: jpeg_attack(
            img, quality=cfg.jpeg_quality, differentiable=True
        )
    if name == "Combination":

        def fn(img):
            img = gaussian_blur(
                img, sigma=cfg.blur_sigma, size=cfg.blur_filter_size
            )
            return jpeg_attack(img, quality=cfg.jpeg_quality, differentiable=True)

        return fn

    raise ValueError(f"Not available solver attack: {name!r}")


def apply_attack(
    attack: Optional[AttackFn], img: jax.Array, rng: Optional[jax.Array] = None
) -> jax.Array:
    """Augmentation entry point, ref GetGen.augmentation
    (src/generator.py:163-168): identity when no attack configured."""
    if attack is None:
        return img
    return attack(img, rng)
