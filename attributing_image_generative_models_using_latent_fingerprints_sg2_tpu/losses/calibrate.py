"""Self-supervised 2AFC calibration of LPIPS linear heads.

The reference fits its LPIPS lin heads on human 2AFC judgements
(custom_lpips/dist_model.py:212-284) --- data a zero-egress environment
cannot supply.  This module replaces the human judge with a *graded
distortion* proxy: for a reference image, produce two distorted versions
of the same distortion family at different strengths; the weaker
distortion is "perceptually closer" by construction.  Fitting the lin
heads (losses/lpips_train.py::train_lin_heads, the reference's own
BCERankingLoss machinery) on these triplets teaches the heads which
backbone channels track perceptual damage --- turning an uncalibrated
backbone (random-init VGG, or the trained discriminator from
losses/disc_percept.py) into a usable perceptual metric with zero
external data.

Distortion families mirror the robustness attack set (attacks/): blur
sigma, additive noise sigma, JPEG quality --- i.e. exactly the damage
modes the attacked-attribution solver must see through.
"""

from __future__ import annotations

from typing import Any, Dict, Iterator

import jax
import jax.numpy as jnp

from ..attacks.blur import gaussian_blur
from ..attacks.diffjpeg import jpeg_attack
from ..attacks.noise import gaussian_noise
from ..training.data import sample_batch

# Strength ladders per family (weak -> strong), spanning the attack
# evaluation range.  Triplets compare ADJACENT rungs: far-apart strengths
# are trivially separable by any feature stack (measured: random-init
# VGG already ranks weak-vs-strong at 1.0), so only near comparisons
# carry training signal for the heads.
_LEVELS = {
    "blur": (0.2, 0.35, 0.6, 1.0, 1.6),
    "noise": (0.03, 0.055, 0.1, 0.16, 0.25),
    "jpeg": (90, 70, 50, 38, 28),  # quality: higher = weaker distortion
}


def _distort(family: str, img: jax.Array, strength, rng: jax.Array) -> jax.Array:
    if family == "blur":
        return gaussian_blur(img, sigma=float(strength), size=13)
    if family == "noise":
        return gaussian_noise(img, rng, std=float(strength))
    if family == "jpeg":
        return jpeg_attack(img, quality=int(strength), differentiable=True)
    raise ValueError(family)


def triplet_batches(
    key: jax.Array,
    *,
    batch: int = 8,
    size: int = 64,
    n_batches: int = 60,
) -> Iterator[Dict[str, jax.Array]]:
    """Procedural-scene 2AFC triplets: ref vs two ADJACENT rungs of one
    distortion ladder; judge marks the weaker rung as closer, with p0/p1
    randomly swapped (judge flips) so the ranking head sees both orders.

    ``judge`` follows the reference BCERankingLoss convention
    (networks_basic.py:131-140): +1 means p1 is closer, -1 means p0 is."""
    fams = list(_LEVELS)
    for i in range(n_batches):
        k = jax.random.fold_in(key, i)
        k_img, k_fam, k_lvl, k_n0, k_n1, k_swap = jax.random.split(k, 6)
        ref = sample_batch(k_img, batch, size)
        fam = fams[int(jax.random.randint(k_fam, (), 0, len(fams)))]
        ladder = _LEVELS[fam]
        j = int(jax.random.randint(k_lvl, (), 0, len(ladder) - 1))
        weak_s, strong_s = ladder[j], ladder[j + 1]
        weak = jnp.clip(_distort(fam, ref, weak_s, k_n1), -1, 1)
        strong = jnp.clip(_distort(fam, ref, strong_s, k_n0), -1, 1)
        swap = bool(jax.random.bernoulli(k_swap))
        if swap:
            p0, p1, judge = weak, strong, -jnp.ones((batch,))
        else:
            p0, p1, judge = strong, weak, jnp.ones((batch,))
        yield {"ref": ref, "p0": p0, "p1": p1, "judge": judge}


def calibrate_lin_heads(
    lpips_params: Dict[str, Any],
    *,
    key: jax.Array = None,
    size: int = 64,
    batch: int = 8,
    steps: int = 120,
    lr: float = 3e-3,
) -> Dict[str, Any]:
    """Return ``lpips_params`` with lin heads fitted on graded-distortion
    triplets (works for any backbone the LPIPS head machinery accepts:
    'vgg', 'net', or 'disc')."""
    from .lpips_train import train_lin_heads

    key = key if key is not None else jax.random.PRNGKey(42)
    k_data, k_train = jax.random.split(key)
    batches = list(
        triplet_batches(k_data, batch=batch, size=size, n_batches=max(20, steps // 3))
    )
    fitted, _rank = train_lin_heads(
        lpips_params, batches, steps=steps, lr=lr, rng=k_train
    )
    return fitted


def rank_accuracy(
    lpips_params: Dict[str, Any],
    *,
    key: jax.Array = None,
    size: int = 64,
    batch: int = 8,
    n_batches: int = 20,
) -> float:
    """Fraction of held-out triplets where the metric ranks the weak
    distortion closer (judge agreement; 0.5 = chance)."""
    from . import lpips as lpips_mod

    key = key if key is not None else jax.random.PRNGKey(1234)
    correct, total = 0, 0
    fn = jax.jit(
        lambda r, a, b: (lpips_mod.lpips(lpips_params, r, a),
                         lpips_mod.lpips(lpips_params, r, b))
    )
    for b in triplet_batches(key, batch=batch, size=size, n_batches=n_batches):
        d0, d1 = fn(b["ref"], b["p0"], b["p1"])
        pred = jnp.where(jnp.asarray(d1) < jnp.asarray(d0), 1.0, -1.0)
        correct += float(jnp.sum(pred == b["judge"]))
        total += int(b["judge"].shape[0])
    return correct / max(1, total)
