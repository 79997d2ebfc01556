"""Model-level attribution: WHICH registered generator made this image?

The reference attributes an image to a key under ONE known generator
(/root/reference/src/main.py:45-89); the paper's broader claim --- and
the question a provider actually faces --- is attributing an image to a
*model* out of a registry of fingerprinted generators, or to none of
them (open set).  The solver already yields the decision statistic for
free: the best-restart final reconstruction loss.  An image from
generator G is (by construction) on G's fingerprinted manifold, so
solving under G reaches ~the training-residual floor, while solving the
same image under a different generator bottoms out at that generator's
projection distance --- orders of magnitude higher (measured in
tests/test_model_attribution.py).

This module runs the standard solve under every registered pipeline and
applies a min-loss decision with an open-set threshold, i.e. a
likelihood-ratio-style test with the reconstruction loss as the
negative log-likelihood proxy.  Solves under different models are
independent programs and can be dispatched per model; each is the same
single-XLA-program batched solver used everywhere else.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np

from ..config import AttributionConfig
from . import attribute as attr_mod
from .pipeline import Pipeline


@dataclasses.dataclass
class ModelAttributionResult:
    """Per-sample decision over a model registry."""

    model_names: List[str]
    losses: np.ndarray  # [M, S] best-restart final loss under each model
    best_model: np.ndarray  # [S] argmin index
    decided: np.ndarray  # [S] bool: best loss <= open_set_threshold
    margin: np.ndarray  # [S] runner-up loss / best loss (>=1; inf if M==1)
    key_bits: np.ndarray  # [S, K] decoded under the chosen model
    results: Dict[str, attr_mod.AttributionResult]  # full per-model solves

    def chosen(self, s: int) -> Optional[str]:
        """Model name for sample ``s``, or None if rejected (open set)."""
        return self.model_names[int(self.best_model[s])] if self.decided[s] else None


def attribute_model(
    pipes: Dict[str, Pipeline],
    targets: jax.Array,
    rng: jax.Array,
    acfg: AttributionConfig,
    *,
    open_set_threshold: float = float("inf"),
    **attribute_kwargs: Any,
) -> ModelAttributionResult:
    """Solve ``targets`` under every registered pipeline; decide by min
    best-restart loss.

    ``open_set_threshold``: a sample whose best loss exceeds it is
    attributed to NO registered model (default inf = closed set).
    Calibrate it from in-distribution solves (e.g. the p99 of losses on
    images the registry's models generated --- see
    ``calibrate_open_set_threshold``).  All solver options
    (``n_starts``, ``steps``, ``remat`` ...) pass through unchanged.
    """
    if not pipes:
        raise ValueError("empty model registry")
    names = list(pipes.keys())
    # fail fast on heterogeneous registries: mismatched key_len breaks the
    # final np.stack only AFTER every expensive solve ran, and mismatched
    # img_size crashes mid-loop inside jit tracing
    hw_t = tuple(targets.shape[-3:-1])
    for name in names:
        p = pipes[name]
        k = p.fpcfg.key_len
        hw = p.mcfg.img_size
        if k != pipes[names[0]].fpcfg.key_len:
            raise ValueError(
                f"registry pipelines disagree on key_len: {name!r} has {k}, "
                f"{names[0]!r} has {pipes[names[0]].fpcfg.key_len}"
            )
        if (hw, hw) != hw_t:
            raise ValueError(
                f"pipeline {name!r} img_size {hw} != target spatial shape "
                f"{hw_t}"
            )
    losses = []
    results: Dict[str, attr_mod.AttributionResult] = {}
    for i, name in enumerate(names):
        pipe = pipes[name]
        res = attr_mod.attribute(
            pipe.gen_params,
            pipe.lpips_params,
            pipe.basis,
            pipe.noise,
            targets,
            jax.random.fold_in(rng, i),
            mcfg=pipe.mcfg,
            acfg=acfg,
            biggan_cfg=pipe.biggan_cfg,
            class_onehot=pipe.class_onehot,
            truncation=pipe.truncation,
            **attribute_kwargs,
        )
        results[name] = res
        losses.append(np.asarray(res.loss))
    losses = np.stack(losses)  # [M, S]
    best = losses.argmin(axis=0)  # [S]
    s_idx = np.arange(losses.shape[1])
    best_loss = losses[best, s_idx]
    if losses.shape[0] > 1:
        part = np.sort(losses, axis=0)
        margin = part[1] / np.maximum(part[0], 1e-30)
    else:
        margin = np.full(losses.shape[1], np.inf)
    key_bits = np.stack(
        [np.asarray(results[names[int(best[s])]].key_bits[s]) for s in s_idx]
    )
    return ModelAttributionResult(
        model_names=names,
        losses=losses,
        best_model=best,
        decided=best_loss <= open_set_threshold,
        margin=margin,
        key_bits=key_bits,
        results=results,
    )


def calibrate_open_set_threshold(
    in_dist_losses: np.ndarray, percentile: float = 99.0, slack: float = 2.0
) -> float:
    """Threshold from solves on images the registered models DID generate.

    ``slack`` multiplies the percentile so borderline in-distribution
    samples survive; anything above it (out-of-registry generators, real
    photos) is rejected.  The separation is typically orders of
    magnitude (tests measure >100x), so the choice is not delicate.
    """
    losses = np.asarray(in_dist_losses, np.float64).reshape(-1)
    if losses.size == 0:
        raise ValueError("need at least one in-distribution loss")
    return float(np.percentile(losses, percentile) * slack)
