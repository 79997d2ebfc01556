"""Device-side PCA of the generator's W space.

The reference samples 10k z, maps them through the style MLP, pulls the
result to the CPU and runs sklearn PCA (a 10000x512 SVD on host)
(/root/reference/src/PCA.py:62-108).  On TPU the whole thing is one jitted
program: the mapping of 10k latents is a few batched matmuls, and the
eigendecomposition of the 512x512 covariance runs on device --- no host
round trip.

Conventions (documented deviations from sklearn):
- components are eigenvectors of the sample covariance (denominator n-1,
  matching sklearn's ``explained_variance_``), ranked by descending
  variance;
- sign fixed so each component's largest-|.|  coordinate is positive
  (sklearn's svd_flip depends on the left singular vectors, which a
  covariance eigh never sees; any sign choice spans the same subspace and
  the pipeline is sign-invariant end-to-end).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PCABasis:
    """Full principal basis of the latent space.

    pc:    [D, D] principal components as rows, descending variance
           (ref ``pc``, src/PCA.py:99-100).
    sigma: [D] per-axis standard deviations (ref ``sigma_512``,
           src/PCA.py:94).
    mean:  [D] latent mean (ref ``latent_mean``, src/PCA.py:102-104).
    """

    pc: jax.Array
    sigma: jax.Array
    mean: jax.Array


def pca_from_samples(samples: jax.Array) -> PCABasis:
    """PCA of [N, D] samples via eigh of the covariance."""
    n = samples.shape[0]
    mean = jnp.mean(samples, axis=0)
    xc = samples - mean
    cov = (xc.T @ xc) / (n - 1)
    evals, evecs = jnp.linalg.eigh(cov)  # ascending
    evals = evals[::-1]
    pc = evecs[:, ::-1].T  # rows = components, descending variance
    # deterministic sign: largest-|.| coordinate of each row positive
    idx = jnp.argmax(jnp.abs(pc), axis=1)
    signs = jnp.sign(pc[jnp.arange(pc.shape[0]), idx])
    pc = pc * signs[:, None]
    sigma = jnp.sqrt(jnp.maximum(evals, 0.0))
    return PCABasis(pc=pc, sigma=sigma, mean=mean)


def perform_pca(
    key: jax.Array,
    mapping_fn: Callable[[jax.Array], jax.Array],
    n_samples: int = 10000,
    dim: int = 512,
) -> PCABasis:
    """Sample z ~ N(0, I), push through the mapping network, PCA the w's.

    Ref: src/PCA.py:66-74 (the sg2 branch).  NOTE: not jitted here ---
    ``mapping_fn`` typically closes over generator params, and jitting with
    a static callable would bake those params in as compile-time constants
    (pathological XLA compile).  Use ``perform_pca_for_params`` for the
    jitted path with params as a traced argument.
    """
    z = jax.random.normal(key, (n_samples, dim))
    w = mapping_fn(z)
    return pca_from_samples(w)


@partial(jax.jit, static_argnums=(2, 3, 4))
def perform_pca_for_params(
    params,
    key: jax.Array,
    mapping_apply: Callable,
    n_samples: int = 10000,
    dim: int = 512,
) -> PCABasis:
    """Jitted PCA with params traced: ``mapping_apply(params, z) -> w``.

    One compiled program: 10k-latent mapping (batched matmuls on the MXU)
    + covariance + eigh, all on device --- vs the reference's
    GPU->CPU->sklearn round trip (src/PCA.py:70-71).
    """
    z = jax.random.normal(key, (n_samples, dim))
    w = mapping_apply(params, z)
    return pca_from_samples(w)


def pca_from_truncated_noise(key: jax.Array, truncation: float, n_samples: int, dim: int = 128) -> PCABasis:
    """BigGAN branch: PCA over truncated-normal latents themselves
    (ref src/PCA.py:76-84; latents from ``truncated_noise_sample``)."""
    z = jax.random.truncated_normal(key, -2.0, 2.0, (n_samples, dim)) * truncation
    return pca_from_samples(z)
