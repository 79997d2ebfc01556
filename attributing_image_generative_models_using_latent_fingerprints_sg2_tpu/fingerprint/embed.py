"""Fingerprint embedding: split the principal basis into content and key
carriers and perturb latents along the low-variance axes.

Math (ref docstrings src/generator.py:70-79,149-156):

    w0 = U^T alpha + mu                  (content)
    wx = w0 + c * V^T diag(s) k          (content + key)

with U = pc rows outside [shift, shift+key_len)  ("u_cap", [D-K, D]),
V = pc[shift : shift+key_len]                     ("v_cap", [K, D]),
s = fixed sigma (the reference overrides the empirical sigma of the key
axes with the constant --sigma, src/main.py:36 / src/generator.py:216),
k in {0,1}^K, c = --sd.

Everything here is row-vector convention ([B, D] latents) and pure jnp,
usable inside jit/vmap.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import FingerprintConfig
from .pca import PCABasis


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FingerprintBasis:
    """Sliced basis, all row-convention.

    u_cap:     [D-K, D] content carrier (ref src/generator.py:214).
    v_cap:     [K, D]   key carrier     (ref src/generator.py:212).
    sigma_rest:[D-K]    empirical sigmas of content axes ("sigma_448",
               ref src/generator.py:217).
    sigma_key: [K]      fixed perturbation strengths ("sigma_64" after the
               override, ref src/generator.py:216).
    mean:      [D]      latent mean.
    max_alpha/min_alpha: [D-K] +-3 sigma box for the bound penalty
               (ref src/main.py:23-28, generator.py:220-223).
    sd_moved:  float    scalar c (ref --sd).
    """

    u_cap: jax.Array
    v_cap: jax.Array
    sigma_rest: jax.Array
    sigma_key: jax.Array
    mean: jax.Array
    max_alpha: jax.Array
    min_alpha: jax.Array
    sd_moved: float = dataclasses.field(metadata=dict(static=True), default=1.0)


def build_basis(pca: PCABasis, fp: FingerprintConfig) -> FingerprintBasis:
    """Slice the full PCA basis by (shift, key_len), ref src/main.py:30-40."""
    d = pca.pc.shape[0]
    k0, k1 = fp.shift, fp.shift + fp.key_len
    v_cap = pca.pc[k0:k1]
    u_cap = jnp.concatenate([pca.pc[:k0], pca.pc[k1:d]], axis=0)
    sigma_rest = jnp.concatenate([pca.sigma[:k0], pca.sigma[k1:d]], axis=0)
    sigma_key = fp.sigma * jnp.ones((fp.key_len,), pca.sigma.dtype)
    bound = 3.0 * sigma_rest  # ref src/main.py:23-28
    return FingerprintBasis(
        u_cap=u_cap,
        v_cap=v_cap,
        sigma_rest=sigma_rest,
        sigma_key=sigma_key,
        mean=pca.mean,
        max_alpha=bound,
        min_alpha=-bound,
        sd_moved=float(fp.sd_moved),
    )


def sample_key_bits(key: jax.Array, key_len: int, batch: int) -> jax.Array:
    """Random binary key k ~ U{0,1}, ref src/generator.py:80. [B, K] float."""
    return jax.random.randint(key, (batch, key_len), 0, 2).astype(jnp.float32)


def sample_alpha(key: jax.Array, basis: FingerprintBasis, batch: int) -> jax.Array:
    """Content coefficients alpha ~ sigma_rest * N(0,1), ref src/main.py:122."""
    d = basis.sigma_rest.shape[0]
    return jax.random.normal(key, (batch, d)) * basis.sigma_rest


def content_latent(basis: FingerprintBasis, alpha: jax.Array) -> jax.Array:
    """w0 = alpha @ U + mu.  alpha: [B, D-K] -> [B, D].
    Ref src/generator.py:83 (column convention there)."""
    return alpha @ basis.u_cap + basis.mean


def key_offset(basis: FingerprintBasis, k: jax.Array) -> jax.Array:
    """c * (s*k) @ V.  k: [B, K] (binary or sigmoid-relaxed) -> [B, D].
    Ref src/generator.py:85-89 and get_new_latent src/generator.py:148-161."""
    return basis.sd_moved * (k * basis.sigma_key) @ basis.v_cap


def embed(
    basis: FingerprintBasis, alpha: jax.Array, k: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """(w0, wx): content latent and fingerprinted latent."""
    w0 = content_latent(basis, alpha)
    return w0, w0 + key_offset(basis, k)


def project_latent(basis: FingerprintBasis, w: jax.Array) -> jax.Array:
    """Project an arbitrary latent w onto the content subspace, returning
    the w0 whose U-coordinates reproduce w's (ref generate_with_latent,
    src/generator.py:114-146: w0 = U^T (U U^T)^{-1} U (w - mu)).

    Note: since U's rows are orthonormal eigenvectors, (U U^T) = I and this
    reduces to U^T U (w - mu); the solve is kept for numerical fidelity
    with non-orthonormal bases."""
    uut = basis.u_cap @ basis.u_cap.T
    coords = jnp.linalg.solve(uut, basis.u_cap @ (w - basis.mean).T)
    return (basis.u_cap.T @ coords).T


def alpha_bound_penalty(
    basis: FingerprintBasis, alpha: jax.Array
) -> jax.Array:
    """Sum of ReLU violations of the +-3 sigma box, per batch element.
    Ref src/utils.py:53-58 (summed over all elements there; here per-row so
    vmapped restarts stay independent)."""
    over = jax.nn.relu(alpha - basis.max_alpha)
    under = jax.nn.relu(basis.min_alpha - alpha)
    return jnp.sum(over + under, axis=-1)


def bit_accuracy(pred_bits: jax.Array, true_bits: jax.Array) -> jax.Array:
    """Fraction of matching key bits, ref src/utils.py:37-41. [...] -> []"""
    return jnp.mean((pred_bits == true_bits).astype(jnp.float32), axis=-1)
