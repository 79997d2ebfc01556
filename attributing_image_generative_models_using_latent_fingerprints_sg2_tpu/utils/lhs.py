"""Latin Hypercube Sampling in JAX.

The reference draws the multi-start initial guesses with scipy's
``LatinHypercube(d, centered=True)`` (/root/reference/src/main.py:103,46).
Centered LHS: each of the n samples occupies the center of one of n
equal-width strata per dimension, with an independent random permutation of
strata per dimension:

    sample[i, dim] = (perm_dim[i] + 0.5) / n

All permutations are produced in ONE vectorized op (argsort of iid
uniforms along the sample axis) so the traced graph stays O(1) in the
dimension count --- important at d=448 with hundreds of samples.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _perms(key: jax.Array, shape_nd: tuple) -> jax.Array:
    """Independent permutations of arange(n) along the last axis."""
    u = jax.random.uniform(key, shape_nd)
    return jnp.argsort(u, axis=-1)


def latin_hypercube(key: jax.Array, n: int, d: int, centered: bool = True) -> jax.Array:
    """[n, d] samples in [0, 1)."""
    if centered:
        perms = _perms(key, (d, n))  # [d, n]
        return ((perms + 0.5) / n).T
    kp, kj = jax.random.split(key)
    perms = _perms(kp, (d, n))
    jitter = jax.random.uniform(kj, (d, n))
    return ((perms + jitter) / n).T


def latin_hypercube_batch(key: jax.Array, batch: int, n: int, d: int) -> jax.Array:
    """[batch, n, d] independent centered LHS designs in one op."""
    perms = _perms(key, (batch, d, n))
    return jnp.transpose((perms + 0.5) / n, (0, 2, 1))


def lhs_alpha_init(key: jax.Array, n: int, sigma: jax.Array) -> jax.Array:
    """Scale LHS samples from [0,1) to [-sigma, +sigma] per dimension.

    Ref src/main.py:52: alpha = 2 * sample * sigma - sigma.
    sigma: [d] -> returns [n, d].
    """
    s = latin_hypercube(key, n, sigma.shape[0], centered=True)
    return (2.0 * s - 1.0) * sigma


def lhs_alpha_init_batch(key: jax.Array, batch: int, n: int, sigma: jax.Array) -> jax.Array:
    """[batch, n, d] restart initializations, independent LHS per sample."""
    s = latin_hypercube_batch(key, batch, n, sigma.shape[0])
    return (2.0 * s - 1.0) * sigma
