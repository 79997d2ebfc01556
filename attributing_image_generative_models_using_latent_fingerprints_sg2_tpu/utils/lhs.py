"""Latin Hypercube Sampling in JAX.

The reference draws the multi-start initial guesses with scipy's
``LatinHypercube(d, centered=True)`` (/root/reference/src/main.py:103,46).
Centered LHS: each of the n samples occupies the center of one of n
equal-width strata per dimension, with an independent random permutation of
strata per dimension.  That is exactly reproducible with JAX PRNG:

    sample[i, d] = (perm_d[i] + 0.5) / n
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def latin_hypercube(key: jax.Array, n: int, d: int, centered: bool = True) -> jax.Array:
    """[n, d] samples in [0, 1)."""
    keys = jax.random.split(key, d if centered else d + 1)
    perms = jnp.stack(
        [jax.random.permutation(keys[i], n) for i in range(d)], axis=1
    )  # [n, d]
    if centered:
        return (perms + 0.5) / n
    jitter = jax.random.uniform(keys[-1], (n, d))
    return (perms + jitter) / n


def lhs_alpha_init(key: jax.Array, n: int, sigma: jax.Array) -> jax.Array:
    """Scale LHS samples from [0,1) to [-sigma, +sigma] per dimension.

    Ref src/main.py:52: alpha = 2 * sample * sigma - sigma.
    sigma: [d] -> returns [n, d].
    """
    s = latin_hypercube(key, n, sigma.shape[0], centered=True)
    return (2.0 * s - 1.0) * sigma
