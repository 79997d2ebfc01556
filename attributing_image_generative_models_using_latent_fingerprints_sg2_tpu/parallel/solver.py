"""Mesh-parallel attribution driver.

Shards the attribution workload (samples x restarts) over the "data" mesh
axis and optionally the generator over "model", then calls the single
compiled solver from ``fingerprint.attribute``.  Because every per-sample
restart is an independent Adam chain, the only cross-device communication
XLA emits is the final per-sample argmin / metric reductions --- exactly
the communication floor of this algorithm (SURVEY.md section 2:
"parallelism inventory").
"""

from __future__ import annotations

import jax

from ..config import AttributionConfig, ModelConfig
from ..fingerprint import attribute as attr
from .mesh import Mesh, replicate, shard_batch, shard_generator_params


def solve_placed(
    mesh: Mesh,
    gen_params,
    lpips_params,
    basis,
    noise,
    targets_sharded: jax.Array,
    rng: jax.Array,
    *,
    mcfg: ModelConfig,
    acfg: AttributionConfig,
    shard_model: bool = False,
    **kwargs,
) -> attr.AttributionResult:
    """Replicate weights on ``mesh`` and solve ALREADY-sharded targets.

    Shared placement core of both the single-process path
    (``attribute_on_mesh``) and the multi-process path
    (``parallel.multihost.attribute_multihost``)."""
    if shard_model and mesh.shape["model"] > 1:
        gen_params = shard_generator_params(mesh, gen_params)
    else:
        gen_params = replicate(mesh, gen_params)
    lpips_params = replicate(mesh, lpips_params) if lpips_params is not None else None
    basis = replicate(mesh, basis)
    noise = replicate(mesh, noise)
    rng = replicate(mesh, rng)
    with jax.sharding.set_mesh(mesh):
        return attr.attribute(
            gen_params, lpips_params, basis, noise, targets_sharded, rng,
            mcfg=mcfg, acfg=acfg, **kwargs,
        )


def attribute_on_mesh(
    mesh: Mesh,
    gen_params,
    lpips_params,
    basis,
    noise,
    targets: jax.Array,
    rng: jax.Array,
    *,
    mcfg: ModelConfig,
    acfg: AttributionConfig,
    shard_model: bool = False,
    **kwargs,
) -> attr.AttributionResult:
    """Place inputs on the mesh and run the solver SPMD.

    targets' sample axis shards over "data"; generator/LPIPS weights and
    the basis replicate (or channel-shard the generator with
    ``shard_model=True``).  jit then propagates the shardings through the
    whole scan --- the same program as single-chip, no code fork.
    """
    data = mesh.shape["data"]
    if targets.shape[0] % data != 0:
        raise ValueError(
            f"sample count {targets.shape[0]} not divisible by data axis {data}"
        )
    return solve_placed(
        mesh, gen_params, lpips_params, basis, noise,
        shard_batch(mesh, targets), rng,
        mcfg=mcfg, acfg=acfg, shard_model=shard_model, **kwargs,
    )
