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

import dataclasses

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


def place_pipeline(mesh: Mesh, pipe, *, shard_model: bool = False):
    """Place a ``fingerprint.pipeline.Pipeline``'s device arrays on ``mesh``.

    Generator weights, fingerprint basis, fixed noise, and (if present)
    LPIPS weights / BigGAN conditioning replicate across the mesh
    (``shard_model=True`` channel-shards the generator over "model"
    instead, like the attribution path).  One-time placement so a
    generation loop pays no per-call host->device transfers.
    """
    gen_params = (
        shard_generator_params(mesh, pipe.gen_params)
        if shard_model and mesh.shape["model"] > 1
        else replicate(mesh, pipe.gen_params)
    )
    return dataclasses.replace(
        pipe,
        gen_params=gen_params,
        basis=replicate(mesh, pipe.basis),
        noise=replicate(mesh, pipe.noise),
        lpips_params=(
            replicate(mesh, pipe.lpips_params)
            if pipe.lpips_params is not None
            else None
        ),
        class_onehot=(
            replicate(mesh, pipe.class_onehot)
            if pipe.class_onehot is not None
            else None
        ),
    )


def generate_on_mesh(mesh: Mesh, pipe, rng: jax.Array, batch: int):
    """Mesh-data-parallel fingerprinted generation.

    Same (imgs, w0, wx, bits, alpha) contract and RNG stream as
    ``pipeline.generate_fingerprinted`` (ref src/generator.py:69-107),
    but the batch's rows shard over the mesh's "data" axis so the
    synthesis conv stack — all of the FLOPs — runs SPMD with zero
    collectives.  The latent-space math (a few [B, 512] matmuls) is
    computed replicated; ``pipe`` should already be placed with
    ``place_pipeline``.
    """
    data = mesh.shape["data"]
    if batch % data != 0:
        raise ValueError(f"batch {batch} not divisible by data axis {data}")
    from ..fingerprint import pipeline as pl
    from ..fingerprint.embed import embed, sample_alpha, sample_key_bits

    k_alpha, k_bits = jax.random.split(rng)
    alpha = sample_alpha(k_alpha, pipe.basis, batch)
    bits = sample_key_bits(k_bits, pipe.fpcfg.key_len, batch)
    w0, wx = embed(pipe.basis, alpha, bits)
    w0 = shard_batch(mesh, w0)
    wx = shard_batch(mesh, wx)
    imgs = pl.synthesize(pipe, wx)
    return imgs, w0, wx, bits, alpha
