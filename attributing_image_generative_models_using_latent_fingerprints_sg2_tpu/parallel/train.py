"""Mesh-data-parallel GAN training driver.

The reference has no training subsystem at all (it loads pretrained
checkpoints, ref src/PCA.py:40) and no parallelism (SURVEY.md §2
checklist); training here already runs as one fused jitted step
(training/gan.py).  This module scales that step over a ('data', ...)
`jax.sharding.Mesh`:

- the TrainState (G, D, EMA, both Adam states) is replicated;
- every batch tensor (reals, style-mixed latents, fakes) carries a
  `with_sharding_constraint` on its leading axis, so XLA's SPMD
  partitioner runs both network passes batch-parallel and inserts the
  gradient `psum`s — the only per-step collectives besides the
  minibatch-stddev reduction, and both ride ICI;
- semantics are GLOBAL-batch (GSPMD preserves program meaning): the
  discriminator's minibatch-stddev and every batch-mean see the full
  batch, so a mesh run follows the same optimization trajectory as a
  single-device run with the same global batch (tests/test_training_mesh.py
  asserts agreement; bit-exactness across device counts is forbidden by
  XLA CPU tiling, see tests/test_sharding.py notes).

The chunk runners mirror cli/train.py: `lax.scan` over hundreds of steps
per dispatch amortizes the axon per-dispatch overhead, and the absolute
step index keyed through `fold_in(base_key, j)` keeps the key stream
identical to the single-device driver — so --snapshot/--resume compose
with the mesh unchanged.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh

from ..config import ModelConfig
from ..training.gan import TrainConfig, TrainState, make_train_step
from .mesh import data_sharded, replicate


def place_train_state(mesh: Mesh, state: TrainState) -> TrainState:
    """Replicate the full TrainState across the mesh."""
    return replicate(mesh, state)


def make_mesh_chunk_runners(
    mesh: Mesh, mcfg: ModelConfig, tcfg: TrainConfig, external_data: bool = False
):
    """Jitted `(run_chunk, run_chunk_data)` for mesh-parallel training.

    `run_chunk(state, base_key, start, length)` scans `length` synthetic
    steps; `run_chunk_data(state, base_key, start, reals)` consumes a
    [length, batch, S, S, 3] real-image stack (place it with
    `shard_reals` first so the device layout matches the constraint and
    no resharding copy happens on entry).
    """
    if tcfg.batch % mesh.shape["data"] != 0:
        raise ValueError(
            f"batch {tcfg.batch} not divisible by data axis {mesh.shape['data']}"
        )
    step = make_train_step(mcfg, tcfg, external_data=external_data, mesh=mesh)

    @partial(jax.jit, static_argnames="length")
    def run_chunk(state, base_key, start, length):
        def body(s, j):
            return step(s, jax.random.fold_in(base_key, j))

        return lax.scan(body, state, start + jnp.arange(length))

    @jax.jit
    def run_chunk_data(state, base_key, start, reals):
        def body(s, xs):
            j, real = xs
            return step(s, jax.random.fold_in(base_key, j), real)

        return lax.scan(body, state, (start + jnp.arange(reals.shape[0]), reals))

    return run_chunk, run_chunk_data


def shard_reals(mesh: Mesh, reals) -> jax.Array:
    """Place a [length, batch, S, S, 3] chunk with batch over 'data'."""
    return jax.device_put(jnp.asarray(reals), data_sharded(mesh, axis=1))
