"""Multi-host (multi-process) attribution over a global device mesh.

The reference is single-process/single-GPU (SURVEY.md section 2
checklist); this module is the DCN half of the TPU-native scaling story:

- intra-host / intra-pod chips shard over ICI via ``parallel.mesh``;
- multiple hosts (or pods) join one ``jax.distributed`` job, their chips
  forming a single **global** mesh; every process runs the SAME solver
  program (SPMD), holding only its addressable shard of the sample axis.

Communication floor is unchanged: restarts/samples are independent Adam
chains, so cross-host traffic is only the final per-sample argmin/metric
reductions, which XLA routes over DCN.

Typical use (one process per host):

    from ...parallel import multihost as mh
    mh.initialize()                      # reads JAX_COORDINATOR_ADDRESS etc.
    mesh = mh.global_mesh()
    res = mh.attribute_multihost(
        mesh, gen_params, lpips_params, basis, noise,
        local_targets,                    # THIS host's samples [S_local, H, W, 3]
        rng, mcfg=mcfg, acfg=acfg,
    )
    accs = mh.process_allgather(res.loss)   # small, replicated to all hosts

Validated end-to-end by ``tests/test_multihost.py`` with 2 CPU processes
x 4 virtual devices each (Gloo backend): both hosts gather identical
global results, numerically equivalent to the single-process 8-device
solve (partitioned reductions reassociate floats, so equivalence is
within tolerance, not bit-identical).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import AttributionConfig, ModelConfig
from ..fingerprint import attribute as attr


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join (or start) the distributed job.  Idempotent.

    Falls back to the standard env vars (``JAX_COORDINATOR_ADDRESS``,
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``) when args are omitted; on
    cloud TPU slices jax.distributed auto-discovers and none are needed.
    """
    # idempotence check WITHOUT touching the backend (jax.process_count()
    # would initialize XLA, after which jax.distributed.initialize errors)
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized
    kwargs: dict = {}
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def global_mesh(model: int = 1) -> Mesh:
    """('data', 'model') mesh over ALL devices of ALL processes."""
    devices = jax.devices()  # global device list
    n = len(devices)
    if n % model:
        raise ValueError(f"{n} global devices not divisible by model={model}")
    return Mesh(
        np.asarray(devices).reshape(n // model, model), axis_names=("data", "model")
    )


def shard_local_batch(mesh: Mesh, local_x: Any, axis: int = 0) -> jax.Array:
    """Assemble a GLOBAL array whose shards are each process's local batch.

    ``local_x``: this process's [S_local, ...] samples (numpy or jax).
    The global axis-0 size is S_local * process_count, ordered by
    process id (each process contributes the devices it owns on the
    'data' axis)."""
    spec = [None] * (axis + 1)
    spec[axis] = "data"
    sharding = NamedSharding(mesh, P(*spec))
    return jax.make_array_from_process_local_data(sharding, np.asarray(local_x))


def replicate_global(mesh: Mesh, tree: Any) -> Any:
    """Replicate a (host-identical) pytree across the global mesh."""
    from .mesh import replicate

    return replicate(mesh, tree)


def process_allgather(x: Any) -> np.ndarray:
    """Gather a (possibly sharded) small array to every host as numpy."""
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def attribute_multihost(
    mesh: Mesh,
    gen_params,
    lpips_params,
    basis,
    noise,
    local_targets,
    rng: jax.Array,
    *,
    mcfg: ModelConfig,
    acfg: AttributionConfig,
    shard_model: bool = False,
    **kwargs,
) -> attr.AttributionResult:
    """Run the single-program solver SPMD over the global mesh.

    Every process passes its OWN ``local_targets`` shard; weights/basis/
    noise must be host-identical (same checkpoint / same PRNG seed) and
    are replicated.  The returned result's arrays are globally sharded;
    use ``process_allgather`` for small fields that every host needs.
    """
    from .solver import solve_placed

    global_samples = local_targets.shape[0] * jax.process_count()
    data = mesh.shape["data"]
    if global_samples % data != 0:
        raise ValueError(
            f"global sample count {global_samples} "
            f"({local_targets.shape[0]} x {jax.process_count()} processes) "
            f"not divisible by data axis {data}"
        )
    return solve_placed(
        mesh, gen_params, lpips_params, basis, noise,
        shard_local_batch(mesh, local_targets), rng,
        mcfg=mcfg, acfg=acfg, shard_model=shard_model, **kwargs,
    )


def train_multihost_chunk_runners(
    mesh: Mesh, mcfg: ModelConfig, tcfg, external_data: bool = False
):
    """SPMD GAN-training chunk runners over the global (multi-process) mesh.

    The single-host mesh runners (parallel/train.py) are already SPMD
    programs, so multi-host training is the same jitted chunk run by
    every process: the TrainState replicates host-identically (same init
    seed on every host), batch tensors shard over the global 'data' axis,
    and XLA routes the gradient psums over ICI within a host and DCN
    across hosts.  Synthetic data is key-derived, hence host-identical by
    construction; for real data each host decodes only its own rows
    (slice the folder schedule by process, then assemble the global chunk
    with ``shard_local_batch(mesh, local_reals, axis=1)``).

    Validated by tests/test_multihost.py: 2 processes x 4 devices track
    the single-process 8-device trajectory step for step.
    """
    from .train import make_mesh_chunk_runners

    nproc = max(1, jax.process_count())
    if tcfg.batch % nproc:
        raise ValueError(
            f"global batch {tcfg.batch} not divisible by {nproc} processes"
        )
    return make_mesh_chunk_runners(mesh, mcfg, tcfg, external_data=external_data)


def generate_multihost(
    mesh: Mesh,
    pipe,
    rng: jax.Array,
    global_batch: int,
    *,
    shard_model: bool = False,
):
    """SPMD fingerprinted generation over the global mesh.

    Every process passes the SAME ``rng`` and a pipeline built from the
    same checkpoint/seed: the latent-space draw (same stream as
    ``pipeline.generate_fingerprinted``) is recomputed host-identically
    and is host-local numpy-cheap; each process then contributes its
    contiguous row block (by process id, matching ``shard_local_batch``'s
    ordering) to the global 'data'-sharded latent, and synthesis — all of
    the FLOPs — runs SPMD with zero collectives (one boundary all-gather
    when ``shard_model``).  Returns the ``generate_fingerprinted`` tuple:
    imgs/w0/wx globally sharded, bits/alpha host-local full copies.
    """
    from ..fingerprint import pipeline as pl
    from ..fingerprint.embed import embed, sample_alpha, sample_key_bits
    from .solver import place_pipeline

    data = mesh.shape["data"]
    nproc = jax.process_count()
    if global_batch % data != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by data axis {data}"
        )
    if global_batch % nproc != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by {nproc} processes"
        )
    placed = place_pipeline(mesh, pipe, shard_model=shard_model)

    k_alpha, k_bits = jax.random.split(rng)
    alpha = sample_alpha(k_alpha, pipe.basis, global_batch)
    bits = sample_key_bits(k_bits, pipe.fpcfg.key_len, global_batch)
    w0, wx = embed(pipe.basis, alpha, bits)

    b_local = global_batch // nproc
    sl = slice(jax.process_index() * b_local, (jax.process_index() + 1) * b_local)
    wx_g = shard_local_batch(mesh, np.asarray(wx)[sl])
    w0_g = shard_local_batch(mesh, np.asarray(w0)[sl])
    imgs = pl.synthesize(placed, wx_g)
    return imgs, w0_g, wx_g, bits, alpha
