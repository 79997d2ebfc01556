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
