"""Device mesh + sharding helpers.

The reference is single-process single-GPU (SURVEY.md section 2 checklist:
its only "parallelism" is a no-op DataParallel around LPIPS,
custom_lpips/dist_model.py:100).  Here scaling is mesh-native:

- axis **"data"**: the embarrassingly parallel axes --- attribution
  samples x LHS restarts, or generation batch.  Each element is an
  independent Adam chain; no cross-chip traffic until the final
  argmin/metric reduction, which XLA lowers to a tiny all-reduce over ICI.
- axis **"model"**: optional tensor parallelism for the synthesis
  network at high resolution --- conv output channels shard over the
  axis, XLA inserting the all-gathers/psums the dataflow requires.

Everything is ordinary jit + sharded arrays: compute follows data, and
the same program runs on 1 chip, a v4-8 slice, or a CPU-backed test mesh
(xla_force_host_platform_device_count).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = 0, model: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    """Build a ('data', 'model') mesh.  data=0 => use all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data <= 0:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    need = data * model
    if need > n:
        raise ValueError(f"mesh {data}x{model} needs {need} devices, have {n}")
    arr = np.asarray(devices[:need]).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, axis: int = 0) -> NamedSharding:
    spec = [None] * (axis + 1)
    spec[axis] = "data"
    return NamedSharding(mesh, P(*spec))


def shard_batch(mesh: Mesh, x: jax.Array, axis: int = 0) -> jax.Array:
    """Place an array with its ``axis`` sharded over the data axis."""
    return jax.device_put(x, data_sharded(mesh, axis))


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Replicate a pytree across the whole mesh."""
    s = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def shard_generator_params(mesh: Mesh, params: Any) -> Any:
    """Tensor-parallel placement of the synthesis network.

    Styled-conv kernels [kh,kw,I,O] and activation biases [O] shard their
    output-channel axis over "model" when divisible; modulation / mapping /
    ToRGB (O=3) stay replicated.  XLA's SPMD partitioner then runs each
    conv channel-parallel and inserts the boundary collectives.
    """
    axis = mesh.shape["model"]
    rep = replicated(mesh)

    def place(path, x):
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        if axis > 1 and hasattr(x, "ndim"):
            if x.ndim == 4 and "weight" in name and "mod" not in name and x.shape[-1] % axis == 0 and x.shape[-1] > 3:
                return jax.device_put(x, NamedSharding(mesh, P(None, None, None, "model")))
            if x.ndim == 1 and "act_bias" in name and x.shape[0] % axis == 0:
                return jax.device_put(x, NamedSharding(mesh, P("model")))
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map_with_path(place, params)
