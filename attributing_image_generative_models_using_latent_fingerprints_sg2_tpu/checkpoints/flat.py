"""Generic flat <-> nested parameter-pytree conversion for ``.npz``
persistence.

The rosinality converter (checkpoints/rosinality.py) covers the
generator's reference-compatible layout; this module handles everything
else we persist (currently the trained discriminator consumed by
losses/disc_percept.py) with a simple lossless scheme:

- flatten: each leaf keyed by its tree path joined with '/';
  sequence positions appear as bare integers ("blocks/0/conv1/weight").
- unflatten: rebuild nested dicts; any dict whose keys are all numeric
  strings becomes a tuple (matching how model code stores layer lists).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:  # pragma: no cover - future path kinds
            parts.append(str(p))
    return "/".join(parts)


def flatten_params(params: Any) -> Dict[str, np.ndarray]:
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for path, leaf in leaves:
        key = _path_str(path)
        if key in out:
            raise ValueError(f"duplicate flattened key {key!r}")
        out[key] = np.asarray(leaf)
    return out


def unflatten_params(flat: Dict[str, np.ndarray]) -> Any:
    nested: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = nested
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def finalize(node):
        if not isinstance(node, dict):
            return node
        out = {k: finalize(v) for k, v in node.items()}
        if out and all(k.isdigit() for k in out):
            return tuple(out[str(i)] for i in range(len(out)))
        return out

    return finalize(nested)
