"""Crash-safe training snapshots (save / resume the full TrainState).

Attribution already has per-sample resumable state (checkpoints/state.py);
this is the training-side counterpart: the FULL optimization state —
generator, discriminator, EMA, both Adam states, step counter — is
persisted at chunk boundaries so a preempted run continues bit-for-bit
(the step key stream is `fold_in(base_key, absolute_step)` and the folder
data schedule is a pure function of (seed, epoch), so a resumed run sees
the identical key/data stream).

Format: one ``.npz`` with positional leaves plus a JSON meta blob.  The
tree structure is NOT serialized — the loader rebuilds it from a template
``TrainState`` produced by ``init_train_state`` with the same configs,
which also guarantees shape/dtype agreement (checked leaf-by-leaf).
Writes are atomic (tmp file + ``os.replace``) so a crash mid-write never
corrupts the previous snapshot.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax
import numpy as np


def save_snapshot(path: str, state: Any, meta: Dict[str, Any]) -> None:
    leaves = jax.tree_util.tree_leaves(state)
    payload = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    payload["meta"] = np.asarray(json.dumps(meta))
    tmp = path + ".tmp"
    np.savez(tmp, **payload)
    # np.savez appends .npz to paths without it; normalize
    src = tmp if os.path.exists(tmp) else tmp + ".npz"
    os.replace(src, path)


def load_snapshot(path: str, template: Any) -> Tuple[Any, Dict[str, Any]]:
    """Rebuild a TrainState from ``path`` using ``template``'s structure."""
    with np.load(path) as data:
        meta = json.loads(str(data["meta"]))
        t_leaves, treedef = jax.tree_util.tree_flatten(template)
        n = len(t_leaves)
        if sum(1 for k in data.files if k.startswith("leaf_")) != n:
            raise ValueError(
                f"snapshot {path!r} has a different leaf count than the "
                f"template state ({n}); config mismatch?")
        leaves = []
        for i, t in enumerate(t_leaves):
            leaf = data[f"leaf_{i}"]
            t_arr = np.asarray(t)
            if leaf.shape != t_arr.shape or leaf.dtype != t_arr.dtype:
                raise ValueError(
                    f"snapshot leaf {i} is {leaf.shape}/{leaf.dtype}, "
                    f"template expects {t_arr.shape}/{t_arr.dtype}")
            leaves.append(jax.numpy.asarray(leaf))
    return jax.tree_util.tree_unflatten(treedef, leaves), meta


def check_meta(meta: Dict[str, Any], expected: Dict[str, Any]) -> None:
    """Raise if any run-defining field differs from the snapshot's."""
    for k, v in expected.items():
        if meta.get(k) != v:
            raise ValueError(
                f"snapshot was taken with {k}={meta.get(k)!r}, this run has "
                f"{k}={v!r}; refusing to resume across configs")
