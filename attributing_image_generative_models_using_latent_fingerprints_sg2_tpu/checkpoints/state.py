"""Attribution run state: save / resume.

The reference has no failure recovery: a crash mid-run loses everything
except PNGs already written, and ``result.txt`` is rewritten every
iteration (SURVEY.md section 5; src/main.py:151).  Here long attribution
runs checkpoint per chunk --- true keys, per-sample results, progress
cursor, and the RNG seed --- so an interrupted run resumes exactly where
it stopped.

Orbax is used when available (its async checkpointing is the right tool on
real pods); the portable fallback is a plain ``.npz`` + JSON manifest,
which is what the tests exercise.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, List, Optional

import numpy as np


@dataclasses.dataclass
class AttributionRunState:
    """Resumable progress of a multi-chunk attribution run."""

    next_sample: int = 0
    bit_accs: List[float] = dataclasses.field(default_factory=list)
    success: int = 0
    seed: int = 0
    config: Optional[dict] = None


def _paths(run_dir: str):
    return (
        os.path.join(run_dir, "attribution_state.json"),
        os.path.join(run_dir, "attribution_arrays.npz"),
    )


def save_state(
    run_dir: str,
    state: AttributionRunState,
    arrays: Optional[Dict[str, np.ndarray]] = None,
) -> None:
    """Atomically persist run state (+ optional arrays: true keys,
    recovered alpha/key logits, per-start losses)."""
    os.makedirs(run_dir, exist_ok=True)
    jpath, apath = _paths(run_dir)
    tmp = jpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(dataclasses.asdict(state), f)
    os.replace(tmp, jpath)
    if arrays:
        tmp = apath + ".tmp.npz"
        np.savez(tmp, **{k: np.asarray(v) for k, v in arrays.items()})
        os.replace(tmp, apath)


def load_state(run_dir: str):
    """Returns (state, arrays) or (None, {}) when no checkpoint exists."""
    jpath, apath = _paths(run_dir)
    if not os.path.exists(jpath):
        return None, {}
    with open(jpath) as f:
        state = AttributionRunState(**json.load(f))
    arrays: Dict[str, np.ndarray] = {}
    if os.path.exists(apath):
        with np.load(apath) as z:
            arrays = {k: z[k] for k in z.files}
    return state, arrays


def save_pytree_orbax(path: str, tree: Any) -> bool:
    """Save an arbitrary pytree with orbax if importable; returns success."""
    try:
        import orbax.checkpoint as ocp
    except Exception:
        return False
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()
    return True


def load_pytree_orbax(path: str, template: Any = None):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)
