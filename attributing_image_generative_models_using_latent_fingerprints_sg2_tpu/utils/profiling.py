"""Tracing / profiling utilities.

The reference has no profiling at all (SURVEY.md section 5: a dangling
``time.time()`` at src/generator.py:211 and tqdm bars).  Here tracing is a
first-class subsystem:

- ``phase(name)``: wall-clock phase timer with a process-global report
  (host-side; fetches nothing).
- ``device_phase(name, result)``: like ``phase`` but fences on a device
  fetch first --- required on this TPU platform, where
  ``block_until_ready`` does not synchronize.
- ``trace(dir)``: context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace of the enclosed device work.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Any, Dict, Iterator, Optional

import numpy as np

_PHASES: Dict[str, list] = defaultdict(list)


@contextlib.contextmanager
def phase(name: str) -> Iterator[None]:
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _PHASES[name].append(time.perf_counter() - t0)


def fence(x: Any) -> None:
    """Force device completion by fetching ONE element of each leaf.

    On the axon TPU platform ``jax.block_until_ready`` returns before the
    computation finishes; a host fetch is the only reliable fence.  The
    fetch is a single-element device-side slice --- never the full array
    (a whole-batch copy would add GBs of host traffic to every run).
    """
    import jax

    for leaf in jax.tree.leaves(x):
        if hasattr(leaf, "ndim") and hasattr(leaf, "__getitem__"):
            np.asarray(leaf[(0,) * leaf.ndim]) if leaf.ndim else np.asarray(leaf)


@contextlib.contextmanager
def device_phase(name: str, result_box: Optional[list] = None) -> Iterator[list]:
    """Phase timer that fences on the device results appended to the box."""
    box = result_box if result_box is not None else []
    t0 = time.perf_counter()
    try:
        yield box
    finally:
        for r in box:
            fence(r)
        _PHASES[name].append(time.perf_counter() - t0)


def report(reset: bool = False) -> Dict[str, Dict[str, float]]:
    out = {}
    for name, times in _PHASES.items():
        arr = np.asarray(times)
        out[name] = {
            "count": int(arr.size),
            "total_s": float(arr.sum()),
            "mean_s": float(arr.mean()),
            "min_s": float(arr.min()),
            "max_s": float(arr.max()),
        }
    if reset:
        _PHASES.clear()
    return out


def format_report(reset: bool = False) -> str:
    rows = ["phase                          count   total     mean"]
    for name, st in sorted(report(reset).items(), key=lambda kv: -kv[1]["total_s"]):
        rows.append(
            f"{name:<30} {st['count']:>5} {st['total_s']:>8.2f}s {st['mean_s']*1000:>8.1f}ms"
        )
    return "\n".join(rows)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """jax.profiler trace of the enclosed block (TensorBoard format).

    Tolerant: if the profiler cannot start/stop on this platform (e.g.
    experimental backends), the enclosed block still runs and a warning is
    printed instead of failing the caller."""
    import jax

    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:  # profiler unsupported on this backend
        print(f"[profiling] trace unavailable: {type(e).__name__}: {e}")
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception as e:
                print(f"[profiling] trace stop failed: {type(e).__name__}: {e}")
