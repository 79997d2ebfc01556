"""Production serving: micro-batching engine + stdlib HTTP front-end.

The reference repo is batch scripts only; this subsystem is the
deploy-time counterpart (static-shape bucketed batching, AOT-compiled
executables, per-request PRNG determinism). See engine.py for design.
"""

from .engine import InferenceEngine, ServeConfig
from .server import make_server, serve_forever_in_thread

__all__ = [
    "InferenceEngine",
    "ServeConfig",
    "make_server",
    "serve_forever_in_thread",
]
