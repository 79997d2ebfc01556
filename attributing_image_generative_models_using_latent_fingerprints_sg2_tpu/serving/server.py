"""Stdlib HTTP/JSON front-end over the micro-batching InferenceEngine.

No web framework: ``ThreadingHTTPServer`` gives one OS thread per
connection, each of which just parses JSON and blocks on an engine
future --- the device-side batching lives entirely in the engine.  This
keeps the serving stack dependency-free (the environment bakes no ASGI
stack) while still coalescing concurrent requests into shared XLA
executions.

Endpoints::

    GET  /healthz              -> {"ok": true, ...}
    GET  /v1/stats             -> engine.stats()
    POST /v1/generate          {"seed"?: int, "key_bits"?: [0/1...],
                                "encoding"?: "png_b64"|"float_list"}
    POST /v1/attribute         {"image_npy_b64": b64(np.save bytes)} or
                               {"image": [[[...]]] float [-1,1] HWC}

Generate responds with the planted/drawn key and the image (base64 PNG
via the native libpng writer by default); attribute responds with the
decoded bits, per-bit confidence, and the solver's best reconstruction
loss.
"""

from __future__ import annotations

import base64
import io
import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict

import numpy as np

from ..utils.image import encode_png, make_image
from .engine import EngineUnavailable, InferenceEngine


def _png_b64(img_float_hwc: np.ndarray) -> str:
    """float [-1,1] HWC -> base64 PNG (in-memory encode)."""
    u8 = make_image(img_float_hwc[None])[0]
    return base64.b64encode(encode_png(u8)).decode("ascii")


def _finite(x: float):
    """RFC 8259 has no Infinity/NaN literal; a one-user registry yields
    margin=inf and a degenerate solve can yield NaN loss --- serialize
    those as null so strict clients can still parse the response."""
    x = float(x)
    return x if np.isfinite(x) else None


def _decode_image(body: Dict[str, Any], img_size: int) -> np.ndarray:
    if "image_npy_b64" in body:
        raw = base64.b64decode(body["image_npy_b64"])
        arr = np.load(io.BytesIO(raw), allow_pickle=False)
    elif "image" in body:
        arr = np.asarray(body["image"], dtype=np.float32)
    else:
        raise ValueError("missing 'image' or 'image_npy_b64'")
    arr = np.asarray(arr, dtype=np.float32)
    if arr.shape != (img_size, img_size, 3):
        raise ValueError(
            f"image must be ({img_size},{img_size},3), got {list(arr.shape)}"
        )
    return arr


class _Handler(BaseHTTPRequestHandler):
    engine: InferenceEngine  # injected by make_server

    # quiet by default; the engine's stats endpoint is the observability
    def log_message(self, fmt, *args):  # noqa: D102
        if os.environ.get("FP_SERVE_VERBOSE"):
            super().log_message(fmt, *args)

    def _reply(self, code: int, payload: Dict[str, Any]) -> None:
        raw = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(raw)))
        self.end_headers()
        self.wfile.write(raw)

    def do_GET(self):  # noqa: N802
        if self.path == "/healthz":
            self._reply(
                200,
                {
                    "ok": True,
                    "model": self.engine.pipe.mcfg.model,
                    "img_size": self.engine.pipe.mcfg.img_size,
                    "key_len": self.engine.pipe.fpcfg.key_len,
                },
            )
        elif self.path == "/v1/stats":
            self._reply(200, self.engine.stats())
        else:
            self._reply(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):  # noqa: N802
        try:
            length = int(self.headers.get("Content-Length", "0"))
            body = json.loads(self.rfile.read(length) or b"{}")
        except (ValueError, json.JSONDecodeError) as e:
            return self._reply(400, {"error": f"bad JSON body: {e}"})
        try:
            if self.path == "/v1/generate":
                return self._generate(body)
            if self.path == "/v1/attribute":
                return self._attribute(body)
            if self.path == "/v1/identify":
                return self._identify(body)
            return self._reply(404, {"error": f"unknown path {self.path}"})
        except EngineUnavailable as e:
            # transient capacity/lifecycle failure: tell clients to retry
            return self._reply(503, {"error": str(e), "retryable": True})
        except ValueError as e:
            return self._reply(400, {"error": str(e)})
        except RuntimeError as e:
            # engine-side misconfiguration (attribution disabled, no
            # registry attached): the request was fine, the server is not
            # set up to serve it --- distinct from client errors
            return self._reply(501, {"error": str(e)})

    def _generate(self, body: Dict[str, Any]) -> None:
        encoding = body.get("encoding", "png_b64")
        if encoding not in ("png_b64", "float_list"):
            # reject before burning a device batch on a doomed request
            raise ValueError(f"unknown encoding {encoding!r}")
        out = self.engine.generate(
            seed=body.get("seed"),
            key_bits=body.get("key_bits"),
            user=body.get("user"),
        )
        resp: Dict[str, Any] = {
            "seed": out["seed"],
            "key_bits": out["key_bits"].tolist(),
        }
        if encoding == "png_b64":
            resp["image_png_b64"] = _png_b64(out["image"])
        else:
            resp["image"] = out["image"].tolist()
        if body.get("return_latent"):
            resp["w"] = out["w"].tolist()
        self._reply(200, resp)

    def _attribute(self, body: Dict[str, Any]) -> None:
        img = _decode_image(body, self.engine.pipe.mcfg.img_size)
        out = self.engine.attribute(img)
        self._reply(
            200,
            {
                "key_bits": out["key_bits"].tolist(),
                "confidence": np.round(out["confidence"], 6).tolist(),
                "loss": _finite(out["loss"]),
            },
        )


    def _identify(self, body: Dict[str, Any]) -> None:
        img = _decode_image(body, self.engine.pipe.mcfg.img_size)
        out = self.engine.identify(img)
        self._reply(
            200,
            {
                "user": out["user"],
                "user_index": out["user_index"],
                "log_likelihood": _finite(out["log_likelihood"]),
                "margin_nats": _finite(out["margin_nats"]),
                "hard_match_user": out["hard_match_user"],
                "hard_distance": out["hard_distance"],
                "key_bits": out["key_bits"].tolist(),
                "loss": _finite(out["loss"]),
            },
        )


def make_server(
    engine: InferenceEngine, host: str = "127.0.0.1", port: int = 0
) -> ThreadingHTTPServer:
    """Bind (but don't serve) an HTTP server over ``engine``.

    ``port=0`` binds an ephemeral port (tests); read it back from
    ``server.server_address[1]``.
    """
    handler = type("BoundHandler", (_Handler,), {"engine": engine})
    return ThreadingHTTPServer((host, port), handler)


def serve_forever_in_thread(
    server: ThreadingHTTPServer,
) -> threading.Thread:
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return t
