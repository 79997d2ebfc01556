"""Micro-batching inference engine for fingerprinted generation and
attribution.

The reference has no serving story: ``generator.py`` / ``main.py``
(/root/reference/src/generator.py:200-236, src/main.py:93-154) are batch
scripts that rebuild the model per invocation.  This engine is the
production counterpart, designed around how XLA/TPU programs actually
execute:

- **Static-shape buckets.**  Every request is coalesced into one of a
  fixed set of batch sizes and padded up to the nearest bucket, so the
  device only ever sees a handful of executables --- no recompiles in
  steady state, and each one is AOT-compiled at startup
  (``jit(f).lower(ShapeDtypeStruct...).compile()``) so the first real
  request pays zero compile latency.
- **Per-request PRNG keys.**  Generation derives all randomness from the
  request's own seed (one ``PRNGKey`` per row, vmapped), so a request's
  output is a pure function of its payload --- independent of which other
  requests it was batched with, and therefore cacheable/reproducible.
  (Bitwise-identical at a fixed bucket shape; across different buckets
  XLA's tiling reorders float reductions at the ~1e-6 level.)
- **One executor thread per device program.**  XLA serializes execution
  on a chip anyway; a single worker draining a queue is the honest
  concurrency model.  HTTP/client threads block on futures; the GIL is
  released while XLA runs, so enqueue/dequeue stays responsive.

Attribution requests run the full batched solver
(fingerprint.attribute.attribute) --- thousands of optimizer steps as a
single ``lax.scan`` program --- over the coalesced targets.  Solver
randomness (LHS restart initialization) is drawn per batch from a
dedicated counter, so unlike generation, attribution outputs are
reproducible given (engine seed, attribute-batch index, batch
composition) --- not per request; this matches the solver's
stochastic-restart semantics (ref src/main.py:103-110).
"""

from __future__ import annotations

import collections
import contextlib
import dataclasses
import threading
import time
from concurrent.futures import Future
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AttributionConfig
from ..fingerprint import attribute as attr_mod
from ..fingerprint.embed import embed
from ..fingerprint.pipeline import Pipeline
from ..models import stylegan2 as sg2


@dataclasses.dataclass(frozen=True)
class ServeConfig:
    """Engine knobs.

    ``buckets`` are the static batch shapes the device programs are
    compiled for (ascending).  ``max_wait_ms`` is the coalescing window:
    after the first request of a batch arrives, the worker waits at most
    this long for more before launching a partial (padded) batch.
    """

    buckets: Tuple[int, ...] = (1, 4, 8)
    max_wait_ms: float = 5.0
    max_queue: int = 1024
    aot_warmup: bool = True
    latency_window: int = 1024  # ring buffer for percentile stats


class EngineUnavailable(RuntimeError):
    """Transient capacity/lifecycle failure (queue full, engine stopped):
    the request was fine, retry later.  The HTTP layer maps this to 503,
    distinct from client errors (400)."""


@dataclasses.dataclass
class _Request:
    kind: str  # "generate" | "attribute"
    payload: Dict[str, Any]
    future: Future
    t_enqueue: float


def _build_generate_fn(pipe: Pipeline):
    """Batched generate program: per-request seeds -> (imgs, wx, bits).

    Rows are independent: each draws alpha/bits from its own folded key,
    so outputs don't depend on batch composition (unlike
    pipeline.generate_fingerprinted, which draws a [B, ...] block from
    one key and is only reproducible at fixed batch size).
    """
    mcfg = pipe.mcfg
    key_len = pipe.fpcfg.key_len
    basis = pipe.basis

    def fn(gen_params, seeds, bits_in, has_bits):
        keys = jax.vmap(jax.random.PRNGKey)(seeds)
        d = basis.sigma_rest.shape[0]
        a_keys = jax.vmap(lambda k: jax.random.fold_in(k, 0))(keys)
        b_keys = jax.vmap(lambda k: jax.random.fold_in(k, 1))(keys)
        alpha = (
            jax.vmap(lambda k: jax.random.normal(k, (d,)))(a_keys)
            * basis.sigma_rest
        )
        sampled = jax.vmap(
            lambda k: jax.random.randint(k, (key_len,), 0, 2)
        )(b_keys).astype(jnp.float32)
        bits = jnp.where(has_bits[:, None], bits_in, sampled)
        _, wx = embed(basis, alpha, bits)
        if mcfg.model == "biggan":
            from ..models import biggan as bg

            onehot = jnp.broadcast_to(
                pipe.class_onehot, (wx.shape[0],) + pipe.class_onehot.shape[1:]
            )
            imgs = bg.generate(
                gen_params, wx, onehot, pipe.truncation, pipe.biggan_cfg
            )
        else:
            imgs, _ = sg2.generate(
                gen_params, [wx], mcfg, input_is_latent=True, noise=pipe.noise
            )
        return imgs, wx, bits

    return fn


def _build_attribute_fn(
    pipe: Pipeline,
    acfg: AttributionConfig,
    encoder_params=None,
    encoder_jitter: float = 0.25,
):
    """Batched attribution program: targets [B,H,W,3] -> decoded keys.

    With ``encoder_params`` (an amortized inverter from
    ``fingerprint.encoder``), the restart initialization runs INSIDE the
    bucket program: the encoder forward is a handful of small convs —
    noise next to the 2000-step solve — and baking its weights into the
    AOT executable keeps the dispatch path identical (same signature,
    zero steady-state recompiles)."""

    def fn(gen_params, lpips_params, targets, rng):
        kw = {}
        if encoder_params is not None:
            from ..fingerprint import encoder as enc_mod

            k_init, rng = jax.random.split(rng)
            a0, k0 = enc_mod.encoder_solve_init(
                encoder_params, pipe.basis, targets, acfg.n_starts,
                k_init, jitter=encoder_jitter,
            )
            kw = dict(alpha_init=a0, key_init=k0)
        res = attr_mod.attribute(
            gen_params,
            lpips_params,
            pipe.basis,
            pipe.noise,
            targets,
            rng,
            mcfg=pipe.mcfg,
            acfg=acfg,
            biggan_cfg=pipe.biggan_cfg,
            class_onehot=pipe.class_onehot,
            truncation=pipe.truncation,
            **kw,
        )
        return res.key_bits, res.key_logits, res.loss, res.best_start

    return fn


class InferenceEngine:
    """Request-batching executor over a built fingerprint Pipeline.

    Usage::

        eng = InferenceEngine(pipe, acfg=acfg)   # acfg optional
        eng.start()                               # AOT-compiles buckets
        out = eng.generate(seed=7)                # dict, blocking
        fut = eng.generate(seed=8, sync=False)    # Future
        dec = eng.attribute(img_hwc)              # dict, blocking
        eng.stop()
    """

    def __init__(
        self,
        pipe: Pipeline,
        acfg: Optional[AttributionConfig] = None,
        cfg: ServeConfig = ServeConfig(),
        seed: int = 0,
        mesh=None,
        shard_model: bool = False,
        registry=None,
        encoder_params=None,
        encoder_jitter: float = 0.25,
    ):
        if not cfg.buckets or list(cfg.buckets) != sorted(set(cfg.buckets)):
            raise ValueError(f"buckets must be ascending+unique: {cfg.buckets}")
        self.mesh = mesh
        if mesh is not None:
            from ..parallel.mesh import data_sharded, replicated
            from ..parallel.solver import place_pipeline

            data = mesh.shape["data"]
            bad = [b for b in cfg.buckets if b % data]
            if bad:
                raise ValueError(
                    f"buckets {bad} not divisible by mesh data axis {data}"
                )
            pipe = place_pipeline(mesh, pipe, shard_model=shard_model)
            self._data_sh = data_sharded(mesh)
            self._repl_sh = replicated(mesh)
        self.pipe = pipe
        self.acfg = acfg
        self.registry = registry  # setter validates + builds the name index
        self.cfg = cfg
        self.seed = seed
        self._gen_jit = jax.jit(_build_generate_fn(pipe))
        self._attr_jit = (
            jax.jit(_build_attribute_fn(
                pipe, acfg, encoder_params=encoder_params,
                encoder_jitter=encoder_jitter,
            ))
            if acfg is not None else None
        )
        self._exec: Dict[Tuple[str, int], Any] = {}  # AOT executables
        self._queues: Dict[str, collections.deque] = {
            "generate": collections.deque(),
            "attribute": collections.deque(),
        }
        self._cond = threading.Condition()
        self._stop = False
        self._worker: Optional[threading.Thread] = None
        self._batch_counter = 0  # auto-seed stream for generate()
        self._attr_counter = 0  # solver-rng stream for attribute batches
        # stats
        self._lock = threading.Lock()
        self._n_requests = collections.Counter()
        self._n_batches = collections.Counter()
        self._n_padded_rows = collections.Counter()
        self._n_real_rows = collections.Counter()
        self._latencies: Dict[str, collections.deque] = {
            k: collections.deque(maxlen=cfg.latency_window)
            for k in ("generate", "attribute")
        }

    # ------------------------------------------------------------------ #
    # registry (fingerprint.keys.KeyRegistry or None)
    # ------------------------------------------------------------------ #
    @property
    def registry(self):
        return self._registry

    @registry.setter
    def registry(self, reg) -> None:
        """Validate at attach time (deploy), not on the first identify in
        production, and build the O(1) name->index map the generate hot
        path uses instead of a linear registry scan per request."""
        if reg is not None and reg.keys.shape[1] != self.pipe.fpcfg.key_len:
            raise ValueError(
                f"registry key_len {reg.keys.shape[1]} != pipeline "
                f"key_len {self.pipe.fpcfg.key_len}"
            )
        self._registry = reg
        self._user_index: Optional[Dict[str, int]] = (
            None if reg is None else {n: i for i, n in enumerate(reg.names)}
        )

    # ------------------------------------------------------------------ #
    # lifecycle
    # ------------------------------------------------------------------ #
    def start(self) -> "InferenceEngine":
        if self.cfg.aot_warmup:
            self.warmup()
        self._stop = False
        self._worker = threading.Thread(
            target=self._run, name="fp-serve-worker", daemon=True
        )
        self._worker.start()
        return self

    def stop(self, timeout: float = 30.0) -> None:
        with self._cond:
            self._stop = True
            self._cond.notify_all()
        if self._worker is not None:
            self._worker.join(timeout=timeout)
            self._worker = None
        # fail any stragglers rather than hanging their clients
        for q in self._queues.values():
            while q:
                req = q.popleft()
                req.future.set_exception(EngineUnavailable("engine stopped"))

    # ------------------------------------------------------------------ #
    # AOT compilation
    # ------------------------------------------------------------------ #
    def _spec(self, shape, dtype, batched: bool = True):
        """Aval for AOT lowering; on a mesh, batch axes shard over 'data'
        so the lowered program is the same SPMD program the parallel
        drivers run (parallel/solver.py)."""
        if self.mesh is not None:
            sh = self._data_sh if batched else self._repl_sh
            return jax.ShapeDtypeStruct(shape, dtype, sharding=sh)
        return jax.ShapeDtypeStruct(shape, dtype)

    def _place(self, arr: np.ndarray, batched: bool = True):
        if self.mesh is None:
            return arr
        return jax.device_put(
            arr, self._data_sh if batched else self._repl_sh
        )

    def _compile_bucket(self, kind: str, b: int):
        """Lower + compile the (kind, bucket) program once; later calls run
        the held executable directly (no jit-cache lookup, no retrace)."""
        if (kind, b) in self._exec:
            return self._exec[(kind, b)]
        p = self.pipe
        ctx = (
            jax.sharding.set_mesh(self.mesh)
            if self.mesh is not None
            else contextlib.nullcontext()
        )
        with ctx:
            if kind == "generate":
                lowered = self._gen_jit.lower(
                    p.gen_params,
                    self._spec((b,), jnp.int32),
                    self._spec((b, p.fpcfg.key_len), jnp.float32),
                    self._spec((b,), jnp.bool_),
                )
            elif kind == "attribute":
                if self._attr_jit is None:
                    raise RuntimeError(
                        "engine built without an AttributionConfig; "
                        "attribution serving is disabled"
                    )
                hw = p.mcfg.img_size
                lowered = self._attr_jit.lower(
                    p.gen_params,
                    p.lpips_params,
                    self._spec((b, hw, hw, 3), jnp.float32),
                    self._spec((2,), jnp.uint32, batched=False),
                )
            else:  # pragma: no cover - internal
                raise ValueError(kind)
            compiled = lowered.compile()
        with self._lock:  # stats() iterates _exec under the same lock
            self._exec[(kind, b)] = compiled
        return compiled

    def warmup(self, kinds: Optional[Sequence[str]] = None) -> Dict[str, float]:
        """AOT-compile every (kind, bucket) executable. Returns seconds per
        kind --- the latency the first real request now does NOT pay."""
        if kinds is None:
            kinds = ["generate"] + (["attribute"] if self._attr_jit else [])
        took = {}
        for kind in kinds:
            t0 = time.perf_counter()
            for b in self.cfg.buckets:
                self._compile_bucket(kind, b)
            took[kind] = time.perf_counter() - t0
        return took

    # ------------------------------------------------------------------ #
    # public request API
    # ------------------------------------------------------------------ #
    def generate(
        self,
        seed: Optional[int] = None,
        key_bits: Optional[Sequence[int]] = None,
        user: Optional[str] = None,
        sync: bool = True,
        timeout: Optional[float] = None,
    ):
        """Generate one fingerprinted image.

        ``seed=None`` draws a fresh engine-local seed.  ``key_bits`` (len
        key_len, 0/1) plants a caller-chosen key instead of a random one;
        ``user`` plants the registry key issued to that user (requires an
        attached KeyRegistry).  Returns (or resolves to)
        ``{"image", "w", "key_bits", "seed"}`` with the image as float32
        [-1,1] HWC numpy.
        """
        if user is not None:
            if key_bits is not None:
                raise ValueError("pass either key_bits or user, not both")
            if self.registry is None:
                raise RuntimeError("no KeyRegistry attached to this engine")
            idx = self._user_index.get(user)
            if idx is None:
                raise ValueError(f"unknown user {user!r}")
            key_bits = self.registry.keys[idx]
        if seed is None:
            with self._lock:
                self._batch_counter += 1
                seed = (self.seed * 1_000_003 + self._batch_counter) % (2**31)
        else:
            # int32 device array; reduce out-of-range seeds deterministically
            # instead of overflowing inside the worker (which would fail the
            # whole coalesced batch)
            seed = int(seed) % (2**31)
        bits = None
        if key_bits is not None:
            bits = np.asarray(key_bits, dtype=np.float32).reshape(-1)
            if bits.shape[0] != self.pipe.fpcfg.key_len:
                raise ValueError(
                    f"key_bits must have length {self.pipe.fpcfg.key_len}, "
                    f"got {bits.shape[0]}"
                )
            if not np.isin(bits, (0.0, 1.0)).all():
                raise ValueError("key_bits must be 0/1")
        fut = self._submit(
            "generate", {"seed": int(seed), "bits": bits}
        )
        return fut.result(timeout=timeout) if sync else fut

    def attribute(
        self,
        image: np.ndarray,
        sync: bool = True,
        timeout: Optional[float] = None,
    ):
        """Decode the fingerprint key from one image (float [-1,1] HWC).

        Returns ``{"key_bits", "key_logits", "confidence", "loss"}``;
        confidence is |sigmoid(logit) - 0.5| * 2 per bit.
        """
        if self._attr_jit is None:
            raise RuntimeError("attribution serving disabled (no acfg)")
        img = np.asarray(image, dtype=np.float32)
        hw = self.pipe.mcfg.img_size
        if img.shape != (hw, hw, 3):
            raise ValueError(f"image must be ({hw},{hw},3), got {img.shape}")
        fut = self._submit("attribute", {"image": img})
        return fut.result(timeout=timeout) if sync else fut

    def identify(
        self,
        image: np.ndarray,
        sync: bool = True,
        timeout: Optional[float] = None,
    ):
        """Attribute the image, then decode WHICH registered user's key it
        carries (ML decode over the registry from the solver's logits;
        fingerprint/keys.py).  Requires ``registry`` to be set.

        Returns ``{"user", "user_index", "log_likelihood", "margin_nats",
        "hard_distance", "key_bits", "loss"}``.
        """
        if self.registry is None:
            raise RuntimeError("no KeyRegistry attached to this engine")
        reg = self.registry  # key_len validated by the registry setter
        inner = self.attribute(image, sync=False)

        def _finish(att: Dict[str, Any]) -> Dict[str, Any]:
            si, ll, margin = reg.match_soft(att["key_logits"])
            hi, hd, _ = reg.match_hard(att["key_bits"])
            return {
                "user": reg.names[si],
                "user_index": si,
                "log_likelihood": ll,
                "margin_nats": margin,
                "hard_match_user": reg.names[hi],
                "hard_distance": hd,
                "key_bits": att["key_bits"],
                "loss": att["loss"],
            }

        if sync:
            return _finish(inner.result(timeout=timeout))
        out: Future = Future()

        def _chain(f: Future):
            if f.exception() is not None:
                out.set_exception(f.exception())
            else:
                try:
                    out.set_result(_finish(f.result()))
                except Exception as e:  # noqa: BLE001
                    out.set_exception(e)

        inner.add_done_callback(_chain)
        return out

    def stats(self) -> Dict[str, Any]:
        with self._lock:
            out: Dict[str, Any] = {
                "buckets": list(self.cfg.buckets),
                "queue_depth": {k: len(q) for k, q in self._queues.items()},
                "compiled": sorted(f"{k}:{b}" for (k, b) in self._exec),
            }
            for kind in ("generate", "attribute"):
                lats = sorted(self._latencies[kind])
                nb = self._n_batches[kind]
                real = self._n_real_rows[kind]
                pad = self._n_padded_rows[kind]
                out[kind] = {
                    "requests": self._n_requests[kind],
                    "batches": nb,
                    "mean_batch_occupancy": (
                        real / max(1, real + pad) if nb else None
                    ),
                    "latency_ms_p50": (
                        1e3 * lats[len(lats) // 2] if lats else None
                    ),
                    "latency_ms_p99": (
                        1e3 * lats[min(len(lats) - 1, int(len(lats) * 0.99))]
                        if lats
                        else None
                    ),
                }
            return out

    # ------------------------------------------------------------------ #
    # worker
    # ------------------------------------------------------------------ #
    def _submit(self, kind: str, payload: Dict[str, Any]) -> Future:
        fut: Future = Future()
        req = _Request(kind, payload, fut, time.perf_counter())
        with self._cond:
            if self._stop or self._worker is None:
                raise EngineUnavailable("engine not running (call start())")
            if sum(len(q) for q in self._queues.values()) >= self.cfg.max_queue:
                raise EngineUnavailable("queue full")
            self._queues[kind].append(req)
            self._cond.notify_all()
        with self._lock:
            self._n_requests[kind] += 1
        return fut

    def _bucket_for(self, n: int) -> int:
        for b in self.cfg.buckets:
            if n <= b:
                return b
        return self.cfg.buckets[-1]

    def _run(self) -> None:
        max_b = self.cfg.buckets[-1]
        wait_s = self.cfg.max_wait_ms / 1e3
        while True:
            with self._cond:
                while not self._stop and not any(self._queues.values()):
                    self._cond.wait(timeout=0.1)
                if self._stop:
                    return
                # serve the kind whose head request has waited longest
                kind = min(
                    (k for k, q in self._queues.items() if q),
                    key=lambda k: self._queues[k][0].t_enqueue,
                )
                q = self._queues[kind]
                batch = [q.popleft()]
                deadline = time.perf_counter() + wait_s
                while len(batch) < max_b:
                    if q:
                        batch.append(q.popleft())
                        continue
                    remaining = deadline - time.perf_counter()
                    if remaining <= 0:
                        break
                    self._cond.wait(timeout=remaining)
                    if self._stop:
                        # still execute what we have so clients get answers
                        break
            try:
                self._execute(kind, batch)
            except Exception as e:  # noqa: BLE001 - fail the batch, keep serving
                for req in batch:
                    if not req.future.done():
                        req.future.set_exception(e)

    def _execute(self, kind: str, batch) -> None:
        n = len(batch)
        b = self._bucket_for(n)
        exe = self._compile_bucket(kind, b)
        p = self.pipe
        if kind == "generate":
            seeds = np.zeros((b,), np.int32)
            bits = np.zeros((b, p.fpcfg.key_len), np.float32)
            has = np.zeros((b,), bool)
            for i, req in enumerate(batch):
                seeds[i] = req.payload["seed"]
                if req.payload["bits"] is not None:
                    bits[i] = req.payload["bits"]
                    has[i] = True
            # padded rows re-run the last real request (cheap, static shape)
            seeds[n:] = seeds[n - 1]
            bits[n:] = bits[n - 1]
            has[n:] = has[n - 1]
            imgs, wx, out_bits = exe(
                p.gen_params,
                self._place(seeds),
                self._place(bits),
                self._place(has),
            )
            imgs = np.asarray(imgs)
            wx = np.asarray(wx)
            out_bits = np.asarray(out_bits)
            for i, req in enumerate(batch):
                req.future.set_result(
                    {
                        "image": imgs[i],
                        "w": wx[i],
                        "key_bits": out_bits[i].astype(np.int32),
                        "seed": int(seeds[i]),
                    }
                )
        else:
            hw = p.mcfg.img_size
            targets = np.zeros((b, hw, hw, 3), np.float32)
            for i, req in enumerate(batch):
                targets[i] = req.payload["image"]
            targets[n:] = targets[n - 1]
            with self._lock:
                self._attr_counter += 1
                rng_seed = self._attr_counter
            rng = np.asarray(
                jax.random.PRNGKey(self.seed * 7_919 + rng_seed), np.uint32
            )
            key_bits, key_logits, loss, best = exe(
                p.gen_params,
                p.lpips_params,
                self._place(targets),
                self._place(rng, batched=False),
            )
            key_bits = np.asarray(key_bits)
            key_logits = np.asarray(key_logits)
            loss = np.asarray(loss)
            for i, req in enumerate(batch):
                conf = np.abs(1.0 / (1.0 + np.exp(-key_logits[i])) - 0.5) * 2.0
                req.future.set_result(
                    {
                        "key_bits": key_bits[i].astype(np.int32),
                        "key_logits": key_logits[i],
                        "confidence": conf,
                        "loss": float(loss[i]),
                    }
                )
        with self._lock:
            self._n_batches[kind] += 1
            self._n_real_rows[kind] += n
            self._n_padded_rows[kind] += b - n
            now = time.perf_counter()
            for req in batch:
                self._latencies[kind].append(now - req.t_enqueue)
