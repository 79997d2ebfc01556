"""Serving CLI: long-lived fingerprint generation/attribution service.

Beyond-reference subsystem (the reference only ships batch scripts,
/root/reference/src/generator.py:200-236): builds the pipeline once,
AOT-compiles the bucketed device programs, then serves HTTP/JSON with
request micro-batching.

    python -m ...cli.serve --random_init --img_size 64 --port 8787 \
        --steps 500 --n 8 --loss mse

    curl -s localhost:8787/healthz
    curl -s -X POST localhost:8787/v1/generate -d '{"seed": 7}'
    curl -s localhost:8787/v1/stats
"""

from __future__ import annotations

import jax

from ..fingerprint import pipeline as pl
from ..serving import InferenceEngine, ServeConfig, make_server
from .common import (
    apply_runtime_config,
    build_parser,
    config_from_args,
    setup_compile_cache,
)


def main(argv=None) -> int:
    parser = build_parser("TPU-native fingerprint serving (HTTP/JSON)")
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8787)
    parser.add_argument(
        "--buckets", type=str, default="1,4,8",
        help="comma-separated static batch buckets (ascending)",
    )
    parser.add_argument(
        "--max_wait_ms", type=float, default=5.0,
        help="batch coalescing window after the first queued request",
    )
    parser.add_argument(
        "--no_attribute", action="store_true",
        help="serve generation only (skips compiling the solver programs)",
    )
    parser.add_argument(
        "--registry", type=str, default=None,
        help="KeyRegistry JSON (cli.keys issue) enabling /v1/identify and "
        "generate-for-user",
    )
    parser.add_argument(
        "--init", choices=["lhs", "encoder"], default="lhs",
        help="restart init for served attribution: blind centered-LHS or "
        "an amortized inverter trained at startup on frozen-generator "
        "pairs (fingerprint/encoder.py; measured better at every "
        "operating point — BASELINE.md round-5).  The inverter's forward "
        "is baked into the AOT bucket executables, so steady-state "
        "dispatch is unchanged",
    )
    parser.add_argument(
        "--encoder_steps", type=int, default=1500,
        help="--init encoder: supervised training steps for the inverter",
    )
    parser.add_argument(
        "--encoder_jitter", type=float, default=0.25,
        help="--init encoder: LHS cloud radius around the prediction, "
        "in units of sigma_rest",
    )
    args = parser.parse_args(argv)
    setup_compile_cache(args.compile_cache)
    cfg = config_from_args(args)
    apply_runtime_config(cfg)

    from .common import resolve_lpips

    want_lpips, custom_lpips_params = resolve_lpips(
        args, cfg, want=not args.no_attribute
    )
    pipe = pl.build_pipeline(
        jax.random.PRNGKey(cfg.run.seed), cfg.model, cfg.fingerprint,
        ckpt_path=cfg.model.ckpt,
        want_lpips=want_lpips,
    )
    if custom_lpips_params is not None:
        pipe.lpips_params = custom_lpips_params

    buckets = tuple(int(b) for b in args.buckets.split(",") if b)
    # data-parallel mesh over all visible devices when >1 (or --mesh_data),
    # same auto-engage rule as cli.generate / cli.attribute; buckets must
    # then be multiples of the data axis so every shard stays static-shape.
    # Non-divisible buckets are dropped (with a note) rather than failing
    # the documented defaults; if none tile the mesh, fall back to the
    # single-device program like cli.generate does for non-tiling batches.
    mesh = None
    n_dev = len(jax.devices())
    if cfg.run.mesh_data > 1 or (cfg.run.mesh_data == 0 and n_dev > 1):
        from ..parallel import mesh as pm

        mesh = pm.make_mesh(
            data=cfg.run.mesh_data or 0, model=max(1, cfg.run.mesh_model)
        )
        data = mesh.shape["data"]
        tiling = tuple(b for b in buckets if b % data == 0)
        if not tiling:
            print(f"[serve] no bucket in {buckets} tiles the {data}-way "
                  "data axis; serving single-device (pass mesh-multiple "
                  "--buckets to engage the mesh)")
            mesh = None
        else:
            if tiling != buckets:
                print(f"[serve] buckets {buckets} -> {tiling} "
                      f"(multiples of the {data}-way data axis)")
            buckets = tiling
            print(f"[serve] mesh: {dict(mesh.shape)}")
    registry = None
    if args.registry:
        from ..fingerprint.keys import KeyRegistry

        registry = KeyRegistry.load(args.registry)
        print(f"[serve] registry: {len(registry)} users, "
              f"min_distance {registry.min_distance}")
    encoder_params = None
    if args.init == "encoder" and not args.no_attribute:
        import time as _time

        from ..fingerprint import encoder as enc_mod

        t0 = _time.time()
        encoder_params, enc_curve = enc_mod.train_encoder(
            jax.random.fold_in(jax.random.PRNGKey(cfg.run.seed), 7),
            pipe.gen_params, pipe.basis, pipe.noise,
            mcfg=cfg.model,
            ecfg=enc_mod.EncoderConfig(
                steps=args.encoder_steps, jitter=args.encoder_jitter,
                batch=enc_mod.auto_batch(cfg.model.img_size),
            ),
        )
        print(f"[serve] encoder trained in {_time.time()-t0:.1f}s "
              f"({args.encoder_steps} steps, final loss "
              f"{float(enc_curve[-1]):.4f})")
    engine = InferenceEngine(
        pipe,
        acfg=None if args.no_attribute else cfg.attribution,
        cfg=ServeConfig(buckets=buckets, max_wait_ms=args.max_wait_ms),
        seed=cfg.run.seed,
        mesh=mesh,
        shard_model=cfg.run.mesh_model > 1,
        registry=registry,
        encoder_params=encoder_params,
        encoder_jitter=args.encoder_jitter,
    )
    print(f"[serve] AOT-compiling buckets {buckets} ...", flush=True)
    took = {k: round(v, 1) for k, v in engine.warmup().items()}
    engine.start()  # warmup already done; start() re-checks the cache
    print(f"[serve] warm ({took}); listening on {args.host}:{args.port}")
    server = make_server(engine, args.host, args.port)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        print("[serve] shutting down")
    finally:
        server.shutdown()
        engine.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
