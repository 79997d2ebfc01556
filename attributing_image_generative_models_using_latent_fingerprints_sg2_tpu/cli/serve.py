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
    args = parser.parse_args(argv)
    setup_compile_cache(args.compile_cache)
    cfg = config_from_args(args)
    apply_runtime_config(cfg)

    custom_lpips = bool(
        args.lpips_vgg or args.lpips_lin or args.lpips_net != "vgg"
        or args.lpips_disc
    )
    pipe = pl.build_pipeline(
        jax.random.PRNGKey(cfg.run.seed), cfg.model, cfg.fingerprint,
        ckpt_path=cfg.model.ckpt,
        want_lpips=(
            not args.no_attribute
            and cfg.attribution.loss == "perceptual"
            and not custom_lpips
        ),
    )
    if (
        not args.no_attribute
        and cfg.attribution.loss == "perceptual"
        and custom_lpips
    ):
        if args.lpips_disc:
            from ..losses.disc_percept import load_disc_percept

            pipe.lpips_params = load_disc_percept(args.lpips_disc)
        else:
            from ..losses.lpips import build_lpips_params

            pipe.lpips_params = build_lpips_params(
                jax.random.PRNGKey(0), vgg_path=args.lpips_vgg,
                lin_path=args.lpips_lin, net=args.lpips_net,
            )

    buckets = tuple(int(b) for b in args.buckets.split(",") if b)
    # data-parallel mesh over all visible devices when >1 (or --mesh_data),
    # same auto-engage rule as cli.generate / cli.attribute; buckets must
    # then be multiples of the data axis so every shard stays static-shape
    mesh = None
    n_dev = len(jax.devices())
    if cfg.run.mesh_data > 1 or (cfg.run.mesh_data == 0 and n_dev > 1):
        from ..parallel import mesh as pm

        mesh = pm.make_mesh(
            data=cfg.run.mesh_data or 0, model=max(1, cfg.run.mesh_model)
        )
        print(f"[serve] mesh: {dict(mesh.shape)}")
    registry = None
    if args.registry:
        from ..fingerprint.keys import KeyRegistry

        registry = KeyRegistry.load(args.registry)
        print(f"[serve] registry: {len(registry)} users, "
              f"min_distance {registry.min_distance}")
    engine = InferenceEngine(
        pipe,
        acfg=None if args.no_attribute else cfg.attribution,
        cfg=ServeConfig(buckets=buckets, max_wait_ms=args.max_wait_ms),
        seed=cfg.run.seed,
        mesh=mesh,
        registry=registry,
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
