"""Evaluation CLI: capacity-quality sweep (+ optional FID).

Implements BASELINE.json config 3: key_len / sigma / shift grid measuring
bit accuracy, exact-match attribution accuracy, and watermark visibility
(LPIPS / MSE / FID between content-only and fingerprinted populations).

    python -m ...cli.evaluate --model sg2 --ckpt ... \
        --key_lens 32,64,128 --sigmas 0.5,1.0,2.0 --samples 8 --steps 200
"""

from __future__ import annotations

import os
import sys

import jax

from ..eval.sweep import run_sweep, sweep_to_json
from .common import (
    apply_runtime_config,
    build_parser,
    config_from_args,
    setup_compile_cache,
)


def main(argv=None) -> int:
    parser = build_parser("fingerprint capacity-quality sweep")
    parser.add_argument("--key_lens", type=str, default="32,64,128")
    parser.add_argument("--sigmas", type=str, default="1.0")
    parser.add_argument("--shifts", type=str, default="",
                        help="comma list; empty = D - key_len per point")
    parser.add_argument("--samples", type=int, default=4)
    parser.add_argument("--with_fid", action="store_true")
    parser.add_argument("--out", type=str, default="sweep.json")
    args = parser.parse_args(argv)
    setup_compile_cache(args.compile_cache)
    cfg = config_from_args(args)
    apply_runtime_config(cfg)

    # exact LPIPS weights / alternative backbones, same flags as attribute
    lpips_params = None
    if args.lpips_vgg or args.lpips_lin or args.lpips_net != "vgg":
        from ..losses.lpips import build_lpips_params

        lpips_params = build_lpips_params(
            jax.random.PRNGKey(0), vgg_path=args.lpips_vgg,
            lin_path=args.lpips_lin, net=args.lpips_net,
        )

    pts = run_sweep(
        jax.random.PRNGKey(cfg.run.seed),
        cfg.model,
        key_lens=tuple(int(v) for v in args.key_lens.split(",") if v),
        sigmas=tuple(float(v) for v in args.sigmas.split(",") if v),
        shifts=tuple(int(v) for v in args.shifts.split(",") if v) or None,
        samples=args.samples,
        acfg=cfg.attribution,
        ckpt_path=cfg.model.ckpt,
        with_fid=args.with_fid,
        dtype=cfg.run.dtype,
        lpips_params=lpips_params,
        # random-init smoke generators emit +-5; clipping would push the
        # targets off-manifold and zero the accuracy signal (see
        # eval/identification.py) --- real checkpoints measure clipped,
        # the deployment condition
        clip_targets=not args.random_init,
    )
    js = sweep_to_json(pts)
    with open(args.out, "w") as f:
        f.write(js)
    print(js)
    print(f"[evaluate] wrote {os.path.abspath(args.out)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
