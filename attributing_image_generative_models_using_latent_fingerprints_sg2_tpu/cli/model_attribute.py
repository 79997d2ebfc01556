"""Model-level attribution CLI: WHICH registered generator made this?

User-facing surface over ``fingerprint/model_attribution.py``.  The
reference's solver assumes the generating model is already known
(/root/reference/src/main.py:45-89); a provider with several
fingerprinted generators first has to decide which model --- if any ---
produced a given image.  This CLI registers N checkpoints (rosinality
``.pt`` or ``cli.train`` ``.npz`` exports), solves the targets under
every model, and reports the min-loss decision with an optional
open-set threshold (calibrated in-run from in-distribution solves).

Two target modes::

    # real images from disk (PNG/JPEG via the native decoder, or .npy)
    python -m ...cli.model_attribute --models a=ck_a.npz b=ck_b.npz \\
        --images img0.png img1.npy --loss mse --calibrate 4

    # self-test: generate --sample_size images round-robin from the
    # registered models themselves and score the decisions
    python -m ...cli.model_attribute --models a=ck_a.npz b=ck_b.npz \\
        --loss mse --sample_size 8

All solver flags (--steps, --n, --loss, --dtype, --remat, ...) and the
fingerprint geometry (--key_len, --shift, --sigma) are shared across the
registry --- model attribution is only defined when every registered
model embeds with the same scheme.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..fingerprint import attribute as attr
from ..fingerprint import pipeline as pl
from ..fingerprint.model_attribution import (
    attribute_model,
    calibrate_open_set_threshold,
)
from .common import (
    apply_runtime_config,
    build_parser,
    config_from_args,
    resolve_lpips,
    setup_compile_cache,
)


def _parse_models(specs):
    out = []
    for spec in specs:
        name, sep, path = spec.partition("=")
        if not sep or not name or not path:
            raise SystemExit(f"--models entries must be NAME=PATH, got {spec!r}")
        if not os.path.exists(path):
            raise SystemExit(f"model checkpoint not found: {path!r}")
        out.append((name, path))
    if len({n for n, _ in out}) != len(out):
        raise SystemExit("--models names must be unique")
    return out


def _load_targets(paths, img_size: int) -> np.ndarray:
    """PNG/JPEG (native decoder w/ PIL fallback) or .npy -> [N,H,W,3] in
    [-1, 1]."""
    from ..training.folder import _to_training_range, load_image

    rows = []
    for p in paths:
        if p.endswith(".npy"):
            arr = np.load(p)
            if arr.dtype == np.uint8:
                arr = _to_training_range(arr)
            arr = np.asarray(arr, np.float32)
            if arr.shape != (img_size, img_size, 3):
                raise SystemExit(
                    f"{p}: expected ({img_size},{img_size},3), got {arr.shape}"
                )
            rows.append(arr)
        else:
            rows.append(_to_training_range(load_image(p, img_size)))
    return np.stack(rows)


def main(argv=None) -> int:
    parser = build_parser(
        "TPU-native model-level attribution (which generator made this?)"
    )
    parser.add_argument(
        "--models", nargs="+", default=[], metavar="NAME=PATH",
        help="registry of fingerprinted generators (rosinality .pt or "
        "cli.train .npz); all share the CLI's fingerprint/arch flags",
    )
    parser.add_argument(
        "--images", nargs="*", default=[],
        help="target images (PNG/JPEG/.npy). Empty = self-test mode: "
        "generate --sample_size targets round-robin from the registry "
        "and score the decisions",
    )
    parser.add_argument(
        "--open_set_threshold", type=float, default=float("inf"),
        help="best-loss above this attributes to NO registered model "
        "(default inf = closed set); overridden by --calibrate",
    )
    parser.add_argument(
        "--calibrate", type=int, default=0,
        help="calibrate the open-set threshold from this many "
        "in-distribution solves per registered model (0 = off)",
    )
    parser.add_argument("--calibrate_percentile", type=float, default=99.0)
    parser.add_argument("--calibrate_slack", type=float, default=2.0)
    parser.add_argument(
        "--out", type=str, default=None,
        help="write the full decision record (losses, margins, per-image "
        "decisions) as JSON here",
    )
    parser.add_argument(
        "--no_clip_targets", action="store_true",
        help="skip the [-1,1] clip on self-test/calibration targets "
        "(random-init TEST generators emit +-5; clipping pushes their "
        "images off-manifold --- same switch as eval/identification.py)",
    )
    args = parser.parse_args(argv)
    setup_compile_cache(args.compile_cache)

    models = _parse_models(args.models)
    if models:
        # per-model weights come from --models; skip the base --ckpt check
        args.random_init = True
    elif args.random_init:
        models = [("random_a", None), ("random_b", None)]
    else:
        raise SystemExit("pass --models NAME=PATH [NAME=PATH ...] "
                         "(or --random_init for a smoke registry)")
    cfg = config_from_args(args)
    apply_runtime_config(cfg)

    # ---- build the registry (one PCA per model; LPIPS built once) -------
    want_lpips, custom_lpips = resolve_lpips(args, cfg)
    t0 = time.time()
    pipes = {}
    shared_lpips = custom_lpips
    for i, (name, path) in enumerate(models):
        pipe = pl.build_pipeline(
            jax.random.fold_in(jax.random.PRNGKey(cfg.run.seed), i),
            cfg.model,
            cfg.fingerprint,
            attack_cfg=(
                cfg.attack if cfg.attack.augmentation != "None" else None
            ),
            ckpt_path=path,
            want_lpips=want_lpips and shared_lpips is None,
        )
        if shared_lpips is None and pipe.lpips_params is not None:
            shared_lpips = pipe.lpips_params
        pipe.lpips_params = shared_lpips
        pipes[name] = pipe
    names = list(pipes)
    print(f"[model_attribute] {len(pipes)} models registered in "
          f"{time.time()-t0:.1f}s: {', '.join(names)}")

    rng = jax.random.PRNGKey(cfg.run.seed)
    kw = dict(remat=cfg.run.remat, dtype=cfg.run.dtype)
    clip = (lambda x: x) if args.no_clip_targets else (
        lambda x: jnp.clip(x, -1.0, 1.0)
    )

    # ---- targets ---------------------------------------------------------
    provenance = None
    if args.images:
        targets = _load_targets(args.images, cfg.model.img_size)
        labels = list(args.images)
    else:
        per = max(1, cfg.run.sample_size // len(pipes))
        rows, provenance, labels = [], [], []
        for i, name in enumerate(names):
            imgs, *_ = pl.generate_fingerprinted(
                pipes[name], jax.random.fold_in(rng, 1000 + i), per
            )
            imgs = clip(imgs)
            if cfg.attack.augmentation != "None":
                imgs = pl.augment(
                    pipes[name], imgs, jax.random.fold_in(rng, 2000 + i)
                )
            rows.append(np.asarray(imgs))
            provenance += [i] * per
            labels += [f"{name}#{j}" for j in range(per)]
        targets = np.concatenate(rows)
        provenance = np.asarray(provenance)
        print(f"[model_attribute] self-test: {targets.shape[0]} targets "
              f"({per} per model), attack={cfg.attack.augmentation}")

    # ---- open-set calibration (in-distribution solves per model) --------
    tau = args.open_set_threshold
    if args.calibrate > 0:
        cal_losses = []
        for i, name in enumerate(names):
            p = pipes[name]
            imgs, *_ = pl.generate_fingerprinted(
                p, jax.random.fold_in(rng, 3000 + i), args.calibrate
            )
            res = attr.attribute(
                p.gen_params, p.lpips_params, p.basis, p.noise,
                clip(imgs),
                jax.random.fold_in(rng, 4000 + i),
                mcfg=p.mcfg, acfg=cfg.attribution, **kw,
            )
            cal_losses.append(np.asarray(res.loss))
        tau = calibrate_open_set_threshold(
            np.concatenate(cal_losses),
            percentile=args.calibrate_percentile,
            slack=args.calibrate_slack,
        )
        print(f"[model_attribute] calibrated open-set threshold: {tau:.3e} "
              f"(p{args.calibrate_percentile:g} x {args.calibrate_slack:g} "
              f"over {len(pipes) * args.calibrate} in-dist solves)")

    # ---- solve under every model ----------------------------------------
    t0 = time.time()
    res = attribute_model(
        pipes, jnp.asarray(targets), jax.random.fold_in(rng, 5000),
        cfg.attribution, open_set_threshold=tau, **kw,
    )
    dt = time.time() - t0
    n = targets.shape[0]
    print(f"[model_attribute] solved {n} targets x {len(pipes)} models "
          f"in {dt:.1f}s")

    rows = []
    for s in range(n):
        chosen = res.chosen(s)
        rows.append({
            "target": labels[s],
            "model": chosen,
            "best_loss": float(res.losses[res.best_model[s], s]),
            "margin": float(res.margin[s]),
            "decided": bool(res.decided[s]),
        })
        print(f"  {labels[s]}: -> {chosen or 'REJECTED (open set)'} "
              f"(loss {rows[-1]['best_loss']:.3e}, "
              f"margin x{rows[-1]['margin']:.1f})")

    record = {
        "models": names,
        "open_set_threshold": tau if np.isfinite(tau) else None,
        "loss_matrix": res.losses.tolist(),
        "decisions": rows,
    }
    if provenance is not None:
        correct = (res.best_model == provenance) & res.decided
        acc = float(correct.mean())
        record["self_test_accuracy"] = acc
        print(f"[model_attribute] self-test accuracy: {acc:.4f} "
              f"({int(correct.sum())}/{n})")
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(record, f, indent=1)
        print(f"[model_attribute] record written to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
