"""StyleGAN2 training CLI (beyond-parity; the reference only loads
pretrained checkpoints, ref src/PCA.py:40).

Trains a generator on the procedural synthetic distribution
(training/data.py) and exports the EMA generator in rosinality
state-dict layout as a portable ``.npz`` that every other CLI accepts
via ``--ckpt`` (checkpoints/rosinality.py reads .npz without torch).
This closes the quality loop in environments with no downloadable
weights: train here, then ``cli.attribute --ckpt <out.npz>`` measures
real key-recovery bit accuracy against a *trained* generator.

Run (quality self-proof, ~minutes on one TPU chip):
    python -m attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.cli.train \
        --img_size 64 --channel_max 128 --steps 3000 --batch 16 --out /tmp/selftrain.npz
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

from ..config import ModelConfig
from ..training.gan import TrainConfig, init_train_state, make_train_step


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--img_size", type=int, default=64)
    p.add_argument("--style_dim", type=int, default=512)
    p.add_argument("--n_mlp", type=int, default=8)
    p.add_argument("--channel_max", type=int, default=128)
    p.add_argument("--channel_multiplier", type=int, default=2)
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--lr", type=float, default=0.002)
    p.add_argument("--r1", type=float, default=10.0)
    p.add_argument("--d_reg_every", type=int, default=16)
    p.add_argument("--mixing", type=float, default=0.9)
    p.add_argument("--ema_decay", type=float, default=0.999)
    p.add_argument("--data_sharp", action="store_true",
                   help="train on the sharp-feature data variant (rectangles + "
                   "stripes; measured LESS attributable than the smooth "
                   "default, see BASELINE.md)")
    p.add_argument("--data_dim", type=int, default=0,
                   help="cap the synthetic data manifold's intrinsic "
                   "dimension (data.py _scene_lowdim; 0 = full 35-factor "
                   "draw).  Low values steepen the trained w-spectrum "
                   "(the FFHQ-like regime; study: make spectrum)")
    p.add_argument("--data_dir", type=str, default=None,
                   help="train on real images from this folder (recursive; "
                   "png/jpeg decoded by the native C++ loader when built, "
                   "else PIL) instead of the synthetic distribution; images "
                   "are center-cropped and area-resampled to --img_size")
    p.add_argument("--prefetch", type=int, default=4,
                   help="host-side decode lookahead (batches) for --data_dir")
    p.add_argument("--decode_threads", type=int, default=0,
                   help="C++ decode threads for --data_dir (0 = hw concurrency)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mesh_data", type=int, default=0,
                   help="data-parallel mesh width for training (0 = all "
                   "visible devices when >1; 1 = force single-device). "
                   "Batch tensors shard over the axis, params replicate, "
                   "gradients psum over ICI; global-batch semantics are "
                   "preserved, so --snapshot/--resume compose unchanged")
    p.add_argument("--chunk", type=int, default=100,
                   help="steps per device dispatch (amortizes axon overhead)")
    p.add_argument("--log_every", type=int, default=1,
                   help="log every N chunks")
    p.add_argument("--out", type=str, default="/tmp/selftrain.npz",
                   help="EMA generator export path (.npz, rosinality names)")
    p.add_argument("--snapshot", type=str, default=None,
                   help="crash-safe training snapshot path (.npz): the FULL "
                   "TrainState (G, D, EMA, both Adam states) is written "
                   "atomically at chunk boundaries; combine with --resume "
                   "to continue a preempted run bit-for-bit")
    p.add_argument("--snapshot_every", type=int, default=1,
                   help="chunks between snapshot writes")
    p.add_argument("--resume", action="store_true",
                   help="resume from --snapshot if it exists (refuses on a "
                   "config mismatch; no-op when absent)")
    p.add_argument("--metrics_out", type=str, default=None,
                   help="append per-step training metrics (d_loss/g_loss/r1 "
                   "+ chunk steps/s) to this jsonl file, one row per step; "
                   "appends across --resume so a preempted run keeps one "
                   "contiguous record")
    p.add_argument("--compile_cache", type=str, default="/tmp/jax_cache_fp")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import jax
    import jax.numpy as jnp
    from jax import lax

    if args.compile_cache:
        jax.config.update("jax_compilation_cache_dir", args.compile_cache)

    mcfg = ModelConfig(
        model="sg2",
        img_size=args.img_size,
        style_dim=args.style_dim,
        n_mlp=args.n_mlp,
        channel_max=args.channel_max,
        channel_multiplier=args.channel_multiplier,
        ckpt=None,
    )
    tcfg = TrainConfig(
        batch=args.batch, lr=args.lr, r1=args.r1, d_reg_every=args.d_reg_every,
        mixing=args.mixing, ema_decay=args.ema_decay, data_sharp=args.data_sharp,
        data_latent_dim=args.data_dim,
    )
    use_folder = args.data_dir is not None

    # data-parallel mesh over all visible devices when >1 (or --mesh_data),
    # falling back to the single-device program when the batch doesn't
    # tile the mesh (mirrors cli/generate.py's auto-engagement)
    mesh = None
    n_dev = len(jax.devices())
    if args.mesh_data > 1 or (args.mesh_data == 0 and n_dev > 1):
        from ..parallel import mesh as pm

        m = pm.make_mesh(data=args.mesh_data or 0, model=1)
        if args.batch % m.shape["data"] == 0:
            mesh = m
            print(f"[train] mesh: {dict(mesh.shape)} over {n_dev} devices")

    step = make_train_step(mcfg, tcfg, external_data=use_folder, mesh=mesh)

    key = jax.random.PRNGKey(args.seed)
    k_init, k_run = jax.random.split(key)
    t0 = time.time()
    state = init_train_state(k_init, mcfg, tcfg)
    print(f"[train] state initialized in {time.time()-t0:.1f}s "
          f"({args.img_size}px, channel_max={args.channel_max})")

    # run-defining meta: resuming across any of these would silently
    # change the optimization, so the snapshot loader refuses
    run_meta = {
        "img_size": args.img_size, "style_dim": args.style_dim,
        "n_mlp": args.n_mlp, "channel_max": args.channel_max,
        "channel_multiplier": args.channel_multiplier,
        "batch": args.batch, "lr": args.lr, "r1": args.r1,
        "d_reg_every": args.d_reg_every, "mixing": args.mixing,
        "ema_decay": args.ema_decay, "data_sharp": args.data_sharp,
        "data_dim": args.data_dim,
        "data_dir": args.data_dir, "seed": args.seed,
    }
    start = 0
    if args.snapshot and args.resume and os.path.exists(args.snapshot):
        from ..training.snapshot import check_meta, load_snapshot

        state, meta = load_snapshot(args.snapshot, state)
        check_meta(meta, run_meta)
        start = int(meta["step"])
        print(f"[train] resumed from {args.snapshot} at step {start}")

    if mesh is not None:
        from ..parallel.train import place_train_state

        state = place_train_state(mesh, state)

    data_iter = None
    if use_folder:
        from ..training.folder import ImageFolder

        dataset = ImageFolder(args.data_dir, args.img_size)
        print(f"[train] folder data: {len(dataset)} images under "
              f"{args.data_dir} (native decode: "
              f"{'yes' if dataset.native_decode else 'no (PIL)'})")
        data_iter = dataset.batches(
            args.seed, args.batch, max(0, args.steps - start),
            prefetch=args.prefetch, n_threads=args.decode_threads,
            start=start,
        )

    chunk = max(1, args.chunk)

    from functools import partial

    @partial(jax.jit, static_argnames="length")
    def run_chunk(state, base_key, start, length):
        def body(s, j):
            return step(s, jax.random.fold_in(base_key, j))
        return lax.scan(body, state, start + jnp.arange(length))

    @jax.jit
    def run_chunk_data(state, base_key, start, reals):
        def body(s, xs):
            j, real = xs
            return step(s, jax.random.fold_in(base_key, j), real)
        return lax.scan(
            body, state, (start + jnp.arange(reals.shape[0]), reals))

    # size the last chunk to steps - ci*chunk so exactly args.steps run
    # (a short tail chunk costs one extra compile, only when steps % chunk)
    n_chunks = max(0, args.steps - start + chunk - 1) // chunk
    t0 = time.time()
    t_chunk = t0
    done = start
    for ci in range(n_chunks):
        length = min(chunk, args.steps - done)
        if use_folder:
            reals = np.stack([next(data_iter) for _ in range(length)])
            if mesh is not None:
                from ..parallel.train import shard_reals

                reals = shard_reals(mesh, reals)
            state, metrics = run_chunk_data(state, k_run, jnp.int32(done), reals)
        else:
            state, metrics = run_chunk(state, k_run, jnp.int32(done), length)
        done += length
        if args.metrics_out:
            import json

            rows = {k: np.asarray(v, dtype=np.float64) for k, v in metrics.items()}
            chunk_dt = time.time() - t_chunk
            with open(args.metrics_out, "a") as f:
                for j in range(length):
                    f.write(json.dumps({
                        "step": done - length + j + 1,
                        **{k: float(rows[k][j]) for k in rows},
                        "chunk_steps_per_s": round(length / max(chunk_dt, 1e-9), 2),
                    }) + "\n")
        t_chunk = time.time()
        if args.snapshot and (
                ci % max(1, args.snapshot_every) == 0 or ci == n_chunks - 1):
            from ..training.snapshot import save_snapshot

            save_snapshot(args.snapshot, state, {**run_meta, "step": done})
        if ci % max(1, args.log_every) == 0 or ci == n_chunks - 1:
            last = {k: float(np.asarray(v[-1])) for k, v in metrics.items()}
            dt = time.time() - t0
            print(f"[train] step {done}/{args.steps}  d {last['d_loss']:.3f}  "
                  f"g {last['g_loss']:.3f}  r1 {last['r1']:.3f}  "
                  f"({(done-start)/dt:.1f} steps/s)")
    dt = time.time() - t0
    print(f"[train] {done-start} steps in {dt:.1f}s "
          f"({(done-start)/max(dt,1e-9):.1f} steps/s)")

    if args.out:
        from ..checkpoints.flat import flatten_params
        from ..checkpoints.rosinality import generator_state_dict_from_params

        sd = generator_state_dict_from_params(jax.tree.map(np.asarray, state.g_ema))
        np.savez(args.out, **sd)
        print(f"[train] EMA generator exported to {args.out} "
              f"({len(sd)} tensors, rosinality names; use --ckpt {args.out})")
        # the trained discriminator doubles as the in-env perceptual
        # backbone (losses/disc_percept.py); flat layout, own file
        dpath = args.out + ".disc.npz"
        dsd = flatten_params(jax.tree.map(np.asarray, state.d_params))
        np.savez(dpath, **dsd)
        print(f"[train] discriminator exported to {dpath} "
              f"({len(dsd)} tensors; use --lpips_disc {dpath})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
