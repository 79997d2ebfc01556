"""Fingerprinted generation CLI.

TPU equivalent of ``python generator.py ...``
(/root/reference/src/generator.py:201-250): builds the pipeline once
(checkpoint -> PCA -> basis -> fixed noise), then emits ``sample_size``
fingerprinted images plus their content-only counterparts and attacked
variants into the reference's directory layout.

Run:
    python -m attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.cli.generate \
        --model sg2 --ckpt ... --key_len 64 --sigma 1 --shift 448 --sample_size 100
"""

from __future__ import annotations

import sys
import time

import jax

from ..fingerprint import pipeline as pl
from ..utils.image import make_image, store_results, watermark_images
from ..utils.io import make_run_dir, save_config
from .common import (
    apply_runtime_config,
    build_parser,
    config_from_args,
    setup_compile_cache,
)


def main(argv=None) -> int:
    args = build_parser("TPU-native fingerprinted generation").parse_args(argv)
    setup_compile_cache(args.compile_cache)
    cfg = config_from_args(args)
    apply_runtime_config(cfg)

    run_dir = save_config(
        make_run_dir(
            cfg.run.save_dir, cfg.attack.augmentation, cfg.fingerprint.sigma, cfg.fingerprint.shift
        ),
        cfg,
    )
    print(f"[generate] run dir: {run_dir}")

    key = jax.random.PRNGKey(cfg.run.seed)
    k_build, k_run = jax.random.split(key)
    t0 = time.time()
    pipe = pl.build_pipeline(
        k_build, cfg.model, cfg.fingerprint,
        attack_cfg=cfg.attack if cfg.attack.augmentation != "None" else None,
        ckpt_path=cfg.model.ckpt, want_lpips=False,
    )
    print(f"[generate] pipeline built in {time.time()-t0:.1f}s (PCA on device)")

    # data-parallel mesh over all visible devices when >1 (or --mesh_data),
    # mirroring cli.attribute: the batch rows shard over "data" and the
    # synthesis runs SPMD with zero collectives.  Falls back to the
    # single-device program when the batch doesn't tile the mesh.
    mesh = None
    n_dev = jax.device_count()
    if cfg.run.mesh_data > 1 or (cfg.run.mesh_data == 0 and n_dev > 1):
        from ..parallel import mesh as pm
        from ..parallel.solver import generate_on_mesh, place_pipeline

        m = pm.make_mesh(data=cfg.run.mesh_data or 0, model=max(1, cfg.run.mesh_model))
        if cfg.run.batch_size % m.shape["data"] == 0:
            mesh = m
            pipe = place_pipeline(mesh, pipe, shard_model=cfg.run.mesh_model > 1)
            print(f"[generate] mesh: {dict(mesh.shape)} over {n_dev} devices")

    n_imgs = 0
    t0 = time.time()
    for i in range(cfg.run.sample_size):
        k_i, _ = jax.random.split(jax.random.fold_in(k_run, i))
        if mesh is not None:
            imgs, w0, wx, bits, _ = generate_on_mesh(mesh, pipe, k_i, cfg.run.batch_size)
        else:
            imgs, w0, wx, bits, _ = pl.generate_fingerprinted(pipe, k_i, cfg.run.batch_size)
        w0_imgs = pl.synthesize(pipe, w0)
        # NOTE: the reference also computes an attacked variant here but
        # never stores it (generator.py:185-198) --- skipped entirely:
        # nothing downstream consumes it, and the attack chain + its
        # device->host fetch are pure waste in a CLI
        u8_wx = make_image(imgs)
        u8_w0 = make_image(w0_imgs)
        pos, neg = watermark_images(u8_wx, u8_w0)
        # index by the cumulative sample counter: store_results writes
        # element j of the batch to {index+j:06d}.png
        store_results(run_dir, n_imgs, u8_w0, u8_wx, pos, neg)
        n_imgs += imgs.shape[0]
    dt = time.time() - t0
    print(
        f"[generate] {n_imgs} fingerprinted images @ {cfg.model.img_size}px "
        f"in {dt:.1f}s ({n_imgs/dt:.2f} imgs/s)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
