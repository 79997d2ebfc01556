"""Worker script for tests/test_multihost.py — one distributed process.

Joins a 2-process jax.distributed job (4 virtual CPU devices each = 8
global), builds the host-identical pipeline from a fixed seed, solves the
attribution for ITS HALF of the samples over the global mesh, and writes
the allgathered results to an npz for the parent test to compare against
the single-process solve.

Run:  python multihost_worker.py <process_id> <port> <out.npz> [dp|tp]

``tp`` builds a 4x2 ('data','model') global mesh and channel-shards the
generator (tensor parallelism whose collectives span the two processes).
"""

import os
import sys


def main() -> int:
    pid, port, out_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "dp"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.parallel import (
        multihost as mh,
    )

    mh.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()

    import numpy as np

    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.config import (
        AttributionConfig,
        FingerprintConfig,
        ModelConfig,
    )
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.fingerprint import (
        pipeline as pl,
    )

    mcfg = ModelConfig(img_size=16, channel_max=64, n_mlp=2, style_dim=64)
    fpcfg = FingerprintConfig(key_len=8, shift=56, sigma=1.0, n_pca_samples=500)
    acfg = AttributionConfig(steps=10, n_starts=2, lr=0.2, loss="mse")

    # host-identical build (same seed on every process)
    pipe = pl.build_pipeline(jax.random.PRNGKey(0), mcfg, fpcfg, want_lpips=False)
    imgs, _, _, bits, _ = pl.generate_fingerprinted(pipe, jax.random.PRNGKey(1), 8)
    imgs_np = np.asarray(imgs)

    # each process owns half the samples (by process id)
    local = imgs_np[pid * 4 : (pid + 1) * 4]
    if mode == "tp":
        mesh = mh.global_mesh(model=2)
        assert dict(mesh.shape) == {"data": 4, "model": 2}
    else:
        mesh = mh.global_mesh()
        assert dict(mesh.shape) == {"data": 8, "model": 1}

    res = mh.attribute_multihost(
        mesh, pipe.gen_params, None, pipe.basis, pipe.noise, local,
        jax.random.PRNGKey(2), mcfg=mcfg, acfg=acfg,
        shard_model=(mode == "tp"),
    )
    loss = mh.process_allgather(res.loss)  # [8], identical on both hosts
    bits_rec = mh.process_allgather(res.key_bits)  # [8, 8]

    # multi-host GENERATION: same rng as the host-local
    # generate_fingerprinted above, so the gathered global images must
    # reproduce imgs_np and the drawn keys must match bits
    g_imgs, _, _, g_bits, _ = mh.generate_multihost(
        mesh, pipe, jax.random.PRNGKey(1), 8, shard_model=(mode == "tp")
    )
    gen_imgs = mh.process_allgather(g_imgs)

    # multi-host GAN TRAINING: host-identical init, 2 SPMD steps over the
    # global mesh; per-step metrics must agree across hosts (replicated)
    # and with the parent's single-process run (same seeds)
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.parallel.train import (
        place_train_state,
    )
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.training.gan import (
        TrainConfig,
        init_train_state,
    )

    tcfg = TrainConfig(batch=8, d_reg_every=2, ema_decay=0.9)
    t_state = init_train_state(jax.random.PRNGKey(5), mcfg, tcfg)
    run_chunk, _ = mh.train_multihost_chunk_runners(mesh, mcfg, tcfg)
    t_state, t_metrics = run_chunk(
        place_train_state(mesh, t_state), jax.random.PRNGKey(6),
        np.int32(0), 2,
    )
    train_rows = {}
    for k, v in t_metrics.items():
        # replicated global array -> its [length] value on every host
        # (tiled=True is required for non-fully-addressable arrays; the
        # parent asserts both hosts saved identical rows)
        g = np.asarray(mh.process_allgather(v))
        assert g.shape == (2,), (k, g.shape)
        train_rows[f"train_{k}"] = g

    np.savez(
        out_path, loss=loss, bits=bits_rec, true_bits=np.asarray(bits),
        gen_imgs=gen_imgs, gen_bits=np.asarray(g_bits),
        local_imgs=imgs_np, **train_rows,
    )
    print(f"[p{pid}] done: loss={loss.round(4).tolist()}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
