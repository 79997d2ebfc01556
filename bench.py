"""Benchmark: attribution solve throughput on real TPU hardware.

Measures the framework's hot loop --- the batched multi-start latent
inversion (generator fwd+bwd + LPIPS per step, all samples x restarts in
one program) --- at the reference's image size (256px, key_len=64,
shift=448) and reports **equivalent serial attribution steps per second**:

    sample_steps/sec = samples * restarts * steps / wall_seconds

i.e. how many of the reference's one-at-a-time optimizer steps
(/root/reference/src/main.py:57-70, each a full generator fwd+bwd plus two
VGG16 forwards) this implementation retires per second.

Baseline: the reference publishes no numbers (BASELINE.md); a single
modern GPU running its serial loop is generously assumed at
REF_STEPS_PER_SEC below (batch-1 StyleGAN2 256px fwd+bwd + LPIPS ~ tens of
iters/sec at best).  ``vs_baseline`` = ours / that.

Output: ONE JSON line {metric, value, unit, vs_baseline}.
"""

from __future__ import annotations

import json
import sys
import time

REF_STEPS_PER_SEC = 20.0  # assumed reference GPU serial its/sec (see docstring)


def main() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_fp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.config import (
        AttributionConfig,
        FingerprintConfig,
        ModelConfig,
    )
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.fingerprint import (
        attribute as attr,
    )
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.fingerprint import (
        pipeline as pl,
    )
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.losses.lpips import (
        init_lpips_params,
    )

    # Reference-scale problem: 256px StyleGAN2, key_len 64, LPIPS loss.
    # Batch: 4 samples x 4 restarts = 16 concurrent inversion chains.
    # n_pca reduced (PCA quality is irrelevant to throughput; keeps the
    # cold-start compile budget bounded on the slow remote-compile tunnel).
    mcfg = ModelConfig(img_size=256)
    fpcfg = FingerprintConfig(key_len=64, shift=448, n_pca_samples=2048)
    samples, n_starts, steps = 4, 4, 20

    acfg = AttributionConfig(steps=steps, n_starts=n_starts, lr=0.2, loss="perceptual")
    key = jax.random.PRNGKey(0)
    pipe = pl.build_pipeline(key, mcfg, fpcfg, want_lpips=False)
    lpips_params = init_lpips_params(jax.random.PRNGKey(1))
    imgs, _, _, bits, _ = pl.generate_fingerprinted(pipe, jax.random.PRNGKey(2), samples)
    targets = jax.lax.stop_gradient(imgs)

    def solve(rng):
        return attr.attribute(
            pipe.gen_params, lpips_params, pipe.basis, pipe.noise, targets, rng,
            mcfg=mcfg, acfg=acfg, dtype="bfloat16",
        )

    import numpy as np

    # warm-up / compile.  NOTE: on the axon TPU platform block_until_ready
    # returns immediately; only a host fetch truly synchronizes, so all
    # timing fences below are np.asarray fetches of a small result.
    res = solve(jax.random.PRNGKey(3))
    np.asarray(res.loss)

    t0 = time.time()
    res = solve(jax.random.PRNGKey(4))
    np.asarray(res.loss)
    dt = time.time() - t0

    sample_steps_per_sec = samples * n_starts * steps / dt
    print(
        json.dumps(
            {
                "metric": "attribution sample-steps/sec (256px, LPIPS, fwd+bwd)",
                "value": round(sample_steps_per_sec, 2),
                "unit": "steps/s",
                "vs_baseline": round(sample_steps_per_sec / REF_STEPS_PER_SEC, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
