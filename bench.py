"""Benchmark: attribution / generation throughput on real TPU hardware.

Measures the framework's hot loop --- the batched multi-start latent
inversion (generator fwd+bwd + LPIPS per step, all samples x restarts in
one program; ref serial loop /root/reference/src/main.py:57-70) --- and
reports **equivalent serial attribution steps per second**:

    chain_steps/sec = chains * steps / wall_seconds

Measurement method (see the axon platform notes in the verify skill):
- only a host fetch fences timing on this platform, so every measurement
  ends in an np.asarray fetch;
- per-dispatch overhead is ~0.5 s, so we never time a single call ---
  throughput is the MARGINAL cost between two scan lengths of the same
  jitted program:  steps/s = B*(S2-S1) / (t(S2) - t(S1));
- one transient tunnel error must not kill the capture of record, so the
  warm-up + timed section is wrapped in a bounded retry.

MFU: FLOPs come from XLA's own cost model (compiled.cost_analysis()),
also taken as a marginal between the two scan lengths; peak is the chip's
bf16 peak (v5e: 197 TFLOP/s).

Presets (``python bench.py [--preset P]``):
- ``default``      --- 256px attribution, bf16, 16 chains (the headline metric)
- ``1024px``       --- 1024px attribution, bf16 + remat, 4 chains
- ``generate``     --- 1024px fingerprinted generation, bf16, imgs/sec
- ``biggan``       --- 256px BigGAN-deep fingerprinted generation, bf16
- ``train``        --- 64px GAN-training steps/sec (the selftrain recipe)
- ``lpips``        --- per-slice LPIPS fwd+bwd roofline (ms / GFLOP / TF/s)
- ``gen_roofline`` --- per-resolution-block generation decomposition
- ``ref_cpu``      --- the reference's own serial loop, CPU torch (anchor)
- ``dataload``     --- native C++ decode pipeline vs PIL, imgs/sec (host-only)
- ``serve``        --- serving-engine throughput under concurrent clients
                       (micro-batching + dispatch overhead included)

Output: ONE JSON line {metric, value, unit, vs_baseline, mfu, ...}.

Baseline: the reference publishes no numbers (BASELINE.md); a single
modern GPU running its serial loop is generously assumed at the
REF_* constants below.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# Assumed reference throughput on one modern GPU (no numbers published
# in-repo; see BASELINE.md). 256px serial fwd+bwd+LPIPS ~ 20 it/s is
# generous; 1024px scales by ~16x pixels -> ~2 it/s; batch-1 1024px
# generation ~ 10 imgs/s.
REF_STEPS_PER_SEC_256 = 20.0
REF_STEPS_PER_SEC_1024 = 2.0
REF_IMGS_PER_SEC_1024 = 10.0

TPU_V5E_BF16_PEAK = 197e12  # FLOP/s per chip

RETRIES = 3
RETRY_SLEEP_S = 8.0


def _peak_flops(jax) -> float | None:
    plat = jax.devices()[0].platform.lower()
    if plat in ("tpu", "axon"):
        return TPU_V5E_BF16_PEAK
    return None


def _flops_of(compiled) -> float | None:
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"])
    except Exception:
        return None


def _measure_marginal(make_fn, s1: int, s2: int, fresh_args):
    """Time fn at two scan lengths; return the marginal seconds t(s2)-t(s1).

    ``make_fn(steps)`` returns a jitted callable; ``fresh_args()`` returns
    a new argument tuple (fresh arrays each attempt, per the platform
    notes). Warm-up (compile+execute) happens per length, then each length
    is timed with host-fetch fences.
    """
    import numpy as np

    fn1, fn2 = make_fn(s1), make_fn(s2)
    for fn in (fn1, fn2):
        args = fresh_args()
        np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])  # compile + warm

    def timed(fn):
        args = fresh_args()
        t0 = time.time()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        return time.time() - t0

    # median of 3 interleaved pairs (observed ~8% run-to-run variance on
    # the shared tunnel)
    diffs = sorted(timed(fn2) - timed(fn1) for _ in range(3))
    if diffs[1] <= 0:
        # tunnel noise swamped the marginal; raising here rides main()'s
        # bounded retry instead of emitting a negative throughput as the
        # JSON record of record
        raise RuntimeError(
            f"non-positive marginal ({diffs}); tunnel variance exceeded "
            f"the s2-s1 gap --- remeasure"
        )
    return diffs[1]


def bench_attribution(
    img_size: int, samples: int = 0, n_starts: int = 0, loss: str = "perceptual",
    remat_lpips: bool = False,
) -> dict:
    import numpy as np

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

    # Reference-scale problem: key_len 64, LPIPS loss. n_pca reduced (PCA
    # quality is irrelevant to throughput; bounds cold-start compile time
    # on the slow remote-compile tunnel).
    mcfg = ModelConfig(img_size=img_size)
    fpcfg = FingerprintConfig(key_len=64, shift=448, n_pca_samples=2048)
    if img_size >= 1024:
        samples, n_starts, s1, s2 = samples or 2, n_starts or 2, 4, 12
        remat, ref = True, REF_STEPS_PER_SEC_1024
    else:
        samples, n_starts, s1, s2 = samples or 4, n_starts or 4, 10, 30
        remat, ref = False, REF_STEPS_PER_SEC_256
    chains = samples * n_starts

    acfg = AttributionConfig(steps=s2, n_starts=n_starts, lr=0.2, loss=loss)
    pipe = pl.build_pipeline(jax.random.PRNGKey(0), mcfg, fpcfg, want_lpips=False)
    lpips_params = init_lpips_params(jax.random.PRNGKey(1))
    imgs, _, _, _, _ = pl.generate_fingerprinted(pipe, jax.random.PRNGKey(2), samples)
    targets = np.asarray(jax.lax.stop_gradient(imgs))  # host copy -> fresh device arrays per attempt

    def make_callable(steps):
        def call(rng, tgt):
            return attr.attribute(
                pipe.gen_params, lpips_params, pipe.basis, pipe.noise,
                jnp.asarray(tgt), rng,
                mcfg=mcfg, acfg=acfg, steps=steps, remat=remat,
                remat_lpips=remat_lpips, dtype="bfloat16",
            ).loss

        return jax.jit(call)

    seed = [10]

    def fresh_args():
        seed[0] += 1
        return (jax.random.PRNGKey(seed[0]), jnp.asarray(targets))

    dt = _measure_marginal(make_callable, s1, s2, fresh_args)
    chain_steps_per_sec = chains * (s2 - s1) / dt

    # FLOPs of exactly one optimizer step (the scan body): XLA's cost
    # model counts a while-loop body once regardless of trip count, so we
    # lower the bare step program instead of diffing scan lengths.
    fl_step = _step_flops(
        pipe, lpips_params, targets, mcfg, acfg, remat=remat,
        remat_lpips=remat_lpips,
    )  # flops per program step = all `chains` chains advancing once
    peak = _peak_flops(jax)
    mfu = (
        fl_step * (s2 - s1) / dt / peak
        if (fl_step and peak and dt > 0)
        else None
    )
    loss_label = "LPIPS" if loss == "perceptual" else loss
    return {
        "metric": f"attribution chain-steps/sec ({img_size}px, {loss_label}, fwd+bwd, bf16, marginal)",
        "value": round(chain_steps_per_sec, 2),
        "unit": "steps/s",
        # the assumed reference rate is for its LPIPS loop; an mse
        # ablation has no meaningful baseline ratio
        "vs_baseline": round(chain_steps_per_sec / ref, 2) if loss == "perceptual" else None,
        "mfu": round(mfu, 4) if mfu is not None else None,
        "flops_per_chain_step": round(fl_step / chains) if fl_step else None,
        "chains": chains,
    }


def _step_flops(pipe, lpips_params, targets, mcfg, acfg, remat: bool,
                remat_lpips: bool = False):
    """XLA-counted FLOPs of one fused loss+grad+Adam step over all chains.

    ``remat``/``remat_lpips`` must match the timed program so the FLOP
    definition (including recompute work) is consistent across A/B knobs."""
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.fingerprint import (
        attribute as attr,
    )
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.losses import (
        lpips as lpips_mod,
    )
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.utils.lhs import (
        lhs_alpha_init_batch,
    )

    s_ = targets.shape[0]
    n_ = acfg.n_starts
    if acfg.loss == "perceptual":
        tf = lpips_mod.extract_features(
            lpips_params, jnp.asarray(targets).astype(jnp.bfloat16)
        )
        target_feats = tuple(f[:, None] for f in tf)
        tgt = None
    else:
        target_feats = None
        tgt = jnp.asarray(targets).astype(jnp.float32)[:, None]
    alpha0 = lhs_alpha_init_batch(
        jax.random.PRNGKey(0), s_, n_, pipe.basis.sigma_rest
    )
    key0 = jnp.zeros((s_, n_, pipe.basis.v_cap.shape[0]))
    opt_params = {"alpha": alpha0, "key": key0}
    optimizer = attr._make_optimizer(acfg)
    opt_state = optimizer.init(opt_params)
    step = attr.make_attribution_step(
        pipe.gen_params, lpips_params, pipe.basis, pipe.noise, mcfg, acfg,
        target_feats, tgt, optimizer, remat=remat, remat_lpips=remat_lpips,
        dtype=jnp.bfloat16,
    )
    fn = jax.jit(lambda c: step(c, None)[0])
    try:
        return _flops_of(fn.lower((opt_params, opt_state)).compile())
    except Exception as e:
        print(f"step-flops cost analysis unavailable: {type(e).__name__}: {e}",
              file=sys.stderr)
        return None


def bench_generate(img_size: int = 1024) -> dict:

    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.config import (
        FingerprintConfig,
        ModelConfig,
    )
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.fingerprint import (
        pipeline as pl,
    )
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.fingerprint.embed import (
        embed,
    )
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.models import (
        stylegan2 as sg2,
    )

    mcfg = ModelConfig(img_size=img_size)
    fpcfg = FingerprintConfig(key_len=64, shift=448, n_pca_samples=2048)
    pipe = pl.build_pipeline(jax.random.PRNGKey(0), mcfg, fpcfg, want_lpips=False)
    batch = 8
    nl = sg2.n_latent(mcfg.img_size)
    d = pipe.basis.u_cap.shape[1]

    def make_callable(n_batches):
        def run(rng):
            def body(carry, i):
                r = jax.random.fold_in(rng, i)
                alpha = jax.random.normal(r, (batch, d - fpcfg.key_len))
                bits = jnp.asarray(
                    jax.random.bernoulli(jax.random.fold_in(r, 1), 0.5,
                                         (batch, fpcfg.key_len)), jnp.float32)
                _, wx = embed(pipe.basis, alpha, bits)
                wplus = jnp.repeat(wx[:, None, :], nl, axis=1).astype(jnp.bfloat16)
                imgs = sg2.synthesis(pipe.gen_params, wplus, pipe.noise,
                                     blur_kernel=mcfg.blur_kernel)
                return carry + jnp.mean(imgs.astype(jnp.float32)), 0.0

            acc, _ = jax.lax.scan(body, 0.0, jnp.arange(n_batches))
            return acc

        return jax.jit(run)

    seed = [100]

    def fresh_args():
        seed[0] += 1
        return (jax.random.PRNGKey(seed[0]),)

    # smaller images need a longer scan for the marginal to dominate
    # tunnel timing noise
    n1, n2 = (2, 6) if img_size >= 1024 else (4, 24)
    dt = _measure_marginal(make_callable, n1, n2, fresh_args)
    imgs_per_sec = batch * (n2 - n1) / dt
    # the assumed reference rate is for 1024px batch-1 generation only
    ref = REF_IMGS_PER_SEC_1024 if img_size >= 1024 else None

    # FLOPs of one batch synthesis (scan body counted once by XLA's cost
    # model, so lower the bare per-batch program).
    def one_batch(rng):
        alpha = jax.random.normal(rng, (batch, d - fpcfg.key_len))
        bits = jnp.asarray(
            jax.random.bernoulli(jax.random.fold_in(rng, 1), 0.5,
                                 (batch, fpcfg.key_len)), jnp.float32)
        _, wx = embed(pipe.basis, alpha, bits)
        wplus = jnp.repeat(wx[:, None, :], nl, axis=1).astype(jnp.bfloat16)
        return sg2.synthesis(pipe.gen_params, wplus, pipe.noise,
                             blur_kernel=mcfg.blur_kernel)

    try:
        fl_batch = _flops_of(jax.jit(one_batch).lower(jax.random.PRNGKey(0)).compile())
    except Exception as e:
        print(f"batch-flops cost analysis unavailable: {type(e).__name__}: {e}",
              file=sys.stderr)
        fl_batch = None
    peak = _peak_flops(jax)
    mfu = (
        fl_batch * (n2 - n1) / dt / peak
        if (fl_batch and peak and dt > 0)
        else None
    )
    return {
        "metric": f"fingerprinted generation imgs/sec ({img_size}px, bf16, marginal)",
        "value": round(imgs_per_sec, 2),
        "unit": "imgs/s",
        "vs_baseline": round(imgs_per_sec / ref, 2) if ref else None,
        "mfu": round(mfu, 4) if mfu is not None else None,
    }


def bench_biggan(img_size: int = 256) -> dict:
    """Fingerprinted BigGAN-deep generation (the reference's second model
    family, src/generator.py:53-64) — random-init weights, bf16."""

    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.config import (
        FingerprintConfig,
        ModelConfig,
    )
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.fingerprint import (
        pipeline as pl,
    )
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.fingerprint.embed import (
        embed,
    )
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.models import (
        biggan as bg,
    )

    mcfg = ModelConfig(model="biggan", img_size=img_size)
    fpcfg = FingerprintConfig(key_len=64, shift=64, n_pca_samples=2048)
    pipe = pl.build_pipeline(jax.random.PRNGKey(0), mcfg, fpcfg, want_lpips=False)
    batch = 8
    d = pipe.basis.u_cap.shape[1]

    def make_callable(n_batches):
        def run(rng):
            def body(carry, i):
                r = jax.random.fold_in(rng, i)
                alpha = jax.random.normal(r, (batch, d - fpcfg.key_len))
                bits = jnp.asarray(
                    jax.random.bernoulli(jax.random.fold_in(r, 1), 0.5,
                                         (batch, fpcfg.key_len)), jnp.float32)
                _, wx = embed(pipe.basis, alpha, bits)
                onehot = jnp.broadcast_to(
                    pipe.class_onehot, (batch,) + pipe.class_onehot.shape[1:]
                )
                imgs = bg.generate(
                    pipe.gen_params, wx.astype(jnp.bfloat16), onehot,
                    pipe.truncation, pipe.biggan_cfg,
                )
                return carry + jnp.mean(imgs.astype(jnp.float32)), 0.0

            acc, _ = jax.lax.scan(body, 0.0, jnp.arange(n_batches))
            return acc

        return jax.jit(run)

    seed = [200]

    def fresh_args():
        seed[0] += 1
        return (jax.random.PRNGKey(seed[0]),)

    n1, n2 = 2, 6
    dt = _measure_marginal(make_callable, n1, n2, fresh_args)
    imgs_per_sec = batch * (n2 - n1) / dt
    return {
        "metric": f"BigGAN-deep fingerprinted generation imgs/sec ({img_size}px, bf16, marginal)",
        "value": round(imgs_per_sec, 2),
        "unit": "imgs/s",
        # no assumed reference rate for 256px BigGAN generation exists
        "vs_baseline": None,
    }


def bench_train(img_size: int = 64) -> dict:
    """GAN training throughput (the round-2 beyond-parity subsystem,
    training/gan.py): one fused D+G step incl. lazy R1, marginal between
    two scan lengths.  Matches the `make quality_selftrain` recipe
    (64px, channel_max=128, batch 16)."""
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.config import (
        ModelConfig,
    )
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.training.gan import (
        TrainConfig,
        init_train_state,
        make_train_step,
    )

    mcfg = ModelConfig(img_size=img_size, channel_max=128, ckpt=None)
    tcfg = TrainConfig(batch=16)
    step = make_train_step(mcfg, tcfg)
    state0 = init_train_state(jax.random.PRNGKey(0), mcfg, tcfg)

    def make_callable(n_steps):
        def run(state, rng):
            def body(s, j):
                s2, m = step(s, jax.random.fold_in(rng, j))
                return s2, 0.0
            s, _ = jax.lax.scan(body, state, jnp.arange(n_steps))
            # fetch depends on the UPDATED weights so XLA cannot DCE the
            # training compute (a bare step counter would be eliminated)
            return jnp.sum(s.g_params["conv1"]["weight"].astype(jnp.float32))
        return jax.jit(run)

    seed = [300]

    def fresh_args():
        seed[0] += 1
        return (state0, jax.random.PRNGKey(seed[0]))

    n1, n2 = 20, 120
    dt = _measure_marginal(make_callable, n1, n2, fresh_args)
    steps_per_sec = (n2 - n1) / dt

    # FLOPs of one fused train step (scan body counted once by XLA's cost
    # model, so lower the bare step program). The R1 branch is lazy
    # (every d_reg_every steps) inside lax.cond; XLA counts both branches,
    # so this slightly overstates the average step -> MFU is an upper
    # bound on the optimistic side by < r1_cost/d_reg_every.
    try:
        fl_step = _flops_of(
            jax.jit(lambda s, r: step(s, r)[0])
            .lower(state0, jax.random.PRNGKey(0))
            .compile()
        )
    except Exception as e:
        print(f"train-step cost analysis unavailable: {type(e).__name__}: {e}",
              file=sys.stderr)
        fl_step = None
    peak = _peak_flops(jax)
    mfu = (
        fl_step * (n2 - n1) / dt / peak
        if (fl_step and peak and dt > 0)
        else None
    )
    return {
        "metric": f"GAN training steps/sec ({img_size}px, batch {tcfg.batch}, fused D+G+R1, marginal)",
        "value": round(steps_per_sec, 2),
        "unit": "steps/s",
        # the reference has no training path to compare against
        "vs_baseline": None,
        "mfu": round(mfu, 4) if mfu is not None else None,
        "flops_per_step": round(fl_step) if fl_step else None,
    }


def bench_lpips_roofline(img_size: int = 256, chains: int = None) -> dict:
    """Per-slice cost decomposition of the LPIPS segment.

    Measures, for k = 1..5, the marginal cost of one fwd+bwd pass through
    the first k VGG slices + their fused distance heads against cached
    target features (exactly the solver's LPIPS work per step, minus the
    generator).  The k-to-k-1 differences attribute the measured
    BASELINE.md "LPIPS increment" to individual slices --- the measured
    basis for (and post-mortem of) fused-slice kernel work.  Also reports
    XLA-counted FLOPs per k, hence per-slice achieved TFLOP/s.
    """

    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.losses import (
        lpips as lp,
    )

    if chains is None:
        # memory scaling: the bwd pass holds the full activation stack
        chains = 16 if img_size <= 256 else (4 if img_size <= 512 else 2)
    params = lp.init_lpips_params(jax.random.PRNGKey(1))
    h = img_size
    img0 = jax.random.uniform(
        jax.random.PRNGKey(2), (chains, h, h, 3), jnp.float32, -1.0, 1.0
    ).astype(jnp.bfloat16)

    def make_make(k, with_grad=True):
        # The target features are computed ONCE inside the jitted program
        # from the (small) target image argument: embedding them as
        # closure constants overflows the remote-compile request body
        # (HTTP 413), and passing the ~260 MB feature stack as per-call
        # arguments buries the marginal under transfer noise.  Computed
        # in-program they appear in both scan lengths and cancel.
        def tfeats(tgt):
            return tuple(
                jax.lax.stop_gradient(lp.normalize_feat(f))
                for f in lp.extract_raw_features(params, tgt, n_slices=k)
            )

        def loss(x, tf):
            raws = lp.extract_raw_features(params, x, n_slices=k)
            return jnp.sum(lp.distance_from_raw_features(params, raws, tf))

        def make(n_steps):
            def run(x, tgt):
                tf = tfeats(tgt)

                def body(xc, i):
                    if with_grad:
                        g = jax.grad(loss)(xc, tf)
                        return (xc - jnp.bfloat16(0.01) * g.astype(xc.dtype)), 0.0
                    # fwd only: chain via a scalar-dependent perturbation
                    v = loss(xc, tf)
                    return xc * (1.0 + 1e-12 * v).astype(xc.dtype), 0.0

                y, _ = jax.lax.scan(body, x, jnp.arange(n_steps))
                return jnp.sum(y.astype(jnp.float32))

            return jax.jit(run)

        return make, loss, tfeats

    seed = [400]

    def fresh_args():
        seed[0] += 1
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed[0]))
        mk = lambda kk: jax.random.uniform(
            kk, (chains, h, h, 3), jnp.float32, -1, 1
        ).astype(jnp.bfloat16)
        return (mk(k1), mk(k2))

    # long scans: per-pass cost is ~1-6 ms, so a 100-step marginal keeps
    # the measurement an order of magnitude above the tunnel's run-to-run
    # noise (~tens of ms)
    s1, s2 = 20, 120
    peak = _peak_flops(jax)
    per_k = []
    prev_ms, prev_fl = 0.0, 0.0
    for k in range(1, 6):
        make, loss, tfeats = make_make(k)
        dt = _measure_marginal(make, s1, s2, fresh_args)
        ms = dt / (s2 - s1) * 1e3  # ms per fwd+bwd pass (all chains)
        fl = None
        try:
            # abstract-shape lowering: counts the grad step alone (not the
            # one-time tfeats), with no array constants in the request
            tf_shapes = jax.eval_shape(tfeats, img0)
            fl = _flops_of(
                jax.jit(lambda x, tf: jax.grad(loss)(x, tf))
                .lower(jax.ShapeDtypeStruct(img0.shape, img0.dtype), tf_shapes)
                .compile()
            )
        except Exception:
            pass
        inc_ms = ms - prev_ms
        # both endpoints must have counted FLOPs; after a failed k the
        # NEXT slice's increment is also unattributable (carrying the
        # stale prev_fl would silently charge it the skipped slice's
        # FLOPs and inflate its TF/s / MFU)
        inc_fl = (fl - prev_fl) if (fl is not None and prev_fl is not None) else None
        per_k.append(
            {
                "k": k,
                "cum_ms": round(ms, 3),
                "slice_ms": round(inc_ms, 3),
                "slice_gflop": round(inc_fl / 1e9, 1) if inc_fl else None,
                "slice_tflops": (
                    round(inc_fl / (inc_ms * 1e-3) / 1e12, 1)
                    if (inc_fl and inc_ms > 0)
                    else None
                ),
                "slice_mfu": (
                    round(inc_fl / (inc_ms * 1e-3) / peak, 3)
                    if (inc_fl and inc_ms > 0 and peak)
                    else None
                ),
            }
        )
        prev_ms, prev_fl = ms, fl

    # fwd-only at k=5 to split forward vs backward
    make_f, _, _ = make_make(5, with_grad=False)
    dt_f = _measure_marginal(make_f, s1, s2, fresh_args)
    fwd_ms = dt_f / (s2 - s1) * 1e3

    return {
        "metric": f"LPIPS segment per-slice decomposition ({img_size}px, {chains} chains, bf16)",
        "value": per_k[-1]["cum_ms"],
        "unit": "ms per fwd+bwd pass",
        "vs_baseline": None,
        "fwd_only_ms": round(fwd_ms, 3),
        "bwd_ms": round(per_k[-1]["cum_ms"] - fwd_ms, 3),
        "slices": per_k,
    }


def bench_gen_roofline(img_size: int = 1024, batch: int = 8) -> dict:
    """Per-resolution-block decomposition of fingerprinted generation.

    The 1024px generation preset sits at MFU 0.16 (BASELINE.md) with no
    segment breakdown.  This measures, for k = 0..n_blocks upsample
    blocks of the SAME 1024px model (synthesis truncated via
    ``max_blocks`` --- the running skip is a valid RGB image at each
    stage), the marginal cost of one batch; successive differences give
    each resolution block's cost.  Each block also gets XLA-counted
    FLOPs, its achieved TF/s, and a minimum-HBM-traffic floor (inputs +
    outputs + skip, bf16, ignoring all intermediates) against the v5e's
    ~819 GB/s --- so the table shows directly whether a block sits on
    the compute roof, the bandwidth floor, or neither.
    """

    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.config import (
        FingerprintConfig,
        ModelConfig,
    )
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.fingerprint import (
        pipeline as pl,
    )
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.fingerprint.embed import (
        embed,
    )
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.models import (
        stylegan2 as sg2,
    )

    HBM_GBPS = 819e9  # v5e
    mcfg = ModelConfig(img_size=img_size)
    fpcfg = FingerprintConfig(key_len=64, shift=448, n_pca_samples=2048)
    pipe = pl.build_pipeline(jax.random.PRNGKey(0), mcfg, fpcfg, want_lpips=False)
    nl = sg2.n_latent(mcfg.img_size)
    d = pipe.basis.u_cap.shape[1]
    n_blocks = len(pipe.gen_params["to_rgbs"])

    def synth(rng, k):
        alpha = jax.random.normal(rng, (batch, d - fpcfg.key_len))
        bits = jnp.asarray(
            jax.random.bernoulli(jax.random.fold_in(rng, 1), 0.5,
                                 (batch, fpcfg.key_len)), jnp.float32)
        _, wx = embed(pipe.basis, alpha, bits)
        wplus = jnp.repeat(wx[:, None, :], nl, axis=1).astype(jnp.bfloat16)
        return sg2.synthesis(pipe.gen_params, wplus, pipe.noise,
                             blur_kernel=mcfg.blur_kernel, max_blocks=k)

    def make_make(k):
        def make(n_batches):
            def run(rng):
                def body(carry, i):
                    imgs = synth(jax.random.fold_in(rng, i), k)
                    return carry + jnp.mean(imgs.astype(jnp.float32)), 0.0

                acc, _ = jax.lax.scan(body, 0.0, jnp.arange(n_batches))
                return acc

            return jax.jit(run)

        return make

    seed = [300]

    def fresh_args():
        seed[0] += 1
        return (jax.random.PRNGKey(seed[0]),)

    blocks = []
    prev_ms, prev_fl = 0.0, 0.0
    for k in range(n_blocks + 1):
        res = 4 * (2 ** k)
        n1, n2 = (2, 6) if res >= 512 else (4, 24)
        dt = _measure_marginal(make_make(k), n1, n2, fresh_args)
        ms = dt / (n2 - n1) * 1e3
        fl = None
        try:
            fl = _flops_of(
                jax.jit(lambda r, kk=k: synth(r, kk))
                .lower(jax.random.PRNGKey(0)).compile()
            )
        except Exception:
            pass
        if k == 0:
            # prev_fl stays None if the base count failed: block 1's
            # increment would otherwise absorb the 4px base cost
            prev_ms, prev_fl = ms, fl
            continue
        # min HBM traffic of block k (bf16): read in-feature, write
        # out-feature twice (up-conv out + conv2 out), write + read skip
        cmap = sg2.channel_map(mcfg.channel_multiplier, mcfg.channel_max)
        cin = cmap[res // 2]
        cout = cmap[res]
        bytes_min = 2 * batch * (
            (res // 2) ** 2 * cin + 2 * res ** 2 * cout + 2 * res ** 2 * 3
        )
        inc_ms = ms - prev_ms
        # require BOTH endpoints counted (see the lpips roofline note)
        inc_fl = (fl - prev_fl) if (fl is not None and prev_fl is not None) else None
        blocks.append(
            {
                "res": res,
                "block_ms": round(inc_ms, 3),
                "block_gflop": round(inc_fl / 1e9, 1) if inc_fl else None,
                "tflops": (
                    round(inc_fl / (inc_ms * 1e-3) / 1e12, 1)
                    if (inc_fl and inc_ms > 0)
                    else None
                ),
                "mfu": (
                    round(inc_fl / (inc_ms * 1e-3) / TPU_V5E_BF16_PEAK, 3)
                    if (inc_fl and inc_ms > 0)
                    else None
                ),
                "min_traffic_mb": round(bytes_min / 1e6, 1),
                "bw_floor_ms": round(bytes_min / HBM_GBPS * 1e3, 3),
            }
        )
        prev_ms, prev_fl = ms, fl

    total_ms = prev_ms
    return {
        "metric": f"generation per-resolution-block decomposition ({img_size}px, batch {batch}, bf16)",
        "value": round(batch / (total_ms * 1e-3), 1),
        "unit": "imgs/s",
        "vs_baseline": None,
        "total_ms_per_batch": round(total_ms, 3),
        "blocks": blocks,
    }


def bench_reference_cpu(img_size: int = 256, iters: int = 8) -> dict:
    """Measured anchor for the assumed REF_* baseline constants.

    Times ONE iteration of the reference's own serial attribution loop
    (/root/reference/src/main.py:57-70: w(alpha, sigmoid(key)) -> G ->
    LPIPS + 0.1*bound -> backward -> Adam, batch 1) using the reference's
    actual Generator (imported from /root/reference/src/model.py with the
    CUDA-extension loader stubbed so its pure-torch CPU fallbacks run,
    exactly as tests/test_reference_parity.py does) and a
    torchvision-architecture VGG16 LPIPS head (random weights --- this
    env has no egress for the pretrained download; timing is
    weight-value independent).

    This is a CPU-torch number and is labeled as such: it grounds the
    *shape* of the vs_baseline ratio with a measurement on the only
    hardware the reference runs on here, alongside the clearly-stated
    20 it/s single-GPU assumption.
    """
    import importlib

    import torch
    import torch.utils.cpp_extension as cppext

    torch.manual_seed(11)
    orig_load = cppext.load
    cppext.load = lambda *a, **k: None
    sys.path.insert(0, "/root/reference/src")
    try:
        ref_model = importlib.import_module("model")
    finally:
        cppext.load = orig_load
        sys.path.remove("/root/reference/src")

    g = ref_model.Generator(img_size, 512, 8, channel_multiplier=2).eval()
    for p in g.parameters():
        p.requires_grad_(False)

    # VGG16 feature stack, layer-for-layer the torchvision `.features`
    # module the reference slices (pretrained_networks.py:121-135) ---
    # torchvision itself is absent in this env, weights are random, and
    # neither changes the timing
    import torch.nn as nn

    plan = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512, "M"]
    layers, cin = [], 3
    for item in plan:
        if item == "M":
            layers.append(nn.MaxPool2d(2))
        else:
            layers += [nn.Conv2d(cin, item, 3, padding=1), nn.ReLU()]
            cin = item
    vgg = nn.Sequential(*layers).eval()
    for p in vgg.parameters():
        p.requires_grad_(False)
    # LPIPS tap points after each relu block (ref pretrained_networks.py
    # vgg16 slices: features[0:4], [4:9], [9:16], [16:23], [23:30])
    slice_ends = [4, 9, 16, 23, 30]
    lins = [torch.rand(c) for c in (64, 128, 256, 512, 512)]

    def vgg_feats(x):
        feats = []
        h = x
        prev = 0
        for end in slice_ends:
            for i in range(prev, end):
                h = vgg[i](h)
            feats.append(h)
            prev = end
        return feats

    def lpips(a, b):
        total = 0.0
        for fa, fb, lin in zip(vgg_feats(a), vgg_feats(b), lins):
            na = fa / (fa.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            nb = fb / (fb.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            d = (na - nb).pow(2) * lin.view(1, -1, 1, 1)
            total = total + d.sum(1).mean()
        return total

    # basis per src/main.py:30-40 (random stand-in; cost-identical)
    key_len, shift = 64, 448
    pc = torch.linalg.qr(torch.randn(512, 512))[0]
    u_cap, v_cap = pc[:shift], pc[shift : shift + key_len]
    sigma448 = torch.rand(shift, 1) + 0.5
    mean = torch.zeros(512)
    noise = [torch.randn(1, 1, 2 ** ((i + 5) // 2), 2 ** ((i + 5) // 2))
             for i in range(g.num_layers)]

    target = torch.tanh(torch.randn(1, 3, img_size, img_size))

    alpha = (torch.rand(shift, 1) - 0.5).requires_grad_(True)
    key = torch.zeros(key_len, 1, requires_grad=True)
    opt = torch.optim.Adam([alpha, key], lr=0.2)

    def step():
        opt.zero_grad()
        w0 = (u_cap.T @ (alpha * sigma448)).squeeze(1) + mean
        wx = w0 + 2.0 * (v_cap.T @ torch.sigmoid(key)).squeeze(1)
        img, _ = g([wx.unsqueeze(0)], input_is_latent=True, noise=noise)
        loss = lpips(target, img) + 0.1 * torch.relu(alpha.abs() - 3).sum()
        loss.backward()
        opt.step()

    step()  # warm-up (allocator, conv algo selection)
    t0 = time.time()
    for _ in range(iters):
        step()
    dt = time.time() - t0
    it_s = iters / dt
    return {
        "metric": f"REFERENCE serial attribution it/s ({img_size}px, CPU torch, "
                  f"batch 1 --- measured anchor for the assumed GPU baseline)",
        "value": round(it_s, 3),
        "unit": "it/s",
        "vs_baseline": None,
        # the GPU assumption only exists at the two anchored sizes; other
        # sizes carry no assumed figure rather than a ~10x-wrong one
        "assumed_gpu_it_s": {256: REF_STEPS_PER_SEC_256,
                             1024: REF_STEPS_PER_SEC_1024}.get(img_size),
        "note": "reference Generator (CPU-fallback ops) + torchvision VGG16 "
                "LPIPS architecture, random weights; serial loop per "
                "src/main.py:57-70",
    }


def bench_dataload(img_size: int = 128, n_imgs: int = 256, reps: int = 3) -> dict:
    """Host-side training-data decode throughput: native C++ vs PIL.

    Builds a deterministic mixed png/jpeg corpus once under /tmp, then
    times the full ImageFolder.load_batch path (decode -> center-crop ->
    area-resample -> f32 range) through (a) the one-ctypes-crossing
    threaded C++ loader and (b) the per-image PIL+numpy fallback.  No
    jax / TPU is touched --- this is the host runtime that has to outrun
    the accelerator step to keep --data_dir training input-bound-free.
    """
    import numpy as np

    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.training import (
        folder as fl,
    )

    src = 320
    root = f"/tmp/bench_dataload_{src}_{n_imgs}"
    marker = os.path.join(root, ".complete")
    if not os.path.exists(marker):
        from PIL import Image

        os.makedirs(root, exist_ok=True)
        rng = np.random.default_rng(0)
        for i in range(n_imgs):
            img = rng.integers(0, 256, size=(src, src - 40, 3), dtype=np.uint8)
            name = f"im{i:04d}.jpg" if i % 2 else f"im{i:04d}.png"
            Image.fromarray(img).save(os.path.join(root, name), quality=90)
        with open(marker, "w") as f:
            f.write("ok")

    ds = fl.ImageFolder(root, img_size)
    idx = list(range(len(ds)))
    native_available = ds.native_decode

    def time_native():
        t0 = time.perf_counter()
        for _ in range(reps):
            ds.load_batch(idx, n_threads=0)
        return n_imgs * reps / (time.perf_counter() - t0)

    def time_pil():
        t0 = time.perf_counter()
        out = np.stack([fl._load_pil(p, img_size) for p in ds.files])
        fl._to_training_range(out)
        return n_imgs / (time.perf_counter() - t0)

    pil_rate = time_pil()
    native_rate = time_native() if native_available else 0.0
    return {
        "metric": f"data-load imgs/s @{img_size}px (native C++ threaded decode)",
        "value": round(native_rate, 1),
        "unit": "imgs/s",
        "vs_baseline": round(native_rate / pil_rate, 2) if pil_rate else None,
        "pil_fallback_imgs_s": round(pil_rate, 1),
        "corpus": f"{n_imgs} mixed png/jpeg {src}x{src-40}",
        "native_available": native_available,
        "note": "host-only preset; baseline = the PIL+numpy per-image fallback",
    }


def bench_serve(img_size: int = 256, n_requests: int = 128,
                n_clients: int = 8, bucket: int = 32) -> dict:
    """Serving-layer throughput: concurrent clients against the
    micro-batching engine (serving/engine.py), end-to-end from submit to
    resolved future.

    Measures what the raw ``generate`` preset deliberately excludes: host
    queueing, batch coalescing, one XLA dispatch per bucket, and the
    device->host image fetch.  On the tunneled axon chip the per-dispatch
    overhead (~0.5 s, BASELINE.md timing rules) dominates, so the
    interesting outputs are imgs/s at the measured occupancy and the
    p50/p99 request latency; on locally-attached TPUs the dispatch term
    shrinks ~1000x and the same engine approaches the raw synthesis rate.
    """
    import threading as _threading

    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.config import (
        FingerprintConfig,
        ModelConfig,
    )
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.fingerprint import (
        pipeline as pl,
    )
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.serving import (
        InferenceEngine,
        ServeConfig,
    )

    mcfg = ModelConfig(img_size=img_size)
    fpcfg = FingerprintConfig(key_len=64, shift=448, n_pca_samples=2048)
    pipe = pl.build_pipeline(jax.random.PRNGKey(0), mcfg, fpcfg, want_lpips=False)
    eng = InferenceEngine(
        pipe, acfg=None,
        cfg=ServeConfig(buckets=(1, bucket), max_wait_ms=3.0),
    ).start()
    try:
        # warm path end-to-end once (AOT already compiled; first call pays
        # data-path setup only)
        eng.generate(seed=0)

        errs: list = []

        def client(cid: int):
            try:
                for i in range(n_requests // n_clients):
                    eng.generate(seed=cid * 10_000 + i, timeout=600)
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        threads = [
            _threading.Thread(target=client, args=(c,))
            for c in range(n_clients)
        ]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.perf_counter() - t0
        if errs:
            raise errs[0]
        st = eng.stats()["generate"]
    finally:
        eng.stop()
    served = n_clients * (n_requests // n_clients)
    rate = served / dt
    return {
        "metric": f"served fingerprinted imgs/sec ({img_size}px, "
                  f"{n_clients} clients, bucket {bucket})",
        "value": round(rate, 2),
        "unit": "imgs/s",
        "vs_baseline": None,  # no serving path exists in the reference
        "occupancy": round(st["mean_batch_occupancy"], 3),
        "batches": st["batches"],
        "latency_ms_p50": round(st["latency_ms_p50"], 1),
        "latency_ms_p99": round(st["latency_ms_p99"], 1),
    }


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--preset",
        choices=["default", "1024px", "generate", "biggan", "train", "lpips",
                 "ref_cpu", "gen_roofline", "dataload", "serve"],
        default="default"
    )
    parser.add_argument(
        "--use_pallas", action="store_true",
        help="route eligible blurs through the Pallas kernels (A/B vs XLA)",
    )
    parser.add_argument(
        "--vgg_pallas", action="store_true",
        help="route the LPIPS backbone's square 3x3+relu convs through the "
             "paired-tap Pallas kernel (A/B vs the XLA conv emitter)",
    )
    parser.add_argument(
        "--fused_slice", action="store_true",
        help="route VGG slice 1 through the fused conv+relu+conv+relu "
             "Pallas kernel (ops/vgg_slice_pallas.py; A/B vs XLA)",
    )
    parser.add_argument("--samples", type=int, default=0,
                        help="override sample count (attribution presets)")
    parser.add_argument("--n_starts", type=int, default=0,
                        help="override restarts per sample (attribution presets)")
    parser.add_argument("--loss", choices=["perceptual", "mse"], default="perceptual",
                        help="ablation: mse isolates generator fwd+bwd cost")
    parser.add_argument("--remat_lpips", action="store_true",
                        help="recompute VGG activations in backward (A/B)")
    parser.add_argument("--fused_upsample", action="store_true",
                        help="polyphase fused upsample conv (A/B vs lhs_dilation)")
    parser.add_argument("--blur_one_pass", action="store_true",
                        help="one-pass 4x4 blur instead of 2 separable passes (A/B)")
    parser.add_argument("--packed_tail", type=int, default=-1,
                        help="run the last N upsample blocks in the "
                             "phase-packed coarse layout (the 1024px "
                             "lane-starvation fix; see gen_roofline). "
                             "-1 = auto: 1 at >=1024px (measured +54%% "
                             "generation, +20%% attribution), 0 below "
                             "(packing the C=64 512px block measured "
                             "-1.8%%); 0 disables")
    parser.add_argument("--packed_output", action="store_true",
                        help="with --packed_tail: return the final block's "
                             "RGB phase-packed ([B,H/2,W/2,12]) and skip "
                             "the device depth-to-space; host unpacks "
                             "(utils.image.unpack_phases). A/B of the "
                             "packed pipeline's one remaining fine-layout "
                             "materialization")
    parser.add_argument("--polyphase_up", action="store_true",
                        help="shifted-add polyphase spelling of the ToRGB-skip "
                             "2x upsample instead of the lhs-dilated conv (A/B)")
    parser.add_argument("--gen_size", type=int, default=None,
                        help="image size override (per-preset default when unset: "
                             "generate/gen_roofline 1024, lpips/ref_cpu/biggan 256, "
                             "train 64)")
    args = parser.parse_args()

    if args.preset == "ref_cpu":
        # pure CPU-torch path: do not touch jax / the TPU at all
        out = bench_reference_cpu(args.gen_size or 256)
        print(json.dumps(out))
        return 0

    if args.preset == "dataload":
        # pure host path: do not touch jax / the TPU at all
        out = bench_dataload(args.gen_size or 128)
        print(json.dumps(out))
        return 0

    # Bounded backend probe BEFORE touching jax in this process: on this
    # platform an unreachable TPU tunnel makes jax.devices() hang forever
    # (observed multi-hour outages), which would hang the caller instead
    # of failing.  Probe in a child with a timeout and fail fast with a
    # diagnosable JSON line.  Opt out / tune via BENCH_TPU_PROBE_SECS
    # (0 disables, e.g. for CPU smoke runs where init is known-good).
    probe_secs = float(os.environ.get("BENCH_TPU_PROBE_SECS", "600"))
    if probe_secs > 0:
        import subprocess

        try:
            subprocess.run(
                [sys.executable, "-c",
                 "import jax; jax.devices()"],
                timeout=probe_secs, check=True,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError) as e:
            print(json.dumps({
                "metric": "bench unavailable: jax backend init failed/hung "
                          f"({type(e).__name__} after {probe_secs:.0f}s probe "
                          "-- TPU tunnel down or chip held by another process)",
                "value": 0,
                "unit": "n/a",
                "vs_baseline": None,
            }))
            return 2

    global jax, jnp
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_fp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.use_pallas:
        from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.ops.upfirdn2d import (
            enable_pallas,
        )

        enable_pallas(True)
    if args.vgg_pallas:
        from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.losses.lpips import (
            enable_vgg_pallas,
        )

        enable_vgg_pallas(True)
    if args.fused_slice:
        from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.losses.lpips import (
            enable_fused_slice,
        )

        enable_fused_slice(True)
    if args.fused_upsample:
        from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.models.stylegan2 import (
            enable_fused_upsample,
        )

        enable_fused_upsample(True)
    if args.blur_one_pass:
        from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.ops.upfirdn2d import (
            enable_one_pass_blur,
        )

        enable_one_pass_blur(True)
    if args.polyphase_up:
        from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.ops.upfirdn2d import (
            enable_polyphase_upsample,
        )

        enable_polyphase_upsample(True)
    if args.packed_tail < 0:
        # auto: pack the final block only where the tail is measured
        # lane-starved (the C_out<=32 block of >=1024px synthesis)
        eff_size = {"1024px": 1024,
                    "generate": args.gen_size or 1024,
                    "gen_roofline": args.gen_size or 1024}.get(
                        args.preset, args.gen_size or 256)
        args.packed_tail = 1 if eff_size >= 1024 else 0
    if args.packed_tail:
        from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.models.stylegan2 import (
            enable_packed_tail,
        )

        enable_packed_tail(args.packed_tail)
    if args.packed_output:
        from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.models.stylegan2 import (
            enable_packed_output,
        )

        enable_packed_output(True)

    last_err: Exception | None = None
    for attempt in range(RETRIES):
        try:
            if args.preset == "gen_roofline":
                out = bench_gen_roofline(args.gen_size or 1024)
            elif args.preset == "lpips":
                out = bench_lpips_roofline(args.gen_size or 256)
            elif args.preset == "generate":
                out = bench_generate(args.gen_size or 1024)
            elif args.preset == "serve":
                out = bench_serve(args.gen_size or 256)
            elif args.preset == "biggan":
                out = bench_biggan(min(args.gen_size or 256, 256))
            elif args.preset == "train":
                out = bench_train(64 if args.gen_size is None else min(args.gen_size, 128))
            elif args.preset == "1024px":
                out = bench_attribution(
                    1024, args.samples, args.n_starts, args.loss, args.remat_lpips)
            else:
                out = bench_attribution(
                    256, args.samples, args.n_starts, args.loss, args.remat_lpips)
            print(json.dumps(out))
            return 0
        except Exception as e:  # transient axon tunnel errors (FailedPrecondition)
            last_err = e
            print(
                f"bench attempt {attempt + 1}/{RETRIES} failed: {type(e).__name__}: {e}",
                file=sys.stderr,
            )
            if attempt + 1 < RETRIES:
                time.sleep(RETRY_SLEEP_S)
    raise SystemExit(f"bench failed after {RETRIES} attempts: {last_err}")


if __name__ == "__main__":
    sys.exit(main())
