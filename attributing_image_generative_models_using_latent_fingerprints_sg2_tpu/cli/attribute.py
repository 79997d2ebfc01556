"""Attribution CLI.

TPU equivalent of ``python main.py ...``
(/root/reference/src/main.py:93-154): generate ``sample_size``
fingerprinted test images with known keys, optionally attack them, then
invert all of them --- every sample and every Latin-Hypercube restart ---
in ONE compiled TPU program, and report per-sample bit accuracy plus
running exact-match attribution accuracy in ``result.txt``.

The reference runs sample_size x n x steps sequential fwd+bwd passes
(4M at defaults); here the whole workload is a single lax.scan over
steps with a [sample_size x n] generator batch.
"""

from __future__ import annotations

import contextlib
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..fingerprint import attribute as attr
from ..fingerprint import pipeline as pl
from ..utils.image import make_image, store_results
from ..utils.io import make_run_dir, save_config, write_results
from .common import (
    apply_runtime_config,
    build_parser,
    config_from_args,
    setup_compile_cache,
)


def main(argv=None) -> int:
    parser = build_parser("TPU-native attribution (latent inversion)")
    parser.add_argument(
        "--chunk_samples", type=int, default=0,
        help="attribute in chunks of this many samples (0 = all at once); "
        "bounds peak memory at large sample_size",
    )
    parser.add_argument(
        "--chunk_starts", type=int, default=0,
        help="split the LHS restarts into chunks of this many (0 = all at "
        "once); bounds peak memory at large --n / high resolution",
    )
    parser.add_argument(
        "--resume", type=str, default=None,
        help="resume an interrupted run from its run dir (uses the saved "
        "attribution_state.json; seeds and sample order are reproduced)",
    )
    parser.add_argument(
        "--init", choices=["lhs", "encoder"], default="lhs",
        help="restart initialization: blind centered-LHS (the reference's "
        "scheme, src/main.py:46-52) or an amortized inverter trained on "
        "frozen-generator pairs at startup (fingerprint/encoder.py) whose "
        "prediction centers every restart.  CLI-only (not saved in the "
        "run config); honored on --resume like the chunk flags",
    )
    parser.add_argument(
        "--encoder_steps", type=int, default=1500,
        help="--init encoder: supervised training steps for the inverter",
    )
    parser.add_argument(
        "--encoder_batch", type=int, default=0,
        help="--init encoder: rendered batch per training step; 0 = auto "
        "(64 through 128px, scaled down above — a 64-image 256px render "
        "inside the training scan exceeds the single-chip memory "
        "envelope; scale --encoder_steps up to keep the sample count)",
    )
    parser.add_argument(
        "--encoder_jitter", type=float, default=0.25,
        help="--init encoder: LHS cloud radius around the prediction, "
        "in units of sigma_rest",
    )
    parser.add_argument(
        "--profile", action="store_true",
        help="record per-phase wall-clock timings (and a jax.profiler "
        "trace of the first solve chunk into <run_dir>/trace) and print "
        "the report at exit",
    )
    args = parser.parse_args(argv)
    setup_compile_cache(args.compile_cache)

    from ..checkpoints.state import AttributionRunState, load_state, save_state

    prior_arrays = {}
    if args.resume:
        run_dir = args.resume
        state, prior_arrays = load_state(run_dir)
        if state is not None and state.config:
            # The saved config is authoritative: targets and true keys
            # are regenerated from (config, seed), so solving the tail
            # under different flags would silently mix two different
            # runs in one result.txt.  CLI flag validation is skipped ---
            # only --resume/--chunk_* are honored.  (Weight-file paths
            # --lpips_vgg/--lpips_lin/--lpips_disc are not part of the
            # config --- re-supply them when resuming a custom-LPIPS run.)
            from ..config import Config

            cfg = Config.from_dict(state.config)
            print(f"[attribute] resuming at sample {state.next_sample} "
                  f"from {run_dir} with its saved config (seed "
                  f"{cfg.run.seed}); other CLI flags are ignored")
        else:
            cfg = config_from_args(args)
            if state is None:
                print(f"[attribute] no state in {run_dir}; starting fresh there")
                state = AttributionRunState(seed=cfg.run.seed, config=cfg.to_dict())
            else:
                print(f"[attribute] resuming at sample {state.next_sample} "
                      f"from {run_dir} (no saved config; using CLI flags)")
    else:
        cfg = config_from_args(args)
        run_dir = save_config(
            make_run_dir(
                cfg.run.save_dir, cfg.attack.augmentation, cfg.fingerprint.sigma, cfg.fingerprint.shift
            ),
            cfg,
        )
        state = AttributionRunState(seed=cfg.run.seed, config=cfg.to_dict())
    print(f"[attribute] run dir: {run_dir}")
    apply_runtime_config(cfg)

    key = jax.random.PRNGKey(state.seed)
    k_build, k_gen, k_atk, k_opt = jax.random.split(key, 4)
    from ..utils import profiling as prof

    t0 = time.time()
    from .common import resolve_lpips

    # skip the default VGG init when custom params replace it below
    want_lpips, custom_lpips_params = resolve_lpips(args, cfg)
    with prof.phase("build_pipeline"):
        pipe = pl.build_pipeline(
            k_build, cfg.model, cfg.fingerprint,
            attack_cfg=cfg.attack if cfg.attack.augmentation != "None" else None,
            ckpt_path=cfg.model.ckpt,
            want_lpips=want_lpips,
        )
    if custom_lpips_params is not None:
        pipe.lpips_params = custom_lpips_params
    print(f"[attribute] pipeline built in {time.time()-t0:.1f}s")

    s_total = cfg.run.sample_size
    # --- generate all targets with known keys -----------------------------
    t0 = time.time()
    with prof.device_phase("generate_targets") as box:
        imgs, w0, wx, true_bits, _ = pl.generate_fingerprinted(pipe, k_gen, s_total)
        targets = pl.augment(pipe, jnp.clip(imgs, -1.0, 1.0), k_atk)
        targets = jax.lax.stop_gradient(targets)
        box.append(targets)
    print(f"[attribute] {s_total} targets generated in {time.time()-t0:.1f}s")
    # Chunk slicer: slicing a DEVICE array at a python offset compiles a
    # fresh tiny program per distinct start (~3 per chunk x
    # sample_size/chunk chunks) — free on a local backend but a real
    # hazard through the remote-compile tunnel, where one slow-compile
    # episode stalls the run mid-flight (observed round 5).  A single
    # jitted dynamic_slice with the start as DATA compiles once per
    # chunk size and serves every offset; arrays stay on device.
    _dslice = jax.jit(
        functools.partial(jax.lax.dynamic_slice_in_dim, axis=0),
        static_argnames="slice_size",
    )

    def _chunk_of(arr, c0, c1):
        if c0 == 0 and c1 >= s_total:
            return arr
        return _dslice(arr, c0, slice_size=c1 - c0)

    # --- amortized encoder init (beyond-parity; fingerprint/encoder.py) ---
    alpha_init_all = key_init_all = None
    if args.init == "encoder":
        from ..fingerprint import encoder as enc_mod

        t0 = time.time()
        ecfg = enc_mod.EncoderConfig(
            steps=args.encoder_steps,
            batch=args.encoder_batch or enc_mod.auto_batch(
                cfg.model.img_size
            ),
            jitter=args.encoder_jitter,
        )
        k_enc, k_einit = jax.random.split(jax.random.fold_in(key, 7))
        with prof.phase("train_encoder"):
            enc_params, enc_curve = enc_mod.train_encoder(
                k_enc, pipe.gen_params, pipe.basis, pipe.noise,
                mcfg=cfg.model, ecfg=ecfg,
                attack=cfg.attack.augmentation,
                attack_cfg=(
                    cfg.attack if cfg.attack.augmentation != "None" else None
                ),
            )
            alpha_init_all, key_init_all = enc_mod.encoder_solve_init(
                enc_params, pipe.basis, targets, cfg.attribution.n_starts,
                k_einit, jitter=args.encoder_jitter,
            )
            enc_acc = float(
                np.mean(np.asarray(
                    enc_mod.encoder_bit_accuracy(enc_params, targets, true_bits)
                ))
            )
        print(
            f"[attribute] encoder trained in {time.time()-t0:.1f}s "
            f"({args.encoder_steps} steps, final loss "
            f"{float(np.asarray(enc_curve)[-1]):.4f}); zero-step decode "
            f"bit acc {enc_acc:.4f}"
        )

    # --- solve -------------------------------------------------------------
    # data-parallel mesh over all visible devices when >1 (or --mesh_data)
    mesh = None
    n_dev = len(jax.devices())
    if cfg.run.mesh_data > 1 or (cfg.run.mesh_data == 0 and n_dev > 1):
        from ..parallel import mesh as pm
        from ..parallel.solver import attribute_on_mesh

        mesh = pm.make_mesh(data=cfg.run.mesh_data or 0, model=max(1, cfg.run.mesh_model))
        print(f"[attribute] mesh: {dict(mesh.shape)} over {n_dev} devices")

    chunk = args.chunk_samples or s_total
    bit_accs = list(state.bit_accs)
    success = state.success
    first_chunk = state.next_sample  # state.next_sample mutates in the loop
    # per-sample arrays accumulate across chunks (and across resumes, when
    # the prior checkpoint's rows line up with the progress cursor)
    rec_bits: list = []
    losses_all: list = []
    if (
        first_chunk > 0
        and prior_arrays.get("recovered_bits") is not None
        and prior_arrays["recovered_bits"].shape[0] == first_chunk
    ):
        rec_bits.append(prior_arrays["recovered_bits"])
        losses_all.append(prior_arrays["losses_all"])
    elif first_chunk > 0:
        print("[attribute] prior per-sample arrays missing or misaligned; "
              "attribution_arrays.npz will cover resumed samples only")
    t_solve = time.time()
    for c0 in range(state.next_sample, s_total, chunk):
        c1 = min(c0 + chunk, s_total)
        kw = dict(
            mcfg=cfg.model,
            acfg=cfg.attribution,
            remat=cfg.run.remat,
            dtype=cfg.run.dtype,
            biggan_cfg=pipe.biggan_cfg,
            class_onehot=pipe.class_onehot,
            truncation=pipe.truncation,
        )
        if cfg.attribution.solver_attack != "None":
            kw["attack_cfg"] = cfg.attack
        if alpha_init_all is not None:
            kw["alpha_init"] = _chunk_of(alpha_init_all, c0, c1)
            kw["key_init"] = _chunk_of(key_init_all, c0, c1)
        # jax.profiler trace of the first solve chunk (--profile);
        # prof.trace degrades to a warning on platforms without profiler
        trace_ctx = (
            prof.trace(os.path.join(run_dir, "trace"))
            if args.profile and c0 == first_chunk
            else contextlib.nullcontext()
        )
        # trace_ctx OUTSIDE device_phase: the fence (host fetch) must
        # happen before stop_trace or the async device work is truncated
        with trace_ctx, prof.device_phase("solve_chunk") as box:
            solve_fn = None
            if mesh is not None and (c1 - c0) % mesh.shape["data"] == 0:
                from ..parallel.solver import attribute_on_mesh

                mesh_ = mesh

                def solve_fn(tgt, r, **skw):
                    # mesh-placed solver; composes with --chunk_starts via
                    # attribute_chunked's solve_fn hook (restart chunking
                    # bounds memory identically on every backend).  skw is
                    # attribute_chunked's pass-through kwargs (n_starts,
                    # remat, dtype, ...); mcfg/acfg are bound here.
                    return attribute_on_mesh(
                        mesh_, pipe.gen_params, pipe.lpips_params,
                        pipe.basis, pipe.noise, tgt, r,
                        shard_model=(cfg.run.mesh_model > 1),
                        mcfg=kw["mcfg"], acfg=kw["acfg"], **skw,
                    )

            res = attr.attribute_chunked(
                pipe.gen_params,
                pipe.lpips_params,
                pipe.basis,
                pipe.noise,
                _chunk_of(targets, c0, c1),
                jax.random.fold_in(k_opt, c0),
                chunk_starts=args.chunk_starts,
                solve_fn=solve_fn,
                **kw,
            )
            box.append(res.loss)
        ev = attr.evaluate_attribution(res, true_bits[c0:c1])
        accs = np.asarray(ev["bit_acc"])
        for i, a in enumerate(accs):
            bit_accs.append(float(a))
            if a >= 1.0:
                success += 1
            print(f"sample: {c0+i}, bit acc: {a:.4f}, loss: {float(res.loss[i]):.6f}")
        # store result images for this chunk (ref src/main.py:129-144)
        w0_imgs = pl.synthesize(pipe, _chunk_of(w0, c0, c1))
        store_results(run_dir, c0, make_image(w0_imgs), make_image(_chunk_of(imgs, c0, c1)))
        attribution_acc = success / len(bit_accs)
        write_results(run_dir, bit_accs, attribution_acc)
        state.next_sample = c1
        state.bit_accs = bit_accs
        state.success = success
        rec_bits.append(np.asarray(res.key_bits))
        losses_all.append(np.asarray(res.losses_all))
        rb = np.concatenate(rec_bits, axis=0)
        # rows of recovered_bits/losses_all align with
        # true_bits[first_sample : first_sample + rows] (first_sample > 0
        # only when a resume could not recover the prior chunks' arrays)
        first_sample = c1 - rb.shape[0]
        save_state(
            run_dir, state,
            arrays={
                "true_bits": np.asarray(true_bits[:c1]),
                "recovered_bits": rb,
                "losses_all": np.concatenate(losses_all, axis=0),
                "first_sample": np.asarray(first_sample),
            },
        )

    dt = time.time() - t_solve
    print(
        f"[attribute] mean bit acc {np.mean(bit_accs):.4f}, "
        f"attribution acc {success/len(bit_accs):.4f} over {s_total} samples"
    )
    if state.next_sample >= s_total and dt < 0.5:
        print("[attribute] nothing left to solve (resumed run already complete)")
    else:
        total_steps = s_total * cfg.attribution.steps
        print(
            f"[attribute] {dt:.1f}s solve; {total_steps/dt:.2f} sample-steps/s "
            f"(x{cfg.attribution.n_starts} restarts each)"
        )
    if args.profile:
        print("[attribute] phase report:")
        print(prof.format_report(reset=True))
    return 0


if __name__ == "__main__":
    sys.exit(main())
