"""Shared CLI flag surface.

Flag names, defaults and semantics mirror the reference's
``src/params.py:4-31`` so existing invocations port verbatim --- but
parsing happens *here*, at entry-point call time, not at import time of a
globals module (the reference parses sys.argv whenever any module imports
``params``, src/params.py:35).  Extra TPU-specific flags are namespaced
and documented.
"""

from __future__ import annotations

import argparse
import os

from ..config import (
    AttackConfig,
    AttributionConfig,
    Config,
    FingerprintConfig,
    ModelConfig,
    RunConfig,
)


def build_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--model", type=str, default="sg2", help="GAN model: sg2 | biggan")
    p.add_argument("--biggan_label", type=str, default="golden retriever",
                   help="BigGAN label to generate image")
    p.add_argument("--ckpt", type=str, default="./checkpoint/550000.pt",
                   help="path to the model checkpoint (rosinality .pt)")
    p.add_argument("--gpu_id", type=int, default=0,
                   help="accepted for reference-CLI compatibility; device selection is JAX's")
    # model parameters
    p.add_argument("--img_size", type=int, default=256, help="generator output size")
    p.add_argument("--sample_size", type=int, default=100, help="number of samples / tests")
    p.add_argument("--sd", type=int, default=1, help="standard deviations moved (c)")
    p.add_argument("--steps", type=int, default=2000, help="optimization steps")
    p.add_argument("--batch_size", type=int, default=1, help="generation batch size")
    p.add_argument("--n", type=int, default=20, help="Latin hypercube restarts")
    p.add_argument("--key_len", type=int, default=64, help="binary key length")
    p.add_argument("--save_dir", type=str, default="./result/", help="output directory")
    p.add_argument("--lr", type=float, default=0.2, help="attribution learning rate")
    # experiment setting
    p.add_argument("--shift", type=int, default=448, help="first PC of the key carrier")
    p.add_argument("--sigma", type=float, default=1.0, help="perturb strength")
    # robustness
    p.add_argument("--augmentation", type=str, default="None",
                   help="attack: None | Noise | Blur | Jpeg | Crop | Combination")
    p.add_argument("--jpeg_quality", type=int, default=50)
    p.add_argument("--noise_sigma", type=float, default=0.1)
    p.add_argument("--blur_sigma", type=float, default=0.5)
    p.add_argument("--blur_filter_size", type=int, default=25,
                   help="Blur attack filter size at eval (ref Gaussian_blur.py:16-20)")
    p.add_argument("--crop_ratio", type=float, default=0.9,
                   help="Crop attack window ratio (benchmark config 4 extra)")
    # architecture overrides (reference hardcodes 512/8/512, src/generator.py:43-47;
    # needed to load non-default checkpoints, e.g. cli.train exports)
    p.add_argument("--style_dim", type=int, default=512, help="w-space dimensionality")
    p.add_argument("--n_mlp", type=int, default=8, help="mapping network depth")
    p.add_argument("--channel_max", type=int, default=512,
                   help="per-resolution channel cap (512 = reference table)")
    # TPU-native extras (no reference equivalent)
    p.add_argument("--seed", type=int, default=0, help="global PRNG seed")
    p.add_argument("--loss", type=str, default="perceptual", help="perceptual | mse")
    p.add_argument("--coarse_to_fine", action="store_true",
                   help="anneal a Gaussian blur on estimate+target during the "
                   "solve (mse loss only): smooths high-frequency local minima")
    p.add_argument("--ctf_sigma0", type=float, default=2.0,
                   help="initial coarse-to-fine blur sigma (pixels)")
    p.add_argument("--ctf_frac", type=float, default=0.5,
                   help="fraction of steps over which the blur anneals to 0")
    p.add_argument("--polish_sweeps", type=int, default=0,
                   help="after the continuous solve, this many greedy "
                   "bit-flip sweeps over the key against the exact "
                   "reconstruction loss (0 = off, reference behavior)")
    p.add_argument("--polish_margin", type=float, default=0.05,
                   help="relative loss improvement a bit flip must clear "
                   "to be accepted (guards against noise-floor flips)")
    p.add_argument("--prune_starts", type=int, default=0,
                   help="successive halving over restarts: after "
                   "--prune_frac of the schedule keep only this many "
                   "best restarts per sample (0 = off)")
    p.add_argument("--prune_frac", type=float, default=0.25,
                   help="fraction of steps all restarts run before pruning")
    p.add_argument("--attack_aware", action="store_true",
                   help="attack-aware solving: push the solver's estimate "
                   "through the same deterministic channel as "
                   "--augmentation before the loss (differentiable Jpeg / "
                   "Blur / Crop model; Noise maps to identity)")
    p.add_argument("--dtype", type=str, default="float32", help="float32 | bfloat16")
    p.add_argument("--remat", action="store_true", help="gradient-checkpoint synthesis blocks")
    p.add_argument("--mesh_data", type=int, default=0,
                   help="data-mesh size (0 = all visible devices)")
    p.add_argument("--mesh_model", type=int, default=1,
                   help="model-mesh size: shard generator conv channels over "
                   "this many devices (tensor parallelism; data*model must "
                   "divide the visible device count)")
    p.add_argument("--use_pallas", action="store_true",
                   help="route eligible upfirdn2d blurs through the Pallas "
                   "TPU kernels instead of XLA convs")
    p.add_argument("--packed_tail", type=int, default=-1,
                   help="run the last N upsample blocks in the phase-packed "
                   "coarse layout (the measured 1024px lane-starvation fix; "
                   "numerics identical). -1 = auto: 1 when img_size >= 1024 "
                   "(measured +54%% generation / +20%% attribution), else 0; "
                   "0 disables")
    p.add_argument("--random_init", action="store_true",
                   help="random generator weights instead of --ckpt (for smoke runs)")
    p.add_argument("--lpips_vgg", type=str, default=None,
                   help="path to a torchvision-format backbone state dict for exact LPIPS")
    p.add_argument("--lpips_lin", type=str, default=None,
                   help="path to LPIPS linear-head weights ({vgg,alex,squeeze}.pth)")
    p.add_argument("--lpips_net", type=str, default="vgg",
                   choices=["vgg", "alex", "squeeze"],
                   help="LPIPS backbone (ref DistModel net arg; pipelines use vgg)")
    p.add_argument("--lpips_disc", type=str, default=None,
                   help="path to a trained discriminator .disc.npz (cli.train "
                   "export): use its feature stack as the perceptual backbone "
                   "--- the in-env replacement for pretrained VGG LPIPS "
                   "(losses/disc_percept.py)")
    p.add_argument("--compile_cache", type=str, default="/tmp/jax_cache_fp",
                   help="persistent XLA compilation cache dir ('' disables)")
    return p


def config_from_args(args: argparse.Namespace) -> Config:
    if getattr(args, "loss", "perceptual") not in ("perceptual", "mse"):
        raise SystemExit(f"--loss must be 'perceptual' or 'mse', got {args.loss!r}")
    if not args.random_init and args.ckpt and not os.path.exists(args.ckpt):
        raise SystemExit(
            f"checkpoint not found: {args.ckpt!r} (pass --ckpt PATH to a "
            "rosinality .pt, or --random_init for a smoke run)"
        )
    return Config(
        model=ModelConfig(
            model=args.model,
            img_size=args.img_size,
            style_dim=getattr(args, "style_dim", 512),
            n_mlp=getattr(args, "n_mlp", 8),
            channel_max=getattr(args, "channel_max", 512),
            ckpt=None if args.random_init else args.ckpt,
            biggan_label=args.biggan_label,
        ),
        fingerprint=FingerprintConfig(
            key_len=args.key_len,
            shift=args.shift,
            sigma=args.sigma,
            sd_moved=float(args.sd),
        ),
        attribution=AttributionConfig(
            steps=args.steps,
            n_starts=args.n,
            lr=args.lr,
            loss=args.loss,
            coarse_to_fine=getattr(args, "coarse_to_fine", False),
            ctf_sigma0=getattr(args, "ctf_sigma0", 2.0),
            ctf_frac=getattr(args, "ctf_frac", 0.5),
            polish_sweeps=getattr(args, "polish_sweeps", 0),
            polish_margin=getattr(args, "polish_margin", 0.05),
            prune_starts=getattr(args, "prune_starts", 0),
            prune_frac=getattr(args, "prune_frac", 0.25),
            solver_attack=(
                args.augmentation
                if getattr(args, "attack_aware", False)
                else "None"
            ),
        ),
        attack=AttackConfig(
            augmentation=args.augmentation,
            jpeg_quality=args.jpeg_quality,
            noise_sigma=args.noise_sigma,
            blur_sigma=args.blur_sigma,
            blur_filter_size=args.blur_filter_size,
            crop_ratio=args.crop_ratio,
        ),
        run=RunConfig(
            sample_size=args.sample_size,
            batch_size=args.batch_size,
            save_dir=args.save_dir,
            seed=args.seed,
            dtype=args.dtype,
            remat=args.remat,
            mesh_data=args.mesh_data,
            mesh_model=args.mesh_model,
            use_pallas=args.use_pallas,
            # -1 = auto: the measured packed-tail policy (pack the final
            # C<=32 block at >=1024px; packing the 512px C=64 block
            # measured -1.8%, smaller models have no C<=32 blocks)
            packed_tail=(args.packed_tail if args.packed_tail >= 0
                         else (1 if args.img_size >= 1024 else 0)),
        ),
    )


def resolve_lpips(args: argparse.Namespace, cfg: Config, want: bool = True):
    """Shared LPIPS wiring for the attribute/serve CLIs.

    Returns ``(want_default_lpips, custom_params)``: pass the first to
    ``build_pipeline(want_lpips=...)`` and, when the second is not None,
    assign it to ``pipe.lpips_params`` afterwards.  ``want=False`` (e.g.
    generation-only serving) skips all LPIPS work."""
    custom = bool(
        args.lpips_vgg or args.lpips_lin or args.lpips_net != "vgg"
        or args.lpips_disc
    )
    perceptual = want and cfg.attribution.loss == "perceptual"
    params = None
    if perceptual and custom:
        if args.lpips_disc:
            from ..losses.disc_percept import load_disc_percept

            params = load_disc_percept(args.lpips_disc)
        else:
            import jax

            from ..losses.lpips import build_lpips_params

            params = build_lpips_params(
                jax.random.PRNGKey(0), vgg_path=args.lpips_vgg,
                lin_path=args.lpips_lin, net=args.lpips_net,
            )
    return perceptual and not custom, params


def apply_runtime_config(cfg: Config) -> None:
    """Apply config knobs that act via process-global switches.

    Sets (not merely enables) each switch so sequential in-process CLI
    invocations don't inherit a previous run's state."""
    from ..models.stylegan2 import enable_packed_tail
    from ..ops.upfirdn2d import enable_pallas

    enable_pallas(cfg.run.use_pallas)
    enable_packed_tail(cfg.run.packed_tail)


def setup_compile_cache(path: str) -> None:
    """Persistent XLA compile cache --- TPU compiles through the remote
    tunnel are slow (20-400s observed); caching makes reruns instant."""
    if not path:
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
