"""Configuration dataclasses.

The reference parses a single global argparse namespace at *import time*
(`src/params.py:1-36`) and every layer reaches into it as a module global.
Here config is explicit data threaded through pure functions: each subsystem
gets a frozen dataclass, the CLI builds them from flags with the same names
and defaults as `src/params.py:4-31`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Generator selection + architecture knobs (ref: src/params.py:4-12)."""

    model: str = "sg2"  # "sg2" | "biggan"
    img_size: int = 256
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    channel_max: int = 512  # cap on per-resolution channels (512 = reference; lower for tests)
    blur_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    lr_mlp: float = 0.01
    ckpt: Optional[str] = "./checkpoint/550000.pt"
    biggan_label: str = "golden retriever"

    @property
    def style_space_dim(self) -> int:
        """Latent dimensionality: w-space for sg2 (ref src/generator.py:43),
        BigGAN's truncated-noise dim 128 (ref src/generator.py:58)."""
        return self.style_dim if self.model == "sg2" else 128

    @property
    def n_latent(self) -> int:
        """Number of per-layer style slots, 2*log2(size)-2 (ref src/model.py:475)."""
        import math

        return int(math.log2(self.img_size)) * 2 - 2


@dataclasses.dataclass(frozen=True)
class FingerprintConfig:
    """Key embedding hyper-parameters (ref: src/params.py:14-24).

    - ``key_len``: binary key length (number of low-variance axes used).
    - ``shift``: first principal-component index of the key carrier;
      V = pc[shift : shift+key_len] (ref src/generator.py:212-215).
    - ``sigma``: fixed per-axis perturbation strength, overriding the
      empirical sigma of the key axes (ref src/main.py:36, generator.py:216).
    - ``sd_moved``: scalar multiplier c in wx = w0 + c V^T S k
      (ref src/params.py:14, generator.py:89).
    - ``n_pca_samples``: latents drawn for PCA (ref src/PCA.py:15).
    """

    key_len: int = 64
    shift: int = 448
    sigma: float = 1.0
    sd_moved: float = 1.0
    n_pca_samples: int = 10000

    def num_main_pc(self, style_space_dim: int) -> int:
        return style_space_dim - self.key_len


@dataclasses.dataclass(frozen=True)
class AttributionConfig:
    """Inversion solver settings (ref: src/params.py:13-20, src/main.py:42-89)."""

    steps: int = 2000
    n_starts: int = 20  # Latin-Hypercube restarts, ref --n
    lr: float = 0.2
    lr_decay: float = 0.001  # lr * exp(-decay * (i+1)), ref src/main.py:42-43
    bound_weight: float = 0.1  # weight of the alpha-bound penalty, ref src/main.py:65
    loss: str = "perceptual"  # "perceptual" | "mse" (ref src/utils.py:44-50)
    log_every: int = 100
    # Coarse-to-fine annealing (beyond-parity solver option, mse loss
    # only): compare Gaussian-blurred estimate/target early in the
    # schedule, sharpening linearly to the exact images by
    # ctf_frac*steps.  Smooths the loss landscape created by
    # high-frequency content (stripe-phase local minima), measured to
    # rescue otherwise-stuck restarts (BASELINE.md selftrain table).
    coarse_to_fine: bool = False
    ctf_sigma0: float = 2.0  # initial blur sigma (pixels)
    ctf_frac: float = 0.5  # fraction of steps over which blur anneals to 0
    # Discrete key refinement (beyond-parity): after the continuous
    # solve, greedily flip key bits one at a time against the exact
    # reconstruction loss (alpha fixed), polish_sweeps passes over all
    # bits.  Failed attributions are optimization failures, not capacity
    # limits (BASELINE.md finding 1), and a sign flip in one key
    # coordinate is exactly the move Adam cannot make late in the
    # schedule.  0 = off (reference behavior).
    polish_sweeps: int = 0
    # Accept a flip only if it improves the loss by this RELATIVE margin.
    # Measured (BASELINE.md round 3): margin 0 accepts bf16-noise-level
    # "improvements" on key-insensitive bits and DESTROYS Adam's weakly
    # correct decisions (flagship exact-match 12/20 -> 2/20); a few
    # percent keeps polish strictly evidence-driven.
    polish_margin: float = 0.05
    # Restart pruning / successive halving (beyond-parity): run all
    # n_starts LHS restarts for prune_frac of the schedule, keep the best
    # prune_starts per sample by current loss, and spend the remaining
    # steps only on the survivors.  Cuts solve cost by up to
    # 1 - (prune_frac + (1-prune_frac)*prune_starts/n_starts) at the risk
    # of dropping a late-blooming restart (measured: make pruning).
    # 0 = off (reference behavior: every restart runs the full schedule).
    prune_starts: int = 0
    prune_frac: float = 0.25
    # Attack-aware solving (beyond-parity): name of the KNOWN channel the
    # target passed through; the solver pushes its estimate through the
    # same deterministic differentiable channel model before the loss
    # (attacks.make_solver_attack) instead of asking the generator to
    # reproduce attack artifacts.  "None" = reference behavior (compare
    # raw G(w) to the attacked target, src/main.py:62-63).
    solver_attack: str = "None"


@dataclasses.dataclass(frozen=True)
class AttackConfig:
    """Robustness attack settings (ref: src/params.py:27-31)."""

    augmentation: str = "None"  # None | Noise | Blur | Jpeg | Crop | Combination
    jpeg_quality: int = 50
    noise_sigma: float = 0.1
    blur_sigma: float = 0.5
    blur_filter_size: int = 25  # eval-mode filter size, ref Gaussian_blur.py:16-20
    crop_ratio: float = 0.9  # crop attack window (benchmark config 4 extra)


@dataclasses.dataclass(frozen=True)
class RunConfig:
    """Top-level run settings: batching, output, precision, parallelism."""

    sample_size: int = 100
    batch_size: int = 1
    save_dir: str = "./result/"
    seed: int = 0
    # TPU-specific knobs (no reference equivalent):
    dtype: str = "float32"  # compute dtype for synthesis ("float32"|"bfloat16")
    remat: bool = False  # jax.checkpoint over synthesis blocks
    mesh_data: int = 1  # data-parallel mesh axis (samples x starts)
    mesh_model: int = 1  # model-parallel mesh axis (channel sharding)
    use_pallas: bool = False  # use Pallas upfirdn2d kernel where applicable
    # run the last N upsample blocks in the phase-packed coarse layout
    # (models/stylegan2.enable_packed_tail): fixes the measured MXU lane
    # starvation of the C=32 final block at 1024px (gen_roofline: MFU
    # 0.044 -> +54% imgs/s packed).  The CLIs default to -1 = auto
    # (resolved in cli/common.build_config: 1 at img_size >= 1024, else
    # 0 -- packing the C=64 512px block measured -1.8%); this resolved
    # field holds the explicit block count.
    packed_tail: int = 0


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = ModelConfig()
    fingerprint: FingerprintConfig = FingerprintConfig()
    attribution: AttributionConfig = AttributionConfig()
    attack: AttackConfig = AttackConfig()
    run: RunConfig = RunConfig()

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "Config":
        """Inverse of ``to_dict`` (e.g. the saved config in a resumable
        run state).  JSON round-trips turn tuples into lists; coerce them
        back --- sub-configs are jit statics and must stay hashable.
        Unknown keys are ignored (forward compatibility)."""

        def _coerce(dc_cls, sub: dict):
            names = {f.name for f in dataclasses.fields(dc_cls)}
            return dc_cls(**{
                k: tuple(v) if isinstance(v, list) else v
                for k, v in sub.items() if k in names
            })

        return cls(
            model=_coerce(ModelConfig, d.get("model", {})),
            fingerprint=_coerce(FingerprintConfig, d.get("fingerprint", {})),
            attribution=_coerce(AttributionConfig, d.get("attribution", {})),
            attack=_coerce(AttackConfig, d.get("attack", {})),
            run=_coerce(RunConfig, d.get("run", {})),
        )
