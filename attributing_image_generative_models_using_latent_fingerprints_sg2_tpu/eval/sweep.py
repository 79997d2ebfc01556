"""Capacity-quality sweep driver.

BASELINE.json config 3 asks for a key_len / sigma / shift grid measuring
the capacity-robustness-quality tradeoff.  For each grid point this
driver:

1. builds the fingerprint basis at (key_len, sigma, shift),
2. generates fingerprinted samples + their content-only counterparts,
3. measures watermark visibility (LPIPS and MSE between w0 and wx images,
   optionally FID between populations),
4. runs attribution and records bit / exact-match accuracy.

One generator + one PCA serve the whole grid (basis slicing is free),
unlike the reference which would rebuild everything per configuration.
"""

from __future__ import annotations

import dataclasses
import itertools
import json
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from ..config import AttributionConfig, FingerprintConfig, ModelConfig
from ..fingerprint import attribute as attr
from ..fingerprint import embed as fpe
from ..fingerprint import pipeline as pl
from ..losses import lpips as lpips_mod


@dataclasses.dataclass
class SweepPoint:
    key_len: int
    sigma: float
    shift: int
    mean_bit_acc: float
    attribution_acc: float
    watermark_lpips: float
    watermark_mse: float
    mean_latent_cos: float = float("nan")  # recovered-vs-true content latent
    fid: Optional[float] = None
    fid_disc: Optional[float] = None  # trained-discriminator features


def run_sweep(
    key: jax.Array,
    mcfg: ModelConfig,
    *,
    key_lens: Sequence[int] = (32, 64, 128),
    sigmas: Sequence[float] = (1.0,),
    shifts: Optional[Sequence[int]] = None,
    samples: int = 4,
    acfg: Optional[AttributionConfig] = None,
    ckpt_path: Optional[str] = None,
    with_fid: bool = False,
    dtype: str = "float32",
    lpips_params=None,
    disc_params=None,
    clip_targets: bool = True,
) -> List[SweepPoint]:
    acfg = acfg or AttributionConfig(steps=200, n_starts=4, loss="mse")
    if acfg.solver_attack != "None":
        raise ValueError(
            "run_sweep solves CLEAN targets (capacity-vs-visibility grid); "
            "attack-aware solving (solver_attack="
            f"{acfg.solver_attack!r}) would push the estimate through a "
            "channel the targets never passed --- use eval.study.eval_point"
            "(attack=..., attack_aware=True) for attacked-target studies"
        )
    k_build, k_run = jax.random.split(key)

    # one model + one PCA for the whole grid
    base_fp = FingerprintConfig(key_len=key_lens[0], shift=0)
    pipe = pl.build_pipeline(
        k_build, mcfg, base_fp, ckpt_path=ckpt_path,
        want_lpips=(acfg.loss == "perceptual"),
    )
    if lpips_params is None:
        lpips_params = pipe.lpips_params or lpips_mod.init_lpips_params(
            jax.random.PRNGKey(7)
        )
    inc_params = None
    if with_fid:
        from .fid import fid_between
        from .inception import init_inception_params

        inc_params = init_inception_params(jax.random.PRNGKey(11))

    d = mcfg.style_space_dim
    results: List[SweepPoint] = []
    for key_len, sigma in itertools.product(key_lens, sigmas):
        grid_shifts = shifts if shifts is not None else (d - key_len,)
        for shift in grid_shifts:
            if shift + key_len > d:
                continue
            fp = FingerprintConfig(key_len=key_len, shift=shift, sigma=sigma)
            basis = fpe.build_basis(pipe.pca, fp)
            rng = jax.random.fold_in(k_run, hash((key_len, shift)) % (1 << 30))
            k_a, k_b, k_opt = jax.random.split(rng, 3)
            alpha = fpe.sample_alpha(k_a, basis, samples)
            bits = fpe.sample_key_bits(k_b, key_len, samples)
            w0, wx = fpe.embed(basis, alpha, bits)
            imgs_wx = pl.synthesize(pipe, wx)
            imgs_w0 = pl.synthesize(pipe, w0)
            if clip_targets:
                # deployment stores clipped u8 images --- measure both the
                # visibility metrics and the solve under the same condition
                # as eval_point / identification_point (their targets clip
                # too), so capacity rows are comparable to headline rows.
                # Random-init TEST generators emit +-5 and clipping pushes
                # targets off-manifold --- tiny-scale callers disable it.
                imgs_wx = jnp.clip(imgs_wx, -1.0, 1.0)
                imgs_w0 = jnp.clip(imgs_w0, -1.0, 1.0)

            wm_lpips = float(
                jnp.mean(lpips_mod.lpips(lpips_params, imgs_w0, imgs_wx))
            )
            wm_mse = float(jnp.mean((imgs_w0 - imgs_wx) ** 2))
            fid_val = None
            if with_fid:
                fid_val = fid_between(inc_params, imgs_w0, imgs_wx, batch=min(8, samples))
            fid_disc_val = None
            if disc_params is not None:
                from .fid import fid_between_disc

                fid_disc_val = fid_between_disc(
                    disc_params, imgs_w0, imgs_wx, batch=min(8, samples)
                )

            res = attr.attribute(
                pipe.gen_params,
                lpips_params if acfg.loss == "perceptual" else None,
                basis,
                pipe.noise,
                imgs_wx,
                k_opt,
                mcfg=mcfg,
                acfg=acfg,
                dtype=dtype,
            )
            ev = attr.evaluate_attribution(res, bits, basis=basis, true_w0=w0)
            results.append(
                SweepPoint(
                    key_len=key_len,
                    sigma=float(sigma),
                    shift=int(shift),
                    mean_bit_acc=float(ev["mean_bit_acc"]),
                    attribution_acc=float(ev["attribution_acc"]),
                    watermark_lpips=wm_lpips,
                    watermark_mse=wm_mse,
                    mean_latent_cos=float(ev["mean_latent_cos"]),
                    fid=fid_val,
                    fid_disc=fid_disc_val,
                )
            )
    return results


def sweep_to_json(points: List[SweepPoint]) -> str:
    return json.dumps([dataclasses.asdict(p) for p in points], indent=2)
