"""High-level fingerprinting pipeline: the TPU equivalent of the
reference's ``GetGen`` (/root/reference/src/generator.py:18-198) ---
minus its structural quirks: the reference builds the Generator and runs
the 10k-sample PCA once per *class instance*, so `main.py` loads the
checkpoint three times and runs PCA twice (src/generator.py:49-52,37-38,
src/PCA.py:39-42, SURVEY.md section 1).  Here everything is built exactly
once into an immutable bundle of device arrays.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..attacks import AttackFn, apply_attack, make_attack
from ..config import AttackConfig, FingerprintConfig, ModelConfig
from ..losses import lpips as lpips_mod
from ..models import stylegan2 as sg2
from .embed import (
    FingerprintBasis,
    build_basis,
    embed,
    sample_alpha,
    sample_key_bits,
)
from .pca import PCABasis, perform_pca_for_params


@dataclasses.dataclass
class Pipeline:
    """Immutable bundle: generator weights + fingerprint basis + noise."""

    mcfg: ModelConfig
    fpcfg: FingerprintConfig
    gen_params: Any
    basis: FingerprintBasis
    pca: PCABasis
    noise: Tuple[jax.Array, ...]
    lpips_params: Optional[Any] = None
    attack: Optional[AttackFn] = None
    # BigGAN extras (ref src/generator.py:58-64): class conditioning + truncation
    biggan_cfg: Optional[Any] = None
    class_onehot: Optional[jax.Array] = None
    truncation: float = 0.4


from functools import lru_cache


@lru_cache(maxsize=None)
def _mapping_fn_for(lr_mlp: float) -> Callable:
    """Stable (cached) callable per lr_mlp so jit's static-arg cache hits."""

    def apply(params, z):
        return sg2.mapping_network(params, z, lr_mlp)

    return apply


def build_pipeline(
    key: jax.Array,
    mcfg: ModelConfig,
    fpcfg: FingerprintConfig,
    attack_cfg: Optional[AttackConfig] = None,
    gen_params: Any = None,
    ckpt_path: Optional[str] = None,
    lpips_params: Any = None,
    want_lpips: bool = True,
    biggan_cfg: Any = None,
    truncation: float = 0.4,
) -> Pipeline:
    """Load/initialize the generator, run device-side PCA, slice the basis,
    draw the fixed synthesis noise (ref src/utils.py:128-138 --- here all
    noise derives from one PRNG key instead of the reference's mix of
    seeded and unseeded host RNG), and prepare attacks/LPIPS.

    ``model == "biggan"`` follows the reference's second family
    (src/generator.py:53-64): PCA over truncated-noise latents
    (src/PCA.py:76-84), class conditioning from --biggan_label,
    truncation 0.4."""
    if mcfg.model not in ("sg2", "biggan"):
        raise ValueError(f"Not Avail GANs: {mcfg.model!r}")  # ref src/generator.py:67

    k_init, k_pca, k_noise, k_lpips = jax.random.split(key, 4)

    if mcfg.model == "biggan":
        from ..models import biggan as bg
        from .pca import pca_from_truncated_noise

        bg_cfg = biggan_cfg or bg.BigGANConfig()
        if gen_params is None:
            if ckpt_path is not None:
                import torch

                sd = torch.load(ckpt_path, map_location="cpu", weights_only=False)
                sd = {k: np.asarray(v) for k, v in sd.items()}
                gen_params = jax.tree.map(
                    jnp.asarray, bg.params_from_torch_state_dict(sd, bg_cfg)
                )
            else:
                gen_params = bg.init_biggan_params(k_init, bg_cfg)
        pca = pca_from_truncated_noise(
            k_pca, truncation, fpcfg.n_pca_samples, bg_cfg.z_dim
        )
        basis = build_basis(pca, fpcfg)
        onehot = jnp.asarray(
            bg.one_hot_from_name(mcfg.biggan_label, bg_cfg.num_classes, 1)
        )
        return Pipeline(
            mcfg=mcfg,
            fpcfg=fpcfg,
            gen_params=gen_params,
            basis=basis,
            pca=pca,
            noise=(),
            lpips_params=(
                lpips_params
                if lpips_params is not None
                else (lpips_mod.init_lpips_params(k_lpips) if want_lpips else None)
            ),
            attack=make_attack(attack_cfg, is_train=False) if attack_cfg else None,
            biggan_cfg=bg_cfg,
            class_onehot=onehot,
            truncation=truncation,
        )

    if gen_params is None:
        if ckpt_path is not None:
            from ..checkpoints.rosinality import load_generator

            gen_params = jax.tree.map(jnp.asarray, load_generator(ckpt_path, mcfg))
        else:
            gen_params = sg2.init_generator_params(k_init, mcfg)

    pca = perform_pca_for_params(
        gen_params,
        k_pca,
        _mapping_fn_for(mcfg.lr_mlp),
        fpcfg.n_pca_samples,
        mcfg.style_space_dim,
    )
    basis = build_basis(pca, fpcfg)
    noise = tuple(sg2.make_noise(k_noise, mcfg.img_size))

    if lpips_params is None and want_lpips:
        lpips_params = lpips_mod.init_lpips_params(k_lpips)

    attack = None
    if attack_cfg is not None:
        attack = make_attack(attack_cfg, is_train=False)

    return Pipeline(
        mcfg=mcfg,
        fpcfg=fpcfg,
        gen_params=gen_params,
        basis=basis,
        pca=pca,
        noise=noise,
        lpips_params=lpips_params,
        attack=attack,
    )


@partial(jax.jit, static_argnames=("mcfg", "batch", "key_len"))
def _generate_core(
    gen_params,
    basis: FingerprintBasis,
    noise,
    rng: jax.Array,
    *,
    mcfg: ModelConfig,
    batch: int,
    key_len: int,
):
    k_alpha, k_bits = jax.random.split(rng)
    alpha = sample_alpha(k_alpha, basis, batch)
    bits = sample_key_bits(k_bits, key_len, batch)
    w0, wx = embed(basis, alpha, bits)
    imgs, _ = sg2.generate(
        gen_params, [wx], mcfg, input_is_latent=True, noise=noise
    )
    return imgs, w0, wx, bits, alpha


def generate_fingerprinted(
    pipe: Pipeline, rng: jax.Array, batch: int = 1
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """(imgs, w0, wx, key_bits, alpha): random content + random key.

    Ref ``generate_with_alpha`` (src/generator.py:69-107) with the random
    alpha draw of src/main.py:122 folded in.
    """
    if pipe.mcfg.model == "biggan":
        k_alpha, k_bits = jax.random.split(rng)
        alpha = sample_alpha(k_alpha, pipe.basis, batch)
        bits = sample_key_bits(k_bits, pipe.fpcfg.key_len, batch)
        w0, wx = embed(pipe.basis, alpha, bits)
        imgs = synthesize(pipe, wx)
        return imgs, w0, wx, bits, alpha
    return _generate_core(
        pipe.gen_params,
        pipe.basis,
        pipe.noise,
        rng,
        mcfg=pipe.mcfg,
        batch=batch,
        key_len=pipe.fpcfg.key_len,
    )


@partial(jax.jit, static_argnames=("mcfg",))
def _synthesize_core(gen_params, noise, w, *, mcfg: ModelConfig):
    imgs, _ = sg2.generate(gen_params, [w], mcfg, input_is_latent=True, noise=noise)
    return imgs


def synthesize(pipe: Pipeline, w: jax.Array) -> jax.Array:
    """Image for an explicit latent w [B, D] with the pipeline's fixed
    noise.  Ref ``generate_image`` (src/generator.py:170-183), which
    routes sg2 / biggan the same way."""
    if pipe.mcfg.model == "biggan":
        from ..models import biggan as bg

        onehot = jnp.broadcast_to(
            pipe.class_onehot, (w.shape[0],) + pipe.class_onehot.shape[1:]
        )
        return bg.generate(pipe.gen_params, w, onehot, pipe.truncation, pipe.biggan_cfg)
    return _synthesize_core(pipe.gen_params, pipe.noise, w, mcfg=pipe.mcfg)


def augment(pipe: Pipeline, imgs: jax.Array, rng: Optional[jax.Array] = None) -> jax.Array:
    """Apply the configured eval-mode attack (identity if none).
    Ref ``GetGen.augmentation`` (src/generator.py:163-168)."""
    return apply_attack(pipe.attack, imgs, rng)


def get_watermarked_images(
    pipe: Pipeline, rng: jax.Array, batch: int = 1
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(original_img, watermarked_img, perturbed_img) float [-1,1] ---
    ref ``get_watermarked_image`` (src/generator.py:185-198), which in the
    reference only works under ``__main__`` because it reads module
    globals."""
    k_gen, k_atk = jax.random.split(rng)
    imgs, w0, wx, bits, _ = generate_fingerprinted(pipe, k_gen, batch)
    original = synthesize(pipe, w0)
    perturbed = augment(pipe, imgs, k_atk)
    return original, imgs, perturbed


def synthesize_mixed(
    pipe: Pipeline, w_content: jax.Array, w_fingerprint: jax.Array,
    inject_index: Optional[int] = None,
) -> jax.Array:
    """Style-mixing synthesis: content style for the first ``inject_index``
    layers, fingerprinted style for the rest.  The reference carries this
    switch (``style_mixing``, src/generator.py:92-95, default off) with
    inject_index = num_block - 1, and num_block = log_size*2 - 2
    (src/generator.py:45) equals n_latent (src/model.py:475) --- so the
    default puts the fingerprinted style in ONLY the last slot."""
    if pipe.mcfg.model != "sg2":
        raise ValueError("style mixing is an sg2 feature")
    if inject_index is None:
        inject_index = pipe.mcfg.n_latent - 1
    imgs, _ = sg2.generate(
        pipe.gen_params,
        [w_content, w_fingerprint],
        pipe.mcfg,
        input_is_latent=True,
        inject_index=inject_index,
        noise=pipe.noise,
    )
    return imgs


def generate_with_latent(
    pipe: Pipeline, rng: jax.Array, latent_w: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Fingerprint an *arbitrary* w: project onto the content subspace,
    then add the key offset.  Ref ``generate_with_latent``
    (src/generator.py:114-146)."""
    from .embed import key_offset, project_latent

    bits = sample_key_bits(rng, pipe.fpcfg.key_len, latent_w.shape[0])
    w0 = project_latent(pipe.basis, latent_w)
    wx = w0 + key_offset(pipe.basis, bits)
    imgs = synthesize(pipe, wx)
    return imgs, w0, wx, bits
