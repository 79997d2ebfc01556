"""Measured end-to-end user identification: solve real images, decode
WHICH user's key they carry, sweep the registry size.

Turns the bit-accuracy tables (eval/study.py) into the deployment
number that actually matters: "with this generator and key budget, how
many users can the provider distinguish reliably?"  One batch of solves
is reused across the whole registry-size curve: all planted users come
from the registry's first ``n_min`` entries, so every larger prefix
only adds distractors --- identification accuracy vs N from a single
solver pass.

The reference has no counterpart (its accuracy is per-image exact
match, /root/reference/src/main.py:139-148); the decoding layer is
fingerprint/keys.py (soft ML decode from solver logits vs hard Hamming).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AttributionConfig, FingerprintConfig
from ..fingerprint import attribute as attr
from ..fingerprint import embed as fpe
from ..fingerprint import pipeline as pl
from ..fingerprint.keys import KeyRegistry, identification_error_union_bound
from .study import wilson_ci


def identification_point(
    pipe: pl.Pipeline,
    *,
    key_len: int = 32,
    sigma: float = 6.0,
    shift: Optional[int] = None,
    min_distance: int = 6,
    registry_sizes: Sequence[int] = (10, 100, 1000),
    samples: int = 20,
    steps: int = 2000,
    n_starts: int = 20,
    seed: int = 100,
    dtype: str = "bfloat16",
    chunk_samples: int = 0,
    clip_targets: bool = True,
    attack: str = "None",
    attack_aware: bool = False,
    issuance: str = "rejection",
    init: str = "lhs",
    encoder_steps: int = 1500,
    encoder_jitter: float = 0.25,
) -> Dict[str, Any]:
    """Generate ``samples`` images planted with registry keys, solve them
    once, and decode the user against every registry prefix size.

    Planted users are drawn round-robin from the first
    ``min(registry_sizes)`` users so the same solves serve every N.
    Returns per-N soft/hard identification accuracy with Wilson CIs,
    mean soft margins, the measured per-bit error rate, and the union
    bound it implies at each N.
    """
    sizes = sorted(set(int(n) for n in registry_sizes))
    if sizes[0] < 2:
        raise ValueError("registry sizes must be >= 2")
    if issuance == "rm":
        # structured Reed-Muller issuance: guaranteed pairwise distance
        # 2^(m-r) by construction, scales to N ~ 4e6 where the O(N^2)
        # rejection sampler cannot go (fingerprint/keys.py issue_rm);
        # min_distance comes from the code, the argument is ignored
        reg = KeyRegistry.issue_rm(sizes[-1], key_len, seed=seed)
        min_distance = reg.min_distance
    elif issuance == "rejection":
        reg = KeyRegistry.issue(
            sizes[-1], key_len, min_distance=min_distance, seed=seed
        )
    else:
        raise ValueError(f"unknown issuance {issuance!r}")

    d = pipe.mcfg.style_space_dim
    if shift is None:
        shift = d - key_len
    fp = FingerprintConfig(key_len=key_len, shift=shift, sigma=sigma)
    basis = fpe.build_basis(pipe.pca, fp)
    # attack_aware mirrors eval/study.py: the solver pushes its estimate
    # through the deterministic channel model of the known attack
    # (AttributionConfig.solver_attack) --- measured +18.6pp bit acc on
    # Crop at kl=32 (BASELINE round-4 campaign), so the attacked
    # identification curve is solved in the mode a deployment would use.
    acfg = AttributionConfig(
        steps=steps, n_starts=n_starts, loss="mse",
        solver_attack=(attack if attack_aware else "None"),
    )

    rng = jax.random.fold_in(jax.random.PRNGKey(seed), 0xFACE)
    k_a, k_opt = jax.random.split(rng)
    users = np.arange(samples) % sizes[0]  # round-robin planted users
    bits = jnp.asarray(reg.keys[users], jnp.float32)  # [S, K]
    alpha = fpe.sample_alpha(k_a, basis, samples)
    _, wx = fpe.embed(basis, alpha, bits)
    # trained generators emit ~[-1,1] and real deployments store clipped
    # u8 images (eval/study.py does the same); random-init TEST generators
    # emit +-5 and clipping would push targets off their manifold, so the
    # tiny-scale tests disable it
    targets = pl.synthesize(pipe, wx)
    if clip_targets:
        targets = jnp.clip(targets, -1.0, 1.0)
    atk_cfg = None
    if attack != "None":
        import dataclasses as _dc

        from ..attacks import make_attack
        from ..config import AttackConfig

        atk_cfg = _dc.replace(AttackConfig(), augmentation=attack)
        fn = make_attack(atk_cfg, is_train=False)
        targets = fn(targets, jax.random.fold_in(rng, 0xA77))
    # host copy: per-offset device-array slicing compiles per chunk start
    # (remote-compile stall hazard; see cli/attribute.py)
    targets = np.asarray(jax.lax.stop_gradient(targets))

    # amortized encoder init (fingerprint/encoder.py): train the inverter
    # on the true stochastic attack channel and start every restart chain
    # around its prediction --- measured better at every operating point
    # (BASELINE round-5 encoderinit study)
    enc_meta: Dict[str, Any] = {}
    alpha_init = key_init = None
    if init == "encoder":
        import time as _time

        from ..fingerprint import encoder as enc_mod

        t_enc = _time.time()
        ecfg = enc_mod.EncoderConfig(
            steps=encoder_steps, jitter=encoder_jitter,
            batch=enc_mod.auto_batch(pipe.mcfg.img_size),
        )
        k_enc, k_einit = jax.random.split(jax.random.fold_in(rng, 7))
        enc_params, enc_curve = enc_mod.train_encoder(
            k_enc, pipe.gen_params, basis, pipe.noise,
            mcfg=pipe.mcfg, ecfg=ecfg, attack=attack, attack_cfg=atk_cfg,
        )
        tgt_dev = jnp.asarray(targets)
        a0, k0 = enc_mod.encoder_solve_init(
            enc_params, basis, tgt_dev, n_starts, k_einit,
            jitter=encoder_jitter,
        )
        alpha_init, key_init = np.asarray(a0), np.asarray(k0)
        enc_acc = np.asarray(
            enc_mod.encoder_bit_accuracy(enc_params, tgt_dev, bits)
        )
        enc_meta = {
            "init": "encoder",
            "encoder_steps": encoder_steps,
            "encoder_jitter": encoder_jitter,
            "encoder_bit_acc": float(enc_acc.mean()),
            "encoder_final_train_loss": float(np.asarray(enc_curve)[-1]),
            "encoder_train_wall_s": round(_time.time() - t_enc, 1),
        }

    chunk = chunk_samples or samples
    logits_all, bits_all = [], []
    for c0 in range(0, samples, chunk):
        c1 = min(c0 + chunk, samples)
        init_kw = {}
        if alpha_init is not None:
            init_kw = dict(
                alpha_init=jnp.asarray(alpha_init[c0:c1]),
                key_init=jnp.asarray(key_init[c0:c1]),
            )
        res = attr.attribute_chunked(
            pipe.gen_params, None, basis, pipe.noise, targets[c0:c1],
            jax.random.fold_in(k_opt, c0),
            mcfg=pipe.mcfg, acfg=acfg, dtype=dtype,
            attack_cfg=(atk_cfg if attack_aware else None),
            **init_kw,
        )
        logits_all.append(np.asarray(res.key_logits, np.float64))
        bits_all.append(np.asarray(res.key_bits))
    logits = np.concatenate(logits_all)  # [S, K]
    dec_bits = np.concatenate(bits_all)  # [S, K]

    true = reg.keys[users].astype(dec_bits.dtype)
    p_bit = float((dec_bits != true).mean())

    per_n = []
    for n in sizes:
        # Permute each prefix before matching: planted users live at the
        # low indices, and both decoders break ties toward the LOWER index
        # (stable argsort) --- matching on the raw prefix would resolve
        # distance ties systematically in the true user's favor and
        # overstate accuracy.  A seeded shuffle makes tie-breaking
        # index-neutral, as it is in deployment.
        perm = np.random.default_rng(seed * 1_000_003 + n).permutation(n)
        inv = np.argsort(perm)  # original index -> shuffled position
        sub = KeyRegistry(
            keys=reg.keys[:n][perm],
            names=[reg.names[i] for i in perm],
            min_distance=reg.min_distance,
        )
        soft_ok = hard_ok = 0
        margins = []
        for s in range(samples):
            si, _, margin = sub.match_soft(logits[s])
            hi, _, _ = sub.match_hard(dec_bits[s])
            soft_ok += si == inv[users[s]]
            hard_ok += hi == inv[users[s]]
            margins.append(margin)
        slo, shi = wilson_ci(soft_ok, samples)
        per_n.append({
            "registry_size": n,
            "soft_accuracy": soft_ok / samples,
            "soft_ci95": [slo, shi],
            "hard_accuracy": hard_ok / samples,
            "mean_margin_nats": float(np.mean(margins)),
            "min_margin_nats": float(np.min(margins)),
            "union_bound_error": identification_error_union_bound(
                p_bit, n, key_len, min_distance
            ),
        })

    return {
        "img_size": pipe.mcfg.img_size,
        "channel_max": pipe.mcfg.channel_max,
        "ckpt": pipe.mcfg.ckpt,
        "key_len": key_len,
        "sigma": float(sigma),
        "shift": int(shift),
        "min_distance": min_distance,
        "issuance": issuance,
        "attack": attack,
        "attack_aware": bool(attack_aware),
        "samples": samples,
        "steps": steps,
        "n_starts": n_starts,
        "distinct_users": int(sizes[0]),
        "measured_p_bit": p_bit,
        "mean_bit_acc": 1.0 - p_bit,
        "by_registry_size": per_n,
        **enc_meta,
    }
