"""Amortized inversion encoder: a learned initializer for the attribution
solve.

The round-4 measurement campaign diagnosed the key_len=64 exact-match wall
as *wrong-basin* failures: soft bit-polish from the converged state moves
nothing, more restarts are the only lever that helps, and the composed
best-recipe stack was a measured negative (BASELINE.md, "Round-4
measurement campaign").  This module attacks that diagnosis directly:
instead of initializing the ``(alpha, key)`` solve from blind centered-LHS
draws (ref /root/reference/src/main.py:46-52), train a small convolutional
encoder ``E(x) -> (alpha_hat, key_logits)`` on self-supervised pairs that
the frozen pipeline generates for free, and start every restart chain in
the neighborhood of the encoder's prediction.

The reference has no counterpart — its solver is random-init only
(/root/reference/src/main.py:45-89); this is a beyond-parity subsystem in
the classic hybrid encoder+optimization GAN-inversion mold.

TPU shape notes: the encoder is a plain NHWC stride-2 conv stack (every
conv is MXU-friendly: channel counts are multiples of 32 rising to 256),
training data is generated *inside* the jitted training step (generator
forward only — no gradient flows into the frozen generator), and the whole
training loop is one ``lax.scan`` program, so the per-dispatch tunnel
overhead is paid once.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import ModelConfig
from ..models import stylegan2 as sg2
from ..utils.lhs import lhs_alpha_init_batch
from .embed import FingerprintBasis, embed

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    """Hyperparameters for the amortized inverter.

    ``width``: stem channel count (doubles per stride-2 stage, capped at
    ``max_width``).  ``steps``/``batch``: supervised training budget —
    every step renders a fresh batch from the frozen generator, so the
    dataset is effectively infinite and never materialized.
    """

    width: int = 64
    max_width: int = 256
    head_dim: int = 256
    steps: int = 1500
    batch: int = 64
    lr: float = 2e-3
    # global-norm gradient clip: measured necessity, not hygiene — the
    # 6-stage 256px stack at batch 16 diverged without it (train loss
    # 2.4e5, decode at chance, and the diverged init dragged the solve
    # itself to chance 0.52 vs 0.86 blind)
    grad_clip: float = 1.0
    key_loss_weight: float = 1.0
    jitter: float = 0.25
    logit_clip: float = 2.0


def _conv(x: jax.Array, w: jax.Array, stride: int = 1) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def _n_stages(img_size: int) -> int:
    """Stride-2 stages down to a 4x4 trunk."""
    n = 0
    while img_size > 4:
        img_size //= 2
        n += 1
    return n


def init_encoder(
    rng: jax.Array,
    img_size: int,
    d_alpha: int,
    key_len: int,
    ecfg: EncoderConfig = EncoderConfig(),
) -> Params:
    """He-initialized parameter pytree for ``apply_encoder``."""
    ks = jax.random.split(rng, _n_stages(img_size) + 4)
    params: Params = {"convs": []}

    def he(k, shape):
        fan_in = shape[0] * shape[1] * shape[2] if len(shape) == 4 else shape[0]
        return jax.random.normal(k, shape) * jnp.sqrt(2.0 / fan_in)

    c_in, c = 3, ecfg.width
    params["stem"] = he(ks[0], (3, 3, c_in, c))
    size = img_size
    for i in range(_n_stages(img_size)):
        c_out = min(c * 2, ecfg.max_width)
        params["convs"].append(
            {"down": he(ks[1 + i], (3, 3, c, c_out)), "b": jnp.zeros((c_out,))}
        )
        c = c_out
        size //= 2
    params["trunk"] = he(ks[-3], (c, ecfg.head_dim))
    params["trunk_b"] = jnp.zeros((ecfg.head_dim,))
    params["head_alpha"] = he(ks[-2], (ecfg.head_dim, d_alpha)) * 0.1
    params["head_alpha_b"] = jnp.zeros((d_alpha,))
    params["head_key"] = he(ks[-1], (ecfg.head_dim, key_len)) * 0.1
    params["head_key_b"] = jnp.zeros((key_len,))
    return params


def apply_encoder(params: Params, imgs: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """imgs [B, H, W, 3] in [-1, 1] -> (alpha_white [B, D-K], key_logits [B, K]).

    ``alpha_white`` is the content coefficient in per-axis std units
    (alpha / sigma_rest): predicting the whitened coordinate makes every
    axis an equal share of the regression loss regardless of the
    generator's spectrum.
    """
    x = _conv(imgs.astype(jnp.float32), params["stem"])
    x = jax.nn.leaky_relu(x, 0.2)
    for layer in params["convs"]:
        x = _conv(x, layer["down"], stride=2) + layer["b"]
        x = jax.nn.leaky_relu(x, 0.2)
    x = jnp.mean(x, axis=(1, 2))  # [B, C] global average pool (4x4 trunk)
    x = jax.nn.leaky_relu(x @ params["trunk"] + params["trunk_b"], 0.2)
    alpha_white = x @ params["head_alpha"] + params["head_alpha_b"]
    key_logits = x @ params["head_key"] + params["head_key_b"]
    return alpha_white, key_logits


@partial(
    jax.jit,
    static_argnames=("mcfg", "ecfg", "attack", "attack_cfg"),
)
def _train_chunk(
    enc: Params,
    opt_state,
    keys: jax.Array,
    gen_params: Params,
    basis: FingerprintBasis,
    noise: Tuple[jax.Array, ...],
    *,
    mcfg: ModelConfig,
    ecfg: EncoderConfig,
    attack: str = "None",
    attack_cfg=None,
):
    """One jitted ``lax.scan`` segment of encoder training (see
    ``train_encoder``).  Each scan step draws ``(alpha, k)`` from the
    embedding priors (alpha ~ sigma_rest * N(0,1) per src/main.py:122
    semantics; k ~ U{0,1}), renders the fingerprinted image with the
    pipeline's fixed noise, optionally pushes it through the
    TRUE stochastic attack channel (``attacks.make_attack`` eval mode —
    see the design note at the channel construction below), and
    regresses (whitened alpha, key logits)."""
    d_alpha = basis.sigma_rest.shape[0]
    key_len = basis.v_cap.shape[0]
    nl = sg2.n_latent(mcfg.img_size)

    # The TRUE (stochastic) channel, not the solver's deterministic
    # differentiable model: the encoder never backprops through the
    # channel (rendered pairs are stop_gradient inputs), so it can and
    # must train on what attacked targets actually look like.  Measured
    # failure of the alternative: training through make_solver_attack's
    # Noise channel (= identity) left the encoder noise-blind and its
    # init REGRESSED the Noise solve 0.947 -> 0.730 vs blind LHS.
    atk = None
    if attack != "None":
        import dataclasses as _dc

        from ..attacks import make_attack
        from ..config import AttackConfig

        cfg = attack_cfg if attack_cfg is not None else AttackConfig()
        atk = make_attack(
            _dc.replace(cfg, augmentation=attack), is_train=False
        )

    tx = optax.chain(
        optax.clip_by_global_norm(ecfg.grad_clip), optax.adam(ecfg.lr)
    )

    def render(k_step):
        ka, kb, kc = jax.random.split(k_step, 3)
        alpha = jax.random.normal(ka, (ecfg.batch, d_alpha)) * basis.sigma_rest
        bits = jax.random.randint(kb, (ecfg.batch, key_len), 0, 2).astype(
            jnp.float32
        )
        _, wx = embed(basis, alpha, bits)
        wplus = jnp.repeat(wx[:, None, :], nl, axis=1).astype(jnp.bfloat16)
        imgs = sg2.synthesis(
            gen_params, wplus, noise, blur_kernel=mcfg.blur_kernel
        )
        imgs = jnp.clip(imgs.astype(jnp.float32), -1.0, 1.0)
        if atk is not None:
            imgs = atk(imgs, kc)
        return jax.lax.stop_gradient(imgs), alpha, bits

    def loss_fn(p, imgs, alpha, bits):
        a_hat, k_logits = apply_encoder(p, imgs)
        a_tgt = alpha / basis.sigma_rest
        l_alpha = jnp.mean(jnp.square(a_hat - a_tgt))
        l_key = jnp.mean(
            optax.sigmoid_binary_cross_entropy(k_logits, bits)
        )
        return l_alpha + ecfg.key_loss_weight * l_key

    def step(carry, k_step):
        p, st = carry
        imgs, alpha, bits = render(k_step)
        loss, grads = jax.value_and_grad(loss_fn)(p, imgs, alpha, bits)
        updates, st = tx.update(grads, st, p)
        p = optax.apply_updates(p, updates)
        return (p, st), loss

    (enc, opt_state), curve = jax.lax.scan(step, (enc, opt_state), keys)
    return enc, opt_state, curve


# Largest single-scan segment: the 1500-step program is the measured-good
# envelope on the tunneled chip; a single 6000-step scan reproducibly
# crashed the TPU worker (round-5), so longer budgets run as a host loop
# re-dispatching the same chunk-sized executable (dispatch overhead
# ~0.5s per segment — noise next to the training itself).
_TRAIN_CHUNK = 1500


def auto_batch(img_size: int) -> int:
    """Memory-envelope default for ``EncoderConfig.batch``: a 64-image
    render inside the training scan is measured-good through 128px but
    crashed the TPU worker at 256px (same single-chip envelope
    cli/study._auto_chunk guards for solves).  Holds batch x pixels at
    the 128px/64 level; callers wanting a specific batch pass it
    explicitly (and should scale steps inversely to keep the sample
    count — the measured saturation point is ~6000 steps x batch 64)."""
    if img_size <= 128:
        return 64
    return max(4, (64 * 128 * 128) // (img_size * img_size))


def train_encoder(
    rng: jax.Array,
    gen_params: Params,
    basis: FingerprintBasis,
    noise: Tuple[jax.Array, ...],
    *,
    mcfg: ModelConfig,
    ecfg: EncoderConfig = EncoderConfig(),
    attack: str = "None",
    attack_cfg=None,
    steps_override: Optional[int] = None,
) -> Tuple[Params, jax.Array]:
    """Train the inverter on frozen-generator pairs.

    Runs as fixed-size jitted ``lax.scan`` segments (``_train_chunk``)
    with a host loop carrying (params, opt_state) across segments, so
    any training budget reuses one compiled program.  Returns
    ``(encoder_params, loss_curve[steps])``.
    """
    steps = int(steps_override) if steps_override is not None else ecfg.steps
    d_alpha = basis.sigma_rest.shape[0]
    key_len = basis.v_cap.shape[0]

    k_init, k_train = jax.random.split(rng)
    enc = init_encoder(k_init, mcfg.img_size, d_alpha, key_len, ecfg)
    opt_state = optax.chain(
        optax.clip_by_global_norm(ecfg.grad_clip), optax.adam(ecfg.lr)
    ).init(enc)

    keys = jax.random.split(k_train, steps)
    curves = []
    for c0 in range(0, steps, _TRAIN_CHUNK):
        seg = keys[c0 : c0 + _TRAIN_CHUNK]
        enc, opt_state, curve = _train_chunk(
            enc, opt_state, seg, gen_params, basis, noise,
            mcfg=mcfg, ecfg=ecfg, attack=attack, attack_cfg=attack_cfg,
        )
        curves.append(curve)
    return enc, jnp.concatenate(curves)


def encoder_solve_init(
    enc_params: Params,
    basis: FingerprintBasis,
    targets: jax.Array,
    n_starts: int,
    rng: jax.Array,
    *,
    jitter: float = 0.25,
    logit_clip: float = 2.0,
) -> Tuple[jax.Array, jax.Array]:
    """Build ``(alpha_init [S, n, D-K], key_init [S, n, K])`` for
    ``attribute(..., alpha_init=, key_init=)``.

    Restart 0 starts exactly at the encoder's prediction; restarts 1..n-1
    explore its neighborhood with a centered-LHS cloud scaled to
    ``jitter * sigma_rest`` (the same stratified design as the blind
    solver, shrunk around the amortized estimate).  Key logits are the
    encoder's, clipped to ``±logit_clip`` so a confidently-wrong bit stays
    recoverable by the continuous solve.
    """
    a_white, k_logits = apply_encoder(enc_params, targets)
    alpha_hat = a_white * basis.sigma_rest  # [S, D-K]
    s_ = targets.shape[0]
    cloud = jitter * lhs_alpha_init_batch(rng, s_, n_starts, basis.sigma_rest)
    cloud = cloud.at[:, 0].set(0.0)
    alpha0 = alpha_hat[:, None, :] + cloud
    key0 = jnp.clip(k_logits, -logit_clip, logit_clip)
    key0 = jnp.broadcast_to(key0[:, None, :], (s_, n_starts, key0.shape[-1]))
    return alpha0, key0


def encoder_bit_accuracy(
    enc_params: Params, targets: jax.Array, true_bits: jax.Array
) -> jax.Array:
    """Zero-step decode: the encoder's own per-sample key accuracy [S]."""
    _, k_logits = apply_encoder(enc_params, targets)
    pred = (k_logits > 0).astype(jnp.float32)
    return jnp.mean((pred == true_bits).astype(jnp.float32), axis=-1)
