"""Gradient-based attribution: invert an image back to (alpha, key).

The reference solves, per test image and per Latin-Hypercube restart,

    min_{alpha, key}  LPIPS(target, G(w(alpha, sigmoid(key)))) + 0.1 * bound(alpha)

with Adam and an exponentially decayed LR, serially: a python loop over
``n`` restarts around a python loop over ``steps``, each step a separate
forward+backward (/root/reference/src/main.py:45-89).  Default workload:
100 samples x 20 restarts x 2000 steps = 4M generator fwd+bwd passes, one
at a time, plus *two* VGG16 forwards per step (the target's features are
recomputed every step, dist_model.py:109-117).

TPU re-design — the entire solver is ONE compiled program:

- all ``S`` samples and all ``n`` restarts are flattened into a single
  generator batch of B = S*n latents (Adam is elementwise, so one update
  over [B, ...] tensors IS B independent Adam chains);
- the optimization loop is a ``lax.fori_loop`` on device --- zero host
  round trips;
- target VGG features are extracted ONCE per sample and broadcast over
  restarts (halves VGG compute vs the reference);
- the loss reduces per-element, so gradients never mix restarts;
- samples shard over the device mesh ('data' axis); restarts can also
  shard.  No collectives are needed until the final per-sample argmin.

LR schedule: lr * exp(-decay * (i+1)) at step i (ref src/main.py:42-43,67).
Restart init: centered Latin Hypercube over [-sigma, sigma]^d
(ref src/main.py:46-52); key logits start at 0 (ref src/utils.py:19-21).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import AttributionConfig, ModelConfig
from ..losses import lpips as lpips_mod
from ..models import stylegan2 as sg2
from ..utils.lhs import lhs_alpha_init_batch
from .embed import FingerprintBasis, alpha_bound_penalty, bit_accuracy, content_latent, key_offset


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AttributionResult:
    """Per-sample solver output (best restart already selected)."""

    alpha: jax.Array  # [S, D-K]
    key_logits: jax.Array  # [S, K]
    key_bits: jax.Array  # [S, K] in {0,1}
    loss: jax.Array  # [S] best final loss
    losses_all: jax.Array  # [S, n] final loss of every restart
    best_start: jax.Array  # [S] argmin restart index
    # [steps] mean per-element loss per step: the observability the
    # reference gets from printing every 100 steps (src/main.py:74-76),
    # without host syncs.
    loss_curve: Optional[jax.Array] = None
    # [S, n, K] final key logits of EVERY restart (survivors only under
    # pruning).  The reference discards non-winning restarts
    # (src/main.py:84-87); keeping them is free and funds the
    # restart-coherence open-set statistic (model_attribution.py): the
    # restarts of a solve against the TRUE generator agree on the key,
    # restarts against a foreign generator decode incoherent keys.
    # NOTE: these logits are the POST-final-update optimizer state, while
    # losses_all is the final step's PRE-update loss — a one-optimizer-step
    # offset.  At the converged (decayed-LR) end of the schedule the
    # difference is negligible, but statistics built on key_logits_all must
    # not assume exact loss↔logit correspondence; under polish the winner's
    # returned key_bits can differ from that restart's raw vote here.
    key_logits_all: Optional[jax.Array] = None


def _make_optimizer(acfg: AttributionConfig) -> optax.GradientTransformation:
    def lr_schedule(count):
        return acfg.lr * jnp.exp(-acfg.lr_decay * (count + 1.0))

    # adam(b1=0.9, b2=0.999, eps=1e-8) matches torch.optim.Adam defaults
    # (ref src/main.py:56); eps outside the sqrt in both.
    return optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_schedule(lr_schedule),
        optax.scale(-1.0),
    )


_CTF_TAPS = 9  # static blur support; sigma anneals inside the fixed window


def _ctf_blur(x: jax.Array, sigma: jax.Array) -> jax.Array:
    """Separable Gaussian blur with a TRACED sigma (static 9-tap window).

    As sigma -> 0 the kernel degenerates to the identity tap, so one
    compiled program covers the whole coarse-to-fine schedule.  SAME
    zero-padding; x is [..., H, W, C]."""
    r = _CTF_TAPS // 2
    off = jnp.arange(-r, r + 1, dtype=jnp.float32)
    s = jnp.maximum(sigma, 1e-3)
    k1 = jnp.exp(-0.5 * jnp.square(off / s))
    k1 = (k1 / jnp.sum(k1)).astype(x.dtype)
    lead = x.shape[:-3]
    h, w, c = x.shape[-3:]
    xf = x.reshape((-1, h, w, c))
    kh = k1.reshape(_CTF_TAPS, 1, 1, 1) * jnp.ones((1, 1, 1, c), x.dtype)
    kw = k1.reshape(1, _CTF_TAPS, 1, 1) * jnp.ones((1, 1, 1, c), x.dtype)
    dn = ("NHWC", "HWIO", "NHWC")
    y = jax.lax.conv_general_dilated(
        xf, kh, (1, 1), ((r, r), (0, 0)), dimension_numbers=dn,
        feature_group_count=c,
    )
    y = jax.lax.conv_general_dilated(
        y, kw, (1, 1), ((0, 0), (r, r)), dimension_numbers=dn,
        feature_group_count=c,
    )
    return y.reshape(lead + (h, w, c))


def make_attribution_step(
    gen_params,
    lpips_params,
    basis: FingerprintBasis,
    noise,
    mcfg: ModelConfig,
    acfg: AttributionConfig,
    target_feats,
    targets,
    optimizer: optax.GradientTransformation,
    remat: bool = False,
    remat_lpips: bool = False,
    dtype: jnp.dtype = jnp.float32,
    biggan_cfg=None,
    class_onehot=None,
    truncation: float = 0.4,
    return_loss_fn: bool = False,
    attack_cfg=None,
) -> Callable:
    """Build the fused (loss+grad+update) step for flattened [S, n] restarts.

    ``target_feats``: tuple of [S, 1, h, w, c] normalized VGG features
    (perceptual mode) or None; ``targets``: [S, 1, H, W, 3] images (mse
    mode) or None.  With ``acfg.solver_attack != "None"`` the estimate is
    pushed through the deterministic channel model before the loss
    (attack-aware attribution; ``attack_cfg`` supplies the strengths).
    """
    nl = sg2.n_latent(mcfg.img_size)

    solver_attack = None
    if acfg.solver_attack != "None":
        from ..attacks import make_solver_attack
        from ..config import AttackConfig

        solver_attack = make_solver_attack(
            attack_cfg if attack_cfg is not None else AttackConfig(),
            acfg.solver_attack,
        )

    def per_elem_loss(opt_params, ctf_sigma=None) -> jax.Array:
        alpha, key_logits = opt_params["alpha"], opt_params["key"]  # [S,n,*]
        s_, n_ = alpha.shape[0], alpha.shape[1]
        k = jax.nn.sigmoid(key_logits)
        w0 = content_latent(basis, alpha.reshape(s_ * n_, -1))
        wx = w0 + key_offset(basis, k.reshape(s_ * n_, -1))
        if mcfg.model == "biggan":
            from ..models import biggan as bg

            onehot = jnp.broadcast_to(
                class_onehot, (wx.shape[0],) + class_onehot.shape[1:]
            )
            imgs = bg.generate(
                gen_params, wx.astype(dtype), onehot, truncation, biggan_cfg
            )
        else:
            wplus = jnp.repeat(wx[:, None, :], nl, axis=1).astype(dtype)
            imgs = sg2.synthesis(
                gen_params, wplus, noise, blur_kernel=mcfg.blur_kernel, remat=remat
            )  # [S*n, H, W, 3] in `dtype` (mixed precision: optimizer state
            # and loss accumulation stay f32, synthesis/VGG in `dtype`)
        if solver_attack is not None:
            # channel model in f32 (the JPEG DCT/quant chain loses too
            # much in bf16), back to the compute dtype for the loss path
            imgs = solver_attack(imgs.astype(jnp.float32)).astype(imgs.dtype)
        if acfg.loss == "perceptual":
            extract = lpips_mod.extract_raw_features
            if remat_lpips:
                # The LPIPS segment is HBM-bandwidth-bound (BASELINE.md
                # ablation): recomputing VGG activations in the backward
                # instead of spilling them trades spare MXU flops for the
                # dominant activation traffic.
                extract = jax.checkpoint(extract, static_argnums=())
            feats = extract(lpips_params, imgs)
            feats = [f.reshape((s_, n_) + f.shape[1:]) for f in feats]
            # fused normalize+diff+lin+mean head with analytic backward
            # (losses/lpips.py _fused_slice_distance); target features are
            # pre-normalized and constant (ref detaches them, main.py:124)
            per = lpips_mod.distance_from_raw_features(
                lpips_params, feats, target_feats
            )
        else:
            est = imgs.astype(jnp.float32).reshape((s_, n_) + imgs.shape[1:])
            tgt = targets
            if acfg.coarse_to_fine and ctf_sigma is not None:
                # anneal: compare blurred estimate/target early (smooth
                # landscape), exact images once sigma has decayed to 0
                est = _ctf_blur(est, ctf_sigma)
                tgt = _ctf_blur(tgt.astype(jnp.float32), ctf_sigma)
            per = jnp.mean(jnp.square(est - tgt), axis=(-3, -2, -1))
        bound = alpha_bound_penalty(basis, alpha)  # [S, n]
        return per + acfg.bound_weight * bound

    def total_loss(opt_params, ctf_sigma=None):
        per = per_elem_loss(opt_params, ctf_sigma)
        return jnp.sum(per), per

    grad_fn = jax.grad(total_loss, has_aux=True)

    def step(carry, ctf_sigma):
        opt_params, opt_state = carry
        grads, per = grad_fn(opt_params, ctf_sigma)
        updates, opt_state = optimizer.update(grads, opt_state, opt_params)
        opt_params = optax.apply_updates(opt_params, updates)
        return (opt_params, opt_state), per

    if return_loss_fn:
        return step, per_elem_loss
    return step


def prune_warm_steps(steps: int, prune_frac: float) -> int:
    """Warm-phase length of the successive-halving schedule (see
    ``attribute``): at least 1 step, at most steps-1."""
    return min(max(1, int(prune_frac * steps)), steps - 1)


def executed_chain_steps(
    steps: int, n_starts: int, prune_starts: int, prune_frac: float
) -> int:
    """Chain-steps actually executed per sample, mirroring ``attribute``'s
    pruning guard exactly (including the degenerate steps<2 case where
    pruning is skipped).  The compute-accounting source of truth for the
    study records."""
    if prune_starts and 0 < prune_starts < n_starts and steps >= 2:
        warm = prune_warm_steps(steps, prune_frac)
        return warm * n_starts + (steps - warm) * prune_starts
    return steps * n_starts


def _polish_loop(per_elem, alpha, key_logits, sweeps, margin=0.05):
    """Greedy coordinate descent over key-logit SIGNS at fixed alpha.

    Discrete refinement (beyond-parity): failed attributions are
    optimization failures, not capacity limits (BASELINE.md finding 1),
    and a sign flip in one key coordinate is exactly the move Adam
    cannot make late in the decayed-LR schedule.

    Works in the solver's own soft space: a candidate flip NEGATES one
    logit (sigmoid(-l) = 1 - sigmoid(l), i.e. the decoded bit mirrors
    while its confidence is preserved), so the search starts exactly at
    the converged loss.  Hard-rounding first was measured to RAISE the
    loss ~30x (the solver converges to soft values whose rounding
    decodes correctly but sits off the fitted latent) and greedy descent
    from that degraded point destroys correct keys (BASELINE.md round-3
    polish A/B).  A flip is accepted only when it beats the incumbent
    loss by a relative ``margin`` -- loss deltas on key-insensitive bits
    sit at the bf16 noise floor.  Monotone by construction; cost =
    sweeps * key_len forwards of batch S."""

    def loss_of(logits):  # [S, K] -> [S]
        op = {"alpha": alpha[:, None], "key": logits[:, None]}
        return per_elem(op)[:, 0]

    def flip_body(carry, j):
        l, cur = carry
        flipped = l.at[:, j].set(-l[:, j])
        lf = loss_of(flipped)
        better = lf < cur * (1.0 - margin)
        l = jnp.where(better[:, None], flipped, l)
        cur = jnp.where(better, lf, cur)
        return (l, cur), None

    order = jnp.tile(jnp.arange(key_logits.shape[1]), sweeps)
    (key_logits, loss), _ = jax.lax.scan(
        flip_body, (key_logits, loss_of(key_logits)), order
    )
    return key_logits, loss


@partial(
    jax.jit,
    static_argnames=(
        "mcfg", "acfg", "sweeps", "dtype", "biggan_cfg", "truncation",
        "attack_cfg",
    ),
)
def polish_key_bits(
    gen_params,
    lpips_params,
    basis: FingerprintBasis,
    noise,
    targets: jax.Array,  # [S, H, W, 3]
    alpha: jax.Array,  # [S, D-K] fixed content coefficients
    key_logits: jax.Array,  # [S, K] logits (pass (2b-1)*scale for hard bits)
    *,
    mcfg: ModelConfig,
    acfg: AttributionConfig,
    sweeps: int = 2,
    dtype: str = "float32",
    biggan_cfg=None,
    class_onehot: Optional[jax.Array] = None,
    truncation: float = 0.4,
    attack_cfg=None,
):
    """Standalone discrete key refinement (see _polish_loop): polish an
    existing attribution (e.g. a resumed/stored result) against its
    targets.  Returns (key_logits, loss); decode with
    ``round(sigmoid(key_logits))``."""
    cdtype = jnp.dtype(dtype)
    if acfg.loss == "perceptual":
        tf = lpips_mod.extract_features(lpips_params, targets.astype(cdtype))
        target_feats = tuple(f[:, None] for f in tf)
        tgt = None
    else:
        target_feats = None
        tgt = targets.astype(jnp.float32)[:, None]
    _, per_elem = make_attribution_step(
        gen_params, lpips_params, basis, noise, mcfg, acfg,
        target_feats, tgt, optax.identity(), dtype=cdtype,
        biggan_cfg=biggan_cfg, class_onehot=class_onehot,
        truncation=truncation, return_loss_fn=True, attack_cfg=attack_cfg,
    )
    return _polish_loop(
        per_elem, alpha, key_logits, sweeps, margin=acfg.polish_margin
    )


@partial(
    jax.jit,
    static_argnames=(
        "mcfg", "acfg", "n_starts", "steps", "remat", "remat_lpips", "dtype",
        "biggan_cfg", "truncation", "attack_cfg",
    ),
)
def attribute(
    gen_params,
    lpips_params,
    basis: FingerprintBasis,
    noise,
    targets: jax.Array,  # [S, H, W, 3] in [-1, 1]
    rng: jax.Array,
    *,
    mcfg: ModelConfig,
    acfg: AttributionConfig,
    n_starts: Optional[int] = None,
    steps: Optional[int] = None,
    remat: bool = False,
    remat_lpips: bool = False,
    dtype: str = "float32",
    biggan_cfg=None,
    class_onehot: Optional[jax.Array] = None,
    truncation: float = 0.4,
    attack_cfg=None,
    alpha_init: Optional[jax.Array] = None,
    key_init: Optional[jax.Array] = None,
) -> AttributionResult:
    """Solve attribution for a batch of target images in one XLA program.

    Equivalent of ``optimization()`` (/root/reference/src/main.py:45-89)
    over all samples at once.

    ``alpha_init``/``key_init`` ([S, n, D-K] / [S, n, K]) override the
    blind LHS/zero restart initialization — the encoder-init path
    (fingerprint/encoder.py) builds them around an amortized inverter's
    prediction; the reference has no equivalent (random init only,
    src/main.py:46-52).
    """
    n_starts = acfg.n_starts if n_starts is None else n_starts
    steps = acfg.steps if steps is None else steps
    cdtype = jnp.dtype(dtype)
    s_ = targets.shape[0]

    # --- restart initialization -------------------------------------------
    alpha0 = (
        alpha_init
        if alpha_init is not None
        else lhs_alpha_init_batch(rng, s_, n_starts, basis.sigma_rest)
    )  # [S,n,D-K]
    key0 = (
        key_init
        if key_init is not None
        else jnp.zeros((s_, n_starts, basis.v_cap.shape[0]))
    )
    opt_params = {"alpha": alpha0, "key": key0}

    # --- target features (once per sample) --------------------------------
    if acfg.loss == "perceptual":
        tf = lpips_mod.extract_features(lpips_params, targets.astype(cdtype))
        target_feats = tuple(f[:, None] for f in tf)  # [S,1,h,w,c]
        tgt = None
    else:
        target_feats = None
        tgt = targets.astype(jnp.float32)[:, None]  # [S,1,H,W,3]

    optimizer = _make_optimizer(acfg)
    opt_state = optimizer.init(opt_params)
    step, per_elem = make_attribution_step(
        gen_params, lpips_params, basis, noise, mcfg, acfg,
        target_feats, tgt, optimizer, remat=remat, remat_lpips=remat_lpips,
        dtype=cdtype, biggan_cfg=biggan_cfg, class_onehot=class_onehot,
        truncation=truncation, return_loss_fn=True, attack_cfg=attack_cfg,
    )

    if acfg.coarse_to_fine and acfg.loss != "mse":
        raise ValueError(
            "--coarse_to_fine requires --loss mse: the anneal blurs the "
            "residual inside the mse objective and has no effect on "
            f"perceptual losses (got loss={acfg.loss!r})"
        )
    if acfg.coarse_to_fine and acfg.loss == "mse":
        # linear anneal to 0 over the first ctf_frac of the schedule
        anneal = max(1, int(acfg.ctf_frac * steps))
        xs = acfg.ctf_sigma0 * jnp.maximum(
            0.0, 1.0 - jnp.arange(steps, dtype=jnp.float32) / anneal
        )
    else:
        xs = jnp.zeros((steps,))  # step ignores the sigma when ctf is off
    k_keep = acfg.prune_starts
    start_map = None  # pruned-index -> original restart index
    if k_keep and 0 < k_keep < n_starts and steps >= 2:
        # Successive-halving over restarts (beyond-parity): run every LHS
        # start for the warmup fraction, keep the top-k per sample by
        # current loss, and spend the remaining budget only on survivors.
        # Restart chains are independent and ranked by the same objective
        # the final argmin uses (ref picks min final loss,
        # src/main.py:84-87), so pruning only costs accuracy when a
        # late-bloomer would have overtaken the warmup leaders ---
        # measured in the `make pruning` study.  Adam state (including
        # the schedule count, so the LR decay is continuous) is gathered
        # along with the survivors; everything stays one XLA program
        # with static shapes.
        warm = prune_warm_steps(steps, acfg.prune_frac)
        (opt_params, opt_state), per1 = jax.lax.scan(
            step, (opt_params, opt_state), xs[:warm]
        )
        start_map = jnp.argsort(per1[-1], axis=1)[:, :k_keep]  # [S, k]

        def _gather(x):
            x = jnp.asarray(x)
            if x.ndim >= 2 and x.shape[:2] == (s_, n_starts):
                idx = start_map.reshape((s_, k_keep) + (1,) * (x.ndim - 2))
                return jnp.take_along_axis(x, idx, axis=1)
            return x  # schedule count and other non-per-restart state

        opt_params = jax.tree.map(_gather, opt_params)
        opt_state = jax.tree.map(_gather, opt_state)
        (opt_params, _), per2 = jax.lax.scan(
            step, (opt_params, opt_state), xs[warm:]
        )
        final_per = per2[-1]  # [S, k]
        curve = jnp.concatenate(
            [jnp.mean(per1, axis=(1, 2)), jnp.mean(per2, axis=(1, 2))]
        )
    else:
        (opt_params, _), per = jax.lax.scan(step, (opt_params, opt_state), xs)
        final_per = per[-1]  # [S, n] last-step per-element loss (pre-update,
        # matching the reference which records loss before the final update's
        # effect is observed, src/main.py:79)
        curve = jnp.mean(per, axis=(1, 2))

    best = jnp.argmin(final_per, axis=1)  # [S]
    take = lambda x: jnp.take_along_axis(
        x, best[:, None, None], axis=1
    ).squeeze(1)
    alpha_best = take(opt_params["alpha"])
    key_best = take(opt_params["key"])
    bits = jnp.round(jax.nn.sigmoid(key_best))
    loss_best = jnp.min(final_per, axis=1)

    if acfg.polish_sweeps > 0:
        key_best, loss_best = _polish_loop(
            per_elem, alpha_best, key_best, acfg.polish_sweeps,
            margin=acfg.polish_margin,
        )
        bits = jnp.round(jax.nn.sigmoid(key_best))

    if start_map is not None:
        # report the ORIGINAL restart index of the winner; losses_all is
        # [S, prune_starts] (survivors only) under pruning
        best = jnp.take_along_axis(start_map, best[:, None], axis=1)[:, 0]

    return AttributionResult(
        alpha=alpha_best,
        key_logits=key_best,
        key_bits=bits,
        loss=loss_best,
        losses_all=final_per,
        best_start=best,
        loss_curve=curve,
        key_logits_all=opt_params["key"],
    )


def attribute_chunked(
    gen_params,
    lpips_params,
    basis: FingerprintBasis,
    noise,
    targets: jax.Array,
    rng: jax.Array,
    *,
    mcfg: ModelConfig,
    acfg: AttributionConfig,
    chunk_starts: int = 0,
    solve_fn: Optional[Callable] = None,
    **kwargs,
) -> AttributionResult:
    """Solve with the restart axis split into chunks of ``chunk_starts``
    (0 = all at once): bounds peak memory at large n (e.g. the full-scale
    1024px config with n=20) at zero algorithmic cost --- restarts are
    independent, so the per-sample argmin merges across chunks exactly.

    ``solve_fn(targets, rng, *, n_starts=None, **kwargs)`` overrides the
    plain single-device solver --- e.g. a mesh-placed wrapper around
    ``parallel.solver.attribute_on_mesh`` --- so restart chunking composes
    with any execution backend.
    """
    if solve_fn is None:
        def solve_fn(tgt, r, **kw):
            return attribute(
                gen_params, lpips_params, basis, noise, tgt, r,
                mcfg=mcfg, acfg=acfg, **kw,
            )

    n_total = acfg.n_starts
    if chunk_starts <= 0 or chunk_starts >= n_total:
        return solve_fn(targets, rng, **kwargs)
    best: Optional[AttributionResult] = None
    offset = 0
    for c0 in range(0, n_total, chunk_starts):
        n_c = min(chunk_starts, n_total - c0)
        kw_c = kwargs
        if kwargs.get("alpha_init") is not None or kwargs.get("key_init") is not None:
            # per-restart init arrays ([S, n_total, ...]) follow their chunk
            kw_c = dict(kwargs)
            for name in ("alpha_init", "key_init"):
                if kw_c.get(name) is not None:
                    kw_c[name] = kw_c[name][:, c0 : c0 + n_c]
        res = solve_fn(
            targets, jax.random.fold_in(rng, c0), n_starts=n_c, **kw_c
        )
        if best is None:
            best = res
        else:
            take_new = res.loss < best.loss  # [S]
            pick = lambda a, b: jnp.where(
                take_new.reshape((-1,) + (1,) * (a.ndim - 1)), a, b
            )
            # loss_curve is a mean over all restarts seen so far, so merge
            # as a restart-count-weighted average of the chunk curves.
            curve = (
                (best.loss_curve * offset + res.loss_curve * n_c)
                / (offset + n_c)
                if best.loss_curve is not None and res.loss_curve is not None
                else best.loss_curve
            )
            best = AttributionResult(
                alpha=pick(res.alpha, best.alpha),
                key_logits=pick(res.key_logits, best.key_logits),
                key_bits=pick(res.key_bits, best.key_bits),
                loss=jnp.minimum(res.loss, best.loss),
                losses_all=jnp.concatenate([best.losses_all, res.losses_all], axis=1),
                best_start=jnp.where(take_new, res.best_start + offset, best.best_start),
                loss_curve=curve,
                key_logits_all=(
                    jnp.concatenate(
                        [best.key_logits_all, res.key_logits_all], axis=1
                    )
                    if best.key_logits_all is not None
                    and res.key_logits_all is not None else None
                ),
            )
        offset += n_c
    return best


def evaluate_attribution(
    result: AttributionResult,
    true_keys: jax.Array,
    *,
    basis: Optional[FingerprintBasis] = None,
    true_w0: Optional[jax.Array] = None,
) -> Dict[str, Any]:
    """Bit accuracy + exact-match attribution accuracy
    (ref src/main.py:72,146-148).

    With ``basis`` and ``true_w0`` also reports the cosine similarity of
    the recovered content latent to the true one --- the reference's
    check_similarity experiment (src/unused_code_backup/
    check_similarity.py:22-27), promoted to a wired metric.
    """
    acc = bit_accuracy(result.key_bits, true_keys)  # [S]
    exact = (acc >= 1.0).astype(jnp.float32)
    out: Dict[str, Any] = {
        "bit_acc": acc,
        "mean_bit_acc": jnp.mean(acc),
        "attribution_acc": jnp.mean(exact),
        "exact": exact,
    }
    if basis is not None and true_w0 is not None:
        w0_rec = content_latent(basis, result.alpha)  # [S, D]
        num = jnp.sum(w0_rec * true_w0, axis=-1)
        den = jnp.linalg.norm(w0_rec, axis=-1) * jnp.linalg.norm(true_w0, axis=-1)
        out["latent_cos"] = num / jnp.maximum(den, 1e-12)
        out["mean_latent_cos"] = jnp.mean(out["latent_cos"])
    return out
