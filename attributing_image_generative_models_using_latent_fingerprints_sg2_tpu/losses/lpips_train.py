"""LPIPS training / evaluation machinery.

The reference vendors the full LPIPS package including the pieces its
pipelines never call (SURVEY.md section 2): the 2AFC ranking head
(``Dist2LogitLayer`` + ``BCERankingLoss``, custom_lpips/networks_basic.py:113-140)
and the 2AFC / JND scoring used to fit the linear heads
(custom_lpips/dist_model.py:212-284).  Re-implemented here functionally so
the metric can be re-calibrated on-TPU from perceptual-judgement data.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Dist2LogitLayer: (d0, d1) -> probability that d1 is "closer"
# ---------------------------------------------------------------------------


def init_dist2logit_params(key: jax.Array, chn_mid: int = 32) -> Dict[str, Any]:
    k1, k2, k3 = jax.random.split(key, 3)

    def lin(k, cin, cout):
        return {
            "w": jax.random.normal(k, (cin, cout)) * (1.0 / np.sqrt(cin)),
            "b": jnp.zeros((cout,)),
        }

    return {"l1": lin(k1, 5, chn_mid), "l2": lin(k2, chn_mid, chn_mid), "l3": lin(k3, chn_mid, 1)}


def dist2logit(params: Dict[str, Any], d0: jax.Array, d1: jax.Array, eps: float = 0.1) -> jax.Array:
    """Ref networks_basic.py Dist2LogitLayer.forward: features are
    (d0, d1, d0-d1, d0/(d1+eps), d1/(d0+eps)) -> 2x(linear+leaky) -> linear
    -> sigmoid.  d0, d1: [B] -> [B] probabilities."""
    f = jnp.stack([d0, d1, d0 - d1, d0 / (d1 + eps), d1 / (d0 + eps)], axis=-1)

    def lrelu(x):
        return jnp.where(x >= 0, x, 0.2 * x)

    h = lrelu(f @ params["l1"]["w"] + params["l1"]["b"])
    h = lrelu(h @ params["l2"]["w"] + params["l2"]["b"])
    logit = h @ params["l3"]["w"] + params["l3"]["b"]
    return jax.nn.sigmoid(logit[..., 0])


def bce_ranking_loss(
    params: Dict[str, Any], d0: jax.Array, d1: jax.Array, judge: jax.Array
) -> jax.Array:
    """Ref BCERankingLoss (networks_basic.py:131-140): judge in [-1, 1]
    maps to per = (judge+1)/2, BCE against the dist2logit probability."""
    per = (judge + 1.0) / 2.0
    p = jnp.clip(dist2logit(params, d0, d1), 1e-7, 1 - 1e-7)
    return -jnp.mean(per * jnp.log(p) + (1.0 - per) * jnp.log(1.0 - p))


# ---------------------------------------------------------------------------
# 2AFC / JND scores (ref dist_model.py:212-284)
# ---------------------------------------------------------------------------


def score_2afc(d0s: np.ndarray, d1s: np.ndarray, gts: np.ndarray) -> float:
    """Fraction of human-judgement agreement: gts is the fraction of humans
    who picked p1 (i.e. judged p1 closer to ref).  The metric agrees with a
    judge when the smaller distance matches their pick:
    d0 < d1 -> metric picks p0 -> credit (1 - gts)."""
    d0s, d1s, gts = map(np.asarray, (d0s, d1s, gts))
    scores = (d0s < d1s) * (1 - gts) + (d1s < d0s) * gts + (d1s == d0s) * 0.5
    return float(np.mean(scores))


def score_jnd(ds: np.ndarray, sames: np.ndarray) -> float:
    """mAP of "same" detection by thresholding distances (ref
    dist_model.py:260-284: sort by distance, precision/recall sweep)."""
    ds, sames = np.asarray(ds), np.asarray(sames, np.float64)
    order = np.argsort(ds)
    sames_sorted = sames[order]
    tps = np.cumsum(sames_sorted)
    fps = np.cumsum(1 - sames_sorted)
    fns = np.sum(sames_sorted) - tps
    precs = tps / np.maximum(tps + fps, 1e-12)
    recs = tps / np.maximum(tps + fns, 1e-12)
    # VOC-style AP: max precision at recall >= t
    ap = 0.0
    for t in np.linspace(0, 1, 11):
        p = precs[recs >= t]
        ap += (p.max() if p.size else 0.0) / 11.0
    return float(ap)


def train_lin_heads(
    lpips_params: Dict[str, Any],
    batches,  # iterable of dicts: ref [B,H,W,3], p0, p1, judge [B]
    steps: int = 100,
    lr: float = 1e-3,
    rng: jax.Array = None,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Fit the LPIPS linear heads (+ ranking head) on 2AFC triplets ---
    the role of dist_model's training mode.  Heads are constrained
    non-negative (LPIPS convention) by projection after each step.

    Returns ``(lpips_params_with_fitted_lin, rank_params)``."""
    import optax

    from . import lpips as lpips_mod

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    rank_params = init_dist2logit_params(rng)
    opt = optax.adam(lr)
    trainable = {"lin": lpips_params["lin"], "rank": rank_params}
    opt_state = opt.init(trainable)

    @jax.jit
    def step(trainable, opt_state, ref, p0, p1, judge):
        def loss_fn(tr):
            lp = dict(lpips_params, lin=tr["lin"])
            d0 = lpips_mod.lpips(lp, ref, p0)
            d1 = lpips_mod.lpips(lp, ref, p1)
            return bce_ranking_loss(tr["rank"], d0, d1, judge)

        loss, grads = jax.value_and_grad(loss_fn)(trainable)
        updates, opt_state = opt.update(grads, opt_state)
        trainable = optax.apply_updates(trainable, updates)
        # project lin heads to >= 0 (ref clamps via weight projection)
        trainable = dict(
            trainable, lin=tuple(jnp.maximum(w, 0.0) for w in trainable["lin"])
        )
        return trainable, opt_state, loss

    it = iter(batches)
    for i in range(steps):
        try:
            b = next(it)
        except StopIteration:
            it = iter(batches)
            b = next(it)
        trainable, opt_state, loss = step(
            trainable, opt_state, b["ref"], b["p0"], b["p1"], b["judge"]
        )
    return dict(lpips_params, lin=trainable["lin"]), trainable["rank"]


def save_lin_weights(path: str, lin) -> None:
    """Persist trained lin heads (ref base_model.py save_network, but as a
    portable npz instead of a torch pickle)."""
    np.savez(path, **{f"lin{k}": np.asarray(w) for k, w in enumerate(lin)})


def load_lin_weights(path: str):
    """Inverse of save_lin_weights -> tuple of [C] arrays."""
    with np.load(path) as z:
        return tuple(jnp.asarray(z[f"lin{k}"]) for k in range(len(z.files)))
