"""LPIPS training machinery tests (2AFC ranking head, scores, head fit)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.losses import (
    lpips as L,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.losses import (
    lpips_train as LT,
)


def test_dist2logit_outputs_probabilities():
    p = LT.init_dist2logit_params(jax.random.PRNGKey(0))
    d0 = jnp.asarray([0.1, 0.5, 2.0])
    d1 = jnp.asarray([0.2, 0.5, 0.1])
    out = np.asarray(LT.dist2logit(p, d0, d1))
    assert out.shape == (3,)
    assert (out > 0).all() and (out < 1).all()


def test_bce_ranking_loss_finite_and_differentiable():
    p = LT.init_dist2logit_params(jax.random.PRNGKey(1))
    d0 = jnp.asarray([0.1, 0.9])
    d1 = jnp.asarray([0.4, 0.2])
    judge = jnp.asarray([1.0, -1.0])
    loss = LT.bce_ranking_loss(p, d0, d1, judge)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda pp: LT.bce_ranking_loss(pp, d0, d1, judge))(p)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))


def test_score_2afc():
    d0 = np.array([0.5, 0.1, 0.3, 0.2])
    d1 = np.array([0.1, 0.5, 0.3, 0.6])
    gts = np.array([1.0, 0.0, 0.7, 1.0])  # fraction of humans picking p1
    # A: d1<d0, gts=1 -> 1;  B: d0<d1, gts=0 -> 1;  C: tie -> 0.5;
    # D: d0<d1 but humans picked p1 -> 0
    assert LT.score_2afc(d0, d1, gts) == pytest.approx((1 + 1 + 0.5 + 0) / 4)


def test_score_jnd_perfect_separation():
    ds = np.array([0.1, 0.2, 0.3, 0.9, 1.0, 1.1])
    sames = np.array([1, 1, 1, 0, 0, 0])
    assert LT.score_jnd(ds, sames) == pytest.approx(1.0, abs=1e-6)
    # random separation scores lower
    assert LT.score_jnd(ds, sames[::-1]) < 0.8


def test_train_lin_heads_improves_ranking():
    """Tiny synthetic 2AFC set where judges always prefer the less-noisy
    patch; after fitting, the metric should rank accordingly more often."""
    key = jax.random.PRNGKey(2)
    lp = L.init_lpips_params(key)
    ref = jax.random.uniform(jax.random.PRNGKey(3), (8, 16, 16, 3)) * 2 - 1
    p0 = jnp.clip(ref + 0.05 * jax.random.normal(jax.random.PRNGKey(4), ref.shape), -1, 1)
    p1 = jnp.clip(ref + 0.6 * jax.random.normal(jax.random.PRNGKey(5), ref.shape), -1, 1)
    judge = -jnp.ones((8,))  # humans always pick p0 (judge=-1 -> per=0)
    batches = [{"ref": ref, "p0": p0, "p1": p1, "judge": judge}]
    new_lp, rank = LT.train_lin_heads(lp, batches, steps=5, lr=1e-3)
    assert all((np.asarray(w) >= 0).all() for w in new_lp["lin"])
    d0 = np.asarray(L.lpips(new_lp, ref, p0))
    d1 = np.asarray(L.lpips(new_lp, ref, p1))
    # gts=0 (humans pick p0) and d0 << d1 -> full agreement
    assert LT.score_2afc(d0, d1, np.zeros(8)) > 0.9


def test_lin_weights_save_load_roundtrip(tmp_path):
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.losses.lpips_train import (
        load_lin_weights,
        save_lin_weights,
    )

    lin = tuple(jnp.asarray(np.random.default_rng(k).uniform(0, 1, (c,)).astype(np.float32))
                for k, c in enumerate((4, 8, 16)))
    p = str(tmp_path / "lin.npz")
    save_lin_weights(p, lin)
    back = load_lin_weights(p)
    assert len(back) == 3
    for a, b in zip(lin, back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_distance_ret_per_layer():
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.losses import (
        lpips as lp,
    )

    params = lp.init_lpips_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    f0, f1 = lp.extract_features(params, a), lp.extract_features(params, b)
    total, per = lp.distance_from_features(params, f0, f1, ret_per_layer=True)
    assert len(per) == 5
    np.testing.assert_allclose(
        np.asarray(total), np.sum([np.asarray(d) for d in per], axis=0), rtol=1e-6
    )
