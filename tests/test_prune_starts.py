"""Restart pruning (successive halving over LHS restarts).

Beyond-parity solver efficiency: the reference runs every restart for the
full schedule and picks the min final loss (src/main.py:46-48,84-87);
pruning keeps only the top-k per sample after a warmup fraction.  Tested
on the tiny invertible generator from test_attribution_e2e.
"""

import dataclasses

import jax
import numpy as np
import pytest

from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.config import (
    AttributionConfig,
    FingerprintConfig,
    ModelConfig,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.fingerprint import (
    attribute as attr,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.fingerprint import (
    pipeline as pl,
)

MCFG = ModelConfig(img_size=32, channel_max=64, n_mlp=3, style_dim=64)
FPCFG = FingerprintConfig(key_len=8, shift=56, sigma=1.0, sd_moved=1.0, n_pca_samples=2000)


@pytest.fixture(scope="module")
def pipe():
    return pl.build_pipeline(jax.random.PRNGKey(0), MCFG, FPCFG, want_lpips=False)


def test_prune_off_values_are_unchanged(pipe):
    """prune_starts=0 and prune_starts>=n both take the single-scan path;
    the pruned-path flag values must not perturb the baseline solve."""
    imgs, *_, bits, _ = pl.generate_fingerprinted(pipe, jax.random.PRNGKey(1), 2)
    base = AttributionConfig(steps=40, n_starts=4, lr=0.2, loss="mse")
    off = dataclasses.replace(base, prune_starts=0)
    too_many = dataclasses.replace(base, prune_starts=4)
    results = [
        attr.attribute(
            pipe.gen_params, None, pipe.basis, pipe.noise, imgs,
            jax.random.PRNGKey(2), mcfg=MCFG, acfg=cfg,
        )
        for cfg in (base, off, too_many)
    ]
    for r in results[1:]:
        np.testing.assert_array_equal(
            np.asarray(results[0].key_bits), np.asarray(r.key_bits)
        )
        np.testing.assert_array_equal(
            np.asarray(results[0].loss), np.asarray(r.loss)
        )


def test_prune_recovers_keys_and_shapes(pipe):
    """Pruned solve still recovers the planted keys on the invertible
    model; losses_all holds survivors only; best_start reports the
    ORIGINAL restart index; the loss curve spans the full schedule."""
    # the known-good e2e operating point (test_attribution_e2e recovers
    # >=0.85 here unpruned), cut half the restarts at mid-schedule
    steps, n, k = 300, 4, 2
    acfg = AttributionConfig(
        steps=steps, n_starts=n, lr=0.2, loss="mse",
        prune_starts=k, prune_frac=0.5,
    )
    imgs, *_, bits, _ = pl.generate_fingerprinted(pipe, jax.random.PRNGKey(1), 3)
    res = attr.attribute(
        pipe.gen_params, None, pipe.basis, pipe.noise, imgs,
        jax.random.PRNGKey(2), mcfg=MCFG, acfg=acfg,
    )
    assert res.losses_all.shape == (3, k)
    assert res.loss_curve.shape == (steps,)
    np.testing.assert_allclose(
        np.asarray(res.loss), np.asarray(res.losses_all).min(axis=1), rtol=1e-6
    )
    bs = np.asarray(res.best_start)
    assert ((0 <= bs) & (bs < n)).all()  # original restart indices
    ev = attr.evaluate_attribution(res, bits)
    assert float(ev["mean_bit_acc"]) > 0.8, np.asarray(ev["bit_acc"])


def test_prune_matches_full_solve_when_leader_holds(pipe):
    """With the SAME rng, the pruned solve's winner can only be a restart
    the full solve also ran; if the full solve's winner survives the
    cut, both solves decode the same key (the surviving chain's
    trajectory is identical --- same init, same Adam/schedule state)."""
    imgs, *_, bits, _ = pl.generate_fingerprinted(pipe, jax.random.PRNGKey(5), 2)
    base = AttributionConfig(steps=200, n_starts=6, lr=0.2, loss="mse")
    pruned = dataclasses.replace(base, prune_starts=3, prune_frac=0.3)
    full = attr.attribute(
        pipe.gen_params, None, pipe.basis, pipe.noise, imgs,
        jax.random.PRNGKey(6), mcfg=MCFG, acfg=base,
    )
    pr = attr.attribute(
        pipe.gen_params, None, pipe.basis, pipe.noise, imgs,
        jax.random.PRNGKey(6), mcfg=MCFG, acfg=pruned,
    )
    same_winner = np.asarray(full.best_start) == np.asarray(pr.best_start)
    assert same_winner.any()  # at this scale the leader usually holds
    got_f = np.asarray(full.key_bits)[same_winner]
    got_p = np.asarray(pr.key_bits)[same_winner]
    np.testing.assert_array_equal(got_f, got_p)
    # the surviving chain re-runs with a different batch width, so XLA
    # may tile its convs differently: same trajectory up to fp noise
    np.testing.assert_allclose(
        np.asarray(full.loss)[same_winner],
        np.asarray(pr.loss)[same_winner],
        rtol=1e-2,
    )
