"""Tiny-scale end-to-end test of the measured model-attribution study
(eval/model_attribution_study.py): registry of 2 random-init generators
+ 1 held-out, real solves at the e2e test scale, checking the decision
accuracy, the calibration/eval split discipline, and the open-set sweep
invariants.
"""

import jax
import numpy as np
import pytest

from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.config import (
    FingerprintConfig,
    ModelConfig,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.eval.model_attribution_study import (
    model_attribution_point,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.fingerprint import (
    pipeline as pl,
)

MCFG = ModelConfig(img_size=32, channel_max=64, n_mlp=3, style_dim=64)
FPCFG = FingerprintConfig(key_len=8, shift=56, sigma=1.0, sd_moved=1.0,
                          n_pca_samples=2000)


@pytest.fixture(scope="module")
def point():
    pipes = {
        f"seed{s}": pl.build_pipeline(
            jax.random.PRNGKey(s * 100), MCFG, FPCFG, want_lpips=False
        )
        for s in range(3)
    }
    registry = {"seed0": pipes["seed0"], "seed1": pipes["seed1"]}
    held_out = {"seed2": pipes["seed2"]}
    return model_attribution_point(
        registry, held_out,
        key_len=8, sigma=1.0,
        samples_per_model=4, steps=450, n_starts=4,
        seed=3, dtype="float32", chunk_samples=6,
        # random-init generators emit +-5; clipping pushes their targets
        # off-manifold (see _fingerprinted_targets) --- prod studies clip
        clip_targets=False,
    )


def test_closed_set_decisions(point):
    # random-init generators separate by orders of magnitude (the
    # fingerprint/model_attribution tests measure >100x); at this scale
    # every evaluation-split decision should be right
    assert point["decision_acc"] == 1.0
    assert point["n_eval_in_dist"] == 4  # 2 models x 4 samples, half held for calib
    assert point["margin_median_in_dist"] > 3.0


def test_open_set_separation_and_curve(point):
    # held-out images bottom out far above in-distribution solves
    assert point["separation_ratio"] > 3.0
    # the calibrated threshold neither rejects in-dist nor accepts out-dist
    assert point["false_reject_at_threshold"] == 0.0
    assert point["false_accept_at_threshold"] == 0.0
    assert point["open_set_auc"] == pytest.approx(1.0, abs=1e-9)
    sweep = point["open_set_sweep"]
    # endpoints: tiny threshold rejects everything / accepts nothing;
    # huge threshold accepts everything
    assert sweep[0]["false_reject"] == 1.0
    assert sweep[0]["false_accept"] == 0.0
    assert sweep[-1]["false_reject"] == 0.0
    assert sweep[-1]["false_accept"] == 1.0
    # monotone in the threshold
    fr = [p["false_reject"] for p in sweep]
    fa = [p["false_accept"] for p in sweep]
    assert all(a >= b for a, b in zip(fr, fr[1:]))
    assert all(a <= b for a, b in zip(fa, fa[1:]))
    # margin-based rule (accept when margin >= thr): random-init
    # generators separate by margin too (in-dist margins are >3 by the
    # closed-set assertion; out-dist margins among equally-bad registry
    # fits are near 1, but at 4 held-out samples allow slack)
    assert point["margin_open_set_auc"] >= 0.75
    msweep = point["margin_open_set_sweep"]
    assert msweep[0]["false_reject"] == 0.0  # tiny thr accepts all
    assert msweep[0]["false_accept"] == 1.0
    assert msweep[-1]["false_reject"] == 1.0  # huge thr rejects all
    assert msweep[-1]["false_accept"] == 0.0


def test_per_model_rows(point):
    rows = {r["model"]: r for r in point["per_model"]}
    assert set(rows) == {"seed0", "seed1"}
    for r in rows.values():
        assert r["decision_acc"] == 1.0
        assert r["own_loss_mean"] < r["cross_loss_mean"]


def test_key_bits_reported(point):
    # keys decoded under the chosen model at the reduced budget: just
    # sanity (above chance), exactness is the e2e suite's job
    assert point["key_bit_acc_when_decided"] is not None
    assert point["key_bit_acc_when_decided"] >= 0.6
