"""End-to-end identification study at CPU-test scale
(eval/identification.py): real solves, registry decode, size sweep."""

import jax
import numpy as np
import pytest

from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.config import (
    FingerprintConfig,
    ModelConfig,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.eval.identification import (
    identification_point,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.fingerprint import (
    pipeline as pl,
)

MCFG = ModelConfig(img_size=32, channel_max=64, n_mlp=3, style_dim=64)
FPCFG = FingerprintConfig(key_len=8, shift=56, sigma=1.0, sd_moved=1.0,
                          n_pca_samples=2000)


@pytest.fixture(scope="module")
def point():
    pipe = pl.build_pipeline(jax.random.PRNGKey(0), MCFG, FPCFG,
                             want_lpips=False)
    return identification_point(
        pipe,
        key_len=8, sigma=1.0, shift=56, min_distance=3,
        registry_sizes=(4, 8),
        samples=8, steps=300, n_starts=4, seed=11,
        dtype="float32", clip_targets=False,
    )


def test_record_structure(point):
    assert point["key_len"] == 8 and point["min_distance"] == 3
    assert point["distinct_users"] == 4
    assert 0.0 <= point["measured_p_bit"] <= 1.0
    sizes = [r["registry_size"] for r in point["by_registry_size"]]
    assert sizes == [4, 8]
    for row in point["by_registry_size"]:
        assert 0.0 <= row["hard_accuracy"] <= 1.0
        assert row["soft_ci95"][0] <= row["soft_accuracy"] <= row["soft_ci95"][1]
        assert 0.0 <= row["union_bound_error"] <= 1.0


def test_identification_works_at_test_scale(point):
    """The solver recovers planted registry keys well enough that soft
    decode identifies most users even among distractors."""
    assert point["mean_bit_acc"] >= 0.8
    by = {r["registry_size"]: r for r in point["by_registry_size"]}
    assert by[4]["soft_accuracy"] >= 0.75
    assert by[8]["soft_accuracy"] >= 0.625
    # growing the registry can only keep or lower accuracy
    assert by[8]["soft_accuracy"] <= by[4]["soft_accuracy"] + 1e-9


def test_validation():
    pipe = pl.build_pipeline(jax.random.PRNGKey(0), MCFG, FPCFG,
                             want_lpips=False)
    with pytest.raises(ValueError):
        identification_point(pipe, registry_sizes=(1,), key_len=8,
                             shift=56, samples=2, steps=2, n_starts=2)


def test_attack_path_smoke():
    """attack= routes targets through the eval-strength channel and the
    record carries the attack tag (quality is the robustness study's job)."""
    pipe = pl.build_pipeline(jax.random.PRNGKey(0), MCFG, FPCFG,
                             want_lpips=False)
    rec = identification_point(
        pipe, key_len=8, sigma=1.0, shift=56, min_distance=2,
        registry_sizes=(4,), samples=4, steps=5, n_starts=2, seed=3,
        dtype="float32", clip_targets=False, attack="Noise",
    )
    assert rec["attack"] == "Noise"
    assert rec["attack_aware"] is False
    assert len(rec["by_registry_size"]) == 1


def test_attack_aware_path_smoke():
    """attack_aware=True threads the deterministic channel model into the
    solver (AttributionConfig.solver_attack + attack_cfg) and the record
    says so; Blur is deterministic so the channel model is exact."""
    pipe = pl.build_pipeline(jax.random.PRNGKey(0), MCFG, FPCFG,
                             want_lpips=False)
    rec = identification_point(
        pipe, key_len=8, sigma=1.0, shift=56, min_distance=2,
        registry_sizes=(4,), samples=4, steps=5, n_starts=2, seed=3,
        dtype="float32", clip_targets=False, attack="Blur",
        attack_aware=True,
    )
    assert rec["attack"] == "Blur" and rec["attack_aware"] is True
    assert np.isfinite(rec["measured_p_bit"])


def test_rm_issuance_path():
    """issuance='rm' builds the registry from Reed-Muller codewords: the
    record carries the code's min distance (8 for RM(2,5) at kl=32 --- the
    argument default is overridden) and the solve/decode loop runs
    unchanged.  kl=8 is not a valid RM(2,m) length with r<m constraints
    honored (m=3, r=2 -> d=2), so this uses key_len=32 on the tiny model."""
    pipe = pl.build_pipeline(
        jax.random.PRNGKey(0),
        MCFG,
        FingerprintConfig(key_len=32, shift=32, sigma=1.0, sd_moved=1.0,
                          n_pca_samples=2000),
        want_lpips=False,
    )
    rec = identification_point(
        pipe, key_len=32, sigma=1.0, shift=32,
        registry_sizes=(4, 64), samples=4, steps=5, n_starts=2, seed=3,
        dtype="float32", clip_targets=False, issuance="rm",
    )
    assert rec["issuance"] == "rm"
    assert rec["min_distance"] == 8  # from RM(2,5), not the default 6
    assert [r["registry_size"] for r in rec["by_registry_size"]] == [4, 64]
    with pytest.raises(ValueError):
        identification_point(pipe, key_len=32, shift=32,
                             registry_sizes=(4,), samples=2, steps=2,
                             n_starts=2, issuance="bogus")
