"""Eval subsystem tests: Inception feature extractor shape/conversion,
FID math, sweep driver, profiling utils, state save/resume."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.config import (
    AttributionConfig,
    ModelConfig,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.eval import (
    fid as fid_mod,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.eval import (
    inception as inc,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.eval.sweep import (
    run_sweep,
    sweep_to_json,
)


@pytest.fixture(scope="module")
def inc_params():
    return inc.init_inception_params(jax.random.PRNGKey(0))


def test_inception_feature_shape(inc_params):
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 299, 299, 3)) * 2 - 1
    f = inc.inception_features(inc_params, x)
    assert f.shape == (2, 2048)
    assert np.isfinite(np.asarray(f)).all()


def test_inception_preprocess_resizes():
    x = jnp.zeros((3, 64, 64, 3))
    y = inc.preprocess(x)
    assert y.shape == (3, 299, 299, 3)
    np.testing.assert_allclose(np.asarray(y), 0.0, atol=1e-6)


def test_frechet_distance_identity_and_symmetry():
    rng = np.random.default_rng(0)
    mu1, mu2 = rng.standard_normal(8), rng.standard_normal(8)
    a = rng.standard_normal((8, 8))
    b = rng.standard_normal((8, 8))
    c1, c2 = a @ a.T + np.eye(8), b @ b.T + np.eye(8)
    assert fid_mod.frechet_distance(mu1, c1, mu1, c1) == pytest.approx(0.0, abs=1e-6)
    d12 = fid_mod.frechet_distance(mu1, c1, mu2, c2)
    d21 = fid_mod.frechet_distance(mu2, c2, mu1, c1)
    assert d12 == pytest.approx(d21, rel=1e-6)
    assert d12 > 0
    # analytic check: identical covariances -> squared mean distance
    d = fid_mod.frechet_distance(mu1, c1, mu2, c1)
    assert d == pytest.approx(float(np.sum((mu1 - mu2) ** 2)), rel=1e-4)


def test_feature_stats_streaming_matches_direct():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((100, 5))
    st = fid_mod.FeatureStats()
    st.update(x[:30])
    st.update(x[30:])
    mu, cov = st.finalize()
    np.testing.assert_allclose(mu, x.mean(0), atol=1e-10)
    np.testing.assert_allclose(cov, np.cov(x, rowvar=False), atol=1e-10)


def test_fid_between_populations(inc_params):
    k = jax.random.PRNGKey(2)
    a = jax.random.uniform(k, (8, 32, 32, 3)) * 2 - 1
    b = jnp.clip(a + 0.5, -1, 1)
    d_self = fid_mod.fid_between(inc_params, a, a, batch=4)
    d_ab = fid_mod.fid_between(inc_params, a, b, batch=4)
    assert d_self == pytest.approx(0.0, abs=1e-2)
    assert d_ab > d_self


def test_sweep_driver_grid():
    mcfg = ModelConfig(img_size=16, channel_max=32, n_mlp=2, style_dim=32)
    acfg = AttributionConfig(steps=5, n_starts=2, loss="mse")
    pts = run_sweep(
        jax.random.PRNGKey(0), mcfg,
        key_lens=(4, 8), sigmas=(1.0,), samples=2, acfg=acfg,
    )
    assert len(pts) == 2
    assert {p.key_len for p in pts} == {4, 8}
    for p in pts:
        assert 0.0 <= p.mean_bit_acc <= 1.0
        assert p.watermark_mse > 0
    js = sweep_to_json(pts)
    assert "mean_bit_acc" in js


def test_profiling_utils():
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.utils import (
        profiling,
    )

    with profiling.phase("unit_test_phase"):
        pass
    rep = profiling.report()
    assert rep["unit_test_phase"]["count"] >= 1
    with profiling.device_phase("unit_test_fence") as box:
        box.append(jnp.ones(4) * 2)
    txt = profiling.format_report(reset=True)
    assert "unit_test_phase" in txt
    assert profiling.report() == {}


def test_state_save_resume(tmp_path):
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.checkpoints.state import (
        AttributionRunState,
        load_state,
        save_state,
    )

    st = AttributionRunState(next_sample=7, bit_accs=[1.0, 0.5], success=1, seed=3)
    save_state(str(tmp_path), st, arrays={"true_bits": np.ones((2, 4))})
    st2, arrays = load_state(str(tmp_path))
    assert st2.next_sample == 7 and st2.success == 1 and st2.bit_accs == [1.0, 0.5]
    np.testing.assert_array_equal(arrays["true_bits"], np.ones((2, 4)))
    st3, arr3 = load_state(str(tmp_path / "missing"))
    assert st3 is None and arr3 == {}


def test_inception_torch_conversion_roundtrip(inc_params):
    """Synthesize a full torchvision-style state dict (shapes from the
    template, names from the shared name map), convert, and verify every
    weight lands in its slot with the right transpose; converted net runs."""
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.eval.inception import (
        params_from_torch_state_dict,
        torch_name_pairs,
    )

    rng = np.random.default_rng(5)
    sd = {}
    for short, leaf, prefix in torch_name_pairs(inc_params):
        tpl = inc_params[short] if leaf is None else inc_params[short][leaf]
        w = rng.standard_normal(np.shape(tpl["w"])).astype(np.float32)
        c = w.shape[-1]
        sd[f"{prefix}.conv.weight"] = np.ascontiguousarray(np.transpose(w, (3, 2, 0, 1)))
        sd[f"{prefix}.bn.weight"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{prefix}.bn.bias"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{prefix}.bn.running_mean"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{prefix}.bn.running_var"] = (np.abs(rng.standard_normal(c)) + 0.5).astype(np.float32)

    converted = params_from_torch_state_dict(sd, inc_params)
    np.testing.assert_array_equal(
        np.transpose(converted["m6b"]["b7_2"]["w"], (3, 2, 0, 1)),
        sd["Mixed_6b.branch7x7_2.conv.weight"],
    )
    np.testing.assert_array_equal(
        converted["m7c"]["bpool"]["gamma"], sd["Mixed_7c.branch_pool.bn.weight"]
    )
    np.testing.assert_array_equal(
        np.transpose(converted["c1a"]["w"], (3, 2, 0, 1)), sd["Conv2d_1a_3x3.conv.weight"]
    )
    f = inc.inception_features(converted, jnp.zeros((1, 299, 299, 3)))
    assert f.shape == (1, 2048)
