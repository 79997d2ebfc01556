"""Quality-study driver (eval/study.py + cli/study.py).

The study machinery is the one-command reproduction layer for every
BASELINE.md quality table (statistics with Wilson CIs, per-bit / key-band
spectrum diagnostics, crash-safe jsonl resume).  Tested here on tiny
random-init pipelines; the real tables are produced by ``make headline``
etc. on the TPU.
"""

import json
import math

import jax
import numpy as np
import pytest

from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.cli import (
    study as study_cli,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.config import (
    FingerprintConfig, ModelConfig,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.eval import (
    study,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.fingerprint import (
    pipeline as pl,
)


def test_wilson_ci_properties():
    lo, hi = study.wilson_ci(0, 0)
    assert (lo, hi) == (0.0, 1.0)
    lo, hi = study.wilson_ci(20, 20)
    assert hi == 1.0 and 0.8 < lo < 1.0
    lo, hi = study.wilson_ci(10, 20)
    assert lo < 0.5 < hi
    # tighter with more data at the same proportion
    lo2, hi2 = study.wilson_ci(50, 100)
    assert (hi2 - lo2) < (hi - lo)


@pytest.fixture(scope="module")
def tiny_pipe():
    mcfg = ModelConfig(
        img_size=16, style_dim=32, n_mlp=2, channel_max=32, ckpt=None
    )
    fpcfg = FingerprintConfig(key_len=8, shift=24, n_pca_samples=256)
    return pl.build_pipeline(
        jax.random.PRNGKey(0), mcfg, fpcfg, ckpt_path=None, want_lpips=False
    )


def test_eval_point_fields_and_shapes(tiny_pipe):
    rec = study.eval_point(
        tiny_pipe, key_len=8, sigma=4.0, samples=4, steps=8, n_starts=2,
        loss="mse", dtype="float32", seed=3,
    )
    assert rec["samples"] == 4 and rec["key_len"] == 8
    assert 0.0 <= rec["mean_bit_acc"] <= 1.0
    assert len(rec["per_bit_acc"]) == 8
    assert len(rec["band_sigma"]) == 8
    assert len(rec["spectrum_decile_sigmas"]) == 11
    lo, hi = rec["exact_match_ci95"]
    assert 0.0 <= lo <= rec["exact_match"] <= hi <= 1.0
    # the key band is the low-variance end of the spectrum by construction
    assert rec["band_sigma_median"] <= rec["content_sigma_median"]
    # chunked solve covers every sample (targets/keys are seed-identical;
    # restart RNG differs per chunk, so accuracies may differ slightly)
    rec2 = study.eval_point(
        tiny_pipe, key_len=8, sigma=4.0, samples=4, steps=8, n_starts=2,
        loss="mse", dtype="float32", seed=3, chunk_samples=2,
    )
    assert rec2["samples"] == 4 and len(rec2["per_bit_acc"]) == 8
    assert 0.0 <= rec2["mean_bit_acc"] <= 1.0


def test_eval_point_attack_runs(tiny_pipe):
    rec = study.eval_point(
        tiny_pipe, key_len=8, sigma=4.0, samples=2, steps=4, n_starts=2,
        loss="mse", dtype="float32", attack="Noise", seed=5,
    )
    assert rec["attack"] == "Noise"
    assert math.isfinite(rec["mean_final_loss"])


def test_bit_sigma_correlation_bounds():
    point = {
        "per_bit_acc": [0.2, 0.4, 0.6, 0.8],
        "band_sigma": [0.1, 0.2, 0.3, 0.4],
    }
    r = study.bit_sigma_correlation(point)
    assert r == pytest.approx(1.0)
    point["band_sigma"] = point["band_sigma"][::-1]
    assert study.bit_sigma_correlation(point) == pytest.approx(-1.0)
    point["per_bit_acc"] = [0.5, 0.5, 0.5, 0.5]
    # degenerate points return None (JSON-safe), not NaN: json.dumps
    # would otherwise write a literal NaN strict parsers reject
    assert study.bit_sigma_correlation(point) is None


def test_bit_sigma_correlation_matches_scipy_with_ties():
    """The numpy rank implementation must agree with scipy's
    tie-corrected spearmanr (scipy stays OUT of the study path so a
    missing dependency can't lose a solved point, but where it exists it
    is the oracle)."""
    scipy_stats = pytest.importorskip("scipy.stats")
    rng = np.random.default_rng(0)
    for _ in range(5):
        # heavy ties, like real per-bit accuracies quantized to k/samples
        acc = rng.integers(15, 21, size=32) / 20.0
        sig = np.round(rng.uniform(0.05, 0.3, size=32), 2)
        point = {"per_bit_acc": acc.tolist(), "band_sigma": sig.tolist()}
        got = study.bit_sigma_correlation(point)
        want = float(scipy_stats.spearmanr(acc, sig).statistic)
        assert got == pytest.approx(want, abs=1e-12)


def test_auto_chunk_respects_measured_envelope():
    """chunk*starts stays inside the measured v5e crash envelope at every
    study grid point, matches the measured-OK operating points, and falls
    back to restart-chunking for the 256px-wide models where one sample's
    20 restarts already exceed the budget."""
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.cli.study import (
        SCALING_MODELS,
        _auto_chunk,
    )

    assert _auto_chunk(64, 128, 20) == (10, 0)   # 200 chains, measured OK
    assert _auto_chunk(128, 128, 20) == (5, 0)   # 100 chains, measured OK
    assert _auto_chunk(128, 256, 20) == (2, 0)   # 40 chains, measured OK
    # pruning reinvestment rows (n=40) keep the chain budget
    c, s = _auto_chunk(128, 128, 40)
    assert c * 40 <= 100 and s == 0
    crash_units = 4.2e8  # 100 chains @128px/cm256 crashed
    for img, cm, _ in SCALING_MODELS:
        chunk, chunk_starts = _auto_chunk(img, cm, 20)
        chains = chunk * (chunk_starts or 20)
        assert chains * img * img * cm < crash_units, (img, cm)
        assert chunk >= 1
        if chunk_starts:  # only the models too wide for one full sample
            assert chunk == 1 and img >= 256


def test_study_cli_resume_skips_done(tmp_path, monkeypatch, capsys):
    """_run_points must skip tags already in the jsonl (crash resume)."""
    out = tmp_path / "table.json"
    jsonl = str(out) + ".jsonl"
    done_rec = {"tag": "a", "mean_bit_acc": 0.9}
    with open(jsonl, "w") as f:
        f.write(json.dumps(done_rec) + "\n")

    args = study_cli._parser().parse_args(["headline", "--out", str(out)])
    # the only spec's tag is already done -> no training, no pipeline
    # build (ensure_trained would raise on the bogus model kwargs)
    rc = study_cli._run_points(
        args, [("a", {"img_size": 1, "channel_max": 1, "train_steps": 0}, {})],
        str(out),
    )
    assert rc == 0
    with open(out) as f:
        table = json.load(f)
    assert table == [done_rec]


def test_study_cli_parser_subcommands():
    for cmd in ["headline", "robustness", "scaling", "capacity", "perceptual"]:
        args = study_cli._parser().parse_args([cmd])
        assert args.cmd == cmd
        assert args.samples >= 20


def test_synthesis_max_blocks(tiny_pipe):
    """max_blocks truncation (gen roofline support): full == default;
    k=0 stops at the 4px base."""
    import jax.numpy as jnp

    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.models import (
        stylegan2 as sg2,
    )

    mcfg = tiny_pipe.mcfg
    nl = sg2.n_latent(mcfg.img_size)
    w = jax.random.normal(jax.random.PRNGKey(0), (2, nl, mcfg.style_dim))
    full = sg2.synthesis(tiny_pipe.gen_params, w, tiny_pipe.noise)
    n_blocks = len(tiny_pipe.gen_params["to_rgbs"])
    same = sg2.synthesis(
        tiny_pipe.gen_params, w, tiny_pipe.noise, max_blocks=n_blocks
    )
    np.testing.assert_array_equal(np.asarray(full), np.asarray(same))
    base = sg2.synthesis(tiny_pipe.gen_params, w, tiny_pipe.noise, max_blocks=0)
    assert base.shape == (2, 4, 4, 3)
    mid = sg2.synthesis(tiny_pipe.gen_params, w, tiny_pipe.noise, max_blocks=1)
    assert mid.shape == (2, 8, 8, 3)
