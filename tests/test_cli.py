"""In-process CLI end-to-end tests: generate -> artifacts, attribute ->
result.txt + resumable state, evaluate -> sweep json.  Tiny random-init
models; validates the full user-facing surface incl. flag parsing and
output layouts (ref README.md usage / src/params.py flags)."""

import json
import os

import numpy as np
import pytest


COMMON = [
    "--model", "sg2", "--random_init", "--img_size", "16",
    "--key_len", "4", "--shift", "504", "--sigma", "1.0",
    "--compile_cache", "",
]


def test_generate_cli(tmp_path):
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.cli.generate import (
        main,
    )

    rc = main(COMMON + ["--sample_size", "2", "--save_dir", str(tmp_path) + "/"])
    assert rc == 0
    runs = []
    for root, dirs, files in os.walk(tmp_path):
        if "sampling_config.yaml" in files:
            runs.append(root)
    assert len(runs) == 1
    run = runs[0]
    assert "None/fixed_sigma_10/shift_504" in run.replace(os.sep, "/")
    for sub in ("original", "watermarked", "watermark_pos", "watermark_neg"):
        pngs = os.listdir(os.path.join(run, sub))
        assert sorted(pngs) == ["000000.png", "000001.png"], (sub, pngs)
    # PNGs decode to 16x16 RGB
    from PIL import Image

    arr = np.asarray(Image.open(os.path.join(run, "watermarked", "000000.png")))
    assert arr.shape == (16, 16, 3) and arr.dtype == np.uint8


def test_attribute_cli_and_resume(tmp_path):
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.cli.attribute import (
        main,
    )

    args = COMMON + [
        "--sample_size", "2", "--steps", "5", "--n", "2", "--loss", "mse",
        "--save_dir", str(tmp_path) + "/", "--chunk_samples", "1",
    ]
    rc = main(args)
    assert rc == 0
    runs = []
    for root, dirs, files in os.walk(tmp_path):
        if "result.txt" in files:
            runs.append(root)
    assert len(runs) == 1
    run = runs[0]
    txt = open(os.path.join(run, "result.txt")).read()
    assert "sample index: 0, bit acc:" in txt
    assert "sample index: 1, bit acc:" in txt
    # resumable state was written and marks the run complete
    st = json.load(open(os.path.join(run, "attribution_state.json")))
    assert st["next_sample"] == 2
    assert len(st["bit_accs"]) == 2
    # per-sample arrays span ALL chunks and align with true_bits
    import numpy as np

    z = np.load(os.path.join(run, "attribution_arrays.npz"))
    assert z["recovered_bits"].shape[0] == 2  # both chunks, not just the last
    assert z["losses_all"].shape[0] == 2
    assert z["true_bits"].shape[0] == 2
    assert int(z["first_sample"]) == 0
    # result PNGs: one file PER SAMPLE (store_results used to overwrite
    # every batch element into the same {index}.png)
    orig = sorted(os.listdir(os.path.join(run, "original")))
    assert orig == ["000000.png", "000001.png"]
    # resuming a finished run is a no-op that exits cleanly --- and must
    # restore the SAVED config/seed even when the CLI flags differ (the
    # resumed tail would otherwise solve different targets)
    rc2 = main(["--resume", run, "--seed", "99", "--sample_size", "7"])
    assert rc2 == 0
    st2 = json.load(open(os.path.join(run, "attribution_state.json")))
    assert st2["next_sample"] == 2 and len(st2["bit_accs"]) == 2
    assert st2["seed"] == st["seed"]


def test_evaluate_cli(tmp_path):
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.cli.evaluate import (
        main,
    )

    out = str(tmp_path / "sweep.json")
    rc = main(
        COMMON
        + [
            "--key_lens", "4", "--sigmas", "1.0", "--samples", "2",
            "--steps", "3", "--n", "2", "--loss", "mse", "--out", out,
        ]
    )
    assert rc == 0
    pts = json.load(open(out))
    assert len(pts) == 1
    assert pts[0]["key_len"] == 4
    assert 0.0 <= pts[0]["mean_bit_acc"] <= 1.0


def test_cli_rejects_unknown_model(tmp_path):
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.cli.generate import (
        main,
    )

    with pytest.raises(ValueError, match="Not Avail GANs"):
        main(["--model", "dalle", "--random_init", "--img_size", "16",
              "--sample_size", "1", "--compile_cache", "",
              "--save_dir", str(tmp_path) + "/"])


def test_flags_reach_config():
    """Every attack/parallelism knob is threaded from flags into the config
    (round-1 gap: --crop_ratio/--blur_filter_size/--mesh_model/--use_pallas
    existed as config fields but had no flags)."""
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.cli.common import (
        apply_runtime_config,
        build_parser,
        config_from_args,
    )
    import importlib

    uf = importlib.import_module(
        "attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.ops.upfirdn2d"
    )

    args = build_parser("t").parse_args(
        [
            "--random_init", "--augmentation", "Crop", "--crop_ratio", "0.8",
            "--blur_filter_size", "13", "--mesh_model", "2", "--mesh_data", "4",
            "--use_pallas",
        ]
    )
    cfg = config_from_args(args)
    assert cfg.attack.crop_ratio == 0.8
    assert cfg.attack.blur_filter_size == 13
    assert cfg.run.mesh_model == 2
    assert cfg.run.mesh_data == 4
    assert cfg.run.use_pallas
    prev = uf.pallas_enabled()
    try:
        apply_runtime_config(cfg)
        assert uf.pallas_enabled()
    finally:
        uf.enable_pallas(prev)

    # attack knobs actually alter the built attack
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.attacks import (
        make_attack,
    )
    import jax
    import jax.numpy as jnp

    img = jnp.ones((1, 16, 16, 3))
    fn = make_attack(cfg.attack, is_train=False)
    out = fn(img, jax.random.PRNGKey(0))
    assert out.shape == img.shape  # crop + resize back


def test_attribute_cli_profile(tmp_path):
    """--profile prints the phase report and survives platforms without a
    working jax.profiler (prof.trace degrades to a warning)."""
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.cli import (
        attribute as attribute_cli,
    )

    rc = attribute_cli.main(
        [
            "--random_init", "--model", "sg2", "--img_size", "16",
            "--sample_size", "2", "--key_len", "8", "--shift", "504",
            "--steps", "5", "--n", "2", "--loss", "mse",
            "--save_dir", str(tmp_path), "--compile_cache", "", "--profile",
        ]
    )
    assert rc == 0


def test_attribute_cli_resumes_after_midrun_crash(tmp_path, monkeypatch):
    """Failure recovery: crash after the first of two sample chunks, then
    resume from the run dir — the completed run must cover both samples
    and the resumed sample must match an uninterrupted run's result."""
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.cli import (
        attribute as attribute_cli,
    )
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.fingerprint import (
        attribute as attr,
    )

    args = COMMON + [
        "--sample_size", "2", "--steps", "5", "--n", "2", "--loss", "mse",
        "--save_dir", str(tmp_path) + "/", "--chunk_samples", "1",
    ]

    # uninterrupted oracle run
    assert attribute_cli.main(args + ["--seed", "3"]) == 0
    oracle_run = next(
        root for root, dirs, files in os.walk(tmp_path) if "result.txt" in files
    )
    oracle_txt = open(os.path.join(oracle_run, "result.txt")).read()

    # crashing run: die entering the second chunk
    crash_dir = tmp_path / "crash"
    calls = {"n": 0}
    orig = attr.attribute_chunked

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected mid-run crash")
        return orig(*a, **kw)

    monkeypatch.setattr(attr, "attribute_chunked", flaky)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="injected"):
        attribute_cli.main(
            COMMON + ["--sample_size", "2", "--steps", "5", "--n", "2",
                      "--loss", "mse", "--save_dir", str(crash_dir) + "/",
                      "--chunk_samples", "1", "--seed", "3"]
        )
    monkeypatch.setattr(attr, "attribute_chunked", orig)

    run = next(
        root for root, dirs, files in os.walk(crash_dir) if "result.txt" in files
    )
    st = json.load(open(os.path.join(run, "attribution_state.json")))
    assert st["next_sample"] == 1  # first chunk landed before the crash

    # resume completes the run with identical per-sample results
    assert attribute_cli.main(args + ["--seed", "3", "--resume", run]) == 0
    st2 = json.load(open(os.path.join(run, "attribution_state.json")))
    assert st2["next_sample"] == 2 and len(st2["bit_accs"]) == 2
    assert open(os.path.join(run, "result.txt")).read() == oracle_txt


def test_train_cli_exports_loadable_ckpt(tmp_path):
    """cli.train end-to-end at smoke scale: parses flags, runs scanned
    steps, exports a rosinality-layout .npz that cli.attribute can load
    via --ckpt (the full selftrain quality-loop plumbing; measured
    operating points in BASELINE.md)."""
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.cli import (
        attribute as attribute_cli,
        train as train_cli,
    )

    out = str(tmp_path / "tiny_ema.npz")
    rc = train_cli.main([
        "--img_size", "16", "--style_dim", "32", "--n_mlp", "2",
        "--channel_max", "32", "--steps", "2", "--batch", "4",
        "--chunk", "2", "--out", out, "--compile_cache", "",
    ])
    assert rc == 0
    assert os.path.exists(out)

    save_dir = str(tmp_path / "res")
    rc = attribute_cli.main([
        "--model", "sg2", "--ckpt", out, "--img_size", "16",
        "--style_dim", "32", "--n_mlp", "2", "--channel_max", "32",
        "--key_len", "4", "--shift", "28", "--sigma", "1.0",
        "--sample_size", "1", "--steps", "5", "--n", "2", "--loss", "mse",
        "--save_dir", save_dir, "--compile_cache", "",
    ])
    assert rc == 0
    results = []
    for root, _, files in os.walk(save_dir):
        results += [os.path.join(root, f) for f in files if f == "result.txt"]
    assert results, "attribute against the trained ckpt wrote no result.txt"


def test_generate_cli_mesh_path(tmp_path, capsys):
    """--batch_size divisible by the 8-device data axis routes generation
    through generate_on_mesh (SPMD synthesis); artifact layout unchanged."""
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.cli.generate import (
        main,
    )

    rc = main(COMMON + [
        "--sample_size", "1", "--batch_size", "8",
        "--save_dir", str(tmp_path) + "/",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "mesh: {'data': 8, 'model': 1}" in out
    for root, dirs, files in os.walk(tmp_path):
        if "sampling_config.yaml" in files:
            pngs = sorted(os.listdir(os.path.join(root, "watermarked")))
            assert pngs == [f"{i:06d}.png" for i in range(8)]
            break
    else:
        raise AssertionError("no run dir written")


def test_packed_tail_auto_resolution():
    """--packed_tail defaults to -1 = auto: resolved at config build to
    the measured policy (pack the final block at >=1024px, nothing
    below; explicit values pass through)."""
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.cli.common import (
        build_parser,
        config_from_args,
    )

    def resolved(extra):
        args = build_parser("t").parse_args(["--random_init"] + extra)
        return config_from_args(args).run.packed_tail

    assert resolved(["--img_size", "1024"]) == 1
    assert resolved(["--img_size", "256"]) == 0
    assert resolved(["--img_size", "1024", "--packed_tail", "0"]) == 0
    assert resolved(["--img_size", "256", "--packed_tail", "2"]) == 2
