"""End-to-end test of the model-attribution CLI: export two tiny
random-init generators as .npz checkpoints, run the CLI in-process in
self-test mode, and check the decisions and the JSON record."""

import json

import jax
import numpy as np
import pytest

from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.checkpoints.rosinality import (
    generator_state_dict_from_params,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.cli import (
    model_attribute as cli_ma,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.config import (
    ModelConfig,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.models import (
    stylegan2 as sg2,
)

MCFG = ModelConfig(img_size=32, channel_max=64, n_mlp=3, style_dim=64)

ARCH_FLAGS = [
    "--img_size", "32", "--channel_max", "64", "--n_mlp", "3",
    "--style_dim", "64", "--key_len", "8", "--shift", "56",
    "--sigma", "1.0", "--loss", "mse", "--lr", "0.2",
    "--compile_cache", "",
]


@pytest.fixture(scope="module")
def ckpts(tmp_path_factory):
    d = tmp_path_factory.mktemp("ma_ckpts")
    paths = {}
    for name, seed in (("a", 0), ("b", 100)):
        params = sg2.init_generator_params(jax.random.PRNGKey(seed), MCFG)
        sd = generator_state_dict_from_params(jax.tree.map(np.asarray, params))
        p = d / f"model_{name}.npz"
        np.savez(p, **sd)
        paths[name] = str(p)
    return paths


def test_self_test_mode_with_calibration(ckpts, tmp_path, capsys):
    out = tmp_path / "ma.json"
    rc = cli_ma.main(
        ARCH_FLAGS + [
            "--models", f"a={ckpts['a']}", f"b={ckpts['b']}",
            "--sample_size", "4", "--steps", "450", "--n", "4",
            "--calibrate", "2", "--no_clip_targets",
            "--out", str(out),
        ]
    )
    assert rc == 0
    rec = json.loads(out.read_text())
    assert rec["models"] == ["a", "b"]
    assert np.asarray(rec["loss_matrix"]).shape == (2, 4)
    assert rec["open_set_threshold"] is not None
    # every self-test image decides for its true generator
    assert rec["self_test_accuracy"] == 1.0
    for row in rec["decisions"]:
        assert row["decided"] and row["model"] == row["target"].split("#")[0]
        assert row["margin"] > 1.5
    assert "self-test accuracy: 1.0000" in capsys.readouterr().out


def test_disk_images_mode(ckpts, tmp_path):
    """Targets from disk (.npy float and .png via the image writer path)
    attribute back to the model that made them."""
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.fingerprint import (
        pipeline as pl,
    )
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.config import (
        FingerprintConfig,
    )

    # identical fingerprint config (incl. default n_pca_samples) and build
    # key as the CLI's model "a": the planted target is exactly on-manifold
    fp = FingerprintConfig(key_len=8, shift=56, sigma=1.0, sd_moved=1.0)
    pipe = pl.build_pipeline(
        jax.random.fold_in(jax.random.PRNGKey(0), 0), MCFG, fp,
        ckpt_path=ckpts["a"], want_lpips=False,
    )
    imgs, *_ = pl.generate_fingerprinted(pipe, jax.random.PRNGKey(9), 1)
    npy = tmp_path / "t0.npy"
    np.save(npy, np.asarray(imgs[0], np.float32))

    out = tmp_path / "ma_disk.json"
    rc = cli_ma.main(
        ARCH_FLAGS + [
            "--models", f"a={ckpts['a']}", f"b={ckpts['b']}",
            "--images", str(npy),
            "--steps", "450", "--n", "4",
            "--out", str(out),
        ]
    )
    assert rc == 0
    rec = json.loads(out.read_text())
    assert rec["decisions"][0]["model"] == "a"
    assert rec["decisions"][0]["margin"] > 1.5


def test_bad_flags():
    with pytest.raises(SystemExit):
        cli_ma.main(ARCH_FLAGS + ["--models", "nopath"])
    with pytest.raises(SystemExit):
        cli_ma.main(ARCH_FLAGS + ["--models", "a=/does/not/exist.npz"])
    with pytest.raises(SystemExit):
        cli_ma.main(ARCH_FLAGS)  # no models, no --random_init
