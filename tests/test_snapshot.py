"""Training snapshot/resume tests (training/snapshot.py + cli.train).

Attribution-side resume is covered in test_cli.py; this is the training
counterpart: the FULL TrainState round-trips through the .npz snapshot,
config mismatches are refused, and a preempted-then-resumed CLI run
produces the bit-identical exported generator as an uninterrupted run
(the step key stream is fold_in(base_key, absolute_step) and the folder
schedule fast-forwards by pure index math).
"""

import os

import jax
import numpy as np
import pytest

from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.config import (
    ModelConfig,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.training.gan import (
    TrainConfig,
    init_train_state,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.training.snapshot import (
    check_meta,
    load_snapshot,
    save_snapshot,
)

MCFG = ModelConfig(
    model="sg2", img_size=16, style_dim=32, n_mlp=2, channel_max=32, ckpt=None
)
TCFG = TrainConfig(batch=4, d_reg_every=2, ema_decay=0.9)


def _tree_equal(a, b):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_snapshot_roundtrip(tmp_path):
    state = init_train_state(jax.random.PRNGKey(0), MCFG, TCFG)
    path = str(tmp_path / "snap.npz")
    save_snapshot(path, state, {"step": 7, "seed": 0})
    template = init_train_state(jax.random.PRNGKey(1), MCFG, TCFG)
    loaded, meta = load_snapshot(path, template)
    assert meta == {"step": 7, "seed": 0}
    _tree_equal(loaded, state)
    # atomicity plumbing: no stray tmp files left behind
    assert [f for f in os.listdir(tmp_path) if f != "snap.npz"] == []


def test_snapshot_meta_mismatch_refused(tmp_path):
    state = init_train_state(jax.random.PRNGKey(0), MCFG, TCFG)
    path = str(tmp_path / "snap.npz")
    save_snapshot(path, state, {"step": 3, "img_size": 16, "lr": 0.002})
    check_meta({"step": 3, "img_size": 16, "lr": 0.002},
               {"img_size": 16, "lr": 0.002})
    with pytest.raises(ValueError, match="img_size"):
        check_meta({"img_size": 16}, {"img_size": 32})


def test_snapshot_shape_mismatch_refused(tmp_path):
    import dataclasses

    state = init_train_state(jax.random.PRNGKey(0), MCFG, TCFG)
    path = str(tmp_path / "snap.npz")
    save_snapshot(path, state, {"step": 1})
    bigger = init_train_state(
        jax.random.PRNGKey(0), dataclasses.replace(MCFG, channel_max=64), TCFG)
    with pytest.raises(ValueError):
        load_snapshot(path, bigger)


def _run_train(tmp_path, tag, steps, extra):
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.cli import (
        train as train_cli,
    )

    out = str(tmp_path / f"{tag}.npz")
    rc = train_cli.main([
        "--img_size", "16", "--style_dim", "32", "--n_mlp", "2",
        "--channel_max", "32", "--steps", str(steps), "--batch", "4",
        "--chunk", "2", "--out", out, "--compile_cache", "",
    ] + extra)
    assert rc == 0
    return dict(np.load(out))


def test_cli_resume_bit_exact(tmp_path):
    """4 straight steps == 2 steps + crash + resume to 4, bit-for-bit.

    Chunk boundaries are identical in both runs (chunk=2), so the scanned
    programs have the same shapes and XLA's CPU tiling cannot introduce
    drift (the known cross-shape nondeterminism, see tests elsewhere)."""
    snap = str(tmp_path / "state.npz")
    ref = _run_train(tmp_path, "straight", 4, [])
    part = _run_train(tmp_path, "part", 2, ["--snapshot", snap])
    assert os.path.exists(snap)
    resumed = _run_train(
        tmp_path, "resumed", 4, ["--snapshot", snap, "--resume"])
    assert set(ref) == set(resumed)
    for k in ref:
        np.testing.assert_array_equal(ref[k], resumed[k], err_msg=k)
    # and the partial run genuinely differs (snapshot was mid-run)
    assert any(
        not np.array_equal(part[k], ref[k]) for k in ref
    ), "2-step export should differ from the 4-step export"


def test_cli_resume_config_mismatch_refused(tmp_path):
    snap = str(tmp_path / "state.npz")
    _run_train(tmp_path, "a", 2, ["--snapshot", snap])
    with pytest.raises(ValueError, match="refusing to resume"):
        _run_train(tmp_path, "b", 4,
                   ["--snapshot", snap, "--resume", "--lr", "0.01"])


def test_cli_metrics_jsonl_contiguous_across_resume(tmp_path):
    """--metrics_out appends one row per executed step with finite values;
    a resumed run continues the same file without duplicating steps."""
    import json

    snap = str(tmp_path / "state.npz")
    mpath = str(tmp_path / "metrics.jsonl")
    _run_train(tmp_path, "m1", 3,
               ["--snapshot", snap, "--metrics_out", mpath])
    _run_train(tmp_path, "m2", 5,
               ["--snapshot", snap, "--resume", "--metrics_out", mpath])
    rows = [json.loads(l) for l in open(mpath)]
    assert [r["step"] for r in rows] == [1, 2, 3, 4, 5]
    for r in rows:
        for k in ("d_loss", "g_loss", "r1", "chunk_steps_per_s"):
            assert np.isfinite(r[k]), (r, k)


def test_folder_schedule_fast_forward(tmp_path):
    """schedule(start=k) yields exactly the tail of schedule(start=0),
    including across an epoch wrap (n=5 files, batch=4)."""
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.training import (
        folder,
    )

    class Tiny(folder.ImageFolder):
        def __init__(self, n):
            self.files = [f"f{i}.png" for i in range(n)]
            self._all_png = True

    ds = Tiny(5)
    full = list(ds.schedule(seed=3, batch=4, steps=10))
    tail = list(ds.schedule(seed=3, batch=4, steps=6, start=4))
    assert len(tail) == 6
    for a, b in zip(full[4:], tail):
        np.testing.assert_array_equal(a, b)
