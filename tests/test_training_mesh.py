"""Mesh-data-parallel training (parallel/train.py + gan.py mesh mode).

Global-batch semantics: GSPMD preserves program meaning, so the 8-way
data-parallel step must follow the same optimization trajectory as the
single-device step on the same global batch — including the
discriminator's minibatch-stddev, whose batch statistics become an ICI
all-reduce under sharding.  Bit-exactness across device counts is
impossible on the XLA CPU backend (tiling changes reduction order; see
tests/test_sharding.py), so agreement is asserted to tight tolerances.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.config import (
    ModelConfig,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.parallel.mesh import (
    make_mesh,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.parallel.train import (
    make_mesh_chunk_runners,
    place_train_state,
    shard_reals,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.training.gan import (
    TrainConfig,
    init_train_state,
    make_train_step,
)

MCFG = ModelConfig(
    model="sg2", img_size=16, style_dim=32, n_mlp=2, channel_max=32, ckpt=None
)
TCFG = TrainConfig(batch=8, d_reg_every=2, ema_decay=0.9)


def _run_steps(step, state, n):
    metrics = []
    for j in range(n):
        state, m = jax.jit(step)(state, jax.random.fold_in(jax.random.PRNGKey(7), j))
        metrics.append({k: float(v) for k, v in m.items()})
    return state, metrics


def test_mesh_step_matches_single_device():
    """Per-step losses agree between 8-way DP and single device.

    Raw-parameter equality is deliberately NOT asserted: Adam's early
    updates are ~lr*sign(g) (v_hat ≈ g²), so any parameter whose gradient
    is near zero flips its update sign under a different reduction order
    — a ±2·lr param diff that says nothing about sharding correctness
    (observed: ~0.004-0.007 diffs on exactly such params while every loss
    metric matched).  The metrics are the semantics-bearing quantities:
    they are computed from the full forward/backward on the global batch
    each step, so a wrong collective (e.g. a missed gradient psum or
    local-batch minibatch-stddev) shifts them far beyond these bounds."""
    state0 = init_train_state(jax.random.PRNGKey(0), MCFG, TCFG)
    mesh = make_mesh(data=8)

    _, m_single = _run_steps(make_train_step(MCFG, TCFG), state0, 3)
    _, m_mesh = _run_steps(
        make_train_step(MCFG, TCFG, mesh=mesh), place_train_state(mesh, state0), 3
    )

    for a, b in zip(m_single, m_mesh):
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=2e-2, atol=1e-3, err_msg=k)


def test_mesh_chunk_runners_synthetic_and_external():
    mesh = make_mesh(data=8)
    state = place_train_state(mesh, init_train_state(jax.random.PRNGKey(1), MCFG, TCFG))
    run_chunk, run_chunk_data = make_mesh_chunk_runners(mesh, MCFG, TCFG)
    state, metrics = run_chunk(state, jax.random.PRNGKey(2), jnp.int32(0), 2)
    assert int(state.step) == 2
    assert all(np.isfinite(np.asarray(v)).all() for v in metrics.values())

    _, run_chunk_data = make_mesh_chunk_runners(mesh, MCFG, TCFG, external_data=True)
    reals = shard_reals(
        mesh, np.random.default_rng(0).uniform(-1, 1, (2, 8, 16, 16, 3)).astype(np.float32)
    )
    state2, metrics2 = run_chunk_data(
        place_train_state(mesh, init_train_state(jax.random.PRNGKey(1), MCFG, TCFG)),
        jax.random.PRNGKey(2), jnp.int32(0), reals,
    )
    assert int(state2.step) == 2
    assert all(np.isfinite(np.asarray(v)).all() for v in metrics2.values())


def test_mesh_rejects_indivisible_batch():
    mesh = make_mesh(data=8)
    bad = dataclasses.replace(TCFG, batch=4)
    try:
        make_mesh_chunk_runners(mesh, MCFG, bad)
    except ValueError as e:
        assert "divisible" in str(e)
    else:
        raise AssertionError("expected ValueError for batch 4 on 8-way mesh")


def test_train_cli_mesh_engagement(tmp_path, capsys):
    """batch divisible by the 8-device data axis auto-engages the mesh;
    exported checkpoint stays loadable."""
    import os

    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.cli import (
        train as train_cli,
    )

    out = str(tmp_path / "mesh_ema.npz")
    rc = train_cli.main([
        "--img_size", "16", "--style_dim", "32", "--n_mlp", "2",
        "--channel_max", "32", "--steps", "2", "--batch", "8",
        "--chunk", "2", "--out", out, "--compile_cache", "",
    ])
    assert rc == 0
    assert "[train] mesh: {'data': 8, 'model': 1}" in capsys.readouterr().out
    assert os.path.exists(out)
    sd = dict(np.load(out))
    assert any(k.startswith("style") for k in sd)
