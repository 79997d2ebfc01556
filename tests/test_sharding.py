"""Multi-device sharding tests on the 8-device virtual CPU mesh.

Checks: mesh construction, data-parallel attribution equals single-device
attribution bit-for-bit (same program, same rng), tensor-parallel
generator placement executes, and the embarrassingly-parallel claim (no
result dependence on mesh shape).
"""

import jax
import jax.numpy as jnp
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
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.models import (
    stylegan2 as sg2,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.parallel import (
    mesh as pm,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.parallel.solver import (
    attribute_on_mesh,
)

MCFG = ModelConfig(img_size=16, channel_max=64, n_mlp=2, style_dim=64)
FPCFG = FingerprintConfig(key_len=8, shift=56, sigma=1.0, n_pca_samples=500)
ACFG = AttributionConfig(steps=10, n_starts=2, lr=0.2, loss="mse")


def test_environment_has_8_devices():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    m = pm.make_mesh()
    assert m.shape == {"data": 8, "model": 1}
    m2 = pm.make_mesh(model=2)
    assert m2.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        pm.make_mesh(data=5, model=3)


@pytest.fixture(scope="module")
def pipe():
    return pl.build_pipeline(jax.random.PRNGKey(0), MCFG, FPCFG, want_lpips=False)


def test_data_parallel_matches_single_device(pipe):
    imgs, _, _, bits, _ = pl.generate_fingerprinted(pipe, jax.random.PRNGKey(1), 8)
    rng = jax.random.PRNGKey(2)

    res1 = attr.attribute(
        pipe.gen_params, None, pipe.basis, pipe.noise, imgs, rng,
        mcfg=MCFG, acfg=ACFG,
    )
    mesh = pm.make_mesh()  # 8-way data parallel
    res8 = attribute_on_mesh(
        mesh, pipe.gen_params, None, pipe.basis, pipe.noise, imgs, rng,
        mcfg=MCFG, acfg=ACFG,
    )
    np.testing.assert_allclose(
        np.asarray(res1.loss), np.asarray(res8.loss), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(res1.key_bits), np.asarray(res8.key_bits)
    )
    # the sharded result really lives distributed over 8 devices
    assert len(res8.loss.sharding.device_set) == 8


def test_mesh_2d_with_model_sharding_matches_unsharded(pipe):
    """Tensor parallelism must be *numerically equivalent*, not just
    executable: the channel-sharded solve on a 4x2 mesh reproduces the
    single-device result (same program, same rng; XLA inserts the
    boundary collectives)."""
    imgs, _, _, bits, _ = pl.generate_fingerprinted(pipe, jax.random.PRNGKey(3), 4)
    rng = jax.random.PRNGKey(4)
    ref = attr.attribute(
        pipe.gen_params, None, pipe.basis, pipe.noise, imgs, rng,
        mcfg=MCFG, acfg=ACFG,
    )
    mesh = pm.make_mesh(model=2)  # 4 x 2 mesh
    res = attribute_on_mesh(
        mesh, pipe.gen_params, None, pipe.basis, pipe.noise, imgs,
        rng, mcfg=MCFG, acfg=ACFG, shard_model=True,
    )
    assert np.isfinite(np.asarray(res.loss)).all()
    assert res.key_bits.shape == (4, 8)
    # collectives reassociate float sums; allow accumulation-order slack
    np.testing.assert_allclose(
        np.asarray(res.loss), np.asarray(ref.loss), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(res.alpha), np.asarray(ref.alpha), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(res.key_bits), np.asarray(ref.key_bits)
    )


def test_tp_synthesis_matches_replicated(pipe):
    """Channel-sharded synthesis (the TP hot path) is numerically equal to
    replicated synthesis at the pixel level."""
    w = jax.random.normal(jax.random.PRNGKey(8), (4, MCFG.style_dim))
    single = pl.synthesize(pipe, w)
    mesh = pm.make_mesh(model=2)
    params_tp = pm.shard_generator_params(mesh, pipe.gen_params)
    noise_r = pm.replicate(mesh, pipe.noise)
    w_sh = pm.shard_batch(mesh, w)
    with jax.sharding.set_mesh(mesh):
        tp = pl._synthesize_core(params_tp, noise_r, w_sh, mcfg=MCFG)
    np.testing.assert_allclose(
        np.asarray(single), np.asarray(tp), rtol=1e-4, atol=1e-5
    )


def test_shard_generator_params_placement(pipe):
    mesh = pm.make_mesh(model=2)
    sharded = pm.shard_generator_params(mesh, pipe.gen_params)
    w = sharded["conv1"]["weight"]  # [3,3,64,64]: O=64 divisible by 2
    assert len(w.sharding.device_set) == 8
    spec = w.sharding.spec
    assert spec[-1] == "model"
    # modulation weights stay replicated
    mw = sharded["conv1"]["mod"]["weight"]
    assert mw.sharding.spec == jax.sharding.PartitionSpec()


def test_sharded_generation_matches_replicated(pipe):
    """Generation over a data mesh is bit-compatible with single-device."""
    w = jax.random.normal(jax.random.PRNGKey(5), (8, MCFG.style_dim))
    single = pl.synthesize(pipe, w)
    mesh = pm.make_mesh()
    w_sh = pm.shard_batch(mesh, w)
    params_r = pm.replicate(mesh, pipe.gen_params)
    noise_r = pm.replicate(mesh, pipe.noise)
    with jax.sharding.set_mesh(mesh):
        shard = pl._synthesize_core(params_r, noise_r, w_sh, mcfg=MCFG)
    np.testing.assert_allclose(
        np.asarray(single), np.asarray(shard), rtol=1e-5, atol=1e-5
    )


def test_divisibility_error(pipe):
    imgs, *_ = pl.generate_fingerprinted(pipe, jax.random.PRNGKey(6), 3)
    with pytest.raises(ValueError, match="not divisible"):
        attribute_on_mesh(
            pm.make_mesh(), pipe.gen_params, None, pipe.basis, pipe.noise,
            imgs, jax.random.PRNGKey(7), mcfg=MCFG, acfg=ACFG,
        )


def test_data_parallel_pruned_and_aware_matches_single_device(pipe):
    """Round-3 solver options compose with the mesh: restart pruning
    (per-sample gather along the restart axis) and attack-aware solving
    (channel model inside the loss) both stay DP-exact --- the sharded
    solve equals the single-device solve."""
    import dataclasses

    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.attacks import (
        center_crop,
    )
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.config import (
        AttackConfig,
    )

    acfg = dataclasses.replace(
        ACFG, steps=12, n_starts=4, prune_starts=2, prune_frac=0.5,
        solver_attack="Crop",
    )
    atk = AttackConfig(augmentation="Crop", crop_ratio=0.75)
    imgs, _, _, bits, _ = pl.generate_fingerprinted(pipe, jax.random.PRNGKey(3), 8)
    targets = center_crop(imgs, ratio=0.75)
    rng = jax.random.PRNGKey(4)

    res1 = attr.attribute(
        pipe.gen_params, None, pipe.basis, pipe.noise, targets, rng,
        mcfg=MCFG, acfg=acfg, attack_cfg=atk,
    )
    res8 = attribute_on_mesh(
        pm.make_mesh(), pipe.gen_params, None, pipe.basis, pipe.noise,
        targets, rng, mcfg=MCFG, acfg=acfg, attack_cfg=atk,
    )
    np.testing.assert_allclose(
        np.asarray(res1.loss), np.asarray(res8.loss), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(res1.key_bits), np.asarray(res8.key_bits)
    )
    np.testing.assert_array_equal(
        np.asarray(res1.best_start), np.asarray(res8.best_start)
    )
    assert res8.losses_all.shape == (8, 2)  # survivors only


def test_chunk_starts_composes_with_mesh(pipe):
    """attribute_chunked's solve_fn hook (the CLI's --chunk_starts + mesh
    composition): restart chunking through the mesh-placed solver must
    equal the unchunked mesh solve --- restart chunks merge by per-sample
    argmin, and the LHS init is identical because each chunk folds the
    same rng offsets regardless of backend."""
    imgs, _, _, bits, _ = pl.generate_fingerprinted(pipe, jax.random.PRNGKey(5), 8)
    rng = jax.random.PRNGKey(6)
    acfg = AttributionConfig(steps=10, n_starts=4, lr=0.2, loss="mse")
    mesh = pm.make_mesh()

    def solve_fn(tgt, r, **skw):
        return attribute_on_mesh(
            mesh, pipe.gen_params, None, pipe.basis, pipe.noise, tgt, r,
            mcfg=MCFG, acfg=acfg, **skw,
        )

    chunked = attr.attribute_chunked(
        pipe.gen_params, None, pipe.basis, pipe.noise, imgs, rng,
        mcfg=MCFG, acfg=acfg, chunk_starts=2, solve_fn=solve_fn,
    )
    # oracle: the same restart chunking on one device (chunk-exact merge
    # is already proven vs the monolithic solve in test_attribution_e2e)
    single = attr.attribute_chunked(
        pipe.gen_params, None, pipe.basis, pipe.noise, imgs, rng,
        mcfg=MCFG, acfg=acfg, chunk_starts=2,
    )
    np.testing.assert_allclose(
        np.asarray(chunked.loss), np.asarray(single.loss), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(chunked.key_bits), np.asarray(single.key_bits)
    )
    assert chunked.losses_all.shape[1] == 4  # all restart chunks merged


def test_generate_on_mesh_matches_single_device(pipe):
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.parallel.solver import (
        generate_on_mesh,
        place_pipeline,
    )

    rng = jax.random.PRNGKey(3)
    imgs1, w01, wx1, bits1, _ = pl.generate_fingerprinted(pipe, rng, 8)
    mesh = pm.make_mesh()  # 8-way data parallel
    placed = place_pipeline(mesh, pipe)
    imgs8, w08, wx8, bits8, _ = generate_on_mesh(mesh, placed, rng, 8)

    np.testing.assert_array_equal(np.asarray(bits1), np.asarray(bits8))
    np.testing.assert_allclose(np.asarray(wx1), np.asarray(wx8), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(imgs1), np.asarray(imgs8), rtol=1e-4, atol=1e-4
    )
    # the images really live distributed over all 8 devices
    assert len(imgs8.sharding.device_set) == 8
    # content synthesis through the placed pipe rides the same sharding
    w0_imgs8 = pl.synthesize(placed, w08)
    np.testing.assert_allclose(
        np.asarray(pl.synthesize(pipe, w01)), np.asarray(w0_imgs8),
        rtol=1e-4, atol=1e-4,
    )


def test_generate_on_mesh_model_sharded(pipe):
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.parallel.solver import (
        generate_on_mesh,
        place_pipeline,
    )

    rng = jax.random.PRNGKey(4)
    imgs1, _, _, _, _ = pl.generate_fingerprinted(pipe, rng, 4)
    mesh = pm.make_mesh(model=2)  # 4x2 data x model
    placed = place_pipeline(mesh, pipe, shard_model=True)
    imgs, _, _, _, _ = generate_on_mesh(mesh, placed, rng, 4)
    np.testing.assert_allclose(
        np.asarray(imgs1), np.asarray(imgs), rtol=1e-4, atol=1e-4
    )


def test_generate_on_mesh_batch_divisibility(pipe):
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.parallel.solver import (
        generate_on_mesh,
        place_pipeline,
    )

    mesh = pm.make_mesh()
    placed = place_pipeline(mesh, pipe)
    with pytest.raises(ValueError, match="not divisible"):
        generate_on_mesh(mesh, placed, jax.random.PRNGKey(0), 3)
