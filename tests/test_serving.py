"""Serving subsystem tests: micro-batching engine + HTTP front-end.

Tiny random-init generator (the e2e test scale) so the full stack ---
AOT bucket compilation, coalescing, padding, the real batched solver,
and the HTTP JSON surface --- runs in CPU-test time.
"""

import base64
import io
import json
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.config import (
    AttributionConfig,
    FingerprintConfig,
    ModelConfig,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.fingerprint import (
    pipeline as pl,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.serving import (
    InferenceEngine,
    ServeConfig,
    make_server,
    serve_forever_in_thread,
)

MCFG = ModelConfig(img_size=32, channel_max=64, n_mlp=3, style_dim=64)
FPCFG = FingerprintConfig(key_len=8, shift=56, sigma=1.0, sd_moved=1.0,
                          n_pca_samples=2000)
ACFG = AttributionConfig(steps=150, n_starts=4, lr=0.2, loss="mse")


@pytest.fixture(scope="module")
def pipe():
    return pl.build_pipeline(jax.random.PRNGKey(0), MCFG, FPCFG, want_lpips=False)


@pytest.fixture(scope="module")
def engine(pipe):
    eng = InferenceEngine(
        pipe, acfg=ACFG,
        cfg=ServeConfig(buckets=(1, 4), max_wait_ms=20.0), seed=0,
    ).start()
    yield eng
    eng.stop()


def test_generate_deterministic_per_seed(engine):
    """Per-request PRNG: same seed -> same image, regardless of batching."""
    a = engine.generate(seed=7)
    b = engine.generate(seed=7)
    c = engine.generate(seed=8)
    np.testing.assert_array_equal(a["image"], b["image"])
    np.testing.assert_array_equal(a["key_bits"], b["key_bits"])
    assert np.abs(a["image"] - c["image"]).max() > 1e-3
    assert a["image"].shape == (32, 32, 3)


def test_generate_with_planted_key_and_synthesis_parity(engine, pipe):
    """Explicit key_bits are planted verbatim, and the returned latent
    reproduces the returned image through the pipeline's synthesize."""
    bits = [1, 0, 1, 1, 0, 0, 1, 0]
    out = engine.generate(seed=3, key_bits=bits)
    np.testing.assert_array_equal(out["key_bits"], np.asarray(bits))
    re = np.asarray(pl.synthesize(pipe, out["w"][None]))[0]
    np.testing.assert_allclose(re, out["image"], atol=1e-4)


def test_generate_batching_coalesces(engine):
    """Concurrent requests share device batches (stats prove coalescing),
    and batched results equal the solo (bucket-1) results."""
    solo = {s: engine.generate(seed=s)["image"] for s in range(20, 26)}
    before = engine.stats()["generate"]["batches"]
    futs = {s: engine.generate(seed=s, sync=False) for s in range(20, 26)}
    outs = {s: f.result(timeout=120) for s, f in futs.items()}
    after = engine.stats()["generate"]["batches"]
    assert after - before < 6  # at least one multi-request batch formed
    # per-request keys make results mathematically batch-independent;
    # across different bucket SHAPES XLA's tiling moves float sums ~1e-6
    # (same effect as tests/test_sharding.py), so allclose not array_equal
    for s, img in solo.items():
        np.testing.assert_allclose(outs[s]["image"], img, atol=1e-4)


def test_attribute_roundtrip(engine):
    """Serve-decoded key matches the planted key on a clean tiny image."""
    gen = engine.generate(seed=11)
    dec = engine.attribute(gen["image"])
    acc = (dec["key_bits"] == gen["key_bits"]).mean()
    assert acc >= 0.75  # tiny model, 150 steps; exactness is the e2e suite's job
    assert dec["confidence"].shape == (FPCFG.key_len,)
    assert np.isfinite(dec["loss"])


def test_input_validation(engine):
    with pytest.raises(ValueError):
        engine.generate(key_bits=[1, 0])  # wrong length
    with pytest.raises(ValueError):
        engine.generate(key_bits=[2] * FPCFG.key_len)  # not 0/1
    with pytest.raises(ValueError):
        engine.attribute(np.zeros((16, 16, 3), np.float32))  # wrong size


def test_out_of_range_seed_reduced_not_overflow(engine):
    """Seeds beyond int32 reduce deterministically instead of raising
    OverflowError inside the worker (which would fail the whole batch)."""
    big = 3_000_000_000
    a = engine.generate(seed=big)
    b = engine.generate(seed=big % (2**31))
    np.testing.assert_array_equal(a["image"], b["image"])
    assert a["seed"] == big % (2**31)


def test_stopped_engine_raises_unavailable(pipe):
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.serving.engine import (
        EngineUnavailable,
    )

    eng = InferenceEngine(
        pipe, cfg=ServeConfig(buckets=(1,), aot_warmup=False)
    ).start()
    eng.stop()
    with pytest.raises(EngineUnavailable):
        eng.generate(seed=1)


def test_attribute_disabled_without_acfg(pipe):
    eng = InferenceEngine(
        pipe, acfg=None, cfg=ServeConfig(buckets=(1,), aot_warmup=False)
    ).start()
    try:
        with pytest.raises(RuntimeError):
            eng.attribute(np.zeros((32, 32, 3), np.float32))
        assert eng.generate(seed=1)["image"].shape == (32, 32, 3)
    finally:
        eng.stop()


def test_stats_shape(engine):
    st = engine.stats()
    assert st["buckets"] == [1, 4]
    assert st["generate"]["requests"] > 0
    assert st["generate"]["batches"] > 0
    assert 0 < st["generate"]["mean_batch_occupancy"] <= 1
    assert st["generate"]["latency_ms_p50"] > 0
    assert any(e.startswith("generate:") for e in st["compiled"])


# ---------------------------------------------------------------------- #
# identification (registry decode over the real solver)
# ---------------------------------------------------------------------- #
def test_identify_end_to_end(engine):
    """Issue keys, generate as a registered user, identify the user back
    through the real solve + ML decode (the paper's deployment story)."""
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.fingerprint.keys import (
        KeyRegistry,
    )

    reg = KeyRegistry.issue(8, key_len=FPCFG.key_len, min_distance=4, seed=0)
    engine.registry = reg
    try:
        gen = engine.generate(seed=77, user="user_00003")
        np.testing.assert_array_equal(gen["key_bits"], reg.keys[3])
        out = engine.identify(gen["image"])
        assert out["user"] == "user_00003"
        assert out["margin_nats"] > 0
        assert out["hard_distance"] <= 2
        with pytest.raises(ValueError):
            engine.generate(user="nobody")
        with pytest.raises(ValueError):
            engine.generate(user="user_00001", key_bits=[0] * FPCFG.key_len)
    finally:
        engine.registry = None


def test_identify_requires_registry(engine):
    with pytest.raises(RuntimeError, match="KeyRegistry"):
        engine.identify(np.zeros((32, 32, 3), np.float32))


# ---------------------------------------------------------------------- #
# mesh serving (8 virtual devices, conftest)
# ---------------------------------------------------------------------- #
def test_mesh_engine_generate_matches_single_device(pipe, engine):
    """An 8-way data-parallel engine serves the same per-seed results
    (to XLA cross-shape tolerance) in ONE SPMD batch."""
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.parallel import (
        mesh as pm,
    )

    mesh = pm.make_mesh(model=1)
    eng = InferenceEngine(
        pipe, acfg=None,
        cfg=ServeConfig(buckets=(8,), max_wait_ms=100.0), mesh=mesh,
    ).start()
    try:
        futs = [eng.generate(seed=100 + i, sync=False) for i in range(8)]
        outs = [f.result(timeout=300) for f in futs]
        assert eng.stats()["generate"]["batches"] == 1  # one SPMD execution
    finally:
        eng.stop()
    for i, out in enumerate(outs):
        solo = engine.generate(seed=100 + i)
        np.testing.assert_allclose(out["image"], solo["image"], atol=1e-4)
        np.testing.assert_array_equal(out["key_bits"], solo["key_bits"])


def test_mesh_engine_bucket_validation(pipe):
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.parallel import (
        mesh as pm,
    )

    with pytest.raises(ValueError, match="not divisible"):
        InferenceEngine(
            pipe, cfg=ServeConfig(buckets=(1, 4)), mesh=pm.make_mesh(model=1)
        )


def test_mesh_engine_attribute_smoke(pipe):
    """The solver program lowers/executes sharded through the engine."""
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.parallel import (
        mesh as pm,
    )

    acfg = AttributionConfig(steps=40, n_starts=2, lr=0.2, loss="mse")
    mesh = pm.make_mesh(model=1)
    eng = InferenceEngine(
        pipe, acfg=acfg,
        cfg=ServeConfig(buckets=(8,), max_wait_ms=100.0), mesh=mesh,
    ).start()
    try:
        gen = eng.generate(seed=55)
        futs = [eng.attribute(gen["image"], sync=False) for _ in range(8)]
        outs = [f.result(timeout=600) for f in futs]
    finally:
        eng.stop()
    for out in outs:
        assert out["key_bits"].shape == (FPCFG.key_len,)
        assert np.isfinite(out["loss"])


# ---------------------------------------------------------------------- #
# HTTP front-end
# ---------------------------------------------------------------------- #
def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=180) as r:
        return r.status, json.loads(r.read())


@pytest.fixture(scope="module")
def http_base(engine):
    server = make_server(engine, "127.0.0.1", 0)
    serve_forever_in_thread(server)
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def test_http_healthz_and_stats(http_base):
    with urllib.request.urlopen(http_base + "/healthz", timeout=30) as r:
        body = json.loads(r.read())
    assert body["ok"] and body["key_len"] == FPCFG.key_len
    with urllib.request.urlopen(http_base + "/v1/stats", timeout=30) as r:
        assert json.loads(r.read())["buckets"] == [1, 4]


def test_http_generate_png(http_base):
    status, body = _post(http_base + "/v1/generate", {"seed": 42})
    assert status == 200
    assert len(body["key_bits"]) == FPCFG.key_len
    raw = base64.b64decode(body["image_png_b64"])
    assert raw[:8] == b"\x89PNG\r\n\x1a\n"


def test_http_generate_attribute_roundtrip(http_base):
    """Full JSON roundtrip: generate float image -> attribute it back."""
    status, gen = _post(
        http_base + "/v1/generate",
        {"seed": 5, "encoding": "float_list", "key_bits": [0, 1] * 4},
    )
    assert status == 200
    img = np.asarray(gen["image"], np.float32)
    buf = io.BytesIO()
    np.save(buf, img)
    status, dec = _post(
        http_base + "/v1/attribute",
        {"image_npy_b64": base64.b64encode(buf.getvalue()).decode()},
    )
    assert status == 200
    acc = (np.asarray(dec["key_bits"]) == np.asarray(gen["key_bits"])).mean()
    assert acc >= 0.75


def test_http_errors(http_base):
    status = urllib.request.urlopen(http_base + "/healthz", timeout=30).status
    assert status == 200
    try:
        _post(http_base + "/v1/attribute", {"image": [[0.0]]})
        assert False, "expected HTTPError"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "image" in json.loads(e.read())["error"]


def test_http_misconfig_is_501_not_400(http_base):
    """A valid request against an endpoint the server isn't configured for
    (identify without a registry) is a server-config error, not a client
    error --- clients must not be told to 'fix' a fine request."""
    img = np.zeros((32, 32, 3), np.float32)
    try:
        _post(http_base + "/v1/identify", {"image": img.tolist()})
        assert False, "expected HTTPError"
    except urllib.error.HTTPError as e:
        assert e.code == 501
        assert "KeyRegistry" in json.loads(e.read())["error"]


def test_http_bad_encoding_rejected_before_generation(http_base, engine):
    before = engine.stats()["generate"]["requests"]
    try:
        _post(http_base + "/v1/generate", {"seed": 1, "encoding": "jpeg"})
        assert False, "expected HTTPError"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "encoding" in json.loads(e.read())["error"]
    # the doomed request never reached the device queue
    assert engine.stats()["generate"]["requests"] == before


def test_registry_setter_validates_key_len(engine):
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.fingerprint.keys import (
        KeyRegistry,
    )

    bad = KeyRegistry.issue(4, key_len=FPCFG.key_len * 2, min_distance=4,
                            seed=0)
    with pytest.raises(ValueError, match="key_len"):
        engine.registry = bad
    assert engine.registry is None  # rejected attach leaves state unchanged


def test_json_finite_sanitizer():
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.serving.server import (
        _finite,
    )

    assert _finite(1.5) == 1.5
    assert _finite(float("inf")) is None
    assert _finite(float("nan")) is None
    # the single-user-registry response path must be strict-JSON parseable
    assert json.loads(json.dumps({"m": _finite(float("inf"))})) == {"m": None}


def test_concurrent_http_load(http_base):
    """Many parallel HTTP clients all get correct, per-seed-stable answers."""
    results = {}
    errs = []

    def hit(seed):
        try:
            _, body = _post(
                http_base + "/v1/generate",
                {"seed": seed, "encoding": "float_list"},
            )
            results[seed] = np.asarray(body["image"], np.float32)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=hit, args=(s,)) for s in range(40, 48)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errs
    assert len(results) == 8
    # spot-check determinism vs a direct engine result
    for s in (40, 47):
        _, again = _post(
            http_base + "/v1/generate",
            {"seed": s, "encoding": "float_list"},
        )
        np.testing.assert_allclose(
            np.asarray(again["image"], np.float32), results[s], atol=1e-4
        )


def test_engine_with_encoder_init(pipe):
    """An engine built with amortized-encoder restart init serves the same
    API (AOT buckets, identical dispatch signature) and still decodes a
    clean planted key; the init is baked into the bucket executable."""
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.fingerprint import (
        encoder as enc_mod,
    )

    enc_params, _ = enc_mod.train_encoder(
        jax.random.PRNGKey(3), pipe.gen_params, pipe.basis, pipe.noise,
        mcfg=MCFG, ecfg=enc_mod.EncoderConfig(steps=8, batch=8, width=16,
                                              max_width=32, head_dim=32),
    )
    eng = InferenceEngine(
        pipe, acfg=ACFG,
        cfg=ServeConfig(buckets=(1,), max_wait_ms=5.0), seed=0,
        encoder_params=enc_params,
    ).start()
    try:
        gen = eng.generate(seed=11)
        dec = eng.attribute(gen["image"])
        assert dec["key_bits"].shape == (FPCFG.key_len,)
        assert np.isfinite(dec["loss"])
        # 8-step encoder on a random-init generator is a weak predictor;
        # the claim here is plumbing (init threads through the AOT bucket
        # program), not quality — quality is the measured study's job
        acc = (dec["key_bits"] == gen["key_bits"]).mean()
        assert acc >= 0.5
    finally:
        eng.stop()
