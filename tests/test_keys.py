"""Key registry + identification tests (fingerprint/keys.py, cli/keys.py).

Pure-host logic, so these are exhaustive; the serving-integrated
end-to-end identify (real solver -> registry decode) lives in
tests/test_serving.py.
"""

import json

import numpy as np
import pytest

from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.fingerprint.keys import (
    KeyRegistry,
    identification_error_union_bound,
    simulate_identification,
)


def test_issue_min_distance_guarantee():
    reg = KeyRegistry.issue(50, key_len=32, min_distance=8, seed=1)
    keys = reg.keys.astype(np.int32)
    # all pairwise Hamming distances >= 8
    dists = np.abs(keys[:, None, :] - keys[None, :, :]).sum(-1)
    np.fill_diagonal(dists, 99)
    assert dists.min() >= 8
    assert len(reg) == 50 and len(reg.names) == 50


def test_issue_exhaustion_raises():
    # 2^3 = 8 codewords total; min_distance 3 packs at most 2 (repetition
    # code) --- demanding 5 must fail loudly, not degrade the guarantee
    with pytest.raises(RuntimeError, match="ball packing"):
        KeyRegistry.issue(5, key_len=3, min_distance=3, max_tries_per_key=500)


def test_issue_validation():
    with pytest.raises(ValueError):
        KeyRegistry.issue(4, key_len=8, min_distance=0)
    with pytest.raises(ValueError):
        KeyRegistry.issue(4, key_len=8, min_distance=9)


def test_hard_match_corrects_within_half_distance():
    reg = KeyRegistry.issue(20, key_len=32, min_distance=9, seed=2)
    rng = np.random.default_rng(3)
    for true_idx in range(20):
        bits = reg.keys[true_idx].copy()
        flip = rng.choice(32, size=4, replace=False)  # 4 <= (9-1)//2
        bits[flip] = 1 - bits[flip]
        idx, dist, margin = reg.match_hard(bits)
        assert idx == true_idx
        assert dist == 4
        assert margin >= 1  # 9 - 2*4


def test_soft_match_uses_confidence():
    """ML decode recovers the truth when the flipped bits are the
    low-confidence ones, even when hard Hamming decoding fails."""
    reg = KeyRegistry(
        keys=np.array([[1, 1, 1, 1, 0, 0, 0, 0],
                       [1, 1, 1, 1, 1, 1, 0, 0]], np.int8),
        names=["a", "b"], min_distance=2,
    )
    # true key = a; bits 4 and 5 read as 1 (matching b!) but with tiny
    # confidence; confident bits all agree with both codewords
    logits = np.array([8.0, 8.0, 8.0, 8.0, 0.1, 0.1, -8.0, -8.0])
    hard_bits = (logits > 0).astype(np.int8)
    hi, _, _ = reg.match_hard(hard_bits)
    assert hi == 1  # hard decoding is fooled: observed == b exactly
    si, ll, margin = reg.match_soft(logits)
    # soft margin between a and b rests only on the two weak bits ---
    # 2*0.1 nats toward b, so soft ALSO picks b but with tiny margin
    assert si == 1 and margin < 0.25
    # now make the weak bits lean 0 (toward a): soft must flip to a
    logits2 = logits.copy()
    logits2[4:6] = -0.1
    si2, _, _ = reg.match_soft(logits2)
    assert si2 == 0


def test_soft_match_beats_hard_statistically():
    """Across random trials with solver-like logits (flipped bits are
    less confident), soft ML decoding identifies at least as well as
    hard Hamming --- the reason the serving path decodes from logits."""
    reg = KeyRegistry.issue(64, key_len=32, min_distance=5, seed=4)
    out = simulate_identification(reg, p_bit=0.12, n_trials=800, seed=5)
    assert out["soft_accuracy"] >= out["hard_accuracy"]
    assert out["soft_accuracy"] > 0.9  # weak bits carry the flips


def test_union_bound_sane():
    assert identification_error_union_bound(0.0, 1000, 64, 10) == 0.0
    b1 = identification_error_union_bound(0.01, 100, 64, 10)
    b2 = identification_error_union_bound(0.02, 100, 64, 10)
    assert 0.0 <= b1 < b2 <= 1.0
    # more users = larger bound (before the clip at 1)
    b3 = identification_error_union_bound(0.01, 1000, 64, 10)
    assert b3 > b1
    # simulation should beat (be below) the conservative bound
    reg = KeyRegistry.issue(100, key_len=64, min_distance=10, seed=6)
    sim = simulate_identification(reg, p_bit=0.02, n_trials=500, seed=7)
    assert 1.0 - sim["hard_accuracy"] <= sim["union_bound_error"] + 0.02


def test_registry_roundtrip(tmp_path):
    reg = KeyRegistry.issue(10, key_len=16, min_distance=4, seed=8)
    path = str(tmp_path / "reg.json")
    reg.save(path)
    back = KeyRegistry.load(path)
    np.testing.assert_array_equal(back.keys, reg.keys)
    assert back.names == reg.names and back.min_distance == 4


def test_match_validation():
    reg = KeyRegistry.issue(4, key_len=8, min_distance=1, seed=9)
    with pytest.raises(ValueError):
        reg.match_hard(np.zeros(5))
    with pytest.raises(ValueError):
        reg.match_soft(np.zeros(5))


def test_keys_cli(tmp_path, capsys):
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.cli import (
        keys as keys_cli,
    )

    out = str(tmp_path / "reg.json")
    assert keys_cli.main([
        "issue", "--users", "20", "--key_len", "32",
        "--min_distance", "6", "--out", out,
    ]) == 0
    issued = json.loads(capsys.readouterr().out)
    assert issued["users"] == 20
    reg = KeyRegistry.load(out)
    assert len(reg) == 20

    assert keys_cli.main([
        "capacity", "--users", "50", "--key_len", "32",
        "--min_distance", "6", "--p_bit", "0.03", "--trials", "300",
    ]) == 0
    cap = json.loads(capsys.readouterr().out)
    assert cap["soft_accuracy"] > 0.9
    assert 0 <= cap["union_bound_error"] <= 1

    # RM issuance: min_distance comes from the code (RM(2,5) -> 8), not
    # the flag, and the registry round-trips
    out_rm = str(tmp_path / "reg_rm.json")
    assert keys_cli.main([
        "issue", "--users", "100", "--key_len", "32",
        "--issuance", "rm", "--out", out_rm,
    ]) == 0
    issued_rm = json.loads(capsys.readouterr().out)
    assert issued_rm["min_distance"] == 8
    assert issued_rm["issuance"] == "rm"
    assert KeyRegistry.load(out_rm).min_distance == 8


def test_issue_packed_distance_guarantee_multiword():
    """key_len > 64 exercises the multi-word packed popcount path; the
    pairwise-distance guarantee must hold exactly (padding bits must not
    leak into the distance)."""
    reg = KeyRegistry.issue(64, 100, min_distance=20, seed=5)
    k = reg.keys
    d = (k[:, None, :] != k[None, :, :]).sum(-1)
    np.fill_diagonal(d, 999)
    assert d.min() >= 20


def test_issue_packed_matches_reference_algorithm():
    """The packed fast path must issue bit-identical registries to the
    plain [n, K] int8 rejection sampler for the same seed (the RNG
    stream is the spec)."""
    def issue_unpacked(n_users, key_len, min_distance, seed):
        rng = np.random.default_rng(seed)
        keys = np.zeros((n_users, key_len), np.int8)
        n = 0
        while n < n_users:
            for _ in range(10000):
                cand = rng.integers(0, 2, key_len, dtype=np.int8)
                if n == 0:
                    break
                if int(np.abs(keys[:n] - cand).sum(axis=1).min()) >= min_distance:
                    break
            keys[n] = cand
            n += 1
        return keys

    for kl, d, n, seed in [(32, 6, 200, 0), (64, 12, 100, 7), (20, 4, 50, 3)]:
        want = issue_unpacked(n, kl, d, seed)
        got = KeyRegistry.issue(n, kl, min_distance=d, seed=seed).keys
        np.testing.assert_array_equal(got, want)


def test_issue_rm_distance_guarantee_and_determinism():
    """RM(2,6) codewords: guaranteed pairwise distance 16 at key_len=64,
    deterministic per seed, distinct across users."""
    reg = KeyRegistry.issue_rm(256, 64, seed=3)
    assert reg.keys.shape == (256, 64)
    assert reg.min_distance == 16
    k = reg.keys.astype(np.int16)
    d = np.abs(k[:, None, :] - k[None, :, :]).sum(-1)
    np.fill_diagonal(d, 64)
    assert d.min() >= 16, d.min()
    reg2 = KeyRegistry.issue_rm(256, 64, seed=3)
    np.testing.assert_array_equal(reg.keys, reg2.keys)
    assert not np.array_equal(
        reg.keys, KeyRegistry.issue_rm(256, 64, seed=4).keys
    )


def test_issue_rm_kl32_and_validation():
    # RM(2,5): 2^16 codewords at distance 8 for key_len=32
    reg = KeyRegistry.issue_rm(512, 32, seed=0)
    assert reg.min_distance == 8
    k = reg.keys.astype(np.int16)
    d = np.abs(k[:, None, :] - k[None, :, :]).sum(-1)
    np.fill_diagonal(d, 32)
    assert d.min() >= 8
    with pytest.raises(ValueError):
        KeyRegistry.issue_rm(2, 48)  # not a power of 2
    with pytest.raises(ValueError):
        KeyRegistry.issue_rm(1 << 17, 32)  # beyond RM(2,5) capacity
    with pytest.raises(ValueError):
        KeyRegistry.issue_rm(4, 64, r=0)


def test_issue_rm_scales_to_a_million_users():
    """The whole point of structured issuance: N=1e6 keys at kl=64 with
    guaranteed d=16, issued in well under a minute (rejection sampling is
    O(N^2) and cannot get here).  Spot-check distances on a random pair
    sample and drive both decoders at full registry size."""
    import time

    t0 = time.time()
    reg = KeyRegistry.issue_rm(1_000_000, 64, seed=1)
    issue_s = time.time() - t0
    assert issue_s < 60, issue_s
    assert len(reg) == 1_000_000 and reg.min_distance == 16
    rng = np.random.default_rng(0)
    a = rng.integers(0, len(reg), 2000)
    b = rng.integers(0, len(reg), 2000)
    mask = a != b
    d = (reg.keys[a[mask]] != reg.keys[b[mask]]).sum(1)
    assert d.min() >= 16
    # chunked decoders handle the full-size registry
    true = 123_456
    bits = reg.keys[true].copy()
    bits[:5] ^= 1  # 5 flips < d/2=8: hard decode must still recover
    hi, dist, margin = reg.match_hard(bits)
    assert hi == true and dist == 5 and margin >= 1
    logits = (2.0 * reg.keys[true] - 1.0) * 4.0
    si, _, smargin = reg.match_soft(logits)
    assert si == true and smargin > 0


def test_match_chunked_equals_dense_reference():
    """The chunked/argpartition decoders must reproduce the dense
    stable-argsort reference exactly, including low-index tie-breaks."""
    rng = np.random.default_rng(5)
    keys = rng.integers(0, 2, (300, 16), dtype=np.int8)
    keys[50] = keys[10]  # deliberate duplicate -> distance tie
    reg = KeyRegistry(keys=keys, names=[str(i) for i in range(300)],
                      min_distance=1)
    for _ in range(20):
        bits = rng.integers(0, 2, 16, dtype=np.int8)
        hi, dist, margin = reg.match_hard(bits)
        dists = np.abs(keys - bits).sum(1)
        order = np.argsort(dists, kind="stable")
        assert hi == order[0]
        assert dist == dists[order[0]]
        assert margin == dists[order[1]] - dists[order[0]]
        logits = rng.normal(size=16) * 3
        si, ll, smargin = reg.match_soft(logits)
        lp1 = -np.logaddexp(0.0, -logits)
        lp0 = -np.logaddexp(0.0, logits)
        ref_ll = keys @ lp1 + (1 - keys) @ lp0
        sorder = np.argsort(-ref_ll, kind="stable")
        assert si == sorder[0]
        assert ll == pytest.approx(ref_ll[sorder[0]], abs=1e-9)
        assert smargin == pytest.approx(
            ref_ll[sorder[0]] - ref_ll[sorder[1]], abs=1e-9
        )
