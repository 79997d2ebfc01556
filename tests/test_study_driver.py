"""Wiring tests for the quality-study driver (cli/study.py).

The studies burn hours of TPU time; these tests validate the spec
construction, jsonl resume, kwarg threading (e.g. per-point ``n_starts``
overrides must beat the CLI default), and tag uniqueness with the
training/eval layers stubbed out --- so a wiring bug surfaces on CPU in
seconds, not on the chip mid-study.
"""

import json
import os

import pytest

from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.cli import (
    study as study_cli,
)


class _Args:
    def __init__(self, tmp, cmd, only=""):
        self.cmd = cmd
        self.out = os.path.join(tmp, f"{cmd}.json")
        self.cache_dir = os.path.join(tmp, "ckpts")
        self.samples = 4
        self.steps = 50
        self.n = 6
        self.seed = 1
        self.chunk_samples = 2
        self.only = only
        self.compile_cache = ""


@pytest.fixture
def stubbed(monkeypatch, tmp_path):
    """Stub the expensive layers; record every eval_point call."""
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.eval import (
        study,
    )

    calls = []

    def fake_ensure_trained(img_size, channel_max, train_steps, cache_dir, **kw):
        return f"{cache_dir}/sg2_{img_size}px_cm{channel_max}_s{train_steps}.npz"

    def fake_build_pipeline(ckpt, img_size, channel_max):
        return {"ckpt": ckpt, "img": img_size, "cm": channel_max}

    def fake_eval_point(pipe, **kw):
        calls.append(kw)
        return {
            "mean_bit_acc": 0.9,
            "bit_acc_ci95": [0.85, 0.95],
            "exact_match": 0.5,
            "exact_match_k": 2,
            "exact_match_ci95": [0.1, 0.9],
            "band_sigma_median": 0.05,
            "samples": kw.get("samples", 0),
        }

    monkeypatch.setattr(study, "ensure_trained", fake_ensure_trained)
    monkeypatch.setattr(study, "build_study_pipeline", fake_build_pipeline)
    monkeypatch.setattr(study, "eval_point", fake_eval_point)
    monkeypatch.setattr(study, "bit_sigma_correlation", lambda rec: 0.0)
    return calls, tmp_path


def test_pruning_specs_thread_overrides(stubbed):
    calls, tmp = stubbed
    args = _Args(str(tmp), "pruning")
    assert study_cli.cmd_pruning(args) == 0
    assert len(calls) == 8  # 4 operating points x {20->5, n40->8}
    n40 = [c for c in calls if c.get("n_starts") == 40]
    assert len(n40) == 4  # per-point n_starts override beats args.n
    assert all(c["prune_starts"] == 8 for c in n40)
    rest = [c for c in calls if c.get("n_starts") != 40]
    assert all(c["n_starts"] == 6 for c in rest)  # CLI default flows through
    assert all(c["prune_starts"] == 5 for c in rest)
    out = json.load(open(args.out))
    assert len(out) == 8
    assert len({r["tag"] for r in out}) == 8  # unique tags


def test_attackaware_specs(stubbed):
    calls, tmp = stubbed
    args = _Args(str(tmp), "attackaware")
    assert study_cli.cmd_attackaware(args) == 0
    assert sorted(c["attack"] for c in calls) == [
        "Blur", "Combination", "Crop", "Jpeg",
    ]
    assert all(c["attack_aware"] is True for c in calls)


def test_jsonl_resume_skips_done_points(stubbed):
    calls, tmp = stubbed
    args = _Args(str(tmp), "attackaware")
    # pre-complete one point in the jsonl
    jsonl = "result/study_attackaware.json.jsonl" if not args.out else args.out + ".jsonl"
    os.makedirs(os.path.dirname(jsonl) or ".", exist_ok=True)
    with open(jsonl, "w") as f:
        f.write(json.dumps({"tag": "64px_kl32_s6_Jpeg_aware", "mean_bit_acc": 0.7}) + "\n")
    assert study_cli.cmd_attackaware(args) == 0
    assert len(calls) == 3  # Jpeg row skipped
    out = json.load(open(args.out))
    assert len(out) == 4  # cached row still lands in the final table


def test_only_filter(stubbed):
    calls, tmp = stubbed
    args = _Args(str(tmp), "pruning", only="n40")
    assert study_cli.cmd_pruning(args) == 0
    assert len(calls) == 4
    assert all(c["n_starts"] == 40 for c in calls)


def test_auto_chunk_respects_chain_budget(stubbed):
    """The crash envelope is measured in CONCURRENT CHAINS (chunk * n):
    points that override n_starts (the pruning study's n=40 rows) must
    shrink the sample chunk so chunk*n stays at the measured budget."""
    calls, tmp = stubbed
    args = _Args(str(tmp), "pruning")
    args.chunk_samples = 0  # auto
    args.n = 20
    assert study_cli.cmd_pruning(args) == 0
    for c in calls:
        n = c.get("n_starts", args.n)
        # budget: 10*20=200 chains at 64px, 5*20=100 at 128px
        assert c["chunk_samples"] * n <= 200


def test_torn_trailing_jsonl_line_resumes(stubbed):
    """A TPU worker crash mid-append leaves a torn final line; resume
    must drop it (rerunning that point) instead of crashing forever."""
    calls, tmp = stubbed
    args = _Args(str(tmp), "attackaware")
    jsonl = args.out + ".jsonl"
    with open(jsonl, "w") as f:
        f.write(json.dumps({"tag": "64px_kl32_s6_Jpeg_aware",
                            "mean_bit_acc": 0.7}) + "\n")
        f.write('{"tag": "64px_kl32_s6_Crop_aware", "mean_bi')  # torn
    assert study_cli.cmd_attackaware(args) == 0
    assert len(calls) == 3  # Jpeg cached; Crop RERUN (torn line dropped)
    assert {c["attack"] for c in calls} == {"Blur", "Crop", "Combination"}


def test_torn_middle_jsonl_line_raises(stubbed, tmp_path):
    calls, tmp = stubbed
    args = _Args(str(tmp), "attackaware")
    with open(args.out + ".jsonl", "w") as f:
        f.write('{"torn": \n')
        f.write(json.dumps({"tag": "x", "mean_bit_acc": 0.7}) + "\n")
    with pytest.raises(json.JSONDecodeError):
        study_cli.cmd_attackaware(args)


def test_executed_chain_steps_matches_attribute_guards():
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.fingerprint.attribute import (
        executed_chain_steps,
    )

    # no pruning
    assert executed_chain_steps(2000, 20, 0, 0.25) == 40000
    # standard halving: 500*20 + 1500*5
    assert executed_chain_steps(2000, 20, 5, 0.25) == 17500
    # reinvestment row: 500*40 + 1500*8 = 0.80x of 40000
    assert executed_chain_steps(2000, 40, 8, 0.25) == 32000
    # degenerate 1-step schedule: attribute() skips pruning (steps >= 2
    # guard), so the accounting must too
    assert executed_chain_steps(1, 20, 5, 0.25) == 20
    # prune_starts >= n_starts disables pruning
    assert executed_chain_steps(100, 4, 4, 0.25) == 400


def test_bestrecipe_specs_budget_matched(stubbed, monkeypatch):
    """The composed recipe must execute EXACTLY the headline chain-step
    budget on its clean rows (n=50 warmed 25%, pruned to 10), and thread
    polish + pruning + (on attacked rows) attack-aware disc loss."""
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.fingerprint.attribute import (
        executed_chain_steps,
    )
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.losses import (
        disc_percept,
    )

    calls, tmp = stubbed
    monkeypatch.setattr(
        disc_percept, "load_disc_percept", lambda path: {"disc": path}
    )
    args = _Args(str(tmp), "bestrecipe")
    args.steps = 2000
    args.n = 20
    args.chunk_samples = 0
    assert study_cli.cmd_bestrecipe(args) == 0
    assert len(calls) == 8  # 6 clean (2 px x 3 points) + 2 attacked
    for c in calls:
        assert c["n_starts"] == 50 and c["prune_starts"] == 10
        assert c["polish_sweeps"] == 2 and c["polish_margin"] == 0.05
        # budget parity with the headline rows (20 restarts x 2000 steps)
        assert executed_chain_steps(
            c["steps"], c["n_starts"], c["prune_starts"], c["prune_frac"]
        ) == executed_chain_steps(2000, 20, 0, 0.25)
        # concurrent-chain envelope still respected at n=50
        assert c["chunk_samples"] * c["n_starts"] <= 200
    attacked = [c for c in calls if c.get("attack", "None") != "None"]
    assert sorted(c["attack"] for c in attacked) == ["Crop", "Jpeg"]
    for c in attacked:
        assert c["attack_aware"] is True
        assert c["loss"] == "perceptual"
        assert c["lpips_params"] is not None  # disc factory ran
    out = json.load(open(args.out))
    assert len({r["tag"] for r in out}) == 8


def test_model_attribution_wiring(stubbed, monkeypatch):
    """5 trained seeds -> registry of 4 + 1 held-out, jsonl resume."""
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.eval import (
        model_attribution_study,
    )

    calls, tmp = stubbed
    seen = []

    def fake_point(registry, held_out, **kw):
        seen.append((sorted(registry), sorted(held_out), kw))
        return {
            "decision_acc": 1.0, "decision_acc_ci95": [0.8, 1.0],
            "false_reject_at_threshold": 0.0,
            "false_accept_at_threshold": 0.0,
            "open_set_auc": 1.0,
        }

    monkeypatch.setattr(
        model_attribution_study, "model_attribution_point", fake_point
    )
    args = _Args(str(tmp), "model_attribution")
    assert study_cli.cmd_model_attribution(args) == 0
    assert len(seen) == 2  # kl32 + kl64 points
    for reg, held, kw in seen:
        assert reg == ["seed0", "seed1", "seed2", "seed3"]
        assert held == ["seed4"]
        assert kw["samples_per_model"] == args.samples
    assert {kw["key_len"] for _, _, kw in seen} == {32, 64}
    out = json.load(open(args.out))
    assert len(out) == 2
    # resume: second run does no work
    seen.clear()
    assert study_cli.cmd_model_attribution(args) == 0
    assert seen == []
