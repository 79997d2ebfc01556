"""The report CLI renders study jsonl records as the BASELINE.md tables."""

import json
import os
import subprocess
import sys

REC = {
    "tag": "64px_kl32_s6_None", "img_size": 64, "channel_max": 128,
    "train_steps": 3000, "key_len": 32, "sigma": 6.0, "samples": 20,
    "mean_bit_acc": 0.9187, "bit_acc_ci95": [0.872, 0.965],
    "exact_match_k": 10, "exact_match_ci95": [0.299, 0.701],
    "band_sigma_median": 0.064, "content_sigma_median": 0.268,
    "bit_sigma_spearman": 0.11, "wall_s": 261.0,
}


def _run(cwd, *args):
    return subprocess.run(
        [sys.executable, "-m",
         "attributing_image_generative_models_using_latent_fingerprints_sg2_tpu"
         ".cli.report", *args],
        cwd=cwd, capture_output=True, text=True,
        env={**os.environ, "PYTHONPATH": os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))},
    )


def test_report_renders_jsonl(tmp_path):
    (tmp_path / "result").mkdir()
    with open(tmp_path / "result" / "study_robustness.json.jsonl", "w") as f:
        f.write(json.dumps(REC) + "\n")
        f.write(json.dumps({**REC, "tag": "64px_kl32_s6_Crop",
                            "mean_bit_acc": 0.7422}) + "\n")
    out = _run(tmp_path, "robustness")
    assert out.returncode == 0, out.stderr
    assert "study_robustness (2 points)" in out.stdout
    # sorted by accuracy descending, CI rendered
    body = out.stdout
    assert body.index("None") < body.index("Crop")
    assert "0.9187 [0.872, 0.965]" in body
    assert "10/20 [0.299, 0.701]" in body


def test_report_scaling_columns(tmp_path):
    (tmp_path / "result").mkdir()
    with open(tmp_path / "result" / "study_scaling.json.jsonl", "w") as f:
        f.write(json.dumps(REC) + "\n")
    out = _run(tmp_path, "scaling")
    assert out.returncode == 0, out.stderr
    assert "64 / 128 / 3k" in out.stdout
    assert "key-band sigma med" in out.stdout


def test_report_ab_join_against_baseline(tmp_path):
    """polish/pruning rows render a delta column against the matching
    headline row; attackaware joins study_robustness by attack."""
    (tmp_path / "result").mkdir()
    with open(tmp_path / "result" / "study_headline.json.jsonl", "w") as f:
        f.write(json.dumps(REC) + "\n")
    with open(tmp_path / "result" / "study_polish.json.jsonl", "w") as f:
        f.write(json.dumps({**REC, "tag": REC["tag"] + "_polish2_soft",
                            "mean_bit_acc": 0.9587,
                            "exact_match_k": 12}) + "\n")
    out = _run(tmp_path, "polish")
    assert out.returncode == 0, out.stderr
    assert "+0.0400 / +2 exact" in out.stdout
    assert "delta vs headline" in out.stdout


def test_report_missing_study_errors(tmp_path):
    (tmp_path / "result").mkdir()
    out = _run(tmp_path, "headline")
    assert out.returncode == 1
    assert "no records" in out.stderr


def test_report_identification_table(tmp_path):
    (tmp_path / "result").mkdir()
    rec = {
        "img_size": 64, "key_len": 32, "sigma": 6.0, "min_distance": 6,
        "measured_p_bit": 0.0313, "mean_bit_acc": 0.9688,
        "by_registry_size": [
            {"registry_size": 10, "soft_accuracy": 1.0,
             "soft_ci95": [0.839, 1.0], "hard_accuracy": 1.0,
             "mean_margin_nats": 41.2, "min_margin_nats": 8.0,
             "union_bound_error": 1.2e-4},
            {"registry_size": 1000, "soft_accuracy": 0.95,
             "soft_ci95": [0.764, 0.991], "hard_accuracy": 0.9,
             "mean_margin_nats": 30.5, "min_margin_nats": 2.1,
             "union_bound_error": 0.013},
        ],
    }
    with open(tmp_path / "result" / "study_identification.json", "w") as f:
        json.dump([rec], f)
    out = _run(tmp_path, "identification")
    assert out.returncode == 0, out.stderr
    assert "study_identification (1 points)" in out.stdout
    assert "1.000 [0.84, 1.00]" in out.stdout
    assert "0.950 [0.76, 0.99]" in out.stdout
    assert "p_bit 0.0313" in out.stdout
    assert "union-bound err" in out.stdout


def test_report_scaling_spearman_degenerate_renders_dash(tmp_path):
    """None (new records) and NaN (records written before the None
    convention) both render '-' instead of 'nan' in the Spearman cell."""
    (tmp_path / "result").mkdir()
    with open(tmp_path / "result" / "study_scaling.json.jsonl", "w") as f:
        f.write(json.dumps({**REC, "bit_sigma_spearman": None}) + "\n")
        f.write(json.dumps({**REC, "tag": REC["tag"] + "_b",
                            "bit_sigma_spearman": float("nan")}) + "\n")
    out = _run(tmp_path, "scaling")
    assert out.returncode == 0, out.stderr
    assert "nan" not in out.stdout
    assert "| - |" in out.stdout


def test_report_capacity_renders_visibility_columns(tmp_path):
    """The capacity table must carry the measured LPIPS/MSE visibility
    numbers, not just FID -- BASELINE.md cites this render."""
    (tmp_path / "result").mkdir()
    rec = {"key_len": 32, "sigma": 3.0, "shift": 480,
           "mean_bit_acc": 0.97, "attribution_acc": 0.6,
           "watermark_lpips": 0.0123, "watermark_mse": 0.0045,
           "fid": 1.3, "fid_disc": 0.8}
    with open(tmp_path / "result" / "study_capacity.json", "w") as f:
        json.dump([rec], f)
    out = _run(tmp_path, "capacity")
    assert out.returncode == 0, out.stderr
    assert "watermark LPIPS" in out.stdout and "watermark MSE" in out.stdout
    assert "0.0123" in out.stdout and "0.0045" in out.stdout
