"""Run-directory management, config snapshots, result logs.

Equivalents of ``save_config`` (/root/reference/src/utils.py:23-34), the
save-dir naming scheme (src/generator.py:109-112 / src/main.py:18-21) and
the ``result.txt`` format (src/main.py:151-154).
"""

from __future__ import annotations

import dataclasses
import datetime
import os
from typing import Any, List


def make_run_dir(save_dir: str, augmentation: str, sigma: float, shift: int) -> str:
    """``{save_dir}/{augmentation}/fixed_sigma_{sigma}/shift_{shift}/`` with
    dots stripped (ref src/main.py:18-21)."""
    sub = "{}/fixed_sigma_{}/shift_{}/".format(augmentation, sigma, shift).replace(".", "")
    return os.path.join(save_dir, sub)


def save_config(save_dir: str, cfg: Any) -> str:
    """Create a timestamped run dir and dump the config YAML
    (ref src/utils.py:23-34).  Returns the run dir."""
    import yaml

    now = datetime.datetime.now().strftime("%Y-%m-%d-%H-%M-%S")
    run_dir = os.path.join(save_dir, now, "")
    os.makedirs(run_dir, exist_ok=True)
    if dataclasses.is_dataclass(cfg) and not isinstance(cfg, type):
        cfg = dataclasses.asdict(cfg)
    with open(os.path.join(run_dir, "sampling_config.yaml"), "w") as f:
        yaml.dump(cfg, f, default_flow_style=False)
    return run_dir


def write_results(run_dir: str, bit_accs: List[float], attribution_acc: float) -> str:
    """Rewrite result.txt with per-sample accuracies + running attribution
    accuracy, format-compatible with ref src/main.py:151-154."""
    path = os.path.join(run_dir, "result.txt")
    with open(path, "w") as f:
        for i, acc in enumerate(bit_accs):
            f.write(
                "\n sample index: {}, bit acc: {}, attribution acc: {}".format(
                    i, float(acc), attribution_acc
                )
            )
    return path


def read_jsonl_resumable(path: str) -> List[dict]:
    """Read a crash-checkpointed jsonl file, tolerating ONE torn final
    line (a process killed mid-append --- e.g. a TPU worker hard-crash ---
    leaves a partial record; drop it so the writer reruns that point).
    A malformed non-final line means real corruption and raises.

    Shared by the study driver's resume (cli/study.py) and the table
    renderer (cli/report.py) so the two can never disagree about which
    records exist."""
    import json
    import sys

    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    recs: List[dict] = []
    for i, line in enumerate(lines):
        try:
            recs.append(json.loads(line))
        except json.JSONDecodeError:
            if i == len(lines) - 1:
                print(f"[jsonl] dropping torn trailing line in {path}",
                      file=sys.stderr)
                continue
            raise
    return recs
