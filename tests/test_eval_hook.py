"""In-training FID hook (cfg.eval_iter, councilx/eval/hook.py): the loop
logs fid_<direction> against the test split at the eval cadence."""

import json
import os

import numpy as np
import pytest

from councilx.config import load_config
from councilx.train.loop import train

REPO = os.path.join(os.path.dirname(__file__), "..")
SMOKE = os.path.join(REPO, "configs", "smoke_tiny.yaml")


@pytest.mark.slow
def test_train_loop_logs_fid(tmp_path):
    cfg = load_config(SMOKE)
    cfg.eval_iter = 2
    cfg.eval_inception_weights = "random"  # smoke mode: plumbing only
    cfg.eval_max_images = 4
    summary = train(cfg, output_path=str(tmp_path), run_name="ev",
                    synthetic=True, max_steps=4)
    assert summary["step"] == 4

    fid_steps = {}
    with open(tmp_path / "ev" / "metrics.jsonl") as f:
        for line in f:
            rec = json.loads(line)
            if "fid_a2b" in rec:
                fid_steps[rec["step"]] = rec["fid_a2b"]
    assert sorted(fid_steps) == [2, 4], fid_steps
    for step, v in fid_steps.items():
        assert np.isfinite(v) and v >= 0.0, (step, v)
    # smoke config is a2b-only: no b2a metric should appear
    with open(tmp_path / "ev" / "metrics.jsonl") as f:
        assert "fid_b2a" not in f.read()


def test_eval_hook_requires_weights(tmp_path):
    cfg = load_config(SMOKE)
    cfg.eval_iter = 2
    with pytest.raises(ValueError, match="eval_inception_weights"):
        train(cfg, output_path=str(tmp_path), run_name="x", synthetic=True,
              max_steps=2)
