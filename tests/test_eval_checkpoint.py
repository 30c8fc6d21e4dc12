"""End-to-end test of tools/eval_checkpoint.py (VERDICT r2 item 3): a saved
generator checkpoint + config + toy input/target folders -> one-command FID.
Proves the full plumbing today so the moment real weights/data appear the
north-star FID-parity protocol is a single command (BASELINE.md §protocol).
"""

import json
import os
import sys

import numpy as np
import pytest

import jax
import yaml

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _write_folder(path, n, seed, size=40):
    from PIL import Image

    os.makedirs(path)
    r = np.random.RandomState(seed)
    for i in range(n):
        arr = (r.rand(size, size, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(path, f"img_{i}.png"))


@pytest.mark.slow
def test_eval_checkpoint_end_to_end(tmp_path, capsys):
    from councilx.ckpt.manager import save_params_npz
    from councilx.config import Config
    from councilx.train.trainer import CouncilTrainer
    from tools.eval_checkpoint import main

    raw = {
        "batch_size": 2,
        "compute_dtype": "float32",
        "gen": {"dim": 8, "mlp_dim": 16, "style_dim": 3, "n_downsample": 2,
                "n_res": 2},
        "dis": {"dim": 8, "n_layer": 2, "num_scales": 2},
        "council": {"council_size": 2, "council_w": 0.2},
        "data": {"new_size": 36, "crop_image_height": 32,
                 "crop_image_width": 32},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(raw))

    # layout-built weights: a freshly initialized stacked generator tree
    trainer = CouncilTrainer(Config.from_dict(raw))
    state = trainer.init_state(jax.random.PRNGKey(0))
    ckpt = tmp_path / "gen.npz"
    save_params_npz(str(ckpt), state.params["a2b"]["gen"])

    inp, tgt = str(tmp_path / "testA"), str(tmp_path / "testB")
    _write_folder(inp, 5, seed=0)   # 5 images -> exercises the ragged tail
    _write_folder(tgt, 6, seed=1)
    save_dir = str(tmp_path / "translated")

    out = main(["--config", str(cfg_path), "--checkpoint", str(ckpt),
                "--input_folder", inp, "--target_folder", tgt,
                "--allow-random", "--kid", "--kid-subset-size", "4",
                "--member", "1", "--batch_size", "2",
                "--feature_batch_size", "4",
                "--save_translations", save_dir])

    assert np.isfinite(out["fid"]) and out["fid"] >= 0
    assert out["n_translated"] == 5 and out["n_target"] == 6
    assert np.isfinite(out["kid"][0])
    assert len(os.listdir(save_dir)) == 5
    # the CLI contract: ONE parseable JSON line on stdout
    line = [l for l in capsys.readouterr().out.splitlines()
            if l.startswith("{")][-1]
    assert json.loads(line)["fid"] == pytest.approx(out["fid"])
