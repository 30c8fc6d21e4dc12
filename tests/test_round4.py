"""Round-4 surface: per-member (best-member) evaluation — the paper's
protocol selects the council member with the lowest FID (SURVEY.md §4
reproduction target). Covers cfg.eval_member ("all" | index) in the
in-training hook, councilx-eval --member all, and the new_size protocol
warning (VERDICT r3 items 4 and weak #6).
"""

import json
import os
import sys

import numpy as np
import pytest

import jax
import yaml

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from councilx.config import Config, load_config

REPO = os.path.join(os.path.dirname(__file__), "..")
SMOKE = os.path.join(REPO, "configs", "smoke_tiny.yaml")

TINY = {
    "batch_size": 2,
    "compute_dtype": "float32",
    "gen": {"dim": 8, "mlp_dim": 16, "style_dim": 3, "n_downsample": 2,
            "n_res": 2},
    "dis": {"dim": 8, "n_layer": 2, "num_scales": 2},
    "council": {"council_size": 2, "council_w": 0.2},
    "data": {"new_size": 36, "crop_image_height": 32,
             "crop_image_width": 32},
}


def _write_folder(path, n, seed, size=40):
    from PIL import Image

    os.makedirs(path)
    r = np.random.RandomState(seed)
    for i in range(n):
        arr = (r.rand(size, size, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(path, f"img_{i}.png"))


class TestEvalMemberConfig:
    def test_default_is_member_zero(self):
        assert Config.from_dict(dict(TINY)).eval_member == 0

    def test_all_accepted(self):
        cfg = Config.from_dict({**TINY, "eval_member": "all"})
        assert cfg.eval_member == "all"

    def test_index_bounds_checked(self):
        with pytest.raises(ValueError, match="eval_member"):
            Config.from_dict({**TINY, "eval_member": 2})  # council_size=2
        with pytest.raises(ValueError, match="eval_member"):
            Config.from_dict({**TINY, "eval_member": -1})
        with pytest.raises(ValueError, match="eval_member"):
            Config.from_dict({**TINY, "eval_member": "best"})


@pytest.mark.slow
def test_eval_checkpoint_member_all(tmp_path, capsys):
    """--member all: per-member FID/KID in one run + the argmin (paper's
    best-member protocol), translations saved into per-member subdirs."""
    from councilx.ckpt.manager import save_params_npz
    from councilx.train.trainer import CouncilTrainer
    from tools.eval_checkpoint import main

    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(TINY))

    trainer = CouncilTrainer(Config.from_dict(dict(TINY)))
    state = trainer.init_state(jax.random.PRNGKey(0))
    ckpt = tmp_path / "gen.npz"
    save_params_npz(str(ckpt), state.params["a2b"]["gen"])

    inp, tgt = str(tmp_path / "testA"), str(tmp_path / "testB")
    _write_folder(inp, 5, seed=0)   # ragged tail batch
    _write_folder(tgt, 6, seed=1)
    save_dir = str(tmp_path / "translated")

    out = main(["--config", str(cfg_path), "--checkpoint", str(ckpt),
                "--input_folder", inp, "--target_folder", tgt,
                "--allow-random", "--kid", "--kid-subset-size", "4",
                "--member", "all", "--batch_size", "2",
                "--feature_batch_size", "4",
                "--save_translations", save_dir])

    assert len(out["fid_per_member"]) == 2
    assert all(np.isfinite(v) and v >= 0 for v in out["fid_per_member"])
    assert out["best_member"] in (0, 1)
    assert out["fid"] == min(out["fid_per_member"])
    assert out["fid_per_member"][out["best_member"]] == out["fid"]
    assert len(out["kid_per_member"]) == 2
    assert out["kid"] == out["kid_per_member"][out["best_member"]]
    assert out["n_translated"] == 5 and out["n_target"] == 6
    for m in (0, 1):
        assert len(os.listdir(os.path.join(save_dir, f"m{m}"))) == 5
    line = [l for l in capsys.readouterr().out.splitlines()
            if l.startswith("{")][-1]
    assert json.loads(line)["best_member"] == out["best_member"]


@pytest.mark.slow
def test_hook_member_all_logs_per_member_fid(tmp_path):
    """eval_member: all -> fid_<dir>_m<k> series + fid_<dir> = min."""
    from councilx.train.loop import train

    cfg = load_config(SMOKE)
    cfg.eval_iter = 2
    cfg.eval_inception_weights = "random"
    cfg.eval_max_images = 4
    cfg.eval_member = "all"
    summary = train(cfg, output_path=str(tmp_path), run_name="ev",
                    synthetic=True, max_steps=2)
    assert summary["step"] == 2

    recs = [json.loads(l) for l in
            open(tmp_path / "ev" / "metrics.jsonl")]
    fid_recs = [r for r in recs if "fid_a2b" in r]
    assert fid_recs, recs
    r = fid_recs[-1]
    assert "fid_a2b_m0" in r and "fid_a2b_m1" in r
    assert r["fid_a2b"] == pytest.approx(
        min(r["fid_a2b_m0"], r["fid_a2b_m1"]))


@pytest.mark.slow
def test_hook_warns_when_new_size_differs(tmp_path):
    """The in-training FID series is not paper-comparable when new_size
    resizes the source files — the hook must say so once (VERDICT weak #6)."""
    import warnings

    from councilx.data.dataset import ImageFolderDataset
    from councilx.data.loader import DataLoader
    from councilx.eval.hook import TrainEvalHook
    from councilx.train.trainer import CouncilTrainer

    folder = str(tmp_path / "imgs")
    _write_folder(folder, 3, seed=0, size=48)  # native 48px != new_size 36

    cfg = Config.from_dict({**TINY, "eval_iter": 2,
                            "eval_inception_weights": "random",
                            "eval_max_images": 2})
    trainer = CouncilTrainer(cfg)
    ds = ImageFolderDataset(folder, new_size=cfg.data.new_size)
    mk = lambda: DataLoader(ds, batch_size=2, shuffle=False, infinite=False,
                            drop_last=False)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        TrainEvalHook(cfg, trainer, mk(), mk())
    msgs = [str(x.message) for x in w]
    assert any("NOT comparable" in m for m in msgs), msgs

    # matching native resolution: no warning
    folder2 = str(tmp_path / "imgs36")
    _write_folder(folder2, 3, seed=1, size=36)
    ds2 = ImageFolderDataset(folder2, new_size=36)
    mk2 = lambda: DataLoader(ds2, batch_size=2, shuffle=False,
                             infinite=False, drop_last=False)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        TrainEvalHook(cfg, trainer, mk2(), mk2())
    assert not [x for x in w if "NOT comparable" in str(x.message)]


@pytest.mark.smoke
class TestMfuParser:
    """tools/mfu.py's StableHLO conv/dot FLOP walk vs analytic counts."""

    def test_conv_flops_exact(self):
        import jax.numpy as jnp
        from tools.mfu import stablehlo_matmul_flops

        def f(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        x = jnp.zeros((2, 16, 16, 8), jnp.float32)
        k = jnp.zeros((3, 3, 8, 4), jnp.float32)
        conv, dot = stablehlo_matmul_flops(jax.jit(f).lower(x, k).as_text())
        assert conv == 2 * 2 * 16 * 16 * 4 * 3 * 3 * 8
        assert dot == 0

    def test_grouped_conv_counts_per_group_channels(self):
        import jax.numpy as jnp
        from tools.mfu import stablehlo_matmul_flops

        def f(x, k):  # feature_group_count=2 (the vmapped-member lowering)
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME", feature_group_count=2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        x = jnp.zeros((2, 16, 16, 8), jnp.float32)
        k = jnp.zeros((3, 3, 4, 8), jnp.float32)  # i = 8/2 groups
        conv, _ = stablehlo_matmul_flops(jax.jit(f).lower(x, k).as_text())
        assert conv == 2 * 2 * 16 * 16 * 8 * 3 * 3 * 4

    def test_dilated_grad_conv_discounted(self):
        import jax.numpy as jnp
        from tools.mfu import stablehlo_matmul_flops

        def loss(x, k):  # stride-2 conv; grad-wrt-x lowers with lhs_dilate=2
            y = jax.lax.conv_general_dilated(
                x, k, (2, 2), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.sum(y * y)

        x = jnp.zeros((2, 16, 16, 8), jnp.float32)
        k = jnp.zeros((3, 3, 8, 4), jnp.float32)
        g = jax.grad(loss)
        conv, _ = stablehlo_matmul_flops(jax.jit(g).lower(x, k).as_text())
        fwd = 2 * 2 * 8 * 8 * 4 * 3 * 3 * 8
        # fwd + grad-x (dilation-discounted ~= fwd) + grad-k (~= fwd):
        # the walk must land well under the naive 4x-overcounted total
        assert conv <= 3.2 * fwd, conv

    def test_dot_general_flops(self):
        import jax.numpy as jnp
        from tools.mfu import stablehlo_matmul_flops

        f = lambda a, b: a @ b
        a = jnp.zeros((4, 8), jnp.float32)
        b = jnp.zeros((8, 16), jnp.float32)
        _, dot = stablehlo_matmul_flops(jax.jit(f).lower(a, b).as_text())
        assert dot == 2 * 4 * 16 * 8
