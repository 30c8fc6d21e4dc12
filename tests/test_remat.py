"""Remat (jax.checkpoint) must not change step numerics, only memory."""

import jax
import jax.numpy as jnp
import numpy as np

from councilx.config import Config
from councilx.train.trainer import CouncilTrainer

_RAW = {
    "batch_size": 2, "compute_dtype": "float32",
    "council": {"council_size": 2, "council_w": 0.2,
                "council_start_at_iter": 0},
    "focus_loss": {"focus_enabled": True},
    "gen": {"dim": 4, "mlp_dim": 8, "style_dim": 2,
            "n_downsample": 2, "n_res": 1},
    "dis": {"dim": 4, "n_layer": 2, "num_scales": 2},
    "new_size": 20, "crop_image_height": 16, "crop_image_width": 16,
}


def test_remat_stages_keeps_param_tree_and_outputs():
    """nn.remat renames modules unless names are pinned — the stage-remat
    paths in ContentEncoder/Decoder must keep the parameter tree (and the
    forward values) bit-identical so checkpoints interchange."""
    from councilx.nn.generator import AdaINGen

    r = np.random.RandomState(0)
    x = jnp.asarray(r.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    outs, trees = {}, {}
    for rs in (False, True):
        g = AdaINGen(input_dim=3, dim=16, style_dim=4, n_downsample=2,
                     n_res=2, mlp_dim=32, focus_mask=True, remat_stages=rs)
        p = g.init(jax.random.PRNGKey(0), x)["params"]
        trees[rs] = jax.tree_util.tree_structure(p)
        outs[rs] = g.apply({"params": p}, x)
    assert trees[False] == trees[True]
    np.testing.assert_allclose(np.asarray(outs[False]),
                               np.asarray(outs[True]), atol=1e-6)


def test_remat_step_matches_plain():
    r = np.random.RandomState(0)
    x = jnp.asarray(r.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32))
    metrics = {}
    variants = {"plain": {}, "remat": {"remat": True},
                "remat_stages": {"remat": True, "remat_stages": True},
                "stages_only": {"remat_stages": True}}
    for name, over in variants.items():
        raw = dict(_RAW, **over)
        tr = CouncilTrainer(Config.from_dict(raw))
        st = tr.init_state(jax.random.PRNGKey(0))
        st, m = tr.train_step(st, x, x)
        st, m = tr.train_step(st, x, x)  # second step: grads flowed equally
        metrics[name] = {k: float(v) for k, v in m.items()}
    for variant in ("remat", "remat_stages", "stages_only"):
        for k, v in metrics["plain"].items():
            assert abs(v - metrics[variant][k]) < 1e-4, \
                (variant, k, v, metrics[variant][k])
