"""Tests for the VGG16 perceptual loss (MUNIT-inherited, vgg_w-gated)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from councilx.nn.vgg import (Vgg16Features, compute_vgg_loss,
                             init_random_vgg, load_vgg_npz, vgg_preprocess)


def test_preprocess_range_and_bgr():
    x = jnp.ones((1, 4, 4, 3)) * jnp.asarray([1.0, 0.0, -1.0])
    out = vgg_preprocess(x)
    # channel order flipped: input R=1 -> BGR last channel = 255 - mean_R
    np.testing.assert_allclose(out[0, 0, 0, 2], 255.0 - 123.680, atol=1e-3)
    np.testing.assert_allclose(out[0, 0, 0, 0], 0.0 - 103.939, atol=1e-3)


def test_vgg_forward_shape():
    params = init_random_vgg(jax.random.PRNGKey(0))
    x = jnp.zeros((2, 64, 64, 3))
    feats = Vgg16Features().apply({"params": params}, x)
    # 4 max pools: 64 -> 4; relu5_3 has 512 channels
    assert feats.shape == (2, 4, 4, 512)


def test_vgg_loss_zero_for_identical_and_positive_otherwise():
    params = init_random_vgg(jax.random.PRNGKey(0))
    r = np.random.RandomState(0)
    a = jnp.asarray(r.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))
    b = jnp.asarray(r.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))
    assert float(compute_vgg_loss(params, a, a)) == pytest.approx(0.0)
    assert float(compute_vgg_loss(params, a, b)) > 0.0


def test_trainer_vgg_gating(tmp_path):
    """vgg_w > 0 without weights raises; with weights the step runs and
    logs loss_gen_vgg."""
    from councilx.config import Config
    from councilx.train.trainer import CouncilTrainer

    raw = {
        "batch_size": 1, "compute_dtype": "float32", "vgg_w": 1.0,
        "recon_x_w": 0, "recon_s_w": 0, "recon_c_w": 0,
        "council": {"council_size": 2, "council_w": 0.1,
                    "council_start_at_iter": 0},
        "focus_loss": {"focus_enabled": False},
        "gen": {"dim": 4, "mlp_dim": 8, "style_dim": 2,
                "n_downsample": 2, "n_res": 1},
        "dis": {"dim": 4, "n_layer": 1, "num_scales": 1},
        "new_size": 20, "crop_image_height": 16, "crop_image_width": 16,
    }
    with pytest.raises(ValueError, match="vgg_model_path"):
        CouncilTrainer(Config.from_dict(raw))

    # save random VGG weights as flat npz and point the config at it
    params = init_random_vgg(jax.random.PRNGKey(1))
    flat = {}

    def walk(node, prefix):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, prefix + k + "/")
            else:
                flat[prefix + k] = np.asarray(v)

    walk(params, "")
    path = tmp_path / "vgg.npz"
    np.savez(path, **flat)
    loaded = load_vgg_npz(str(path))
    raw["vgg_model_path"] = str(path)
    trainer = CouncilTrainer(Config.from_dict(raw))
    assert trainer.vgg_params is not None
    state = trainer.init_state(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    state, metrics = trainer.train_step(state, x, x)
    assert "loss_gen_vgg_a2b" in metrics
    assert np.isfinite(float(metrics["loss_gen_vgg_a2b"]))
    del loaded
