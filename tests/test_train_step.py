"""Train-step tests on tiny synthetic data (SURVEY.md §4 test-pyramid 3):
the fused step runs, losses are finite, discriminators learn, the adversarial
game moves, gates gate, and both directions work."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from councilx.config import Config
from councilx.train.trainer import CouncilTrainer


def tiny_config(**over) -> Config:
    raw = {
        "batch_size": 2,
        "lr": 1e-4,
        "weight_decay": 1e-4,
        "gan_w": 1.0,
        "recon_x_w": 10.0,
        "recon_s_w": 1.0,
        "recon_c_w": 1.0,
        "compute_dtype": "float32",
        "gen": {"dim": 8, "mlp_dim": 16, "style_dim": 3, "n_downsample": 2,
                "n_res": 2},
        "dis": {"dim": 8, "n_layer": 2, "num_scales": 2},
        "council": {"council_size": 2, "council_w": 0.2},
        "data": {"crop_image_height": 32, "crop_image_width": 32},
    }
    raw.update(over)
    return Config.from_dict(raw)


def synthetic_batch(rng, b=2, hw=32):
    # domain A: smooth gradients; domain B: noisy — trivially separable
    x_a = np.tile(np.linspace(-0.5, 0.5, hw, dtype=np.float32)[None, :, None,
                                                               None],
                  (b, 1, hw, 3)).reshape(b, hw, hw, 3)
    x_b = rng.uniform(-1, 1, size=(b, hw, hw, 3)).astype(np.float32)
    return jnp.asarray(x_a), jnp.asarray(x_b)


class TestTrainStep:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = tiny_config()
        trainer = CouncilTrainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0))
        return cfg, trainer, state

    def test_state_shapes(self, setup):
        cfg, trainer, state = setup
        # every param leaf carries the leading council axis
        for group in ("gen", "dis", "cdis"):
            leaves = jax.tree_util.tree_leaves(state.params["a2b"][group])
            assert all(leaf.shape[0] == cfg.council.council_size
                       for leaf in leaves)

    @pytest.mark.smoke  # the tier's one trainer-compile test
    def test_single_step_runs_and_losses_finite(self, rng):
        cfg = tiny_config()
        trainer = CouncilTrainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0))
        step0 = int(state.step)  # read before donation deletes the buffer
        x_a, x_b = synthetic_batch(rng)
        state2, metrics = trainer.train_step(state, x_a, x_b)
        assert int(state2.step) == step0 + 1
        for k, v in metrics.items():
            assert np.isfinite(np.asarray(v)).all(), f"{k} not finite"
        expected = {"loss_dis_adv", "loss_dis_council", "loss_gen_total",
                    "loss_gen_adv_a2b", "loss_gen_council_a2b",
                    "loss_gen_mask_size_a2b", "loss_gen_mask_binary_a2b",
                    "loss_gen_recon_x_a2b", "loss_gen_recon_s_a2b",
                    "loss_gen_recon_c_a2b"}
        assert expected <= set(metrics)

    def test_dis_loss_decreases(self, rng):
        cfg = tiny_config()
        trainer = CouncilTrainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(1))
        x_a, x_b = synthetic_batch(rng)
        first = last = None
        for _ in range(12):
            state, metrics = trainer.train_step(state, x_a, x_b)
            if first is None:
                first = float(metrics["loss_dis_adv"])
            last = float(metrics["loss_dis_adv"])
        assert last < first, (first, last)

    def test_params_change_in_all_groups(self, setup, rng):
        cfg, trainer, state0 = setup
        x_a, x_b = synthetic_batch(rng)
        state0 = trainer.init_state(jax.random.PRNGKey(2))
        state1, _ = trainer.train_step(state0, x_a, x_b)
        for group in ("gen", "dis", "cdis"):
            before = jax.tree_util.tree_leaves(
                trainer.init_state(jax.random.PRNGKey(2)).params["a2b"][group])
            after = jax.tree_util.tree_leaves(state1.params["a2b"][group])
            diffs = [float(jnp.max(jnp.abs(a - b)))
                     for a, b in zip(after, before)]
            assert max(diffs) > 0, f"{group} params did not move"


def test_council_size_one_disables_council_loss(rng):
    cfg = tiny_config(council={"council_size": 1, "council_w": 0.2})
    trainer = CouncilTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    x_a, x_b = synthetic_batch(rng)
    _, metrics = trainer.train_step(state, x_a, x_b)
    assert "loss_gen_council_a2b" not in metrics
    assert "loss_dis_council" not in metrics


def test_council_start_iter_gates_loss(rng):
    cfg = tiny_config(
        council={"council_size": 2, "council_w": 0.2,
                 "council_start_at_iter": 1000})
    trainer = CouncilTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    x_a, x_b = synthetic_batch(rng)
    _, m = trainer.train_step(state, x_a, x_b)
    # the council metric is reported but must not affect the gen total
    cfg2 = tiny_config(council={"council_size": 2, "council_w": 0.0})
    trainer2 = CouncilTrainer(cfg2)
    assert not trainer2.has_council  # council_w=0 disables entirely


def test_both_directions(rng):
    cfg = tiny_config(do_a2b=True, do_b2a=True)
    trainer = CouncilTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    x_a, x_b = synthetic_batch(rng)
    state, metrics = trainer.train_step(state, x_a, x_b)
    assert "loss_gen_adv_a2b" in metrics and "loss_gen_adv_b2a" in metrics
    assert set(state.params) == {"a2b", "b2a"}


def test_no_focus_mode(rng):
    cfg = tiny_config(council={"council_size": 2, "council_w": 0.2,
                               "focus_enabled": False})
    trainer = CouncilTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    x_a, x_b = synthetic_batch(rng)
    _, metrics = trainer.train_step(state, x_a, x_b)
    assert "loss_gen_mask_size_a2b" not in metrics


def test_sample(rng):
    cfg = tiny_config()
    trainer = CouncilTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    x_a, _ = synthetic_batch(rng)
    x_t, mask = trainer.sample(state, x_a)
    assert x_t.shape == (2, 2, 32, 32, 3)
    assert mask.shape == (2, 2, 32, 32, 1)
    assert float(jnp.min(mask)) >= 0.0 and float(jnp.max(mask)) <= 1.0


def test_member_symmetry_with_tied_seeds(rng):
    """Members initialized with identical rng produce identical outputs —
    catches member-axis mixing bugs (SURVEY.md §4 item 3)."""
    cfg = tiny_config()
    trainer = CouncilTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    # tie member params: copy member 0 into member 1
    tied = jax.tree_util.tree_map(
        lambda leaf: jnp.stack([leaf[0], leaf[0]]),
        state.params["a2b"]["gen"])
    x_a, _ = synthetic_batch(rng)
    z = jnp.zeros((2, 2, cfg.gen.style_dim), jnp.float32)
    x_t, mask, _ = trainer._translate_members(tied, x_a, z)
    np.testing.assert_allclose(np.asarray(x_t[0]), np.asarray(x_t[1]),
                               atol=1e-6)
