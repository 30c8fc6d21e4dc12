"""Council-dis update-ratio semantics (both [VERIFY] readings, VERDICT r1 #3/#4)
and council-loss polarity duals — all resolved inside the jit (no host sync).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from councilx.config import Config
from councilx.losses.council import council_dis_loss, council_gen_loss
from councilx.train.trainer import CouncilTrainer

from test_train_step import synthetic_batch, tiny_config


def _council(over):
    base = {"council_size": 2, "council_w": 0.2}
    base.update(over)
    return base


def _adam_count(opt_state) -> int:
    """The scale_by_adam count inside the optax chain state."""
    return int(opt_state[1].count)


class TestKPerStep:
    def test_two_updates_per_step(self, rng):
        cfg = tiny_config(
            council=_council({"council_dis_relative_iteration": 2}))
        assert cfg.council.cdis_ratio_mode == "k_per_step"
        trainer = CouncilTrainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0))
        x_a, x_b = synthetic_batch(rng)
        state, m = trainer.train_step(state, x_a, x_b)
        assert _adam_count(state.opt_cdis) == 2
        assert _adam_count(state.opt_dis) == 1
        assert _adam_count(state.opt_gen) == 1
        state, m = trainer.train_step(state, x_a, x_b)
        assert _adam_count(state.opt_cdis) == 4
        assert np.isfinite(float(m["loss_dis_council"]))

    def test_ratio_one_is_single_update(self, rng):
        cfg = tiny_config(council=_council({}))
        trainer = CouncilTrainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0))
        x_a, x_b = synthetic_batch(rng)
        state, _ = trainer.train_step(state, x_a, x_b)
        assert _adam_count(state.opt_cdis) == 1


class TestEveryKth:
    def test_gates_on_step_parity(self, rng):
        cfg = tiny_config(
            council=_council({"council_dis_relative_iteration": 2,
                              "cdis_ratio_mode": "every_kth"}))
        trainer = CouncilTrainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0))
        x_a, x_b = synthetic_batch(rng)

        # step 0: 0 % 2 == 0 -> cdis updates
        state, m0 = trainer.train_step(state, x_a, x_b)
        assert _adam_count(state.opt_cdis) == 1
        assert float(m0["loss_dis_council"]) != 0.0
        cdis_after0 = jax.device_get(state.params["a2b"]["cdis"])

        # step 1: skipped -> loss metric 0, params bit-identical
        state, m1 = trainer.train_step(state, x_a, x_b)
        assert _adam_count(state.opt_cdis) == 1
        assert float(m1["loss_dis_council"]) == 0.0
        cdis_after1 = jax.device_get(state.params["a2b"]["cdis"])
        for a, b in zip(jax.tree_util.tree_leaves(cdis_after0),
                        jax.tree_util.tree_leaves(cdis_after1)):
            np.testing.assert_array_equal(a, b)

        # step 2: runs again
        state, m2 = trainer.train_step(state, x_a, x_b)
        assert _adam_count(state.opt_cdis) == 2
        assert float(m2["loss_dis_council"]) != 0.0


class TestPolarity:
    @staticmethod
    def _stub_apply(p, x):
        # one "scale": a (B', 1, 1, 1) logit map that depends on the input
        # content and the (scalar) member-discriminator parameter
        return [jnp.mean(x, axis=(1, 2, 3))[:, None, None, None] * p]

    def _grid(self, cdis_params, x_fakes, x_in):
        """(N_dis, N_out, B) logits the stub produces, via numpy."""
        from councilx.losses.council import make_pairs
        pairs = np.asarray(make_pairs(x_fakes, x_in, True))
        n, b = pairs.shape[0], pairs.shape[1]
        flat = pairs.reshape((n * b,) + pairs.shape[2:])
        per_img = flat.mean(axis=(1, 2, 3))          # (N*B,)
        grid = np.asarray(cdis_params)[:, None] * per_img[None, :]
        return grid.reshape(len(cdis_params), n, b)  # (N_dis, N_out, B)

    def test_dis_polarity_swaps_labels(self):
        rng = np.random.RandomState(3)
        x_fakes = jnp.asarray(rng.randn(3, 2, 4, 4, 3).astype(np.float32))
        x_in = jnp.asarray(rng.randn(2, 4, 4, 3).astype(np.float32))
        cdis_params = jnp.asarray([0.3, -0.5, 1.2], jnp.float32)

        g = self._grid(cdis_params, x_fakes, x_in)   # (3, 3, B)
        real = ((g - 1.0) ** 2).mean(axis=2)
        fake = (g ** 2).mean(axis=2)
        eye = np.eye(3)
        want_own_real = (real * eye).sum() + (fake * (1 - eye)).sum() / 2
        want_own_fake = (fake * eye).sum() + (real * (1 - eye)).sum() / 2

        got_r = council_dis_loss(self._stub_apply, cdis_params, x_fakes,
                                 x_in, polarity="own_real")
        got_f = council_dis_loss(self._stub_apply, cdis_params, x_fakes,
                                 x_in, polarity="own_fake")
        np.testing.assert_allclose(float(got_r), want_own_real, rtol=1e-5)
        np.testing.assert_allclose(float(got_f), want_own_fake, rtol=1e-5)

    def test_gen_targets_own_class_label(self):
        rng = np.random.RandomState(4)
        x_fakes = jnp.asarray(rng.randn(3, 2, 4, 4, 3).astype(np.float32))
        x_in = jnp.asarray(rng.randn(2, 4, 4, 3).astype(np.float32))
        cdis_params = jnp.asarray([0.3, -0.5, 1.2], jnp.float32)

        g = self._grid(cdis_params, x_fakes, x_in)
        eye = np.eye(3)
        want_r = (((g - 1.0) ** 2).mean(axis=2) * (1 - eye)).sum()
        want_f = ((g ** 2).mean(axis=2) * (1 - eye)).sum()

        got_r = council_gen_loss(self._stub_apply, cdis_params, x_fakes,
                                 x_in, polarity="own_real")
        got_f = council_gen_loss(self._stub_apply, cdis_params, x_fakes,
                                 x_in, polarity="own_fake")
        np.testing.assert_allclose(float(got_r), want_r, rtol=1e-5)
        np.testing.assert_allclose(float(got_f), want_f, rtol=1e-5)

    def test_own_fake_trains(self, rng):
        cfg = tiny_config(council=_council({"council_polarity": "own_fake"}))
        trainer = CouncilTrainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0))
        x_a, x_b = synthetic_batch(rng)
        state, m = trainer.train_step(state, x_a, x_b)
        assert all(np.isfinite(float(v)) for v in m.values())


def test_invalid_modes_rejected():
    with pytest.raises(ValueError, match="cdis_ratio_mode"):
        Config.from_dict({"council": {"cdis_ratio_mode": "bogus"}})
    with pytest.raises(ValueError, match="council_polarity"):
        Config.from_dict({"council": {"council_polarity": "bogus"}})
