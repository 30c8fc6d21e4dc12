"""Multi-chip (virtual 8-device CPU mesh) data-parallel tests — SURVEY.md §4
item 4: "test multi-node without a real cluster", the TPU way."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from councilx.config import Config
from councilx.parallel.mesh import DataParallelTrainer, make_mesh, shard_batch
from councilx.train.trainer import CouncilTrainer

from test_train_step import synthetic_batch, tiny_config


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    return make_mesh(8)


def dp_config():
    return tiny_config(batch_size=8)


def test_mesh_shapes(mesh8):
    assert mesh8.devices.size == 8
    assert mesh8.axis_names == ("data",)


def test_shard_batch_layout(mesh8, rng):
    x = jnp.asarray(rng.randn(8, 4, 4, 3).astype(np.float32))
    xs = shard_batch(mesh8, x)
    # each device holds 1/8 of the batch
    assert xs.sharding.shard_shape(xs.shape) == (1, 4, 4, 3)


def test_dp_step_runs_and_stays_replicated(mesh8, rng):
    cfg = dp_config()
    trainer = DataParallelTrainer(cfg, mesh8)
    state = trainer.init_state(jax.random.PRNGKey(0))
    x_a, x_b = synthetic_batch(rng, b=8)
    state, metrics = trainer.train_step(state, x_a, x_b)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # params remain fully replicated after the update
    leaf = jax.tree_util.tree_leaves(state.params["a2b"]["gen"])[0]
    assert leaf.sharding.is_fully_replicated


def test_dp_matches_single_device(mesh8, rng):
    """Same seeds, same global batch: the 8-way sharded step must produce
    the same losses and parameters as the single-device step (GSPMD is a
    layout change, not a math change)."""
    cfg = dp_config()
    x_a, x_b = synthetic_batch(rng, b=8)

    single = CouncilTrainer(cfg)
    s_state = single.init_state(jax.random.PRNGKey(0))
    s_state, s_metrics = single.train_step(s_state, x_a, x_b)

    dp = DataParallelTrainer(cfg, mesh8)
    d_state = dp.init_state(jax.random.PRNGKey(0))
    d_state, d_metrics = dp.train_step(d_state, x_a, x_b)

    for k in s_metrics:
        np.testing.assert_allclose(float(s_metrics[k]), float(d_metrics[k]),
                                   rtol=2e-3, atol=1e-4)
    sl = jax.tree_util.tree_leaves(s_state.params["a2b"]["gen"])
    dl = jax.tree_util.tree_leaves(d_state.params["a2b"]["gen"])
    worst = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(sl, dl))
    assert worst < 5e-4, worst


def test_dp_batch_divisibility_check(mesh8, rng):
    cfg = dp_config()
    trainer = DataParallelTrainer(cfg, mesh8)
    state = trainer.init_state(jax.random.PRNGKey(0))
    x_a, x_b = synthetic_batch(rng, b=6)
    with pytest.raises(ValueError):
        trainer.train_step(state, x_a, x_b)

