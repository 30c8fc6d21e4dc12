"""Member (council) parallelism via shard_map: 2-D ('data','council') mesh
on 8 virtual CPU devices must reproduce single-chip training exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from councilx.parallel.council_shard import CouncilShardTrainer
from councilx.parallel.mesh import DataParallelTrainer, make_mesh
from councilx.train.trainer import CouncilTrainer

from test_train_step import synthetic_batch, tiny_config


def test_mesh_and_rejections():
    mesh = make_mesh(8, council_parallel=2)
    assert mesh.axis_names == ("data", "council")
    assert mesh.shape == {"data": 4, "council": 2}
    with pytest.raises(ValueError, match="CouncilShardTrainer"):
        DataParallelTrainer(tiny_config(batch_size=8), mesh)
    with pytest.raises(ValueError, match="mesh"):
        CouncilShardTrainer(tiny_config(batch_size=8), make_mesh(8))


def test_council_shard_matches_single_device(rng):
    """data=4 x council=2: params shard over 'council'; one step of the
    sharded trainer must equal a single-chip step (same seeds/batch).

    Metrics agree to fp-reduction-order noise (~1e-5); params to 2*lr
    (Adam's first-step update is ~±lr, so reduction-order noise can flip
    an update sign) — the same tolerance the DP-equality test uses.
    """
    cfg = tiny_config(batch_size=8)
    x_a, x_b = synthetic_batch(rng, b=8)

    single = CouncilTrainer(cfg)
    s_state = single.init_state(jax.random.PRNGKey(0))
    s_state, s_metrics = single.train_step(s_state, x_a, x_b)

    mesh = make_mesh(8, council_parallel=2)
    cp = CouncilShardTrainer(cfg, mesh)
    c_state = cp.init_state(jax.random.PRNGKey(0))
    leaf = jax.tree_util.tree_leaves(c_state.params["a2b"]["gen"])[0]
    assert leaf.sharding.shard_shape(leaf.shape)[0] == leaf.shape[0] // 2
    c_state, c_metrics = cp.train_step(c_state, x_a, x_b)

    for k in s_metrics:
        np.testing.assert_allclose(float(s_metrics[k]), float(c_metrics[k]),
                                   rtol=2e-3, atol=1e-4, err_msg=k)
    for grp in ("gen", "dis", "cdis"):
        sl = jax.tree_util.tree_leaves(s_state.params["a2b"][grp])
        cl = jax.tree_util.tree_leaves(c_state.params["a2b"][grp])
        worst = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(sl, cl))
        assert worst < 5e-4, (grp, worst)


def test_council_shard_full_width(rng):
    """council axis == council size (one member per shard group)."""
    cfg = tiny_config(batch_size=8)  # council_size=2 in tiny_config
    mesh = make_mesh(8, council_parallel=2)
    cp = CouncilShardTrainer(cfg, mesh)
    assert cp.m == cp.n // 2
    state = cp.init_state(jax.random.PRNGKey(1))
    x_a, x_b = synthetic_batch(rng, b=8)
    state, metrics = cp.train_step(state, x_a, x_b)
    assert all(np.isfinite(float(v)) for v in metrics.values())
