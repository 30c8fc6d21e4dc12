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


def assert_data_replicas_identical(tree):
    """Param leaves shard over 'council' and REPLICATE over 'data'; the
    shards that map to the same global index must be bitwise identical.
    If a data shard ever applies a gradient the others didn't psum (the
    check_vma=False failure mode), this trips on the very first step."""
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        by_index = {}
        for s in leaf.addressable_shards:
            arr = np.asarray(s.data)
            key = str(s.index)
            if key in by_index:
                np.testing.assert_array_equal(
                    by_index[key], arr,
                    err_msg=f"data-axis replicas diverged at "
                            f"{jax.tree_util.keystr(path)}")
            else:
                by_index[key] = arr


def test_grad_psum_invariant():
    """Miniature of the trainer's shard_map pattern: params replicated along
    'data', loss pmean'd over 'data' — jax.grad must produce the GLOBAL
    gradient on every shard. This is exactly what check_vma=True provides
    and check_vma=False silently breaks (grad = local contribution only)."""
    import functools
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    mesh = make_mesh(8, council_parallel=2)
    W = jnp.arange(6, dtype=jnp.float32).reshape(2, 3)
    x = jnp.arange(24, dtype=jnp.float32).reshape(8, 3)

    def loss(w, xs):
        return jnp.sum(jnp.mean(jnp.einsum("nd,bd->nb", w, xs) ** 2, axis=1))

    def step(w, xs):
        return jax.grad(lambda ww: jax.lax.pmean(loss(ww, xs), "data"))(w)

    g_ref = jax.grad(lambda w: loss(w, x))(W)
    fn = shard_map(step, mesh=mesh, in_specs=(P("council"), P("data")),
                   out_specs=P("council"), check_vma=True)
    g = jax.jit(fn)(W, x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-6)


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
    assert_data_replicas_identical(c_state.params)


def test_council_shard_multistep_tracks_single_device(rng):
    """Three steps at a 30x-raised lr: any per-shard gradient error compounds
    far past the tolerance (the single-step test at lr=1e-4 cannot see wrong
    gradients because Adam's first step is ~±lr regardless of grad values).
    Also asserts the 'data'-axis param replicas stay bitwise identical after
    every step."""
    cfg = tiny_config(batch_size=8, lr=3e-3)
    x_a, x_b = synthetic_batch(rng, b=8)

    single = CouncilTrainer(cfg)
    s_state = single.init_state(jax.random.PRNGKey(0))
    mesh = make_mesh(8, council_parallel=2)
    cp = CouncilShardTrainer(cfg, mesh)
    c_state = cp.init_state(jax.random.PRNGKey(0))

    for _ in range(3):
        s_state, _ = single.train_step(s_state, x_a, x_b)
        c_state, _ = cp.train_step(c_state, x_a, x_b)
        assert_data_replicas_identical(c_state.params)

    # Max-norm cannot distinguish benign Adam sign-flips (update is ~±lr
    # wherever |grad| sits at the fp-reduction noise floor) from wrong
    # gradients — but the STATISTICS can: benign flips touch ~0.1% of
    # components and leave mean|Δ| at ~lr/1000, while a local-only gradient
    # (the check_vma=False bug) changes a large fraction of update signs
    # and pushes mean|Δ| toward lr*steps.
    lr = 3e-3
    for grp in ("gen", "dis", "cdis"):
        sl = jax.tree_util.tree_leaves(s_state.params["a2b"][grp])
        cl = jax.tree_util.tree_leaves(c_state.params["a2b"][grp])
        diffs = np.concatenate([np.abs(np.asarray(a) - np.asarray(b)).ravel()
                                for a, b in zip(sl, cl)])
        flip_frac = float((diffs > lr / 2).mean())
        assert diffs.mean() < lr / 10, (grp, float(diffs.mean()))
        assert flip_frac < 0.01, (grp, flip_frac)


@pytest.mark.parametrize("mode", ["k_per_step", "every_kth"])
def test_council_shard_ratio2_matches_single_device(rng, mode):
    """council_dis_relative_iteration=2 under both cdis_ratio_mode readings:
    two sharded steps must track the single-chip trainer (covers the fresh-z
    slicing of the k_per_step inner iterations and the traced every_kth
    gate, including its skip step)."""
    cfg = tiny_config(batch_size=8,
                      council={"council_size": 2, "council_w": 0.2,
                               "council_dis_relative_iteration": 2,
                               "cdis_ratio_mode": mode})
    x_a, x_b = synthetic_batch(rng, b=8)

    single = CouncilTrainer(cfg)
    s_state = single.init_state(jax.random.PRNGKey(0))
    mesh = make_mesh(8, council_parallel=2)
    cp = CouncilShardTrainer(cfg, mesh)
    c_state = cp.init_state(jax.random.PRNGKey(0))

    for _ in range(2):
        s_state, s_metrics = single.train_step(s_state, x_a, x_b)
        c_state, c_metrics = cp.train_step(c_state, x_a, x_b)
        for k in s_metrics:
            np.testing.assert_allclose(
                float(s_metrics[k]), float(c_metrics[k]),
                rtol=2e-3, atol=1e-4, err_msg=f"{mode}:{k}")
    assert_data_replicas_identical(c_state.params)
    for grp in ("gen", "dis", "cdis"):
        sl = jax.tree_util.tree_leaves(s_state.params["a2b"][grp])
        cl = jax.tree_util.tree_leaves(c_state.params["a2b"][grp])
        worst = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(sl, cl))
        assert worst < 1e-3, (mode, grp, worst)


def test_council_shard_det_reduction_matches(rng):
    """det_data_reduction replaces the cross-'data' psum/pmean with an
    order-fixed all_gather + chained sum; it must change only the
    reduction ORDER. One step must match the single-chip trainer to the
    same tolerance as the default path, the replicated metrics must agree,
    and the 'data'-axis param replicas must stay bitwise identical.
    (The cross-process-topology BITWISE claim this mode exists for is
    asserted by tests/test_multihost.py::test_two_process_bitexact_det.)"""
    cfg = tiny_config(batch_size=8, det_data_reduction=True)
    x_a, x_b = synthetic_batch(rng, b=8)

    single = CouncilTrainer(tiny_config(batch_size=8))
    s_state = single.init_state(jax.random.PRNGKey(0))
    s_state, s_metrics = single.train_step(s_state, x_a, x_b)

    mesh = make_mesh(8, council_parallel=2)
    cp = CouncilShardTrainer(cfg, mesh)
    assert cp.det_reduce
    c_state = cp.init_state(jax.random.PRNGKey(0))
    c_state, c_metrics = cp.train_step(c_state, x_a, x_b)

    for k in s_metrics:
        np.testing.assert_allclose(float(s_metrics[k]), float(c_metrics[k]),
                                   rtol=2e-3, atol=1e-4, err_msg=k)
    for grp in ("gen", "dis", "cdis"):
        sl = jax.tree_util.tree_leaves(s_state.params["a2b"][grp])
        cl = jax.tree_util.tree_leaves(c_state.params["a2b"][grp])
        worst = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(sl, cl))
        assert worst < 5e-4, (grp, worst)
    assert_data_replicas_identical(c_state.params)


def test_det_reduction_pure_data_parallel(rng):
    """det_data_reduction with council_parallel=1 routes make_trainer onto
    the shard_map trainer over a degenerate ('data',8)x('council',1) mesh —
    pure data parallelism with order-fixed reductions (GSPMD's implicit
    all-reduces have no order knob). One step must match the single-chip
    trainer to the usual tolerance."""
    from councilx.train.loop import make_trainer

    cfg = tiny_config(batch_size=8, det_data_reduction=True, num_devices=8)
    cp = make_trainer(cfg)
    assert isinstance(cp, CouncilShardTrainer)
    assert cp.k == 1 and cp.det_reduce
    assert cp.mesh.shape == {"data": 8, "council": 1}

    x_a, x_b = synthetic_batch(rng, b=8)
    single = CouncilTrainer(tiny_config(batch_size=8))
    s_state = single.init_state(jax.random.PRNGKey(0))
    s_state, s_metrics = single.train_step(s_state, x_a, x_b)

    c_state = cp.init_state(jax.random.PRNGKey(0))
    c_state, c_metrics = cp.train_step(c_state, x_a, x_b)

    for k in s_metrics:
        np.testing.assert_allclose(float(s_metrics[k]), float(c_metrics[k]),
                                   rtol=2e-3, atol=1e-4, err_msg=k)
    for grp in ("gen", "dis", "cdis"):
        sl = jax.tree_util.tree_leaves(s_state.params["a2b"][grp])
        cl = jax.tree_util.tree_leaves(c_state.params["a2b"][grp])
        worst = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(sl, cl))
        assert worst < 5e-4, (grp, worst)
    assert_data_replicas_identical(c_state.params)


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
