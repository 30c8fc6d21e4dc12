"""skip_nonfinite_updates: a poisoned batch (NaN/inf pixels, upstream loader
bug, fp blow-up) must not destroy a long training run. The guard is a traced
jnp.where select inside the fused step (trainer._apply_if_finite) — no host
sync — gating each of the three update phases independently and logging
finite_{cdis,dis,gen}."""

import numpy as np

import jax
import jax.numpy as jnp

from councilx.parallel.council_shard import CouncilShardTrainer
from councilx.parallel.mesh import make_mesh
from councilx.train.trainer import CouncilTrainer

from test_train_step import synthetic_batch, tiny_config


def _leaves(tree):
    return jax.tree_util.tree_leaves(tree)


def _assert_tree_equal(a, b, msg):
    for la, lb in zip(_leaves(a), _leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb),
                                      err_msg=msg)


def test_guard_skips_all_phases_on_nan_batch(rng):
    cfg = tiny_config(batch_size=2, skip_nonfinite_updates=True)
    trainer = CouncilTrainer(cfg)
    state0 = trainer.init_state(jax.random.PRNGKey(0))
    params0 = jax.device_get(state0.params)
    opt0 = jax.device_get((state0.opt_gen, state0.opt_dis, state0.opt_cdis))

    x_a, x_b = synthetic_batch(rng, b=2)
    x_a = jnp.asarray(np.asarray(x_a).copy())
    x_a = x_a.at[0, 3, 3, 0].set(jnp.nan)  # one poisoned pixel
    state1, metrics = trainer.train_step(state0, x_a, x_b)

    for k in ("finite_cdis", "finite_dis", "finite_gen"):
        assert float(metrics[k]) == 0.0, (k, float(metrics[k]))
    assert int(state1.step) == 1  # the step still advances
    _assert_tree_equal(params0, jax.device_get(state1.params),
                       "params changed on a non-finite step")
    _assert_tree_equal(
        opt0,
        jax.device_get((state1.opt_gen, state1.opt_dis, state1.opt_cdis)),
        "optimizer state changed on a non-finite step")
    # the loss metrics themselves are NaN — that is the observable signal
    assert not np.isfinite(float(metrics["loss_gen_total"]))


def test_guard_recovers_on_next_clean_batch(rng):
    """After a skipped step, a clean batch must train normally — and end up
    bitwise where a run that never saw the poisoned batch would be, except
    for the rng/step advance."""
    cfg = tiny_config(batch_size=2, skip_nonfinite_updates=True)
    trainer = CouncilTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    x_a, x_b = synthetic_batch(rng, b=2)
    bad = jnp.asarray(np.asarray(x_a).copy()).at[0, 0, 0, 0].set(jnp.inf)

    state, m_bad = trainer.train_step(state, bad, x_b)
    assert float(m_bad["finite_gen"]) == 0.0
    state, m_ok = trainer.train_step(state, x_a, x_b)
    for k in ("finite_cdis", "finite_dis", "finite_gen"):
        assert float(m_ok[k]) == 1.0
    assert np.isfinite(float(m_ok["loss_gen_total"]))
    assert int(state.step) == 2


def test_guard_transparent_on_clean_data(rng):
    """Guard on + clean data must produce the exact same step as guard off:
    the select is jnp.where(True, new, old), value-identical."""
    x_a, x_b = synthetic_batch(rng, b=2)

    t_off = CouncilTrainer(tiny_config(batch_size=2))
    s_off = t_off.init_state(jax.random.PRNGKey(0))
    s_off, m_off = t_off.train_step(s_off, x_a, x_b)

    t_on = CouncilTrainer(tiny_config(batch_size=2,
                                      skip_nonfinite_updates=True))
    s_on = t_on.init_state(jax.random.PRNGKey(0))
    s_on, m_on = t_on.train_step(s_on, x_a, x_b)

    for k in ("finite_cdis", "finite_dis", "finite_gen"):
        assert float(m_on.pop(k)) == 1.0
    _assert_tree_equal(jax.device_get(s_off.params),
                       jax.device_get(s_on.params),
                       "guard-on step diverged from guard-off on clean data")
    np.testing.assert_allclose(float(m_off["loss_gen_total"]),
                               float(m_on["loss_gen_total"]), rtol=1e-6)


def test_guard_on_shard_trainer(rng):
    """The member-sharded trainer gates GLOBALLY (pmin over 'council'): one
    poisoned row skips the phase on every shard, params stay put."""
    cfg = tiny_config(batch_size=8, skip_nonfinite_updates=True)
    mesh = make_mesh(8, council_parallel=2)
    cp = CouncilShardTrainer(cfg, mesh)
    state0 = cp.init_state(jax.random.PRNGKey(0))
    from councilx.ckpt.manager import fetch_state_host
    params0 = fetch_state_host(state0.params)

    x_a, x_b = synthetic_batch(rng, b=8)
    bad = jnp.asarray(np.asarray(x_a).copy()).at[5, 1, 1, 1].set(jnp.nan)
    state1, metrics = cp.train_step(state0, bad, x_b)

    for k in ("finite_cdis", "finite_dis", "finite_gen"):
        assert float(metrics[k]) == 0.0, k
    _assert_tree_equal(params0, fetch_state_host(state1.params),
                       "sharded params changed on a non-finite step")
