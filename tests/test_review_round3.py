"""Regression tests for the round-3 high-effort review findings:
lr_policy='constant' overflow, unbalanced profiler start/stop, and the
multi-host stage path (covered by test_multihost's loop test; the uint8
global assembly is asserted there by the run completing)."""

import os

import numpy as np
import pytest

import jax

from councilx.config import load_config
from councilx.train.loop import train
from councilx.train.trainer import CouncilTrainer

from test_train_step import synthetic_batch, tiny_config

REPO = os.path.join(os.path.dirname(__file__), "..")
SMOKE = os.path.join(REPO, "configs", "smoke_tiny.yaml")


def test_constant_lr_policy_trains(rng):
    """lr_policy='constant' must trace and step (a 1<<62 sentinel step_size
    used to overflow optax's int32 count at trace time)."""
    cfg = tiny_config(batch_size=2, lr_policy="constant")
    trainer = CouncilTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    x_a, x_b = synthetic_batch(rng, b=2)
    state, metrics = trainer.train_step(state, x_a, x_b)
    assert np.isfinite(float(metrics["loss_gen_total"]))
    # constant policy == step policy before its first decay boundary
    cfg2 = tiny_config(batch_size=2)  # default step policy, step_size huge
    assert cfg2.lr_policy == "step"
    t2 = CouncilTrainer(cfg2)
    s2 = t2.init_state(jax.random.PRNGKey(0))
    s2, _ = t2.train_step(s2, x_a, x_b)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_profiler_balanced_across_short_and_resumed_runs(tmp_path):
    """(a) A run ending before profile_steps.stop must still finalize the
    trace (files exist, no dangling profiler session); (b) a resumed run
    whose steps overlap only the END of profile_steps must not call
    stop_trace without start_trace (used to raise and kill training)."""
    cfg = load_config(SMOKE)
    out = str(tmp_path)
    # (a) short run: limit 2 < stop 3
    s = train(cfg, output_path=out, run_name="p", synthetic=True,
              max_steps=2, profile_steps=range(1, 3))
    assert s["step"] == 2
    assert os.path.isdir(os.path.join(out, "p", "profile"))
    # (b) resume to steps 2..3: step==3 (the old stop condition) occurs,
    # step==1 (start) does not — must complete without touching the profiler
    s = train(cfg, output_path=out, run_name="p", synthetic=True,
              max_steps=2, resume=True, profile_steps=range(1, 3))
    assert s["step"] == 4
