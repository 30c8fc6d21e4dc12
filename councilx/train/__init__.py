"""Training: council train state, fused jitted train step, outer loop."""

from councilx.train.trainer import CouncilTrainer, TrainState  # noqa: F401
