"""Multi-chip scaling over a jax.sharding.Mesh (SURVEY.md §5.8: this is NEW
capability — the reference is strictly single-GPU, single-process)."""

from councilx.parallel.mesh import (  # noqa: F401
    DataParallelTrainer,
    make_mesh,
    shard_batch,
)
