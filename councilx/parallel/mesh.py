"""Distributed training over a device mesh (pjit/GSPMD): data parallelism,
optionally combined with council-member parallelism.

The reference has NO distributed story (SURVEY.md §2 parallelism audit); this
module adds it the TPU way — no explicit collectives in user code, no
NCCL-style process groups:

* **Data axis**: the global batch shards over ``'data'``; parameters and
  optimizer state replicate along it; GSPMD inserts the gradient
  all-reduces over ICI. Per-step semantics are identical to single-chip
  training at the same GLOBAL batch (loss means are over the global batch)
  — verified by tests/test_parallel.py on the 8-device CPU mesh.

* **Council axis** (optional, ``council_parallel > 1``): every parameter and
  optimizer-state leaf carries a leading member axis (N, ...) — the
  framework's core design — so member parallelism is just sharding that
  axis over ``'council'``. The vmapped per-member forwards partition
  cleanly; the O(N^2) pairwise mutual-agreement loss makes GSPMD insert an
  all-gather of the (N, B, H, W, C) fake stack over ICI, which is tiny next
  to the per-member compute. This is the model-parallel analogue for this
  architecture (there is no attention/tensor dimension worth splitting —
  members ARE the model axis).

Semantics are unchanged by either axis; only wall-clock and per-chip memory
move. Verified against single-device training in tests/test_parallel.py.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from councilx.config import Config
from councilx.train.trainer import CouncilTrainer, TrainState


def make_mesh(n_devices: Optional[int] = None, devices=None,
              council_parallel: int = 1, always_2d: bool = False) -> Mesh:
    """Mesh over the first ``n_devices`` devices.

    council_parallel=1 -> 1-D ('data',) mesh; k>1 -> 2-D ('data','council')
    mesh with the council axis of size k. ``always_2d`` forces the 2-D
    shape even at k=1 (a degenerate council axis) — used to run the
    shard_map trainer for pure data parallelism, e.g. under
    ``det_data_reduction``."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    devices = np.asarray(devices)
    if council_parallel <= 1 and not always_2d:
        return Mesh(devices, axis_names=("data",))
    council_parallel = max(1, council_parallel)
    if devices.size % council_parallel:
        raise ValueError(f"{devices.size} devices not divisible by "
                         f"council_parallel={council_parallel}")
    grid = devices.reshape(devices.size // council_parallel,
                           council_parallel)
    return Mesh(grid, axis_names=("data", "council"))


def make_member_mesh(n_shards: int, devices=None,
                     data_parallel: int = 1) -> Mesh:
    """Mesh for member-sharded ensemble SERVING
    (inference.translate.MemberShardedTranslator).

    ``data_parallel=1`` (default): 1-D ``('council',)`` — the stacked
    council axis splits over devices, the batch replicates.
    ``data_parallel=D``: 2-D ``('data','council')`` over D*n_shards
    devices — the batch additionally shards over 'data' (pod-scale
    ensemble serving: council-8 over 16 chips = 8 member shards x 2 batch
    shards). Distinct from make_mesh(council_parallel=k), whose 2-D mesh
    is the training layout."""
    if devices is None:
        devices = jax.devices()
    need = n_shards * data_parallel
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    if data_parallel <= 1:
        return Mesh(np.asarray(devices[:n_shards]), axis_names=("council",))
    grid = np.asarray(devices[:need]).reshape(data_parallel, n_shards)
    return Mesh(grid, axis_names=("data", "council"))


def shard_batch(mesh: Mesh, batch) -> jax.Array:
    """Place a batch sharded over the mesh's data axis.

    Already-global jax.Arrays (built per-host via
    multihost.make_global_batch) pass through untouched; host-local numpy
    is device_put, which is only valid single-process (multi-host callers
    must assemble the global array themselves — device_put of local data to
    a global sharding would be wrong, so we refuse)."""
    want = NamedSharding(mesh, P("data"))
    if isinstance(batch, jax.Array) and not batch.is_fully_addressable:
        return batch  # multi-host global array; trust the caller's sharding
    if jax.process_count() > 1:
        raise ValueError(
            "multi-host run: pass batches through "
            "councilx.parallel.multihost.make_global_batch, not raw arrays")
    return jax.device_put(batch, want)


class DataParallelTrainer(CouncilTrainer):
    """CouncilTrainer with the fused step pjit-sharded over a mesh.

    Inputs x_a/x_b are global batches sharded on axis 0. With a 1-D mesh the
    TrainState replicates; with a 2-D ('data','council') mesh, every state
    leaf whose leading dimension equals council_size shards over 'council'
    (params and the matching Adam moments), scalars/counters replicate.
    """

    def __init__(self, cfg: Config, mesh: Mesh):
        if "council" in mesh.axis_names:
            # GSPMD cannot auto-partition the vmapped member axis (it
            # lowers to grouped convolutions whose small per-group feature
            # counts are unsplittable); member parallelism is the explicit
            # shard_map trainer instead.
            raise ValueError(
                "DataParallelTrainer takes a 1-D ('data',) mesh; for a "
                "('data','council') mesh use "
                "councilx.parallel.council_shard.CouncilShardTrainer")
        super().__init__(cfg)
        self.mesh = mesh
        replicated = NamedSharding(mesh, P())
        batch_sh = NamedSharding(mesh, P("data"))
        self._replicated = replicated
        self._batch_sharding = batch_sh
        self._jit_step = jax.jit(
            self._step,
            donate_argnums=(0,),
            in_shardings=(replicated, batch_sh, batch_sh),
            out_shardings=(replicated, replicated),
        )

    def init_state(self, rng: jax.Array) -> TrainState:
        # jit with out_shardings instead of init-then-device_put: on a
        # multi-host mesh device_put of host-local values is invalid; the
        # jitted init is the documented path (each process materializes its
        # addressable replicas only)
        return jax.jit(super().init_state,
                       out_shardings=self._replicated)(rng)

    def place_state(self, state_host) -> TrainState:
        """Place a host-side (numpy) TrainState, e.g. a restored checkpoint,
        onto the mesh. Works single- and multi-host (numpy jit inputs are
        treated as replicated; every process passes the same values)."""
        return jax.jit(lambda s: s, out_shardings=self._replicated)(state_host)

    def train_step(self, state: TrainState, x_a, x_b
                   ) -> Tuple[TrainState, dict]:
        n_dev = self.mesh.shape["data"]
        if x_a.shape[0] % n_dev:
            raise ValueError(
                f"global batch {x_a.shape[0]} not divisible by data-axis "
                f"size {n_dev}")
        x_a = shard_batch(self.mesh, x_a)
        x_b = shard_batch(self.mesh, x_b)
        # the cdis ratio is resolved inside the jit (trainer._step) — no
        # host readback of state.step in the hot loop
        with self.mesh:
            return self._jit_step(state, x_a, x_b)
