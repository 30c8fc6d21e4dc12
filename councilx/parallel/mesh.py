"""Data-parallel training over a device mesh (pjit/GSPMD).

The reference has NO distributed story (SURVEY.md §2 parallelism audit); this
module adds it the TPU way: a 1-D ``Mesh(('data',))``, parameters + optimizer
state replicated, the global batch sharded over the 'data' axis, and XLA's
GSPMD partitioner inserting the gradient all-reduces over ICI — no explicit
collectives in user code, no NCCL-style process groups. The per-step
semantics are identical to single-chip training at the same GLOBAL batch
(loss means are over the global batch), so scaling out changes only
wall-clock, not math — verified by tests/test_parallel.py on the 8-device
CPU mesh.

Council-axis sharding (mesh ('data', 'council')) is a planned extension for
councils larger than a chip's memory; with N<=4 members and these model
sizes, replication + batch DP is the right layout (params are ~100 MB total,
HBM is the constraint on activations, which DP already shards).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from councilx.config import Config
from councilx.train.trainer import CouncilTrainer, TrainState


def make_mesh(n_devices: Optional[int] = None,
              devices=None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))


def shard_batch(mesh: Mesh, batch) -> jax.Array:
    """Place a host batch sharded over the mesh's data axis."""
    return jax.device_put(batch, NamedSharding(mesh, P("data")))


class DataParallelTrainer(CouncilTrainer):
    """CouncilTrainer with the fused step pjit-sharded over a mesh.

    Inputs x_a/x_b are global batches sharded on axis 0; TrainState is
    replicated. Everything else — including the vmapped council axis and the
    batched pairwise council loss — partitions automatically under GSPMD.
    """

    def __init__(self, cfg: Config, mesh: Mesh):
        super().__init__(cfg)
        self.mesh = mesh
        replicated = NamedSharding(mesh, P())
        batch_sh = NamedSharding(mesh, P("data"))
        self._replicated = replicated
        self._batch_sharding = batch_sh
        self._jit_step = jax.jit(
            self._step,
            static_argnames=("do_cdis",),
            donate_argnums=(0,),
            in_shardings=(replicated, batch_sh, batch_sh),
            out_shardings=(replicated, replicated),
        )

    def init_state(self, rng: jax.Array) -> TrainState:
        state = super().init_state(rng)
        return jax.device_put(state, self._replicated)

    def train_step(self, state: TrainState, x_a, x_b
                   ) -> Tuple[TrainState, dict]:
        n_dev = self.mesh.devices.size
        if x_a.shape[0] % n_dev:
            raise ValueError(
                f"global batch {x_a.shape[0]} not divisible by mesh size "
                f"{n_dev}")
        x_a = shard_batch(self.mesh, x_a)
        x_b = shard_batch(self.mesh, x_b)
        ratio = max(1, self.cfg.council.council_dis_relative_iteration)
        do_cdis = True if ratio == 1 else bool(
            int(jax.device_get(state.step)) % ratio == 0)
        # pjit with explicit in_shardings rejects kwargs -> pass positionally
        with self.mesh:
            return self._jit_step(state, x_a, x_b, do_cdis)
