"""Multi-host (multi-process) training support.

The reference is single-process/single-GPU (SURVEY.md §5.8 — no
torch.distributed at all); this module adds the JAX-native multi-host story
so a real TPU pod slice (multiple hosts, each owning a subset of chips) can
run training:

  * :func:`maybe_init_distributed` — `jax.distributed.initialize` gated on
    explicit arguments or the standard env vars; a no-op for single-process
    runs (the common case, incl. every test that doesn't spawn processes).
  * per-host input: each process loads only its share of the global batch;
    :func:`make_global_batch` assembles the global sharded array via
    `jax.make_array_from_process_local_data` (the documented multi-host
    input path).
  * :func:`is_primary` gates host-side side effects (logging, sample sheets,
    checkpoint writes) to process 0.

Verified by tests/test_multihost.py, which spawns 2 real processes x 4
virtual CPU devices each and asserts step-equality with a single-process
8-device run.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None,
                           local_device_ids: Optional[Sequence[int]] = None
                           ) -> bool:
    """Initialize jax.distributed when multi-process info is available.

    Arguments fall back to the COUNCILX_COORDINATOR / COUNCILX_NUM_PROCESSES
    / COUNCILX_PROCESS_ID env vars; on TPU pods with none of these set,
    `jax.distributed.initialize()` can also auto-detect from the TPU
    metadata — we only call it when explicitly requested to keep
    single-chip/CPU runs untouched. Returns True iff initialize() ran.
    """
    coordinator = coordinator or os.environ.get("COUNCILX_COORDINATOR")
    if num_processes is None and "COUNCILX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["COUNCILX_NUM_PROCESSES"])
    if process_id is None and "COUNCILX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["COUNCILX_PROCESS_ID"])
    if not coordinator and num_processes is None:
        return False
    if num_processes is not None and num_processes <= 1:
        return False
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)
    return True


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_primary() -> bool:
    """True on the process that owns host-side side effects."""
    return jax.process_index() == 0


def local_batch_size(global_batch: int) -> int:
    """The per-process share of the global batch this host must load."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"process count {n}")
    return global_batch // n


def make_global_batch(mesh: Mesh, local: np.ndarray,
                      spec: P = P("data")) -> jax.Array:
    """Assemble a globally-sharded array from this process's local batch
    rows (jax.make_array_from_process_local_data). Every process passes its
    own ``local`` block; together they form the global batch, sharded over
    the mesh's data axis. Single-process: equivalent to a device_put."""
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(sharding, np.asarray(local))
