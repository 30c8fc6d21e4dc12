"""Checkpoint save/restore (reference trainer_council.py::{save, resume}).

The reference torch.saves per-member state dicts into
outputs/<name>/checkpoints/gen_%08d.pt (+ dis/dis_council/optimizer.pt) and
resumes by globbing the newest file and parsing the iteration out of the
FILENAME (utils.py::get_model_list). Here:

  * orbax saves the full TrainState (params + all three optimizer states +
    step + rng) atomically per snapshot under checkpoints/step_<iter>;
  * the iteration lives IN the payload, not the filename (SURVEY.md §5.3);
  * ``latest_checkpoint`` replaces get_model_list;
  * light-weight .npz export/import of generator params serves inference
    tooling and the .pt conversion path without orbax.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _ckpt_dir(root: str, step: int) -> str:
    return os.path.join(root, f"step_{step:08d}")


_ASYNC_CKPTR = None


def _get_async_ckptr():
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        import orbax.checkpoint as ocp
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC_CKPTR


def fetch_state_host(state):
    """device_get that also works on multi-host sharded states.

    Non-fully-addressable leaves (state sharded over a multi-process mesh)
    are first replicated with a collective identity-jit — EVERY process must
    call this (it is a collective); the full host copy then exists on every
    process."""
    def needs_gather(l):
        return isinstance(l, jax.Array) and not l.is_fully_addressable

    flat, treedef = jax.tree_util.tree_flatten(state)
    idx = [i for i, l in enumerate(flat) if needs_gather(l)]
    if not idx:
        return jax.device_get(state)
    from jax.sharding import NamedSharding, PartitionSpec

    # replicate ONLY the non-addressable jax.Array leaves; numpy/python
    # leaves mixed into the tree (e.g. a host-restored field) pass through
    # device_get untouched instead of crashing on l.sharding.mesh
    subset = [flat[i] for i in idx]
    out_sh = [NamedSharding(l.sharding.mesh, PartitionSpec())
              for l in subset]
    gathered = jax.jit(lambda s: s, out_shardings=out_sh)(subset)
    for i, g in zip(idx, gathered):
        flat[i] = g
    return jax.device_get(jax.tree_util.tree_unflatten(treedef, flat))


def save_checkpoint(root: str, state, step: int, keep: int = 3,
                    async_save: bool = False) -> str:
    """Orbax snapshot of the TrainState at ``step``.

    ``async_save=True`` returns as soon as the device->host copy is done and
    writes in a background thread (orbax AsyncCheckpointer) so training
    continues — SURVEY.md §5.3. Call :func:`wait_for_checkpoints` before
    reading the snapshot back or exiting.

    Multi-host: EVERY process must call this — the device->host gather is a
    collective, and orbax's Checkpointer.save itself performs a global sync
    in multi-process mode (calling it on process 0 alone deadlocks the
    job; measured). All processes pass the same shared-filesystem path;
    orbax writes the (host-replicated numpy) leaves from the primary host
    only."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(_ckpt_dir(root, step))
    host_state = fetch_state_host(state)
    os.makedirs(root, exist_ok=True)
    if async_save:
        ckptr = _get_async_ckptr()
        ckptr.save(path, host_state, force=True)
    else:
        ocp.PyTreeCheckpointer().save(path, host_state, force=True)
    if jax.process_index() == 0:
        _gc_old(root, keep)
    return path


def wait_for_checkpoints() -> None:
    """Block until any in-flight async snapshot is fully written."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def list_checkpoints(root: str):
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        m = re.fullmatch(r"step_(\d+)", name)
        if m:
            out.append((int(m.group(1)), os.path.join(root, name)))
    return sorted(out)


def latest_checkpoint(root: str) -> Optional[Tuple[int, str]]:
    """Newest snapshot (reference utils.py::get_model_list semantics)."""
    cks = list_checkpoints(root)
    return cks[-1] if cks else None


def restore_checkpoint(root: str, state_template) -> Tuple[Any, int]:
    """Restore the newest snapshot into the structure of ``state_template``."""
    import orbax.checkpoint as ocp

    found = latest_checkpoint(root)
    if found is None:
        raise FileNotFoundError(f"no checkpoints under {root}")
    step, path = found
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(os.path.abspath(path),
                             item=fetch_state_host(state_template))
    return restored, step


def _gc_old(root: str, keep: int) -> None:
    import shutil

    cks = list_checkpoints(root)
    for _, path in cks[:-keep] if keep > 0 else []:
        shutil.rmtree(path, ignore_errors=True)


# ---------------------------------------------------------------------------
# npz flat pytree export (inference snapshots, .pt conversion target)
# ---------------------------------------------------------------------------


def _flatten(tree, prefix="") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    tree: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def save_params_npz(path: str, params) -> None:
    np.savez(path, **_flatten(jax.device_get(params)))


def load_params_npz(path: str):
    with np.load(path) as data:
        return _unflatten({k: data[k] for k in data.files})
