"""Outer training loop (reference train.py §3.1 of SURVEY.md).

Hot loop shape matches the reference — fetch unpaired batch pair, step, log /
sample / snapshot on the configured cadences — with the TPU-native changes:
uint8 batches go to device and are augmented inside jit (data/ondevice.py),
all three updates happen in one fused jitted call, checkpoints are orbax
snapshots, and per-step wall time / images-per-second (the north-star
metric) are tracked and logged. Optional jax.profiler traces cover SURVEY.md
§5.1 (the reference has no tracing at all).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from councilx.config import Config
from councilx.ckpt.manager import (latest_checkpoint, restore_checkpoint,
                                   save_checkpoint, wait_for_checkpoints)
from councilx.data.loader import get_all_data_loaders
from councilx.data.ondevice import augment_batch
from councilx.train.trainer import CouncilTrainer
from councilx.utils.images import write_html, write_sample_sheet
from councilx.utils.logging import MetricLogger, prepare_sub_folder


def make_trainer(cfg: Config) -> CouncilTrainer:
    """Build the right trainer for the config's mesh settings:
    num_devices == 1 -> single-device CouncilTrainer; > 1 -> GSPMD
    data-parallel; council_parallel > 1 -> the explicit shard_map
    ('data','council') trainer. det_data_reduction needs explicit
    collectives, so it routes pure data-parallel onto the shard_map
    trainer with a degenerate council axis of 1 (GSPMD's implicit
    all-reduces have no order knob)."""
    if cfg.num_devices <= 1:
        return CouncilTrainer(cfg)
    from councilx.parallel.mesh import DataParallelTrainer, make_mesh
    council = cfg.council_parallel
    if council <= 1 and cfg.det_data_reduction:
        council = 1
        from councilx.parallel.council_shard import CouncilShardTrainer
        return CouncilShardTrainer(
            cfg, make_mesh(cfg.num_devices, council_parallel=council,
                           always_2d=True))
    mesh = make_mesh(cfg.num_devices, council_parallel=council)
    if council > 1:
        from councilx.parallel.council_shard import CouncilShardTrainer
        return CouncilShardTrainer(cfg, mesh)
    return DataParallelTrainer(cfg, mesh)


def mask_skipped_metrics(metrics: Dict) -> Dict:
    """Drop placeholder metrics from steps where the gated council-dis
    update did not run (cdis_ratio_mode='every_kth' skip steps return a
    literal 0.0 through the lax.cond). The TB/JSONL stream then simply has
    no data point for the skipped step instead of a sawtooth of fake zeros.
    Consumes the ``cdis_updated`` flag either way."""
    updated = metrics.pop("cdis_updated", None)
    if updated is not None and float(np.asarray(updated)) == 0.0:
        metrics.pop("loss_dis_council", None)
        # no update ran, so "applied cleanly" (finite_cdis=1.0) would
        # mislead the same way the placeholder loss does
        metrics.pop("finite_cdis", None)
    return metrics


def train(cfg: Config, output_path: str = "outputs", run_name: str = "run",
          resume: bool = False, synthetic: bool = False,
          max_steps: Optional[int] = None, seed: int = 0,
          profile_steps: Optional[range] = None,
          stop_event=None) -> Dict:
    """Run training. Returns a summary dict (final step, throughput).

    Multi-host: every participating process runs this same function after
    jax.distributed initialization (SURVEY.md §5.8). Each host loads its
    share of the global batch; collectives (train step, checkpoint gathers)
    run on all processes; filesystem side effects are process-0 only.

    ``stop_event`` (a threading.Event): graceful shutdown — when set (e.g.
    by train.py's SIGTERM/SIGINT handlers), the loop finishes the current
    step, writes a final checkpoint and returns with ``interrupted=True``
    instead of dying mid-state. Single-process only: under multi-host a
    per-process early exit would desynchronize the collectives, so the
    event is ignored there (preempt multi-host jobs at the
    snapshot_save_iter cadence instead).
    """
    from councilx.parallel import multihost

    n_proc = jax.process_count()
    primary = multihost.is_primary()
    run_dir = os.path.join(output_path, run_name)
    if primary:
        ckpt_dir, image_dir = prepare_sub_folder(run_dir)
        logger = MetricLogger(run_dir)
        with open(os.path.join(run_dir, "config.yaml"), "w") as f:
            yaml.safe_dump(cfg.to_dict(), f)  # reference copies the config
    else:
        ckpt_dir = os.path.join(run_dir, "checkpoints")
        image_dir = os.path.join(run_dir, "images")
        logger = None

    trainer = make_trainer(cfg)
    mesh = getattr(trainer, "mesh", None)
    if n_proc > 1 and mesh is None:
        raise ValueError(
            "multi-host training needs a mesh trainer: set num_devices to "
            "the GLOBAL device count (and optionally council_parallel)")
    state = trainer.init_state(jax.random.PRNGKey(seed))
    start_step = 0
    if resume:
        # agree on what to restore BEFORE any process enters the restore
        # collectives: each process resolves --resume against its OWN
        # filesystem, so on non-shared disks they can disagree — and a
        # process that restores (replicate-jit collective) while another
        # skips straight to process_allgather deadlocks on mismatched
        # collectives instead of failing loudly. Allgather the locally
        # found step first and drive the branch from the agreed value.
        found = latest_checkpoint(ckpt_dir)
        local_step = found[0] if found else -1
        agreed_step = local_step
        if n_proc > 1:
            from jax.experimental import multihost_utils
            steps = np.asarray(
                multihost_utils.process_allgather(jnp.asarray(local_step)))
            if int(steps.min()) != int(steps.max()):
                raise RuntimeError(
                    f"resume desynchronized across hosts: per-process "
                    f"latest checkpoint steps {steps.tolist()} — "
                    f"checkpoints must live on a shared filesystem (or be "
                    f"mirrored to every host)")
            agreed_step = int(steps[0])
        if agreed_step >= 0:
            host_state, start_step = restore_checkpoint(ckpt_dir, state)
            state = trainer.place_state(host_state)
            if primary:
                print(f"resumed from iteration {start_step}")

    local_bs = multihost.local_batch_size(cfg.batch_size)
    train_a, train_b, test_a, test_b = get_all_data_loaders(
        cfg, synthetic=synthetic, batch_size=local_bs,
        shard_index=jax.process_index(), shard_count=n_proc,
        # the train index streams are deterministic — fast-forward them to
        # the resumed step so the run continues the data order instead of
        # replaying already-consumed batches
        start_batch=start_step)
    # fixed display batches (reference: display_size samples) — head_rows:
    # epoch-0 rows regardless of resume fast-forward (the sheets stay
    # comparable across a resume) and no abandoned producer thread
    disp_n = min(cfg.display_size, local_bs)
    disp_a = test_a.head_rows(disp_n)
    disp_train_a = train_a.head_rows(disp_n)
    if n_proc > 1:
        # one consistent display batch everywhere (sampling is replicated
        # compute; all processes must see the same pixels)
        from jax.experimental import multihost_utils
        disp_a = np.asarray(
            multihost_utils.broadcast_one_to_all(jnp.asarray(disp_a)))
        disp_train_a = np.asarray(
            multihost_utils.broadcast_one_to_all(jnp.asarray(disp_train_a)))

    aug_key = jax.random.fold_in(jax.random.PRNGKey(seed), 1)
    crop_h, crop_w = cfg.data.crop_image_height, cfg.data.crop_image_width

    eval_hook = None
    if cfg.eval_iter:
        # in-training FID vs the test split at the eval_iter cadence
        # (councilx/eval/hook.py); head_rows fixtures don't consume or
        # race the loaders' streams
        from councilx.eval.hook import TrainEvalHook
        eval_hook = TrainEvalHook(cfg, trainer, test_a, test_b)

    limit = min(cfg.max_iter, max_steps + start_step if max_steps else
                cfg.max_iter)
    step = start_step
    t_window = time.perf_counter()
    window_steps = 0
    images_per_sec = 0.0

    it_a, it_b = iter(train_a), iter(train_b)
    # augmentation is keyed per GLOBAL row (augment_batch row_offset): each
    # process augments its own slice of the global batch with exactly the
    # crops/flips a single-process run would apply to those rows
    row_off = jax.process_index() * local_bs

    def stage_batch(s: int):
        """All host-side work for step s: loader fetch, H2D transfer,
        augment dispatch, (multi-host) global-batch assembly. Keyed by the
        step number, so staging ahead of time changes nothing."""
        a_u8, b_u8 = next(it_a), next(it_b)
        k = jax.random.fold_in(aug_key, s)
        ka, kb = jax.random.split(k)
        if n_proc > 1:
            # assemble the global batch from the local UINT8 rows FIRST
            # (jax.make_array_from_process_local_data), then augment the
            # sharded global array on device. Augmenting locally and
            # gathering after would round-trip the f32 crops through the
            # host — 4x the bytes, twice, per step. The augment keys are
            # per GLOBAL row either way (row_offset vs global index), so
            # the pixels match the single-process run exactly.
            ga = multihost.make_global_batch(mesh, np.asarray(a_u8))
            gb = multihost.make_global_batch(mesh, np.asarray(b_u8))
            x_a = augment_batch(ka, ga, crop_h, crop_w, train=True)
            x_b = augment_batch(kb, gb, crop_h, crop_w, train=True)
            return x_a, x_b
        x_a = augment_batch(ka, jnp.asarray(a_u8), crop_h, crop_w,
                            train=True, row_offset=row_off)
        x_b = augment_batch(kb, jnp.asarray(b_u8), crop_h, crop_w,
                            train=True, row_offset=row_off)
        return x_a, x_b

    # one-step-deep host pipeline (cfg.host_prefetch): batch k+1 is staged
    # in a worker thread while step k's dispatches/readbacks run — without
    # it the device idles for the full host+tunnel latency whenever the
    # host blocks on a readback (log boundaries, sampling). Single worker →
    # the loader is still consumed strictly in step order.
    pool = None
    pending = None
    if cfg.host_prefetch:
        from concurrent.futures import ThreadPoolExecutor
        pool = ThreadPoolExecutor(max_workers=1,
                                  thread_name_prefix="councilx-stage")
        pending = pool.submit(stage_batch, step)

    interrupted = False
    profiling = False
    while step < limit:
        if (stop_event is not None and n_proc == 1
                and stop_event.is_set()):
            interrupted = True
            break
        if pending is not None:
            x_a, x_b = pending.result()
            pending = (pool.submit(stage_batch, step + 1)
                       if step + 1 < limit else None)
        else:
            x_a, x_b = stage_batch(step)

        if profile_steps and step == profile_steps.start:
            jax.profiler.start_trace(os.path.join(run_dir, "profile"))
            profiling = True
        state, metrics = trainer.train_step(state, x_a, x_b)
        step += 1
        window_steps += 1
        if profiling and step >= profile_steps.stop:
            # barrier via readback: block_until_ready is a NO-OP under the
            # axon tunnel (CLAUDE.md) and would truncate the trace
            jax.device_get(dict(metrics))
            jax.profiler.stop_trace()
            profiling = False

        if step % cfg.log_iter == 0:
            now = time.perf_counter()
            images_per_sec = (window_steps * cfg.batch_size
                              / max(now - t_window, 1e-9))
            t_window, window_steps = now, 0
            # ONE batched readback for the whole metric dict: per-scalar
            # np.asarray costs a tunnel round-trip each (2.4-7.7 ms x ~25
            # metrics per window adds up to a visible per-step tax)
            metrics = mask_skipped_metrics(jax.device_get(dict(metrics)))
            metrics["images_per_sec"] = images_per_sec
            if logger is not None:
                logger.write(step, metrics)

        # in-training FID: the translate is a collective (all processes),
        # feature extraction + the metric write happen on process 0
        if eval_hook is not None and step % cfg.eval_iter == 0:
            emetrics = eval_hook(trainer, state, primary=primary)
            if logger is not None and emetrics:
                logger.write(step, emetrics)

        # sampling runs on EVERY process (under multi-host it gathers
        # sharded params — a collective); only process 0 writes files
        if cfg.image_save_iter and step % cfg.image_save_iter == 0:
            _write_samples(trainer, state, disp_a, disp_train_a, image_dir,
                           step, crop_h, crop_w, write=primary)
            if primary:
                write_html(os.path.join(run_dir, "index.html"), image_dir,
                           step, cfg.image_save_iter)

        # reference train.py: a rolling "current" sheet every
        # image_display_iter (overwritten in place, not archived)
        if cfg.image_display_iter and step % cfg.image_display_iter == 0:
            x = augment_batch(jax.random.PRNGKey(0), jnp.asarray(disp_a),
                              crop_h, crop_w, train=False)
            x_t, mask = trainer.sample(state, x,
                                       direction=trainer.directions[0])
            if primary:
                write_sample_sheet(
                    image_dir, "current",
                    np.asarray(x), np.asarray(x_t),
                    np.asarray(mask) if mask is not None else None)

        if cfg.snapshot_save_iter and step % cfg.snapshot_save_iter == 0:
            # async: the write happens in a background thread while
            # training continues (SURVEY.md §5.3)
            save_checkpoint(ckpt_dir, state, step, async_save=True)

    if profiling:
        # loop ended (limit/interrupt/resume overlap) with a trace open —
        # finalize it so the profile isn't lost
        jax.profiler.stop_trace()
    if pool is not None:
        pool.shutdown(wait=False)
    wait_for_checkpoints()
    save_checkpoint(ckpt_dir, state, step)
    if logger is not None:
        logger.close()
    return {"step": step, "images_per_sec": images_per_sec,
            "interrupted": interrupted}


def _write_samples(trainer: CouncilTrainer, state, test_u8, train_u8,
                   image_dir: str, step: int, crop_h: int,
                   crop_w: int, write: bool = True) -> None:
    """Per-member sample sheets for train and test batches (reference
    Council_Trainer.sample + utils.write_2images). ``write=False`` still
    runs the sampling (a collective under multi-host) but skips the file
    writes (non-primary processes)."""
    for tag, batch in (("test", test_u8), ("train", train_u8)):
        x = augment_batch(jax.random.PRNGKey(0), jnp.asarray(batch), crop_h,
                          crop_w, train=False)
        for d in trainer.directions:
            x_t, mask = trainer.sample(state, x, direction=d)
            if write:
                write_sample_sheet(
                    image_dir, f"{tag}_{step:08d}",
                    np.asarray(x), np.asarray(x_t),
                    np.asarray(mask) if mask is not None else None)
