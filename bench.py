#!/usr/bin/env python
"""Benchmark: north-star metric — images/sec/chip, 256px council-4 training.

Runs the full fused train step (council-dis + dis + gen updates, focus mask
on, 3-scale discriminators, batched pairwise council loss) on synthetic data
at 256x256 with council_size=4 in bfloat16 — the BASELINE.json headline
configuration — and prints ONE JSON line.

vs_baseline: the reference (single V100, PyTorch eager, members looped in
Python) publishes no throughput numbers and could not be run (mount empty;
see BASELINE.md). We use a documented engineering ESTIMATE of the reference's
V100 throughput of 3.0 images/sec for the same configuration (see
BASELINE.md "Reference throughput estimate") purely to report a ratio; the
absolute value is the real measurement.

Env overrides: BENCH_BATCH (default 8), BENCH_WARMUP (5), BENCH_STEPS (30),
BENCH_COUNCIL (4), BENCH_PALLAS (0/1: pallas conv kernels),
BENCH_REMAT (0/1: member-level generator remat), BENCH_REMAT_STAGES (0/1:
stage-granular encoder/decoder remat), BENCH_MU_BF16 (0/1: bf16 Adam first
moments), BENCH_IN_PRECISION (f32/mixed/bf16 instance-norm internals —
defaults to the Config default), BENCH_NORM_STATS (two_pass/one_pass norm
statistics — see Config.norm_stats), BENCH_GEN_CHUNKS (member chunks for
the gen update, council-8 single-chip). The batch-16 sweep built from these
is in BASELINE.md.
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from councilx.config import Config
from councilx.train.trainer import CouncilTrainer

V100_REFERENCE_ESTIMATE = 3.0  # images/sec — see BASELINE.md; estimate only


def headline_config(batch: int = 8, council: int = 4) -> Config:
    """The BASELINE.json headline configuration (256px council-N bf16 train)
    with the BENCH_* env overrides applied — importable so tools (mfu.py)
    analyze EXACTLY the benchmarked step."""
    return Config.from_dict({
        "batch_size": batch,
        "compute_dtype": "bfloat16",
        "use_pallas": bool(int(os.environ.get("BENCH_PALLAS", "0"))),
        "remat": bool(int(os.environ.get("BENCH_REMAT", "0"))),
        "remat_stages": bool(int(os.environ.get("BENCH_REMAT_STAGES", "0"))),
        "adam_mu_dtype": ("bfloat16"
                          if int(os.environ.get("BENCH_MU_BF16", "0"))
                          else "float32"),
        **({"in_precision": os.environ["BENCH_IN_PRECISION"]}
           if "BENCH_IN_PRECISION" in os.environ else {}),
        **({"norm_stats": os.environ["BENCH_NORM_STATS"]}
           if "BENCH_NORM_STATS" in os.environ else {}),
        "gen_member_chunks": int(os.environ.get("BENCH_GEN_CHUNKS", "1")),
        "council": {"council_size": council, "council_w": 0.2,
                    "council_start_at_iter": 0},
        "focus_loss": {"focus_enabled": True},
        "gen": {"dim": 64, "mlp_dim": 256, "style_dim": 8,
                "n_downsample": 2, "n_res": 4},
        "dis": {"dim": 64, "n_layer": 4, "num_scales": 3},
        "new_size": 270, "crop_image_height": 256, "crop_image_width": 256,
    })


def main():
    from councilx.utils.platform import apply_env_platform
    apply_env_platform()

    batch = int(os.environ.get("BENCH_BATCH", "8"))
    warmup = int(os.environ.get("BENCH_WARMUP", "5"))
    steps = int(os.environ.get("BENCH_STEPS", "30"))
    council = int(os.environ.get("BENCH_COUNCIL", "4"))
    cfg = headline_config(batch, council)

    n_chips = 1  # bench target is per-chip; driver runs on one real TPU chip
    trainer = CouncilTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    x_a = jnp.asarray(rng.uniform(-1, 1, (batch, 256, 256, 3))
                      .astype(np.float32))
    x_b = jnp.asarray(rng.uniform(-1, 1, (batch, 256, 256, 3))
                      .astype(np.float32))

    # NOTE: timing barriers use jax.device_get (a host readback), NOT
    # block_until_ready — under the remote-TPU tunnel used here,
    # block_until_ready returns before device execution finishes, which
    # inflates throughput ~50x. A readback of the final step's metrics
    # forces the entire donated-state dependency chain to have executed.
    for _ in range(warmup):
        state, metrics = trainer.train_step(state, x_a, x_b)
    jax.device_get(metrics)

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = trainer.train_step(state, x_a, x_b)
    jax.device_get(metrics)
    dt = time.perf_counter() - t0

    images_per_sec_per_chip = batch * steps / dt / n_chips
    print(json.dumps({
        "metric": f"images_per_sec_per_chip_256px_council{council}_train",
        "value": round(images_per_sec_per_chip, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec_per_chip
                             / V100_REFERENCE_ESTIMATE, 3),
    }))


if __name__ == "__main__":
    main()
