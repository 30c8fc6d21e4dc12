#!/usr/bin/env python
"""Interleaved A/B of FULL train-step config variants in ONE process.

Sequential whole-process benchmarks drift ~2x run to run on this box
(CLAUDE.md); chained-op microbenches disagree with composed reality
(BASELINE.md round-4 notes). The only trustworthy comparison of two train
configurations is alternating timed blocks of the complete fused step
inside one process — this tool does exactly that, reusing bench.py's
headline configuration so the variants differ by ONLY the listed fields.

Env:
  AB_VARIANTS  comma-separated "field=value" Config overrides, e.g.
               "norm_stats=two_pass,norm_stats=one_pass" (required, >=2)
  AB_ROUNDS    alternating rounds (3)
  AB_STEPS     timed steps per block (10)
  AB_WARMUP    warmup steps per variant before timing (3)
  AB_OFFLOAD   park inactive variants' train states on the HOST between
               blocks (default: on when >2 variants — three full headline
               states don't fit 16 GB HBM together, measured
               RESOURCE_EXHAUSTED; off for 2 variants, where both states
               stay resident and behavior matches every recorded A/B).
               Uploads/readbacks and one re-warm step per block run
               OUTSIDE the timed window, so timings stay honest — at the
               cost of extra untimed tunnel transfer per block.
  BENCH_*      all bench.py env overrides apply to the shared base config

Prints one JSON line per variant plus a ratio line for two variants.
Timing barriers are jax.device_get readbacks (block_until_ready is a no-op
under the axon tunnel — CLAUDE.md).
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from councilx.utils.platform import apply_env_platform
    apply_env_platform()

    from bench import headline_config
    from councilx.train.trainer import CouncilTrainer

    batch = int(os.environ.get("BENCH_BATCH", "8"))
    council = int(os.environ.get("BENCH_COUNCIL", "4"))
    rounds = int(os.environ.get("AB_ROUNDS", "3"))
    steps = int(os.environ.get("AB_STEPS", "10"))
    warmup = int(os.environ.get("AB_WARMUP", "3"))
    specs = [s.strip() for s in os.environ["AB_VARIANTS"].split(",")]

    base = headline_config(batch, council)
    variants = []
    for s in specs:
        f, _, v = s.partition("=")
        if v.lower() in ("true", "false"):   # bool fields: "False" is a
            v = v.lower() == "true"          # truthy STRING otherwise
        variants.append((s, dataclasses.replace(base, **{f: v})))

    rng = np.random.RandomState(0)
    x_a = jnp.asarray(rng.uniform(-1, 1, (batch, 256, 256, 3))
                      .astype(np.float32))
    x_b = jnp.asarray(rng.uniform(-1, 1, (batch, 256, 256, 3))
                      .astype(np.float32))

    offload = bool(int(os.environ.get(
        "AB_OFFLOAD", "1" if len(variants) > 2 else "0")))

    # keyed by variant INDEX, not spec string: duplicate specs (an A/A
    # noise-floor run) must time two independent trainers, not collapse
    # into one dict slot
    runs = {}
    for idx, (label, cfg) in enumerate(variants):
        trainer = CouncilTrainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0))
        for _ in range(warmup):   # compiles + steady-state warmup
            state, metrics = trainer.train_step(state, x_a, x_b)
        if warmup:
            jax.device_get(metrics)
        if offload:               # park on host so the next variant's
            state = jax.device_get(state)   # warmup has the whole HBM
        runs[idx] = [trainer, state, 0.0]

    for _ in range(rounds):
        for idx in runs:
            trainer, state, acc = runs[idx]
            if offload:
                # re-upload + ONE untimed step: its device_get barrier
                # guarantees the H2D transfer and re-warm finish before t0
                state = jax.device_put(state)
                state, metrics = trainer.train_step(state, x_a, x_b)
                jax.device_get(metrics)
            t0 = time.perf_counter()
            for _ in range(steps):
                state, metrics = trainer.train_step(state, x_a, x_b)
            jax.device_get(metrics)
            acc += time.perf_counter() - t0
            if offload:           # untimed: park again for the next variant
                state = jax.device_get(state)
            runs[idx] = [trainer, state, acc]

    results = []
    for idx, (label, _) in enumerate(variants):
        acc = runs[idx][2]
        ips = batch * steps * rounds / acc
        results.append(ips)
        print(json.dumps({
            "metric": "train_ab_images_per_sec", "variant": label,
            "batch": batch, "council": council,
            "rounds": rounds, "steps_per_block": steps,
            "images_per_sec": round(ips, 3)}))
    if len(specs) == 2:
        a, b = specs
        print(json.dumps({
            "metric": "train_ab_ratio", "a": a, "b": b,
            "ratio_b_over_a": round(results[1] / results[0], 4)}))


if __name__ == "__main__":
    main()
