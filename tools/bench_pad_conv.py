#!/usr/bin/env python
"""Interleaved A/B of conv2d_same engines at the serving boundary shapes.

The two channel-starved 7x7 convs (generator first: Cin=3; final: Cout=3)
measured 12.8 / 22.4 TF/s in the stage profile. This chains N copies of
each engine inside ONE jit (per-call tunnel dispatch is 2.4-7.7 ms;
CLAUDE.md) and interleaves variants in one process.

Env: PB_BATCH (384), PB_SIZE (256), PB_CHAIN (8), PB_ROUNDS (3).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from councilx.ops.pad_conv import conv2d_same, conv2d_same_reference


def main():
    batch = int(os.environ.get("PB_BATCH", "384"))
    size = int(os.environ.get("PB_SIZE", "256"))
    chain = int(os.environ.get("PB_CHAIN", "8"))
    rounds = int(os.environ.get("PB_ROUNDS", "3"))
    r = np.random.RandomState(0)

    cases = [("enc7x7_3_64", 3, 64), ("final7x7_64_3", 64, 3)]
    variants = [
        ("reference", lambda x, k: conv2d_same_reference(x, k, None)),
        ("strips", lambda x, k: conv2d_same(x, k, None, engine="strips")),
        ("phase", lambda x, k: conv2d_same(x, k, None, engine="phase")),
    ]

    jobs = []
    for cname, ci, co in cases:
        x = jnp.asarray(r.uniform(-1, 1, (batch, size, size, ci))
                        .astype(np.float32)).astype(jnp.bfloat16)
        k = jnp.asarray(r.uniform(-0.1, 0.1, (7, 7, ci, co))
                        .astype(np.float32)).astype(jnp.bfloat16)
        # chain via a channel-mean bridge back to Cin so copies can't be CSE'd
        bridge = jnp.asarray(r.uniform(-0.1, 0.1, (co, ci))
                             .astype(np.float32)).astype(jnp.bfloat16)
        gflops = 2 * 7 * 7 * ci * co * size * size * batch / 1e9
        for vname, fn in variants:
            def run(x, k, fn=fn, bridge=bridge):
                for i in range(chain):
                    y = fn(x, k)
                    x = jnp.einsum("bhwc,cd->bhwd", y, bridge) + i * 1e-6
                return jnp.sum(y.astype(jnp.float32))
            jit = jax.jit(run)
            jax.device_get(jit(x, k))  # compile + warm
            jobs.append((cname, vname, jit, x, k, gflops))

    best = {}
    for _ in range(rounds):
        for cname, vname, jit, x, k, gflops in jobs:
            t0 = time.perf_counter()
            jax.device_get(jit(x, k))
            ms = (time.perf_counter() - t0) * 1e3 / chain
            key = (cname, vname)
            if key not in best or ms < best[key][0]:
                best[key] = (ms, gflops)
    for (cname, vname), (ms, gflops) in best.items():
        print(json.dumps({"case": cname, "engine": vname,
                          "ms_per_conv": round(ms, 2),
                          "tf_s": round(gflops / ms, 1)}))


if __name__ == "__main__":
    main()
