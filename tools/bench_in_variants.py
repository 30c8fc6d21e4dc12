#!/usr/bin/env python
"""A/B/A/B-interleaved timing of instance-norm variants inside the real
ResBlock composition (reflect pad + 2 convs + skip), to pick the IN
implementation free of the run-to-run drift that plagued sequential
benchmarks (bench_ops vs bench_resblock disagreed 2x on the same chain).

Variants:
  f32   — current shipping path: cast to f32, stats+normalize in f32, cast
          back (the torch-parity formula)
  mixed — stats (mean/var) reduced in f32, normalize arithmetic in bf16
  bf16  — everything in bf16
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from councilx.nn.blocks import pad2d


def conv(xp, k):
    return jax.lax.conv_general_dilated(
        xp, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def in_f32(h):
    h32 = h.astype(jnp.float32)
    mean = jnp.mean(h32, axis=(-3, -2), keepdims=True)
    var = jnp.var(h32, axis=(-3, -2), keepdims=True)
    return ((h32 - mean) * jax.lax.rsqrt(var + 1e-5)).astype(h.dtype)


def in_mixed(h):
    h32 = h.astype(jnp.float32)
    mean = jnp.mean(h32, axis=(-3, -2), keepdims=True)
    var = jnp.var(h32, axis=(-3, -2), keepdims=True)
    scale = jax.lax.rsqrt(var + 1e-5).astype(h.dtype)
    return (h - mean.astype(h.dtype)) * scale


def in_bf16(h):
    mean = jnp.mean(h, axis=(-3, -2), keepdims=True)
    var = jnp.var(h, axis=(-3, -2), keepdims=True)
    return (h - mean) * jax.lax.rsqrt(var + 1e-5)


def main():
    r = np.random.RandomState(0)
    b, hw, c = 8, 64, 256
    n = 10
    x = jnp.asarray((r.randn(b, hw, hw, c) * 0.1).astype(np.float32),
                    jnp.bfloat16)
    ks = jnp.asarray((r.randn(n, 2, 3, 3, c, c) * 0.02).astype(np.float32),
                     jnp.bfloat16)
    fl2 = 2 * 2 * b * hw * hw * 9 * c * c

    def make_chain(norm):
        def block(y, k):
            h = jax.nn.relu(norm(conv(pad2d(y, 1, "reflect"), k[0])))
            return y + norm(conv(pad2d(h, 1, "reflect"), k[1]))

        @jax.jit
        def chain(x, ks):
            y = x
            for i in range(n):
                y = block(y, ks[i])
            return y
        return chain

    chains = {"f32": make_chain(in_f32), "mixed": make_chain(in_mixed),
              "bf16": make_chain(in_bf16)}
    # warm up all compiles first
    for f in chains.values():
        jax.device_get(f(x, ks).ravel()[0])

    # interleaved rounds
    times = {k: [] for k in chains}
    for _ in range(6):
        for name, f in chains.items():
            t0 = time.perf_counter()
            for _ in range(10):
                out = f(x, ks)
            jax.device_get(out.ravel()[0])
            times[name].append((time.perf_counter() - t0) / 10 / n)
    for name, ts in times.items():
        ts = sorted(ts)
        med = ts[len(ts) // 2]
        print(f"IN {name:6s}: median {med*1e3:7.3f} ms/link "
              f"{fl2/med/1e12:6.1f} TF/s   (all: "
              + " ".join(f"{t*1e3:.3f}" for t in ts) + ")")

    # numerics: mixed/bf16 vs f32 on one block output
    y_f = chains["f32"](x, ks)
    for name in ("mixed", "bf16"):
        y_v = chains[name](x, ks)
        d = jnp.max(jnp.abs(y_v.astype(jnp.float32) - y_f.astype(jnp.float32)))
        m = jnp.max(jnp.abs(y_f.astype(jnp.float32)))
        print(f"max abs diff {name} vs f32 after {n} blocks: "
              f"{float(d):.4e} (scale {float(m):.3f})")


if __name__ == "__main__":
    print("devices:", jax.devices())
    main()
