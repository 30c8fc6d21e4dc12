#!/usr/bin/env python
"""Bisect the ResBlock performance cliff (tools/bench_ops.py found the
conv+IN+relu chain at 89 TF/s but the full ResBlock at 24.7 TF/s).
Chained-in-one-jit timing (per-call dispatch latency would otherwise
dominate — see bench_ops.py header)."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from councilx.nn.blocks import instance_norm, pad2d


def timeit(fn, *args, steps=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / steps


def conv(xp, k):
    return jax.lax.conv_general_dilated(
        xp, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    r = np.random.RandomState(0)
    b, hw, c = 8, 64, 256
    n = 10
    x = jnp.asarray((r.randn(b, hw, hw, c) * 0.1).astype(np.float32),
                    jnp.bfloat16)
    ks = jnp.asarray((r.randn(n, 2, 3, 3, c, c) * 0.02).astype(np.float32),
                     jnp.bfloat16)
    fl2 = 2 * 2 * b * hw * hw * 9 * c * c  # 2 convs per link

    def report(name, t):
        print(f"{name:44s}: {t*1e3:7.3f} ms/link  {fl2/t/1e12:6.1f} TF/s")

    def bench(name, body):
        def chain(x, ks):
            y = x
            for i in range(n):
                y = body(y, ks[i])
            return y
        report(name, timeit(jax.jit(chain), x, ks) / n)

    def IN(h):
        return instance_norm(h.astype(jnp.float32)).astype(jnp.bfloat16)

    def zp(y):
        return jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))

    def rp(y):
        return pad2d(y, 1, "reflect")

    # the cliff reproducer
    bench("full ResBlock (rp, IN, relu, rp, IN, +)",
          lambda y, k: y + IN(conv(rp(jax.nn.relu(IN(conv(rp(y), k[0])))),
                                   k[1])))
    # drop the skip
    bench("no skip (rp, IN, relu, rp, IN)",
          lambda y, k: IN(conv(rp(jax.nn.relu(IN(conv(rp(y), k[0])))),
                               k[1])))
    # drop the 2nd IN
    bench("skip, single IN (rp,IN,relu,rp,+)",
          lambda y, k: y + conv(rp(jax.nn.relu(IN(conv(rp(y), k[0])))),
                                k[1]))
    # no INs at all
    bench("skip, no IN (rp, relu, rp, +)",
          lambda y, k: y + conv(rp(jax.nn.relu(conv(rp(y), k[0]))), k[1]))
    # zero pad instead of reflect
    bench("full ResBlock but zero pad",
          lambda y, k: y + IN(conv(zp(jax.nn.relu(IN(conv(zp(y), k[0])))),
                                   k[1])))
    # bf16 INs
    def IN16(h):
        return instance_norm(h)
    bench("full ResBlock, bf16 IN",
          lambda y, k: y + IN16(conv(rp(jax.nn.relu(IN16(conv(rp(y),
                                                              k[0])))),
                                     k[1])))
    # relu after the second IN too (removes the linear tail)
    bench("full ResBlock + trailing relu",
          lambda y, k: y + jax.nn.relu(
              IN(conv(rp(jax.nn.relu(IN(conv(rp(y), k[0])))), k[1]))))
    # skip added BEFORE the 2nd IN
    bench("skip before 2nd IN",
          lambda y, k: IN(y + conv(rp(jax.nn.relu(IN(conv(rp(y), k[0])))),
                                   k[1])))


if __name__ == "__main__":
    print("devices:", jax.devices())
    main()
