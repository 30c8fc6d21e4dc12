#!/usr/bin/env python
"""Microbenchmark: 3x3 resblock conv, XLA vs Pallas, fwd and fwd+bwd.

Round-1 numbers (BASELINE.md) were internally inconsistent (XLA fwd 63.6
TF/s but fwd+bwd apparently ~120 TF/s), so this re-measures from scratch
with jax.device_get readback barriers (block_until_ready is a no-op under
the axon tunnel) and with the backward isolated via jax.vjp so XLA cannot
DCE or CSE across what we time.

Shapes: the FLOPs-dominant resblock convs of the 256px council-4 config
((32,64,64,256) = batch 8 x 4 members folded) and the 128px/128ch variant.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, steps=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / steps


def conv_xla(xp, k):
    # plain bf16 conv — exactly what flax nn.Conv(dtype=bf16) runs; the MXU
    # accumulates f32 internally regardless
    return jax.lax.conv_general_dilated(
        xp, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def run_shape(b, h, w, c, o, dtype=jnp.bfloat16):
    from councilx.ops.pallas_conv import conv3x3_valid, conv3x3_eligible

    r = np.random.RandomState(0)
    xp = jnp.asarray(r.randn(b, h + 2, w + 2, c), dtype)
    k = jnp.asarray(r.randn(3, 3, c, o) * 0.05, dtype)
    g = jnp.asarray(r.randn(b, h, w, o), dtype)

    fwd_flops = 2 * b * h * w * 9 * c * o
    bwd_flops = 2 * fwd_flops

    print(f"shape ({b},{h},{w},{c})->{o} {dtype.__name__}; "
          f"fwd {fwd_flops/1e9:.1f} GFLOP")

    def report(name, t, flops):
        print(f"  {name:26s}: {t*1e3:7.3f} ms  {flops/t/1e12:6.1f} TF/s")

    # XLA forward
    f_x = jax.jit(conv_xla)
    report("xla fwd", timeit(f_x, xp, k), fwd_flops)

    # XLA backward only (vjp with precomputed residuals; g is an input so
    # nothing can be folded)
    def bwd_xla(xp, k, g):
        _, vjp = jax.vjp(conv_xla, xp, k)
        return vjp(g)

    report("xla bwd (dx+dk)", timeit(jax.jit(bwd_xla), xp, k, g), bwd_flops)

    # XLA dx / dk separately, as the raw convs they are
    def dx_xla(g, k):
        kf = jnp.flip(k, (0, 1)).swapaxes(2, 3)
        gp = jnp.pad(g, ((0, 0), (2, 2), (2, 2), (0, 0)))
        return conv_xla(gp, kf)

    report("xla dx alone", timeit(jax.jit(dx_xla), g, k), bwd_flops // 2)

    def dk_xla(xp, g):
        # wgrad as XLA expresses it: conv with batch as contraction
        return jax.lax.conv_general_dilated(
            xp.transpose(3, 1, 2, 0), g.transpose(1, 2, 0, 3), (1, 1),
            "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    report("xla dk alone", timeit(jax.jit(dk_xla), xp, g), bwd_flops // 2)

    if conv3x3_eligible(xp.shape, k.shape):
        f_p = jax.jit(conv3x3_valid)
        report("pallas fwd", timeit(f_p, xp, k), fwd_flops)

        def bwd_p(xp, k, g):
            _, vjp = jax.vjp(conv3x3_valid, xp, k)
            return vjp(g)

        report("pallas bwd (unfused)", timeit(jax.jit(bwd_p), xp, k, g),
               bwd_flops)

    else:
        print("  (pallas ineligible for this shape)")

    from councilx.ops.winograd import conv3x3_winograd, winograd_eligible

    if winograd_eligible(xp.shape, k.shape):
        f_w = jax.jit(conv3x3_winograd)
        err = float(jnp.max(jnp.abs(
            f_w(xp, k).astype(jnp.float32)
            - f_x(xp, k).astype(jnp.float32))))
        report("winograd fwd", timeit(f_w, xp, k), fwd_flops)
        print(f"    (winograd-vs-xla max abs err {err:.3e})")

        def bwd_w(xp, k, g):
            _, vjp = jax.vjp(conv3x3_winograd, xp, k)
            return vjp(g)

        report("winograd bwd", timeit(jax.jit(bwd_w), xp, k, g), bwd_flops)

        def fwdbwd(conv, xp, k, g):
            y, vjp = jax.vjp(conv, xp, k)
            return y, vjp(g)

        report("winograd fwd+bwd",
               timeit(jax.jit(lambda a, b_, c_: fwdbwd(conv3x3_winograd,
                                                       a, b_, c_)),
                      xp, k, g), 3 * fwd_flops)
        report("xla fwd+bwd",
               timeit(jax.jit(lambda a, b_, c_: fwdbwd(conv_xla, a, b_, c_)),
                      xp, k, g), 3 * fwd_flops)

    # big matmul reference point for peak
    if b == 32:
        m = jnp.asarray(r.randn(8192, 8192), dtype)
        mm = jax.jit(lambda a, b_: jnp.dot(a, b_,
                                           preferred_element_type=jnp.float32)
                     .astype(a.dtype))
        t = timeit(mm, m, m)
        report("8192^3 matmul (peak ref)", t, 2 * 8192 ** 3)


if __name__ == "__main__":
    import os
    print("devices:", jax.devices())
    if os.environ.get("BENCH_CONV_BATCH_SWEEP"):
        # batch scaling at the dominant shape: does doubling per-chip batch
        # buy any conv efficiency? (the batch-16 OOM question — if TF/s is
        # flat in B, unlocking batch 16 buys ~nothing)
        for b in (8, 16, 32, 64):
            run_shape(b, 64, 64, 256, 256)
    else:
        run_shape(32, 64, 64, 256, 256)
        run_shape(32, 128, 128, 128, 128)
