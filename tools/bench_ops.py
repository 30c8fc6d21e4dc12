#!/usr/bin/env python
"""Chained (latency-free) microbenchmarks of the generator's layer graph.

CRITICAL measurement note (round 2): per-call dispatch through the axon
tunnel costs ~2.4-7.7 ms, so any standalone sub-10ms timing is mostly
latency — every round-1 kernel comparison was polluted by it. The only
trustworthy numbers come from chaining N copies of the op inside ONE jit
and dividing. With that method XLA's 3x3 conv runs at 143 TF/s (b=8) /
177 TF/s (b=32) — near peak — while the full generator forward measures
~55 TF/s. This file bisects where the 2-3x goes: pad? instance norm (and
its f32 casts)? the resblock composition? the member vmap (grouped-conv
lowering)? the fused upsample's border splicing?
"""

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
    n_chain = 10
    x = jnp.asarray((r.randn(b, hw, hw, c) * 0.1).astype(np.float32),
                    jnp.bfloat16)
    ks = jnp.asarray((r.randn(n_chain, 2, 3, 3, c, c) * 0.02
                      ).astype(np.float32), jnp.bfloat16)
    conv_flops = 2 * b * hw * hw * 9 * c * c

    def report(name, t, flops_per_link):
        print(f"{name:34s}: {t*1e3:7.3f} ms/link  "
              f"{flops_per_link/t/1e12:6.1f} TF/s")

    # 1. bare conv chain (zero-pad SAME semantics via pre-pad)
    def chain_conv(x, ks):
        y = x
        for i in range(n_chain):
            y = conv(jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0))), ks[i, 0])
        return y

    report("conv (zero pad)",
           timeit(jax.jit(chain_conv), x, ks) / n_chain, conv_flops)

    # 2. + reflect pad (what Conv2dBlock does)
    def chain_reflect(x, ks):
        y = x
        for i in range(n_chain):
            y = conv(pad2d(y, 1, "reflect"), ks[i, 0])
        return y

    report("conv (reflect pad)",
           timeit(jax.jit(chain_reflect), x, ks) / n_chain, conv_flops)

    # 3. + instance norm in f32 (Conv2dBlock's norm='in' path) + relu
    def chain_conv_in(x, ks):
        y = x
        for i in range(n_chain):
            y = conv(pad2d(y, 1, "reflect"), ks[i, 0])
            y = instance_norm(y.astype(jnp.float32)).astype(jnp.bfloat16)
            y = jax.nn.relu(y)
        return y

    report("conv + IN(f32) + relu",
           timeit(jax.jit(chain_conv_in), x, ks) / n_chain, conv_flops)

    # 4. + instance norm natively in bf16 (is the f32 cast the cost?)
    def chain_conv_in16(x, ks):
        y = x
        for i in range(n_chain):
            y = conv(pad2d(y, 1, "reflect"), ks[i, 0])
            y = jax.nn.relu(instance_norm(y))
        return y

    report("conv + IN(bf16) + relu",
           timeit(jax.jit(chain_conv_in16), x, ks) / n_chain, conv_flops)

    # 5. full ResBlock semantics (2 convs, IN f32, relu, skip)
    def chain_resblock(x, ks):
        y = x
        for i in range(n_chain):
            h = conv(pad2d(y, 1, "reflect"), ks[i, 0])
            h = jax.nn.relu(
                instance_norm(h.astype(jnp.float32)).astype(jnp.bfloat16))
            h = conv(pad2d(h, 1, "reflect"), ks[i, 1])
            h = instance_norm(h.astype(jnp.float32)).astype(jnp.bfloat16)
            y = y + h
        return y

    report("ResBlock (2 convs)",
           timeit(jax.jit(chain_resblock), x, ks) / n_chain, 2 * conv_flops)

    # 6. member-vmapped conv (the trainer's stacked-params grouped lowering)
    n_mem = 4
    xm = jnp.asarray((r.randn(n_mem, b, hw, hw, c) * 0.1).astype(np.float32),
                     jnp.bfloat16)
    km = jnp.asarray((r.randn(n_chain, n_mem, 3, 3, c, c) * 0.02
                      ).astype(np.float32), jnp.bfloat16)

    def chain_vmap(xm, km):
        y = xm
        for i in range(n_chain):
            y = jax.vmap(lambda a, k: conv(
                jnp.pad(a, ((0, 0), (1, 1), (1, 1), (0, 0))), k))(y, km[i])
        return y

    report("conv vmapped over 4 members",
           timeit(jax.jit(chain_vmap), xm, km) / n_chain,
           n_mem * conv_flops)

    # 7. same work as a python loop over members (sequential dense convs)
    def chain_loop(xm, km):
        ys = []
        for m in range(n_mem):
            y = xm[m]
            for i in range(n_chain):
                y = conv(jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0))),
                         km[i, m])
            ys.append(y)
        return jnp.stack(ys)

    report("conv python-loop over 4 members",
           timeit(jax.jit(chain_loop), xm, km) / n_chain,
           n_mem * conv_flops)

    # 8. fused upsample-conv (the decoder stage) chained
    from councilx.ops.upsample_conv import upsample2x_conv5x5
    k5 = jnp.asarray((r.randn(n_chain, 5, 5, c, c // 2) * 0.02
                      ).astype(np.float32), jnp.bfloat16)
    down = jnp.asarray((r.randn(n_chain, 2, 2, c // 2, c) * 0.02
                        ).astype(np.float32), jnp.bfloat16)

    def chain_up(x, k5, down):
        y = x
        for i in range(n_chain):
            u = upsample2x_conv5x5(y, k5[i], None, "reflect")
            # fold back down (2x2 stride 2) so the chain stays same-shape
            y = jax.lax.conv_general_dilated(
                u, down[i], (2, 2), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y

    up_flops = 2 * b * (2 * hw) * (2 * hw) * 9 * c * (c // 2) * 9 // 9
    report("fused upsample2x+5x5 (as 3x3x4)",
           timeit(jax.jit(chain_up), x, k5, down) / n_chain, up_flops)

    # 9. MUNIT LayerNorm at decoder shapes (b, 128, 128, 128)
    xl = jnp.asarray((r.randn(b, 2 * hw, 2 * hw, c // 2) * 0.1
                      ).astype(np.float32), jnp.bfloat16)

    def chain_ln(xl):
        y = xl
        for _ in range(n_chain):
            y32 = y.astype(jnp.float32)
            mean = jnp.mean(y32, axis=(1, 2, 3), keepdims=True)
            var = jnp.var(y32, axis=(1, 2, 3), keepdims=True)
            n = y32.size // y32.shape[0]
            std = jnp.sqrt(var * (n / (n - 1)))
            y = ((y32 - mean) / (std + 1e-5)).astype(jnp.bfloat16)
        return y

    ln_bytes = xl.size * 2 * 2
    t = timeit(jax.jit(chain_ln), xl) / n_chain
    print(f"{'MUNIT LayerNorm (128px,128ch)':34s}: {t*1e3:7.3f} ms/link  "
          f"{ln_bytes/t/1e9:6.1f} GB/s eff")


if __name__ == "__main__":
    print("devices:", jax.devices())
    main()
