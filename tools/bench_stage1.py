#!/usr/bin/env python
"""Composition bench of the serving encoder head (conv7x7 3->64 + IN + relu).

The round-4 stage profile puts this stage at ~50 ms of the ~413 ms serving
step (12%, 4.8% of peak) even with the phase-packed conv engine — far above
its ~13 ms HBM floor (output 3.2 GB + one IN round-trip at batch 384). This
tool attributes the gap by chaining full-stage VARIANTS inside one jit and
interleaving them in one process (per-call tunnel dispatch is 2.4-7.7 ms and
cross-process drift ~2x; CLAUDE.md):

- shipped:      conv2d_same(phase) -> bias -> IN(mixed) -> relu   (Conv2dBlock)
- phase_in:     phase conv -> bias -> IN with stats POOLED over the four
                parity groups in the (H/2,W/2,4C) layout -> relu -> d2s:
                the depth-to-space becomes the LAST op so normalize+relu
                fuse into the conv output instead of re-reading the full-res
                tensor. Stats are mathematically identical (equal-size
                groups; f32 accumulate) up to summation order.
- conv_only:    phase conv + bias (no IN/relu) — the IN+relu marginal
- no_d2s:       phase conv + bias + IN + relu in phase layout, NO d2s —
                the d2s marginal
- in_bf16:      shipped but IN stats in bf16
- strips_in:    strips engine + IN(mixed) + relu
- reference:    pad2d + VALID conv + IN(mixed) + relu

Env: S1_BATCH (384), S1_SIZE (256), S1_CHAIN (6), S1_ROUNDS (3).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from councilx.nn.blocks import apply_instance_norm, pad2d
from councilx.ops.pad_conv import (_phase_packed_kernel, conv2d_same,
                                   conv2d_same_reference)


def phase_conv(x, kernel, bias):
    """Stride-2 phase-packed conv; returns (B, H/2, W/2, 4*Cout)."""
    p = kernel.shape[0] // 2
    xp = pad2d(x, p, "reflect")
    k8 = _phase_packed_kernel(kernel).astype(x.dtype)
    y4 = jax.lax.conv_general_dilated(
        xp, k8, window_strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y4 = y4 + jnp.tile(bias, 4).astype(y4.dtype)
    return y4


def d2s(y4, cout):
    b_, hh, ww, _ = y4.shape
    y = y4.reshape(b_, hh, ww, 2, 2, cout)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b_, 2 * hh, 2 * ww, cout)


def phase_in_relu(y4, cout, eps=1e-5):
    """IN(mixed) + relu computed in the phase layout (exact pooled stats)."""
    b_, hh, ww, _ = y4.shape
    y5 = y4.reshape(b_, hh, ww, 4, cout)
    y32 = y5.astype(jnp.float32)
    mean = jnp.mean(y32, axis=(1, 2, 3), keepdims=True)
    var = jnp.var(y32, axis=(1, 2, 3), keepdims=True)
    scale = jax.lax.rsqrt(var + eps).astype(y4.dtype)
    yn = (y5 - mean.astype(y4.dtype)) * scale
    return jax.nn.relu(yn).reshape(y4.shape)


def main():
    batch = int(os.environ.get("S1_BATCH", "384"))
    size = int(os.environ.get("S1_SIZE", "256"))
    chain = int(os.environ.get("S1_CHAIN", "6"))
    rounds = int(os.environ.get("S1_ROUNDS", "3"))
    ci, co = 3, 64
    r = np.random.RandomState(0)
    x = jnp.asarray(r.uniform(-1, 1, (batch, size, size, ci))
                    .astype(np.float32)).astype(jnp.bfloat16)
    k = jnp.asarray(r.uniform(-0.1, 0.1, (7, 7, ci, co))
                    .astype(np.float32)).astype(jnp.bfloat16)
    bias = jnp.asarray(r.uniform(-0.1, 0.1, (co,)).astype(np.float32))
    bridge = jnp.asarray(r.uniform(-0.1, 0.1, (co, ci))
                         .astype(np.float32)).astype(jnp.bfloat16)
    bridge4 = jnp.asarray(r.uniform(-0.1, 0.1, (4 * co, ci))
                          .astype(np.float32)).astype(jnp.bfloat16)

    def v_shipped(x):
        y = conv2d_same(x, k, bias, engine="phase")
        return jax.nn.relu(apply_instance_norm(y, "mixed"))

    def v_phase_in(x):
        y4 = phase_conv(x, k, bias)
        return d2s(phase_in_relu(y4, co), co)

    def v_conv_only(x):
        return d2s(phase_conv(x, k, bias), co)

    def v_no_d2s(x):
        return phase_in_relu(phase_conv(x, k, bias), co)

    def v_in_bf16(x):
        y = conv2d_same(x, k, bias, engine="phase")
        return jax.nn.relu(apply_instance_norm(y, "bf16"))

    def v_strips_in(x):
        y = conv2d_same(x, k, bias, engine="strips")
        return jax.nn.relu(apply_instance_norm(y, "mixed"))

    def v_reference(x):
        y = conv2d_same_reference(x, k, bias)
        return jax.nn.relu(apply_instance_norm(y, "mixed"))

    variants = [("shipped", v_shipped, bridge),
                ("phase_in", v_phase_in, bridge),
                ("conv_only", v_conv_only, bridge),
                ("no_d2s", v_no_d2s, bridge4),
                ("in_bf16", v_in_bf16, bridge),
                ("strips_in", v_strips_in, bridge),
                ("reference", v_reference, bridge)]

    # numerical check (phase_in pooled stats vs shipped full-res stats)
    a = np.asarray(v_shipped(x[:2]).astype(jnp.float32))
    b = np.asarray(v_phase_in(x[:2]).astype(jnp.float32))
    maxdiff = float(np.max(np.abs(a - b)))

    jobs = []
    for name, fn, br in variants:
        def run(x, fn=fn, br=br):
            for i in range(chain):
                y = fn(x)
                x = jnp.einsum("bhwc,cd->bhwd", y, br) + i * 1e-6
            return jnp.sum(y.astype(jnp.float32))
        jit = jax.jit(run)
        jax.device_get(jit(x))
        jobs.append((name, jit))

    best = {}
    for _ in range(rounds):
        for name, jit in jobs:
            t0 = time.perf_counter()
            jax.device_get(jit(x))
            ms = (time.perf_counter() - t0) * 1e3 / chain
            best[name] = min(best.get(name, 1e9), ms)
    out = {"metric": "stage1_variants_ms", "batch": batch, "size": size,
           "chain": chain, "phase_in_vs_shipped_maxdiff": maxdiff}
    out.update({name: round(ms, 2) for name, ms in best.items()})
    print(json.dumps(out))


if __name__ == "__main__":
    main()
