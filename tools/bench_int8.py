#!/usr/bin/env python
"""Chained microbenchmark: int8 vs bf16 convolutions on the TPU MXU.

Motivation (round 3): serving is compute-bound at ~63% of the 197 TF/s
bf16 roofline (BASELINE.md inference section). The v5e MXU doubles
throughput at int8 (~394 TOPS), so a W8A8 post-training-quantized serving
path could raise the ceiling 2x — IF XLA actually lowers int8
`conv_general_dilated` onto the int8 MXU path at our shapes. This tool
answers that question with the only trustworthy method on this tunnel
(CLAUDE.md): N op copies chained inside ONE jit, divided.

Variants per shape:
  bf16            — today's serving path (baseline)
  int8-raw        — int8 x int8 -> int32 conv, rescale+requant folded OUT
                    (upper bound on the MXU int8 path)
  int8-w8a8       — the real quantized-serving link: per-tensor dynamic
                    activation quant (max/abs reduce + scale + round) +
                    int8 conv + int32->bf16 rescale (+ relu)

Shapes: the generator hot spots — 64px/256ch 3x3 (content encoder +
resblocks), and the decoder-equivalent 128px/128ch 3x3.
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


def conv(xp, k, pet=None):
    return jax.lax.conv_general_dilated(
        xp, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pet)


def pad1(x):
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))


def run_shape(b, hw, c, n_chain=10):
    r = np.random.RandomState(0)
    x32 = (r.randn(b, hw, hw, c) * 0.1).astype(np.float32)
    k32 = (r.randn(n_chain, 3, 3, c, c) * 0.02).astype(np.float32)
    x16 = jnp.asarray(x32, jnp.bfloat16)
    k16 = jnp.asarray(k32, jnp.bfloat16)
    # per-output-channel int8 weights + their f32 scales
    w_s = np.abs(k32).max(axis=(1, 2, 3), keepdims=True) / 127.0
    k8 = jnp.asarray(np.round(k32 / w_s).astype(np.int8))
    w_s = jnp.asarray(w_s[:, 0, 0, 0, :].astype(np.float32))  # (n, c_out)
    x8 = jnp.asarray(
        np.clip(np.round(x32 / (np.abs(x32).max() / 127.0)),
                -127, 127).astype(np.int8))
    flops = 2 * b * hw * hw * 9 * c * c

    def report(name, t):
        print(f"  {name:14s}: {t*1e3:7.3f} ms/link  "
              f"{flops/t/1e12:6.1f} TF(OP)/s")

    def chain_bf16(x, ks):
        y = x
        for i in range(n_chain):
            y = jax.nn.relu(conv(pad1(y), ks[i]))
        return y

    def chain_int8_raw(x, ks):
        """int8 in, int8 out per link; requant approximated by a cheap
        shift so the chain stays int8 — isolates the conv itself."""
        y = x
        for i in range(n_chain):
            acc = conv(pad1(y), ks[i], pet=jnp.int32)
            y = jnp.clip(acc >> 7, -127, 127).astype(jnp.int8)
        return y

    def chain_w8a8(x, ks, w_s):
        """The full quantized-serving link: dynamic per-tensor activation
        quant, int8 conv, int32 -> bf16 rescale, relu."""
        y = x
        for i in range(n_chain):
            a_s = jnp.maximum(jnp.max(jnp.abs(y.astype(jnp.float32))),
                              1e-8) / 127.0
            q = jnp.clip(jnp.round(y.astype(jnp.float32) / a_s),
                         -127, 127).astype(jnp.int8)
            acc = conv(pad1(q), ks[i], pet=jnp.int32)
            y = jax.nn.relu(
                (acc.astype(jnp.float32) * (a_s * w_s[i])
                 ).astype(jnp.bfloat16))
        return y

    print(f"shape b={b} hw={hw} c={c}:")
    report("bf16", timeit(jax.jit(chain_bf16), x16, k16) / n_chain)
    try:
        report("int8-raw", timeit(jax.jit(chain_int8_raw), x8, k8) / n_chain)
    except Exception as e:
        print(f"  int8-raw      : FAILED ({type(e).__name__}: {e})")
    try:
        report("int8-w8a8",
               timeit(jax.jit(chain_w8a8), x16, k8, w_s) / n_chain)
    except Exception as e:
        print(f"  int8-w8a8     : FAILED ({type(e).__name__}: {e})")


def main():
    print("devices:", jax.devices())
    for b, hw, c in ((8, 64, 256), (64, 64, 256), (64, 128, 128),
                     (128, 64, 256)):
        run_shape(b, hw, c)


if __name__ == "__main__":
    main()
