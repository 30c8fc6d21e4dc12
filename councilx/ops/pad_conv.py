"""Same-size KxK conv with reflect/replicate padding, without the pad copy.

The reference pads with ``nn.ReflectionPad2d`` before every conv
(networks.py::Conv2dBlock — SURVEY.md §2.1 row 7); the direct translation
(councilx.nn.blocks.pad2d + VALID conv) materializes a padded copy of the
activation in HBM. For the generator's 7x7 stride-1 convs that copy is pure
bandwidth: measured 22% of the final-stage time at the 256px serving shapes
(tools/bench_decoder_tail.py: reflect 34.96 ms vs zero-pad 27.20 ms per
chained link on v5e).

Exact rewrite: run the conv with XLA's built-in zero padding — free, it
rides the conv's own halo handling — then recompute the P-pixel output
border (the only rows/cols the pad mode influences) with the reference path
on thin input slices and splice them in. Bit-exact up to float summation
order, same trick as ops/upsample_conv.py's border strips.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from councilx.nn.blocks import pad2d


def conv2d_same_reference(x: jnp.ndarray, kernel: jnp.ndarray,
                          bias: Optional[jnp.ndarray],
                          pad_type: str = "reflect",
                          precision=None) -> jnp.ndarray:
    """The unfused path: pad2d(P) -> VALID KxK conv (stride 1, K odd)."""
    p = kernel.shape[0] // 2
    y = jax.lax.conv_general_dilated(
        pad2d(x, p, pad_type), kernel.astype(x.dtype),
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def conv2d_same(x: jnp.ndarray, kernel: jnp.ndarray,
                bias: Optional[jnp.ndarray], pad_type: str = "reflect",
                precision=None) -> jnp.ndarray:
    """Fused, exact equivalent of :func:`conv2d_same_reference`.

    x: (B, H, W, Cin); kernel: (K, K, Cin, Cout) HWIO with K odd, stride 1,
    "same" P = K//2 padding. Interior via zero-padded conv (no HBM copy);
    the P-pixel output border recomputed exactly on 2P-row/col input slices
    (a strip's taps never reach its fake far boundary, and its near-side
    reflect/replicate pad only reads rows/cols inside the slice).
    """
    kh, kw = kernel.shape[0], kernel.shape[1]
    if kh != kw or kh % 2 != 1:
        raise ValueError(f"conv2d_same needs an odd square kernel, "
                         f"got {kernel.shape[:2]}")
    p = kh // 2
    if pad_type == "zero" or p == 0:
        return conv2d_same_reference(x, kernel, bias, "zero", precision)
    h, w = x.shape[1], x.shape[2]
    if h < 2 * p or w < 2 * p:
        return conv2d_same_reference(x, kernel, bias, pad_type, precision)

    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=(1, 1),
        padding=[(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)

    def ref(sl):
        return conv2d_same_reference(sl, kernel, None, pad_type, precision)

    top = ref(x[:, :2 * p])[:, :p]
    bot = ref(x[:, -2 * p:])[:, -p:]
    left = ref(x[:, :, :2 * p])[:, :, :p]
    right = ref(x[:, :, -2 * p:])[:, :, -p:]
    y = y.at[:, :p].set(top)
    y = y.at[:, -p:].set(bot)
    y = y.at[:, :, :p].set(left)
    y = y.at[:, :, -p:].set(right)

    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
