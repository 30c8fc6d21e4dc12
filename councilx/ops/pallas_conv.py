"""Pallas TPU kernel: 3x3 VALID convolution as 9 shifted MXU dots.

Targets the network's FLOPs-dominant shape — the resblock convs (3x3,
stride 1, C_in = C_out ∈ {128, 256, 512}, spatial ~64x64 after padding).
XLA's conv runs this at ~34% of bf16 peak (BASELINE.md); this kernel keeps
the whole padded image tile and the 9 tap matrices resident in VMEM and
accumulates nine (rows x C_in) @ (C_in x C_out) dots per output row-block —
pure MXU work with one HBM read of x and one write of y.

Semantics: ``conv3x3_valid(xp, k)`` == lax.conv_general_dilated(xp, k,
(1,1), 'VALID') for xp (B, H+2, W+2, C) NHWC, k (3, 3, C, O) HWIO. The
caller does the (reflect) padding — exactly how Conv2dBlock already
structures pad -> VALID conv.

Backward is a custom VJP: dx is the same kernel applied to the zero-padded
cotangent with the spatially-flipped, in/out-transposed kernel (a standard
conv transpose identity); dk is a 9-tap batched dot done in XLA (a big-K
GEMM XLA already runs near peak).

NOT integrated into the model path: round-1 profiling showed the fwd+bwd
pair loses to XLA's convs end-to-end (BASELINE.md), so this kernel is kept
as a benchmarked experiment with its own tests (tests/test_pallas_conv.py);
XLA is the shipping path and the numerics reference.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM plan per grid step (bf16 x, f32 accumulator):
#   x       (H+2, W+2, C) whole padded image, double-buffered   bf16
#   k       (3, 3, C, O)                                        bf16
#   y tile  (hb, W, O), double-buffered                         bf16
#   acc     (hb * W, O) scratch                                 f32
_VMEM_BUDGET = 10 * 1024 * 1024


def _pick_hb(h: int, w: int, c: int, o: int) -> Optional[int]:
    x_bytes = (h + 2) * (w + 2) * c * 2
    k_bytes = 9 * c * o * 2
    for hb in (32, 16, 8, h):
        if h % hb:
            continue
        acc_bytes = hb * w * o * 4
        y_bytes = hb * w * o * 2
        if (2 * x_bytes + k_bytes + acc_bytes + 2 * y_bytes
                <= _VMEM_BUDGET):
            return hb
    return None


def _conv_kernel_rows(x_ref, k_ref, y_ref, acc_ref, *, hb: int, w: int):
    """One (batch, row-block) grid step: 9 shifted dots into the f32 acc.
    x is blocked over batch only (whole padded image in VMEM); the row
    block with its +2-row halo is sliced dynamically."""
    j = pl.program_id(1)
    c = x_ref.shape[-1]
    o = y_ref.shape[-1]
    acc_ref[...] = jnp.zeros_like(acc_ref)
    row0 = j * hb
    for dy in range(3):
        for dx in range(3):
            xs = x_ref[0, pl.ds(row0 + dy, hb), dx:dx + w, :]
            xs = xs.reshape(hb * w, c)
            acc_ref[...] += jnp.dot(xs, k_ref[dy, dx, :, :],
                                    preferred_element_type=jnp.float32)
    y_ref[0] = acc_ref[...].reshape(hb, w, o).astype(y_ref.dtype)


def _conv3x3_pallas_rows(xp: jnp.ndarray, k: jnp.ndarray, hb: int
                         ) -> jnp.ndarray:
    b, hp, wp, c = xp.shape
    h, w = hp - 2, wp - 2
    o = k.shape[-1]
    grid = (b, h // hb)
    return pl.pallas_call(
        functools.partial(_conv_kernel_rows, hb=hb, w=w),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hp, wp, c), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, c, o), lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hb, w, o), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, o), xp.dtype),
        scratch_shapes=[pltpu.VMEM((hb * w, o), jnp.float32)],
    )(xp, k)


def conv3x3_eligible(xp_shape: Tuple[int, ...], k_shape: Tuple[int, ...]
                     ) -> bool:
    """Shapes this kernel handles efficiently & legally on TPU."""
    if len(xp_shape) != 4 or len(k_shape) != 4:
        return False
    b, hp, wp, c = xp_shape
    kh, kw, kc, o = k_shape
    if (kh, kw) != (3, 3) or kc != c:
        return False
    if c % 128 or o % 128:           # lane-tiling friendly
        return False
    h, w = hp - 2, wp - 2
    if h < 8 or w < 8 or h % 8:
        return False
    # whole padded image + weights must fit the VMEM plan
    return _pick_hb(h, w, c, o) is not None


@jax.custom_vjp
def conv3x3_valid(xp: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """VALID 3x3 conv on pre-padded NHWC input (see module docstring)."""
    return _fwd_impl(xp, k)


def _fwd_impl(xp, k):
    b, hp, wp, c = xp.shape
    h, w = hp - 2, wp - 2
    hb = _pick_hb(h, w, c, k.shape[-1])
    return _conv3x3_pallas_rows(xp, k.astype(xp.dtype), hb)


def _fwd_rule(xp, k):
    return _fwd_impl(xp, k), (xp, k)


def _bwd_rule(res, g):
    xp, k = res
    # dx over the PADDED input: full-pad g by 2 and convolve with the
    # flipped, in/out-swapped kernel -> shape (B, H+2, W+2, C) = xp's shape
    k_flip = jnp.flip(k, axis=(0, 1)).swapaxes(2, 3)  # (3,3,O,C)
    g_pad = jnp.pad(g, ((0, 0), (2, 2), (2, 2), (0, 0)))
    if conv3x3_eligible(g_pad.shape, k_flip.shape):
        dxp = conv3x3_valid(g_pad, k_flip.astype(g.dtype))
    else:
        dxp = jax.lax.conv_general_dilated(
            g_pad, k_flip.astype(g.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # dk: per-tap big-K GEMM — XLA runs this near peak
    b, hp, wp, c = xp.shape
    h, w = hp - 2, wp - 2
    taps = []
    for dy in range(3):
        row = []
        for dx in range(3):
            xs = xp[:, dy:dy + h, dx:dx + w, :].reshape(-1, c)
            gs = g.reshape(-1, g.shape[-1])
            row.append(jnp.dot(xs.T, gs,
                               preferred_element_type=jnp.float32))
        taps.append(jnp.stack(row))
    dk = jnp.stack(taps).astype(k.dtype)  # (3,3,C,O)
    return dxp, dk


conv3x3_valid.defvjp(_fwd_rule, _bwd_rule)
