"""Pallas TPU kernels: 3x3 VALID convolution (fwd, dgrad, wgrad).

Targets the network's FLOPs-dominant shape — the resblock convs (3x3,
stride 1, C_in = C_out = 256, spatial 64x64 (256px configs) / 32x32 (128px
configs), reference networks.py::ResBlock). XLA runs these at ~60 TF/s on a
v5e whose big-matmul roofline is ~148 TF/s (tools/bench_conv.py).

Design (round-2, v3): per (batch, row-block) grid step the kernel builds an
in-VMEM im2col patch matrix — the 9 shifted (hb*W, C) windows written into
one (hb*W, 9C) buffer — and issues ONE MXU dot with K = 9C against the
(9C, O)-reshaped kernel. Two earlier designs measured slower:

  * 9 separate dots + f32 accumulator (round 1, 64.7 TF/s): the 9
    read-modify-write passes over the (hb*W, O) f32 accumulator dominate;
    the single big-K dot lets the MXU accumulate internally instead.
  * hoisted column shifts feeding 9 dots (62.4 TF/s): same accumulator
    problem, so reducing shift-copy traffic didn't help.

The whole padded image of one batch element stays resident in VMEM per grid
step (fits for the gated shapes — :func:`conv3x3_eligible`), so HBM traffic
is one read of x and one write of y.

Backward is a custom VJP with the same structure:
  * dgrad = this forward kernel on the zero-padded cotangent with the
    flipped, in/out-transposed kernel (conv-transpose identity); partial
    final row blocks (H+2 rows) use Pallas' boundary masking + caller-side
    zero-padding of the input rows.
  * wgrad = :func:`_conv3x3_wgrad`: the same im2col patch matrix contracted
    against the cotangent rows — one (9C, hb*W)@(hb*W, O) dot per step —
    accumulated across the sequential TPU grid into a constant-index
    (9C, O) f32 output.

Integration: Conv2dBlock's 3x3 path and the fused upsample-conv's phase
conv (councilx/nn/blocks.py, ops/upsample_conv.py) behind the per-model
``use_pallas`` attribute + :func:`conv3x3_eligible`; XLA remains the
fallback and the numerics reference (tests/test_pallas_conv.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 13 * 1024 * 1024


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# forward (also dgrad via the conv-transpose identity)
# ---------------------------------------------------------------------------


def _fwd_vmem_ok(h_in_rows: int, w: int, c: int, o: int, hb: int,
                 itemsize: int) -> bool:
    x_bytes = h_in_rows * (w + 2) * c * itemsize        # whole padded image
    k_bytes = 9 * c * o * itemsize
    cat_bytes = hb * w * 9 * c * itemsize               # im2col patch matrix
    y_bytes = hb * w * o * itemsize
    return (2 * x_bytes + k_bytes + cat_bytes
            + 2 * y_bytes) <= _VMEM_BUDGET


def _pick_hb(h_out: int, w: int, c: int, o: int,
             itemsize: int = 2) -> Optional[int]:
    """Largest row-block size whose VMEM plan fits. The grid is
    cdiv(h_out, hb); the input must carry cdiv*hb + 2 rows (caller pads)."""
    for hb in (32, 16, 8):
        rows = _cdiv(h_out, hb) * hb + 2
        if _fwd_vmem_ok(rows, w, c, o, hb, itemsize):
            return hb
    return None


def _conv_kernel_rows(x_ref, k_ref, y_ref, cat_ref, *, hb: int, w: int):
    """One (batch, row-block) grid step: im2col into cat_ref, one MXU dot.

    x_ref: (1, rows, w+2, c) whole padded image (rows >= grid_j*hb + hb + 2,
    zero-padded by the caller past the true image). k_ref: (9c, o)."""
    j = pl.program_id(1)
    c = x_ref.shape[-1]
    o = y_ref.shape[-1]
    row0 = j * hb
    for dy in range(3):
        for dx in range(3):
            tap = dy * 3 + dx
            cat_ref[:, tap * c:(tap + 1) * c] = (
                x_ref[0, pl.ds(row0 + dy, hb), dx:dx + w, :]
                .reshape(hb * w, c))
    y = jnp.dot(cat_ref[...], k_ref[...],
                preferred_element_type=jnp.float32)
    y_ref[0] = y.reshape(hb, w, o).astype(y_ref.dtype)


def _conv3x3_pallas_rows(xp: jnp.ndarray, k: jnp.ndarray, hb: int,
                         h_out: int) -> jnp.ndarray:
    """VALID 3x3 conv producing h_out rows; xp must carry
    cdiv(h_out,hb)*hb + 2 rows (zero-pad any excess). k: (3,3,C,O)."""
    b, rows, wp, c = xp.shape
    w = wp - 2
    o = k.shape[-1]
    nj = _cdiv(h_out, hb)
    assert rows == nj * hb + 2, (rows, nj, hb)
    k_cat = k.reshape(9 * c, o)  # tap-major (dy, dx) row order
    return pl.pallas_call(
        functools.partial(_conv_kernel_rows, hb=hb, w=w),
        grid=(b, nj),
        in_specs=[
            pl.BlockSpec((1, rows, wp, c), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * c, o), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hb, w, o), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h_out, w, o), xp.dtype),
        scratch_shapes=[pltpu.VMEM((hb * w, 9 * c), xp.dtype)],
    )(xp, k_cat)


def conv3x3_eligible(xp_shape: Tuple[int, ...], k_shape: Tuple[int, ...],
                     itemsize: int = 2) -> bool:
    """Shapes this kernel handles efficiently & legally on TPU.

    ``itemsize`` must match the dtype the conv will actually run in (2 for
    bf16 — the training default — 4 for f32): the VMEM plans scale with it,
    and the forward/backward impls pick their row blocks with the real
    dtype, so gating with the wrong itemsize would pass shapes whose f32
    plan does not fit.
    """
    if len(xp_shape) != 4 or len(k_shape) != 4:
        return False
    b, hp, wp, c = xp_shape
    kh, kw, kc, o = k_shape
    if (kh, kw) != (3, 3) or kc != c:
        return False
    if c % 128 or o % 128:           # lane-tiling friendly
        return False
    h, w = hp - 2, wp - 2
    if h < 8 or w < 8:
        return False
    # fwd plan, dgrad plan (h+2 rows), and wgrad plan must all fit
    if (_pick_hb(h, w, c, o, itemsize) is None
            or _pick_hb(h + 2, w + 2, o, c, itemsize) is None):
        return False
    return _wgrad_pick_hb(h, w, c, o, itemsize) is not None


# ---------------------------------------------------------------------------
# wgrad: dk[dy,dx,c,o] = sum_{b,i,j} xp[b,i+dy,j+dx,c] * g[b,i,j,o]
# ---------------------------------------------------------------------------


def _wgrad_vmem_ok(h: int, w: int, c: int, o: int, hb: int,
                   itemsize: int) -> bool:
    x_bytes = (h + 2) * (w + 2) * c * itemsize
    g_bytes = h * w * o * itemsize
    cat_bytes = hb * w * 9 * c * itemsize
    dk_bytes = 9 * c * o * 4
    return 2 * x_bytes + 2 * g_bytes + cat_bytes + dk_bytes <= _VMEM_BUDGET


def _wgrad_pick_hb(h: int, w: int, c: int, o: int,
                   itemsize: int = 2) -> Optional[int]:
    for hb in (32, 16, 8):
        if h % hb == 0 and _wgrad_vmem_ok(h, w, c, o, hb, itemsize):
            return hb
    return None


def _wgrad_kernel(x_ref, g_ref, dk_ref, cat_ref, *, hb: int, w: int):
    """One (batch, row-block) grid step: im2col patch matrix contracted
    against the cotangent rows, accumulated into the constant-index
    (9C, O) f32 output across the sequential grid."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    c = x_ref.shape[-1]
    o = g_ref.shape[-1]
    row0 = j * hb
    for dy in range(3):
        for dx in range(3):
            tap = dy * 3 + dx
            cat_ref[:, tap * c:(tap + 1) * c] = (
                x_ref[0, pl.ds(row0 + dy, hb), dx:dx + w, :]
                .reshape(hb * w, c))
    gs = g_ref[0, pl.ds(row0, hb), :, :].reshape(hb * w, o)
    contrib = jax.lax.dot_general(
        cat_ref[...], gs, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (9c, o)

    first = jnp.logical_and(i == 0, j == 0)

    @pl.when(first)
    def _():
        dk_ref[...] = contrib

    @pl.when(jnp.logical_not(first))
    def _():
        dk_ref[...] += contrib


def _conv3x3_wgrad(xp: jnp.ndarray, g: jnp.ndarray, hb: int) -> jnp.ndarray:
    b, hp, wp, c = xp.shape
    h, w = hp - 2, wp - 2
    o = g.shape[-1]
    dk_cat = pl.pallas_call(
        functools.partial(_wgrad_kernel, hb=hb, w=w),
        grid=(b, h // hb),
        in_specs=[
            pl.BlockSpec((1, hp, wp, c), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, o), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9 * c, o), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9 * c, o), jnp.float32),
        scratch_shapes=[pltpu.VMEM((hb * w, 9 * c), xp.dtype)],
    )(xp, g)
    return dk_cat.reshape(3, 3, c, o)


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------


@jax.custom_vjp
def conv3x3_valid(xp: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """VALID 3x3 conv on pre-padded NHWC input (see module docstring).

    Semantics: == lax.conv_general_dilated(xp, k, (1,1), 'VALID') for xp
    (B, H+2, W+2, C) NHWC, k (3, 3, C, O) HWIO; the caller does the
    (reflect) padding — exactly how Conv2dBlock structures pad -> VALID."""
    return _fwd_impl(xp, k)


def _fwd_impl(xp, k):
    b, hp, wp, c = xp.shape
    h, w = hp - 2, wp - 2
    hb = _pick_hb(h, w, c, k.shape[-1], xp.dtype.itemsize)
    if hb is None:
        # no VMEM plan fits this shape (ungated caller — conv3x3_eligible
        # callers never get here); fall back to XLA instead of crashing in
        # _cdiv(h, None)
        return jax.lax.conv_general_dilated(
            xp, k.astype(xp.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    rows_needed = _cdiv(h, hb) * hb + 2
    if rows_needed > hp:
        xp = jnp.pad(xp, ((0, 0), (0, rows_needed - hp), (0, 0), (0, 0)))
    return _conv3x3_pallas_rows(xp, k.astype(xp.dtype), hb, h)


def _fwd_rule(xp, k):
    return _fwd_impl(xp, k), (xp, k)


def _bwd_rule(res, g):
    xp, k = res
    b, hp, wp, c = xp.shape
    h, w = hp - 2, wp - 2
    o = k.shape[-1]
    # dgrad over the PADDED input: full-pad g by 2 and convolve with the
    # flipped, in/out-swapped kernel -> shape (B, H+2, W+2, C) == xp's
    k_flip = jnp.flip(k, axis=(0, 1)).swapaxes(2, 3).astype(g.dtype)
    hb = _pick_hb(h + 2, w + 2, o, c, g.dtype.itemsize)
    if hb is not None:
        rows_needed = _cdiv(h + 2, hb) * hb + 2
        g_pad = jnp.pad(g, ((0, 0), (2, rows_needed - h - 2), (2, 2),
                            (0, 0)))
        dxp = _conv3x3_pallas_rows(g_pad, k_flip, hb, h + 2)
    else:
        g_pad = jnp.pad(g, ((0, 0), (2, 2), (2, 2), (0, 0)))
        dxp = jax.lax.conv_general_dilated(
            g_pad, k_flip, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # wgrad
    hbw = _wgrad_pick_hb(h, w, c, o, g.dtype.itemsize)
    if hbw is not None:
        dk = _conv3x3_wgrad(xp, g, hbw)
    else:
        dk = jax.lax.conv_general_dilated(
            xp.transpose(3, 1, 2, 0), g.transpose(1, 2, 0, 3), (1, 1),
            "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32
        ).transpose(1, 2, 0, 3)  # (C,3,3,O) -> (3,3,C,O)
    return dxp, dk.astype(k.dtype)


conv3x3_valid.defvjp(_fwd_rule, _bwd_rule)
