"""Pallas TPU kernel: fused single-pass instance norm (+ optional AdaIN
affine), with a custom VJP.

Instance norm is the most common non-conv op in the network (every content-
encoder conv, every decoder AdaIN resblock conv — ~19 applications per
generator forward). XLA computes it as reduce(mean) + reduce(var) +
normalize, reading the activation from HBM at least twice in the forward
and ~4x in the backward. This kernel keeps the (HW, C-block) tile resident
in VMEM: ONE read + one write forward, and a fused backward from saved
(mean, rstd) residuals.

Numerics match councilx.nn.blocks.instance_norm / adain exactly at fp32:
biased variance, eps inside rsqrt, stats in float32 regardless of input
dtype (tests/test_pallas_norm.py, interpret mode on CPU + compiled on TPU).

Gated per-model by the ``use_pallas`` module attribute (set from
``Config.use_pallas`` by the trainer/translator ctors); the XLA path in
nn/blocks.py is the fallback and the parity reference.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Budget on the fp32 footprint of ONE (HW, Cb) tile. The backward kernel
# holds ~5 such f32 temporaries plus double-buffered ins/outs, so 2 MB here
# keeps the scoped-VMEM stack under the 16 MB limit with headroom.
_VMEM_BUDGET = 2 * 1024 * 1024


def _pick_cb(hw: int, c: int) -> Optional[int]:
    """Channel block satisfying the Mosaic TPU tiling rule (last block dim a
    multiple of 128 OR the whole channel dim) within the VMEM budget.

    Returns None when no valid block fits — callers fall back to the XLA
    path (the case for large-HW layers, e.g. 256x256x64 or 128x128x128
    activations; the kernel's sweet spot is the 64x64x256 resblock stack,
    the most frequent instance-norm site in the network)."""
    cands = [128] if c % 128 == 0 else []
    cands.append(c)  # whole-dim block is always legal
    valid = [cb for cb in cands if hw * cb * 4 <= _VMEM_BUDGET]
    return max(valid) if valid else None


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(x_ref, y_ref, mean_ref, rstd_ref, *, eps: float):
    x = x_ref[0].astype(jnp.float32)                  # (HW, Cb)
    mean = jnp.mean(x, axis=0, keepdims=True)         # (1, Cb)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=0, keepdims=True)    # biased, like torch
    rstd = jax.lax.rsqrt(var + eps)
    y_ref[0] = (xc * rstd).astype(y_ref.dtype)
    mean_ref[0] = mean
    rstd_ref[0] = rstd


def _fwd_affine_kernel(x_ref, g_ref, b_ref, y_ref, mean_ref, rstd_ref,
                       *, eps: float):
    x = x_ref[0].astype(jnp.float32)
    mean = jnp.mean(x, axis=0, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=0, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    g = g_ref[0].astype(jnp.float32)                  # (1, Cb)
    b = b_ref[0].astype(jnp.float32)
    y_ref[0] = (xc * rstd * g + b).astype(y_ref.dtype)
    mean_ref[0] = mean
    rstd_ref[0] = rstd


def _run_fwd(x4: jnp.ndarray, gamma: Optional[jnp.ndarray],
             beta: Optional[jnp.ndarray], eps: float):
    """x4: (B, HW, C) -> (y, mean (B,1,C), rstd (B,1,C))."""
    bsz, hw, c = x4.shape
    cb = _pick_cb(hw, c)
    assert cb is not None  # dispatcher falls back before reaching here
    grid = (bsz, c // cb)
    x_spec = pl.BlockSpec((1, hw, cb), lambda i, j: (i, 0, j),
                          memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((1, 1, cb), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM)
    out_shape = (
        jax.ShapeDtypeStruct(x4.shape, x4.dtype),
        jax.ShapeDtypeStruct((bsz, 1, c), jnp.float32),
        jax.ShapeDtypeStruct((bsz, 1, c), jnp.float32),
    )
    if gamma is None:
        return pl.pallas_call(
            functools.partial(_fwd_kernel, eps=eps),
            grid=grid,
            in_specs=[x_spec],
            out_specs=(x_spec, stat_spec, stat_spec),
            out_shape=out_shape,
        )(x4)
    g3 = gamma.reshape(bsz, 1, c)
    b3 = beta.reshape(bsz, 1, c)
    return pl.pallas_call(
        functools.partial(_fwd_affine_kernel, eps=eps),
        grid=grid,
        in_specs=[x_spec, stat_spec, stat_spec],
        out_specs=(x_spec, stat_spec, stat_spec),
        out_shape=out_shape,
    )(x4, g3, b3)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_kernel(dy_ref, x_ref, mean_ref, rstd_ref, dx_ref):
    dy = dy_ref[0].astype(jnp.float32)                # (HW, Cb)
    x = x_ref[0].astype(jnp.float32)
    mean = mean_ref[0]
    rstd = rstd_ref[0]
    xhat = (x - mean) * rstd
    m_dy = jnp.mean(dy, axis=0, keepdims=True)
    m_dyx = jnp.mean(dy * xhat, axis=0, keepdims=True)
    dx_ref[0] = (rstd * (dy - m_dy - xhat * m_dyx)).astype(dx_ref.dtype)


def _bwd_affine_kernel(dy_ref, x_ref, mean_ref, rstd_ref, g_ref,
                       dx_ref, dg_ref, db_ref):
    dy = dy_ref[0].astype(jnp.float32)
    x = x_ref[0].astype(jnp.float32)
    mean = mean_ref[0]
    rstd = rstd_ref[0]
    g = g_ref[0].astype(jnp.float32)
    xhat = (x - mean) * rstd
    dg_ref[0] = jnp.sum(dy * xhat, axis=0, keepdims=True)
    db_ref[0] = jnp.sum(dy, axis=0, keepdims=True)
    dyg = dy * g
    m_dy = jnp.mean(dyg, axis=0, keepdims=True)
    m_dyx = jnp.mean(dyg * xhat, axis=0, keepdims=True)
    dx_ref[0] = (rstd * (dyg - m_dy - xhat * m_dyx)).astype(dx_ref.dtype)


def _run_bwd(dy4, x4, mean, rstd, gamma):
    bsz, hw, c = x4.shape
    cb = _pick_cb(hw, c)
    assert cb is not None
    grid = (bsz, c // cb)
    x_spec = pl.BlockSpec((1, hw, cb), lambda i, j: (i, 0, j),
                          memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((1, 1, cb), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM)
    if gamma is None:
        return pl.pallas_call(
            _bwd_kernel,
            grid=grid,
            in_specs=[x_spec, x_spec, stat_spec, stat_spec],
            out_specs=x_spec,
            out_shape=jax.ShapeDtypeStruct(x4.shape, dy4.dtype),
        )(dy4, x4, mean, rstd), None, None
    g3 = gamma.reshape(bsz, 1, c)
    dx, dg, db = pl.pallas_call(
        _bwd_affine_kernel,
        grid=grid,
        in_specs=[x_spec, x_spec, stat_spec, stat_spec, stat_spec],
        out_specs=(x_spec, stat_spec, stat_spec),
        out_shape=(
            jax.ShapeDtypeStruct(x4.shape, dy4.dtype),
            jax.ShapeDtypeStruct((bsz, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, c), jnp.float32),
        ),
    )(dy4, x4, mean, rstd, g3)
    return dx, dg.reshape(bsz, c), db.reshape(bsz, c)


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _in_core(x4, gamma, beta, eps):
    y, _, _ = _run_fwd(x4, gamma, beta, eps)
    return y


def _in_core_fwd(x4, gamma, beta, eps):
    y, mean, rstd = _run_fwd(x4, gamma, beta, eps)
    return y, (x4, mean, rstd, gamma)


def _in_core_bwd(eps, res, dy):
    x4, mean, rstd, gamma = res
    dx, dg, db = _run_bwd(dy, x4, mean, rstd, gamma)
    return dx, dg, db


_in_core.defvjp(_in_core_fwd, _in_core_bwd)


def instance_norm_pallas(x: jnp.ndarray,
                         gamma: Optional[jnp.ndarray] = None,
                         beta: Optional[jnp.ndarray] = None,
                         eps: float = 1e-5) -> jnp.ndarray:
    """Fused instance norm on NHWC input; optional (B, C) AdaIN affine.

    Drop-in for blocks.instance_norm / blocks.adain (same numerics)."""
    b, h, w, c = x.shape
    if (gamma is None) != (beta is None):
        raise ValueError("gamma and beta must be given together")
    if _pick_cb(h * w, c) is None:
        # no legal VMEM tile for this (HW, C) — XLA path, same numerics
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(-3, -2), keepdims=True)
        var = jnp.var(x32, axis=(-3, -2), keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + eps)
        if gamma is not None:
            y = (y * gamma.astype(jnp.float32)[:, None, None, :]
                 + beta.astype(jnp.float32)[:, None, None, :])
        return y.astype(x.dtype)
    x4 = x.reshape(b, h * w, c)
    y = _in_core(x4, gamma, beta, eps)
    return y.reshape(b, h, w, c)
