"""Fused nearest-2x-upsample + 5x5 conv via exact phase decomposition.

The reference decoder (networks.py::Decoder) does
``nn.Upsample(scale_factor=2, mode='nearest')`` followed by a padded 5x5
conv — the two FLOPs-dominant layers of the generator. Materializing the
upsampled tensor costs 4x the HBM traffic and the 5x5 conv then does 25
MACs/output-pixel even though a nearest-upsampled image has only ~9 distinct
source pixels under any 5x5 window.

Exact rewrite: for output parity (a, b) in {0,1}^2, the taps of the 5x5
kernel collapse onto at most 3x3 *distinct* source pixels, with weights
grouped by parity:

    row parity 0:  [w0+w1, w2+w3, w4]     (output row 2i reads x[i-1:i+2])
    row parity 1:  [w0, w1+w2, w3+w4]     (output row 2i+1, same support)

so the whole op becomes ONE 3x3 conv with 4x the output channels (all four
phase kernels stacked) followed by a depth-to-space interleave: 9/25 the
MACs, no upsampled intermediate, and a single large MXU-friendly conv.

The grouping is exact for every output pixel whose 5x5 window stays inside
the upsampled image; the 2-pixel output border interacts with the reflect
padding (which reflects on the *upsampled* grid) differently per parity, so
the border strips are recomputed with the reference path on thin input
slices (cost ~H*4 pixels) and spliced in — the result is bit-exactly the
same function as upsample+pad+conv up to float summation order.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from councilx.nn.blocks import pad2d, upsample_nearest_2x

# grouping matrices: G[a] maps the 5 taps of one axis onto the 3 distinct
# source pixels for output parity a (see module docstring)
_G0 = np.array([[1, 1, 0, 0, 0],
                [0, 0, 1, 1, 0],
                [0, 0, 0, 0, 1]], dtype=np.float32)
_G1 = np.array([[1, 0, 0, 0, 0],
                [0, 1, 1, 0, 0],
                [0, 0, 0, 1, 1]], dtype=np.float32)


def upsample2x_conv5x5_reference(x: jnp.ndarray, kernel: jnp.ndarray,
                                 bias: Optional[jnp.ndarray],
                                 pad_type: str = "reflect",
                                 precision=None) -> jnp.ndarray:
    """The unfused path: nearest-2x upsample -> pad(2) -> VALID 5x5 conv.

    x: (B, H, W, Cin); kernel: (5, 5, Cin, Cout) HWIO. Matches the reference
    decoder's Upsample + Conv2dBlock(5,1,2) conv stage exactly.
    """
    up = upsample_nearest_2x(x)
    up = pad2d(up, 2, pad_type)
    y = jax.lax.conv_general_dilated(
        up, kernel.astype(x.dtype), window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def _phase_kernels(kernel: jnp.ndarray, precision=None) -> jnp.ndarray:
    """(5,5,I,O) -> (3,3,I,4*O) with phase order (a,b) major on channels.

    ``precision`` must be threaded through to the einsum: on TPU the
    default einsum precision is bf16 even for f32 operands, which would
    silently cap the whole op at ~1e-2 accuracy when the caller asked for
    ``precision="highest"`` (the G contraction only ever ADDS disjoint
    taps, so any matmul precision loss here is pure rounding of the sums).
    """
    g = [jnp.asarray(_G0, kernel.dtype), jnp.asarray(_G1, kernel.dtype)]
    ks = []
    for a in range(2):
        for b in range(2):
            # K_ab[r,c,i,o] = sum_{u,v} G_a[r,u] * W[u,v,i,o] * G_b[c,v]
            ks.append(jnp.einsum("ru,uvio,cv->rcio", g[a], kernel, g[b],
                                 precision=precision))
    return jnp.concatenate(ks, axis=-1)  # (3, 3, I, 4*O)


def _dilated_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """(5,5,I,O) -> (6,6,I,O): ones(2,2) full-convolved with the 5x5 taps.

    nearest-up(x) = zero-insert(x) ⊛ ones(2,2), so up + conv5x5 collapses to
    zero-insert ⊛ (ones2x2 ⊛ w5x5) = lhs_dilation=2 conv with this kernel.
    Tap sums accumulate in f32 (same pre-summed-weights numerics class as
    the phase kernels' G-matrix grouping).
    """
    k = kernel.astype(jnp.float32)
    k6 = jnp.zeros((6, 6) + kernel.shape[2:], jnp.float32)
    for dy in (0, 1):
        for dx in (0, 1):
            k6 = k6.at[dy:dy + 5, dx:dx + 5].add(k)
    return k6


def upsample2x_conv5x5(x: jnp.ndarray, kernel: jnp.ndarray,
                       bias: Optional[jnp.ndarray],
                       pad_type: str = "reflect",
                       precision=None, use_pallas: bool = False,
                       quant: bool = False,
                       a_scale: Optional[jnp.ndarray] = None,
                       engine: str = "dilated") -> jnp.ndarray:
    """Fused, exact equivalent of :func:`upsample2x_conv5x5_reference`.

    Interior engines (2-pixel output border always recomputed exactly via
    reference-path strips and spliced in):

    - ``"dilated"`` (default): ONE ``conv_general_dilated`` with
      ``lhs_dilation=2`` and the 6x6 combined kernel — XLA's native phase
      handling of input dilation. Measured 1.5-1.7x faster than the phase
      engine at the 256px serving shapes (tools/bench_decoder_tail.py:
      158.5 vs 93.5 TF/s at up1, 127.2 vs 88.3 at up2 on v5e).
    - ``"phase"``: one 3x3 conv with 4x output channels (the four parity
      kernels stacked) + depth-to-space. Kept because the quant and Pallas
      paths operate on the 3x3 phase conv; forced when those are requested.

    With ``use_pallas`` the 3x3 conv runs on the Pallas kernel
    (ops/pallas_conv.py) when the shape is eligible. With ``quant`` the
    interior phase conv runs W8A8 int8 on the MXU (ops/quant.py; the thin
    border strips stay in the compute dtype — their cost is ~H*4 pixels).
    """
    b_, h, w, cin = x.shape
    cout = kernel.shape[-1]
    if h < 4 or w < 4:
        return upsample2x_conv5x5_reference(x, kernel, bias, pad_type,
                                            precision)

    if quant or use_pallas:
        engine = "phase"
    if engine == "dilated":
        # zero-insert to the (2H-1, 2W-1) grid + 6x6 kernel, pad 3: exact
        # for every output pixel whose taps stay in range — i.e. everything
        # but the 2-pixel border, which the strips below overwrite anyway
        k6 = _dilated_kernel(kernel).astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            x, k6, window_strides=(1, 1), padding=[(3, 3), (3, 3)],
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)
    else:
        # interior: pad mode is irrelevant (the border it influences gets
        # overwritten below); edge-pad keeps values in range for bf16
        xp = pad2d(x, 1, "replicate")
        k4 = _phase_kernels(kernel, precision).astype(x.dtype)
        y4 = None
        if quant:
            from councilx.ops.quant import conv_w8a8
            y4 = conv_w8a8(xp, k4, out_dtype=x.dtype, a_scale=a_scale)
        if y4 is None and use_pallas and precision is None:
            from councilx.ops.pallas_conv import (conv3x3_eligible,
                                                  conv3x3_valid)
            if conv3x3_eligible(xp.shape, k4.shape, xp.dtype.itemsize):
                y4 = conv3x3_valid(xp, k4)
        if y4 is None:
            y4 = jax.lax.conv_general_dilated(
                xp, k4, window_strides=(1, 1), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=precision)
        # (B,H,W,4C): channel blocks ordered (a,b) -> depth-to-space
        y = y4.reshape(b_, h, w, 2, 2, cout)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b_, 2 * h, 2 * w, cout)

    # exact border strips via the reference path on thin slices. A strip
    # computed from a 4-row slice is exact for its first 2 output rows
    # (taps never reach the slice's fake far boundary).
    def ref(sl):
        return upsample2x_conv5x5_reference(sl, kernel, None, pad_type,
                                            precision)

    top = ref(x[:, :4])[:, :2]
    bot = ref(x[:, -4:])[:, -2:]
    left = ref(x[:, :, :4])[:, :, :2]
    right = ref(x[:, :, -4:])[:, :, -2:]
    y = y.at[:, :2].set(top)
    y = y.at[:, -2:].set(bot)
    y = y.at[:, :, :2].set(left)
    y = y.at[:, :, -2:].set(right)

    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def _strip_to_phase_row(t: jnp.ndarray) -> jnp.ndarray:
    """Full-res 2-row strip (B, 2, 2W, C) -> ONE phase-layout row
    (B, 1, W, 4C) with (a, b)-major channels: full-res (r=2i+a, c=2j+b)
    lives at phase [i, j, (2a+b)*C + o], and a 2-row full-res strip is
    exactly one phase row across all four parities."""
    b_, _, wf, c = t.shape
    t = t.reshape(b_, 2, wf // 2, 2, c)          # (B, a, j, b, C)
    t = t.transpose(0, 2, 1, 3, 4)               # (B, j, a, b, C)
    return t.reshape(b_, 1, wf // 2, 4 * c)


def _strip_to_phase_col(t: jnp.ndarray) -> jnp.ndarray:
    """Full-res 2-col strip (B, 2H, 2, C) -> ONE phase-layout column
    (B, H, 1, 4C) (see _strip_to_phase_row)."""
    b_, hf, _, c = t.shape
    t = t.reshape(b_, hf // 2, 2, 2, c)          # (B, i, a, b, C)
    return t.reshape(b_, hf // 2, 1, 4 * c)


def _ln_affine_act(y: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
                   eps: float, ln_precision: str, ln_stats: str, act,
                   tiled: bool) -> jnp.ndarray:
    """MUNIT LayerNorm + per-channel affine + activation on ``y``, whose
    channel axis is either the plain C (tiled=False) or the (a, b)-major
    phase layout 4C (tiled=True; affine params repeat 4x). Precision/stats
    semantics mirror nn.blocks.MunitLayerNorm line for line."""
    from councilx.nn.blocks import norm_mean_var

    g = jnp.tile(gamma, 4) if tiled else gamma
    b = jnp.tile(beta, 4) if tiled else beta
    orig_dtype = y.dtype
    ys = y if ln_precision == "bf16" else y.astype(jnp.float32)
    axes = tuple(range(1, y.ndim))
    n = 1
    for a in axes:
        n *= y.shape[a]
    mean, var_b = norm_mean_var(ys, axes, ln_stats)
    std = jnp.sqrt(var_b * (n / (n - 1)))    # unbiased, like torch .std()
    if ln_precision == "f32":
        out = (y.astype(jnp.float32) - mean) / (std + eps)
        out = (out * g + b).astype(orig_dtype)
    else:
        inv = (1.0 / (std + eps)).astype(orig_dtype)
        out = (y - mean.astype(orig_dtype)) * inv
        out = out * g.astype(orig_dtype) + b.astype(orig_dtype)
    return act(out) if act is not None else out


def upsample2x_conv5x5_ln_fused(x: jnp.ndarray, kernel: jnp.ndarray,
                                bias: Optional[jnp.ndarray],
                                pad_type: str,
                                gamma: jnp.ndarray, beta: jnp.ndarray,
                                eps: float = 1e-5,
                                ln_precision: str = "mixed",
                                ln_stats: str = "two_pass",
                                act=None,
                                precision=None) -> jnp.ndarray:
    """Upsample+conv with MUNIT LayerNorm + affine + activation applied in
    the half-res PHASE layout; depth-to-space runs last.

    The decoder's upsample stages are ``upsample2x -> 5x5 conv -> MUNIT
    LayerNorm -> relu`` (reference networks.py::Decoder, norm='ln'). With
    the dilated/phase interior engines the LN still costs a full-resolution
    stats read plus a full-resolution normalize round-trip AFTER the conv
    (round-4 serving stage table: dec_up2 carries ~12 ms of LN stats at
    256px batch 384 — BASELINE.md). MUNIT LN normalizes per-sample over ALL
    of (H, W, C), and the phase layout (B, H/2, W/2, 4C) holds exactly the
    same element set, so pooling the stats there is exact up to float
    summation order — the same equal-size-groups argument as
    ops/pad_conv.py::conv2d_same_phase_fused. The per-channel affine maps to
    the (a, b)-major phase channels as ``tile(gamma, 4)``, and elementwise
    activations commute with depth-to-space, so the entire
    conv -> LN -> affine -> act pipeline runs at half resolution with d2s as
    the only full-res pass.

    Exactness at the borders: the 2-pixel full-res output border (where the
    interior engine's pad handling differs from the reference) is exactly
    ONE phase-layout row/column per side, so the reference-path strips are
    spliced into the phase tensor BEFORE the statistics — the LN sees
    bit-identical inputs to the unfused path, reordered.

    ``ln_precision``/``ln_stats`` mirror nn.blocks.MunitLayerNorm's
    precision/stats semantics exactly ("f32" | "mixed" | "bf16";
    "two_pass" | "one_pass"). Unbiased std with n = the per-sample element
    count, matching torch ``Tensor.std()``.
    """
    b_, h, w, _ = x.shape
    cout = kernel.shape[-1]
    if h < 4 or w < 4:
        y = upsample2x_conv5x5_reference(x, kernel, bias, pad_type,
                                         precision)
        # tiny-input fallback: full-res LN (identical formula)
        return _ln_affine_act(y, gamma, beta, eps, ln_precision, ln_stats,
                              act, tiled=False)

    xp = pad2d(x, 1, "replicate")
    k4 = _phase_kernels(kernel, precision).astype(x.dtype)
    y4 = jax.lax.conv_general_dilated(
        xp, k4, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)

    # exact border strips (reference path on thin slices), spliced in the
    # phase layout BEFORE the LN statistics — same splice order as
    # upsample2x_conv5x5 (left/right own the corners)
    def ref(sl):
        return upsample2x_conv5x5_reference(sl, kernel, None, pad_type,
                                            precision)

    y4 = y4.at[:, :1].set(_strip_to_phase_row(ref(x[:, :4])[:, :2]))
    y4 = y4.at[:, -1:].set(_strip_to_phase_row(ref(x[:, -4:])[:, -2:]))
    y4 = y4.at[:, :, :1].set(_strip_to_phase_col(ref(x[:, :, :4])[:, :, :2]))
    y4 = y4.at[:, :, -1:].set(
        _strip_to_phase_col(ref(x[:, :, -4:])[:, :, -2:]))
    if bias is not None:
        y4 = y4 + jnp.tile(bias, 4).astype(y4.dtype)

    y4 = _ln_affine_act(y4, gamma, beta, eps, ln_precision, ln_stats, act,
                        tiled=True)
    y = y4.reshape(b_, h, w, 2, 2, cout)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b_, 2 * h, 2 * w, cout)
