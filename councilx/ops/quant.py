"""W8A8 dynamic post-training quantization for the serving conv path.

Motivation (round 3, measured — `tools/bench_int8.py`): the v5e MXU runs
int8 x int8 -> int32 convolutions at up to 330 TOPS vs the 197 TF/s bf16
peak, and the full quantize->conv->rescale link still beats bf16 ~1.4x at
serving batch sizes. Serving is compute-bound (BASELINE.md HBM-roofline
analysis), so this is the one lever past the bf16 ceiling.

Scheme (standard dynamic PTQ, TPU-shaped):

* **Weights**: per-output-channel symmetric int8 — scale
  ``w_s[o] = max|W[..., o]| / 127``, quantized IN-GRAPH from the live f32
  params. The param tree, checkpoints and converters are untouched; the
  round+cast folds into the serving executable and costs one VPU pass over
  25.9 MB of weights per batch (amortized over the whole batch).
* **Activations**: symmetric int8, two variants:
  - dynamic (``quant=w8a8``): per-image ``a_s[b] = max|x[b]| / 127``
    computed in-graph. Self-contained, but measured 0.86x end-to-end —
    the per-conv max-reduces break XLA's conv+IN fusion.
  - static (``quant=w8a8_static``): per-tensor scales CALIBRATED offline
    (``quant=w8a8_calib`` records running absmax into a flax
    ``quant_stats`` collection; tools/calibrate_quant.py drives it) and
    baked into the serving executable as constants. No dynamic reduce —
    measured 1.03-1.06x over bf16 (BASELINE.md).
* **Accumulation**: exact int32 on the MXU, then one fused
  ``acc * (a_s * w_s)`` rescale back to the compute dtype.

Quality note: convs followed by instance norm / AdaIN are *scale-invariant
per (sample, channel)* — IN normalizes mean/variance over (H, W) — so the
per-channel/per-image scale factors cancel exactly there and only the
int8 rounding error survives. The generator's heavy convs (encoder
downsamples, all resblocks) are all IN/AdaIN convs; the quality-critical
unnormalized ends (first 7x7 from RGB, final 7x7 to RGB, style branch,
MLP) stay in bf16 (see nn/generator.py plumbing).

No counterpart in the reference (CUDA/torch fp32 eager end to end); this
is a TPU-native serving feature, off by default (`quant: none`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def quantize_kernel_per_channel(kernel: jnp.ndarray):
    """(H, W, I, O) float kernel -> (int8 kernel, f32 scale (O,))."""
    k32 = kernel.astype(jnp.float32)
    w_s = jnp.maximum(jnp.max(jnp.abs(k32), axis=(0, 1, 2)), 1e-12) / 127.0
    k8 = jnp.clip(jnp.round(k32 / w_s), -127, 127).astype(jnp.int8)
    return k8, w_s


def quantize_act_per_image(x: jnp.ndarray):
    """(B, H, W, C) float -> (int8 x, f32 scale (B, 1, 1, 1))."""
    x32 = x.astype(jnp.float32)
    a_s = jnp.maximum(jnp.max(jnp.abs(x32), axis=(1, 2, 3), keepdims=True),
                      1e-12) / 127.0
    q = jnp.clip(jnp.round(x32 / a_s), -127, 127).astype(jnp.int8)
    return q, a_s


def quantize_act_static(x: jnp.ndarray, a_scale: jnp.ndarray):
    """Quantize with a precomputed (calibrated) per-tensor scale — no
    dynamic reduce. Measured (BASELINE.md): removing the per-conv dynamic
    max-reduce is what flips W8A8 serving from 0.86x to 1.03-1.06x vs
    bf16."""
    a_s = jnp.maximum(a_scale.astype(jnp.float32), 1e-12)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / a_s),
                 -127, 127).astype(jnp.int8)
    return q, a_s


def conv_w8a8(x: jnp.ndarray, kernel: jnp.ndarray,
              bias: Optional[jnp.ndarray] = None,
              stride: int = 1,
              out_dtype: jnp.dtype = jnp.bfloat16,
              a_scale: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Quantized VALID conv: activation quant (dynamic per-image, or static
    per-tensor when a calibrated ``a_scale`` is given) + per-channel weight
    quant + int8 MXU conv + fused rescale.

    ``x`` must already be padded (Conv2dBlock pads before dispatch, same as
    its other conv branches). Exact int32 accumulation; the only error vs
    the f32 conv is the two symmetric-roundoff terms (plus clipping when a
    static scale under-covers an outlier).
    """
    if a_scale is not None:
        q, a_s = quantize_act_static(x, a_scale)
    else:
        q, a_s = quantize_act_per_image(x)
    k8, w_s = quantize_kernel_per_channel(kernel)
    acc = jax.lax.conv_general_dilated(
        q, k8, window_strides=(stride, stride), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (a_s * w_s)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)
