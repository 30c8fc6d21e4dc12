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

from councilx.nn.blocks import norm_mean_var, pad2d


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


def _phase_packed_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """(K,K,I,O), K odd -> (K+1,K+1,I,4*O) with phase order (a,b) major.

    K8[u',v',i,(a,b,o)] = K[u'-a, v'-b, i, o] (zero outside [0,K)): the
    stride-2 conv with K8 computes all four output parities of the stride-1
    K-tap conv at once — y[2i+a, 2j+b, o] = sum_u K[u,v] xp[2i+a+u, 2j+b+v]
    = sum_{u'} K8[u',v',(a,b,o)] xp[2i+u', 2j+v'] with u = u'-a.
    """
    k = kernel.shape[0]
    out = []
    for a in (0, 1):
        for b in (0, 1):
            kk = jnp.zeros((k + 1, k + 1) + kernel.shape[2:], kernel.dtype)
            kk = kk.at[a:a + k, b:b + k].set(kernel)
            out.append(kk)
    return jnp.concatenate(out, axis=-1)  # (K+1, K+1, I, 4*O)


def conv2d_same_phase(x: jnp.ndarray, kernel: jnp.ndarray,
                      bias: Optional[jnp.ndarray],
                      pad_type: str = "reflect",
                      precision=None) -> jnp.ndarray:
    """Exact "same" KxK stride-1 conv as ONE stride-2 (K+1)x(K+1) conv +
    depth-to-space. Requires even H, W (caller falls back otherwise).

    This is the MXU-shape fix for channel-starved boundary convs: the
    generator's first conv (Cin=3) runs the MXU contraction at 7*7*3=147
    barely-filled lanes and its final conv (Cout=3) runs the output dim at
    3 of 128 — measured 12.8 / 22.4 TF/s, 65 ms of the 423 ms serving step
    (tools/profile_infer_stages.py, v5e batch 384). Phase packing trades
    (K+1)^2/K^2 = 1.31x the MACs for contraction 8*8*Cin and output 4*Cout:
    both boundary convs become ordinary MXU-shaped convs at half spatial
    resolution. Exact for every pixel (the real pad happens first), so no
    border strips are needed.
    """
    kh = kernel.shape[0]
    p = kh // 2
    b_, h, w, _ = x.shape
    cout = kernel.shape[3]
    xp = pad2d(x, p, pad_type)
    k8 = _phase_packed_kernel(kernel).astype(x.dtype)
    # padded (h+2p) minus taps (2p+2), stride 2 -> exactly h/2 positions
    y4 = jax.lax.conv_general_dilated(
        xp, k8, window_strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)
    y = y4.reshape(b_, h // 2, w // 2, 2, 2, cout)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b_, h, w, cout)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def conv2d_same_phase_fused(x: jnp.ndarray, kernel: jnp.ndarray,
                            bias: Optional[jnp.ndarray],
                            pad_type: str = "reflect",
                            norm: str = "none",
                            in_precision: str = "mixed",
                            in_stats: str = "two_pass",
                            act=None, precision=None,
                            eps: float = 1e-5) -> jnp.ndarray:
    """Phase-packed same conv with instance norm + activation applied in the
    half-res phase layout; depth-to-space runs LAST.

    :func:`conv2d_same_phase` followed by Conv2dBlock's generic tail costs
    two extra full-resolution round-trips: the d2s transpose writes the
    full-res tensor, then the IN stats re-read it and the normalize+relu
    re-read/re-write it (round-4 stage profile: the generator's first conv
    stage ran at 50 ms vs a ~13 ms HBM floor at 256px batch 384). Here the
    IN statistics pool over the four parity groups in the (B, H/2, W/2,
    4*C) conv output — the groups are equal-sized, so pooled mean/var ==
    full-res mean/var exactly up to float summation order — and the
    normalize + activation fuse into the conv output, leaving d2s as the
    only full-res pass.

    ``norm``: "none" | "in" (affine-free, MUNIT InstanceNorm2d semantics);
    ``in_precision`` matches nn.blocks.apply_instance_norm ("f32" | "mixed"
    | "bf16"); ``act`` is an elementwise callable or None (elementwise ops
    commute with d2s). Requires even H, W (caller falls back otherwise).
    """
    kh = kernel.shape[0]
    p = kh // 2
    b_, h, w, _ = x.shape
    cout = kernel.shape[3]
    xp = pad2d(x, p, pad_type)
    k8 = _phase_packed_kernel(kernel).astype(x.dtype)
    y4 = jax.lax.conv_general_dilated(
        xp, k8, window_strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)
    if bias is not None:
        # channel layout is (a, b) major: index = (2a+b)*cout + o
        y4 = y4 + jnp.tile(bias, 4).astype(y4.dtype)
    y5 = y4.reshape(b_, h // 2, w // 2, 4, cout)
    if norm == "in":
        stats_f32 = in_precision in ("f32", "mixed") \
            and y5.dtype != jnp.float32
        ys = y5.astype(jnp.float32) if stats_f32 else y5
        mean, var = norm_mean_var(ys, (1, 2, 3), in_stats)
        if in_precision == "f32" and stats_f32:
            y5 = ((ys - mean) * jax.lax.rsqrt(var + eps)).astype(y5.dtype)
        else:
            y5 = (y5 - mean.astype(y5.dtype)) \
                * jax.lax.rsqrt(var + eps).astype(y5.dtype)
    elif norm != "none":
        raise ValueError(f"conv2d_same_phase_fused: unsupported norm {norm}")
    if act is not None:
        y5 = act(y5)
    y = y5.reshape(b_, h // 2, w // 2, 2, 2, cout)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b_, h, w, cout)


def conv2d_same(x: jnp.ndarray, kernel: jnp.ndarray,
                bias: Optional[jnp.ndarray], pad_type: str = "reflect",
                precision=None, engine: str = "auto") -> jnp.ndarray:
    """Fused, exact equivalent of :func:`conv2d_same_reference`.

    x: (B, H, W, Cin); kernel: (K, K, Cin, Cout) HWIO with K odd, stride 1,
    "same" P = K//2 padding. Engines:

    - ``"phase"``: stride-2 phase-packed conv + depth-to-space
      (:func:`conv2d_same_phase`) — the win when Cin or Cout is tiny
      (MXU shape starvation); needs even H and W.
    - ``"strips"``: zero-padded conv (no HBM pad copy) + the P-pixel output
      border recomputed exactly on 2P-row/col input slices (a strip's taps
      never reach its fake far boundary, and its near-side
      reflect/replicate pad only reads rows/cols inside the slice).
    - ``"auto"`` (default): phase when the shape is channel-starved
      (Cin <= 16 or Cout <= 16) and H, W are even; strips otherwise.
    - ``"reference"``: the unfused pad2d + VALID conv (A/B baseline).
    """
    kh, kw = kernel.shape[0], kernel.shape[1]
    if kh != kw or kh % 2 != 1:
        raise ValueError(f"conv2d_same needs an odd square kernel, "
                         f"got {kernel.shape[:2]}")
    p = kh // 2
    h, w = x.shape[1], x.shape[2]
    if engine == "reference":
        return conv2d_same_reference(x, kernel, bias, pad_type, precision)
    if engine == "auto":
        starved = x.shape[3] <= 16 or kernel.shape[3] <= 16
        engine = ("phase" if starved and h % 2 == 0 and w % 2 == 0
                  else "strips")
    if engine == "phase" and h % 2 == 0 and w % 2 == 0 and p > 0:
        return conv2d_same_phase(x, kernel, bias, pad_type, precision)
    if pad_type == "zero" or p == 0:
        return conv2d_same_reference(x, kernel, bias, "zero", precision)
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
