"""Winograd F(2x2, 3x3) convolution in pure XLA (jnp) — 2.25x fewer MACs.

The resblock 3x3 convs are the network's FLOPs-dominant ops and run at
~60-65 TF/s under XLA's direct conv on a v5e whose matmul roofline is ~149
TF/s (tools/bench_conv.py, round-2 measurements; three Pallas designs all
hit the same wall — the per-tap shifted-window materialization is
VPU-bound, see ops/pallas_conv.py). Winograd attacks the FLOPs instead:
F(2x2, 3x3) computes each 2x2 output tile from a 4x4 input tile with 16
multiplies instead of 36 (2.25x), turning the conv into 16 batched
(tiles, C) @ (C, O) matmuls — exactly what the MXU is best at — plus
cheap +/- transform arithmetic on the VPU.

    y = A^T [ (G k G^T) (x) (B^T d B) ] A   per 4x4 tile d, summed over C.

Everything is jnp, so XLA fuses the transforms and jax.grad differentiates
the graph — the backward is automatically winograd-structured (dgrad and
wgrad both inherit the 2.25x MAC reduction).

Numerics: the transform matrices are exact in bf16 (entries 0, +-1, +-0.5);
products accumulate in f32 (preferred_element_type) and the output
transform sums in f32 before the final cast. bf16 winograd grows the
input-rounding error by a small constant vs direct conv (the transforms
sum up to 4 inputs, adding ~2 bits of dynamic range per tile); fp32 is
tested to 1e-5 against lax.conv (tests/test_winograd.py).

Status: a BENCHMARKED EXPERIMENT, not integrated into any model path —
measured ~10x SLOWER than XLA's direct conv on TPU because the 16x
transform intermediates blow out HBM traffic (BASELINE.md round-2 notes).
Nothing under councilx/nn imports it; it ships with its numerics tests
(tests/test_winograd.py) as the record of why the FLOP-reduction route
loses here.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# F(2x2, 3x3) transform matrices (Lavin & Gray, arXiv 1509.09308)
_BT = np.array([[1, 0, -1, 0],
                [0, 1, 1, 0],
                [0, -1, 1, 0],
                [0, 1, 0, -1]], np.float32)
_G = np.array([[1, 0, 0],
               [0.5, 0.5, 0.5],
               [0.5, -0.5, 0.5],
               [0, 0, 1]], np.float32)
_AT = np.array([[1, 1, 1, 0],
                [0, 1, -1, -1]], np.float32)


def winograd_eligible(xp_shape: Tuple[int, ...],
                      k_shape: Tuple[int, ...]) -> bool:
    """xp is the pre-padded input (B, H+2, W+2, C); requires even H, W and
    a 3x3 kernel. Channel counts are unconstrained (matmuls tile fine)."""
    if len(xp_shape) != 4 or len(k_shape) != 4:
        return False
    b, hp, wp, c = xp_shape
    kh, kw, kc, o = k_shape
    if (kh, kw) != (3, 3) or kc != c:
        return False
    h, w = hp - 2, wp - 2
    return h >= 4 and w >= 4 and h % 2 == 0 and w % 2 == 0


def conv3x3_winograd(xp: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """VALID 3x3 conv on pre-padded NHWC input via Winograd F(2x2, 3x3).

    Semantics match lax.conv_general_dilated(xp, k, (1,1), 'VALID') for
    xp (B, H+2, W+2, C), k (3, 3, C, O) HWIO, up to float summation order.
    """
    b, hp, wp, c = xp.shape
    h, w = hp - 2, wp - 2
    o = k.shape[-1]
    nth, ntw = h // 2, w // 2
    dt = xp.dtype

    bt = jnp.asarray(_BT, dt)
    # kernel transform in f32 (0.5 entries; k arrives bf16 in training)
    u = jnp.einsum("pu,uvco,qv->pqco", jnp.asarray(_G, jnp.float32),
                   k.astype(jnp.float32), jnp.asarray(_G, jnp.float32))
    u = u.astype(dt)

    # overlapping 4x4 tiles with stride 2: d[u,v] = strided subgrid
    d = jnp.stack([
        jnp.stack([
            jax.lax.slice(xp, (0, uu, vv, 0),
                          (b, uu + 2 * nth - 1, vv + 2 * ntw - 1, c),
                          (1, 2, 2, 1))
            for vv in range(4)], axis=0)
        for uu in range(4)], axis=0)          # (4, 4, B, nth, ntw, C)

    # input transform: V[p,q] = sum_{u,v} BT[p,u] BT[q,v] d[u,v]
    v = jnp.einsum("pu,uvbijc,qv->pqbijc", bt, d, bt)

    # 16 batched channel contractions on the MXU, f32 accumulation
    m = jnp.einsum("pqbijc,pqco->pqbijo", v, u,
                   preferred_element_type=jnp.float32)

    # output transform: y[r,s] = sum_{p,q} AT[r,p] AT[s,q] m[p,q]  (f32)
    at = jnp.asarray(_AT, jnp.float32)
    y = jnp.einsum("rp,pqbijo,sq->birjso", at, m, at)
    return y.reshape(b, h, w, o).astype(dt)
