"""Focus-mask losses (reference: trainer_council.py focus/mask loss block).

The generator's extra alpha channel becomes a mask in [0, 1]; these losses
push it to be (a) small — edit as few pixels as possible, (b) binary, and
(c) optionally smooth. SURVEY.md §2.2 rows 'Focus-mask *'.

Exact reference formulas are [VERIFY] (mount was empty); mechanisms per the
paper (arXiv 1911.10538 §3.3): size = mean(mask), binarization = a penalty
minimized at mask ∈ {0, 1} and maximal at 0.5 (we use mask·(1−mask), smooth
and bounded), TV = mean absolute spatial gradient.
"""

from __future__ import annotations

import jax.numpy as jnp


def mask_size_loss(mask: jnp.ndarray) -> jnp.ndarray:
    """mean(mask) — penalize editing pixels at all. mask: (..., H, W, 1)."""
    return jnp.mean(mask.astype(jnp.float32))


def mask_binary_loss(mask: jnp.ndarray) -> jnp.ndarray:
    """mean(mask * (1 - mask)) — zero iff the mask is exactly binary."""
    m = mask.astype(jnp.float32)
    return jnp.mean(m * (1.0 - m))


def mask_tv_loss(mask: jnp.ndarray) -> jnp.ndarray:
    """Anisotropic total variation on the mask (mean |∇mask|)."""
    m = mask.astype(jnp.float32)
    dh = jnp.abs(m[..., 1:, :, :] - m[..., :-1, :, :])
    dw = jnp.abs(m[..., :, 1:, :] - m[..., :, :-1, :])
    return jnp.mean(dh) + jnp.mean(dw)
