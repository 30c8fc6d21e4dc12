"""Adversarial losses (reference networks.py::MsImageDis.calc_dis_loss /
calc_gen_loss).

LSGAN (the shipped configs' gan_type):
  dis: sum over scales of mean(D(fake)^2) + mean((D(real) - 1)^2)
  gen: sum over scales of mean((D(fake) - 1)^2)
NSGAN (MUNIT option, kept for completeness): sigmoid + BCE against 0/1.

Each function takes the *list* of per-scale logit maps the discriminator
returns. Losses reduce to a scalar (mean over batch and patches, sum over
scales) exactly like the reference.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp


def _bce_logits(logits: jnp.ndarray, target: float) -> jnp.ndarray:
    # BCE(sigmoid(x), t) == softplus(x) - t * x, elementwise mean
    return jnp.mean(jax.nn.softplus(logits) - target * logits)


def gan_dis_loss(fake_outs: List[jnp.ndarray], real_outs: List[jnp.ndarray],
                 gan_type: str = "lsgan") -> jnp.ndarray:
    """Discriminator loss over the scale pyramid. Fakes must already be
    gradient-stopped by the caller (the reference uses .detach())."""
    loss = 0.0
    for f, r in zip(fake_outs, real_outs):
        f = f.astype(jnp.float32)
        r = r.astype(jnp.float32)
        if gan_type == "lsgan":
            loss += jnp.mean(f ** 2) + jnp.mean((r - 1.0) ** 2)
        elif gan_type == "nsgan":
            loss += _bce_logits(f, 0.0) + _bce_logits(r, 1.0)
        else:
            raise ValueError(f"unsupported gan_type: {gan_type}")
    return loss


def gan_gen_loss(fake_outs: List[jnp.ndarray],
                 gan_type: str = "lsgan") -> jnp.ndarray:
    """Generator-side adversarial loss over the scale pyramid."""
    loss = 0.0
    for f in fake_outs:
        f = f.astype(jnp.float32)
        if gan_type == "lsgan":
            loss += jnp.mean((f - 1.0) ** 2)
        elif gan_type == "nsgan":
            loss += _bce_logits(f, 1.0)
        else:
            raise ValueError(f"unsupported gan_type: {gan_type}")
    return loss
