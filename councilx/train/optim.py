"""Optimizer groups matching the reference's three torch.optim.Adam groups.

Reference (trainer_council.py::__init__): Adam(lr, betas=(beta1, beta2),
weight_decay=weight_decay) for gen / dis / council-dis parameter groups, each
with a StepLR(step_size, gamma) scheduler stepped once per iteration.

torch-Adam semantics reproduced exactly: L2 weight decay added to the raw
gradient (not decoupled), eps = 1e-8 outside the sqrt, bias-corrected
moments; LR follows lr * gamma**(floor(count / step_size)).
"""

from __future__ import annotations

import optax

from councilx.config import Config


def make_step_lr_adam(lr: float, beta1: float, beta2: float,
                      weight_decay: float, step_size: int, gamma: float,
                      mu_dtype=None) -> optax.GradientTransformation:
    def schedule(count):
        return lr * (gamma ** (count // step_size))

    return optax.chain(
        optax.add_decayed_weights(weight_decay) if weight_decay
        else optax.identity(),
        optax.scale_by_adam(b1=beta1, b2=beta2, eps=1e-8, mu_dtype=mu_dtype),
        optax.scale_by_schedule(lambda c: -schedule(c)),
    )


def make_optimizers(cfg: Config):
    """-> (gen_tx, dis_tx, cdis_tx), mirroring the reference's 3 groups."""
    import jax.numpy as jnp
    mu_dtype = jnp.bfloat16 if cfg.adam_mu_dtype == "bfloat16" else None
    if cfg.lr_policy == "step":
        mk = lambda: make_step_lr_adam(  # noqa: E731
            cfg.lr, cfg.beta1, cfg.beta2, cfg.weight_decay, cfg.step_size,
            cfg.gamma, mu_dtype=mu_dtype)
    elif cfg.lr_policy == "constant":
        # gamma=1.0 makes the decay a no-op for ANY step_size; a huge
        # sentinel step_size would overflow optax's int32 count at trace
        # time (count // (1<<62) crashes the first train step)
        mk = lambda: make_step_lr_adam(  # noqa: E731
            cfg.lr, cfg.beta1, cfg.beta2, cfg.weight_decay, 1, 1.0,
            mu_dtype=mu_dtype)
    else:
        raise ValueError(f"unsupported lr_policy: {cfg.lr_policy}")
    return mk(), mk(), mk()
