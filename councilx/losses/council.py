"""Council mutual-agreement losses — the paper's core mechanism, batched.

Reference behavior (trainer_council.py::gen_update / dis_council_update,
SURVEY.md §3.2–3.3): member i's translated output, channel-concatenated with
the input image, is scored by every OTHER member's council discriminator
D̂_j; the generator is rewarded when D̂_j accepts it ("looks like member j's
own work"), while D̂_i itself is trained to tell member i's pairs (real
class) from other members' pairs (fake class). The reference runs this as an
O(N²) Python double loop of separate CUDA launches; here the whole pairwise
grid evaluates as ONE batched computation: the member axis folds into the
batch fed to a vmapped discriminator — exactly the "one batched pairwise
kernel over all N council members" called for in BASELINE.json's north star.

Polarity note: the real/fake assignment is [VERIFY] against the live source
(mount was empty), so BOTH are implemented behind ``polarity``
(Config.council.council_polarity): "own_real" (default — D̂_i treats member
i's own pairs as the real class) or "own_fake" (swapped labels). Generators
always target the own-class label, so both polarities train the same
agreement pressure; re-grounding is a one-line config change.
"""

from __future__ import annotations

from typing import Callable, List, Optional

import jax
import jax.numpy as jnp


def _pair_grid_logits(cdis_apply: Callable, cdis_params, pairs: jnp.ndarray,
                      scan: bool = False) -> List[jnp.ndarray]:
    """Evaluate every council discriminator on every member's (fake ‖ input)
    pair in one batched pass.

    pairs: (N, B, H, W, 2C) — member-i outputs concatenated with the input.
    Returns a per-scale list of logit grids shaped (N_dis, N_out, B, h, w, 1).

    ``scan=True`` loops over discriminators with lax.map + rematerialized
    backward (one discriminator's activations live at a time) — the
    low-memory path used when Config.remat is on; numerics identical.
    """
    n, b = pairs.shape[0], pairs.shape[1]
    flat = pairs.reshape((n * b,) + pairs.shape[2:])

    def per_dis(params_j):
        outs = cdis_apply(params_j, flat)
        return [o.reshape((n, b) + o.shape[1:]) for o in outs]

    if scan:
        return jax.lax.map(jax.checkpoint(per_dis), cdis_params)
    return jax.vmap(per_dis)(cdis_params)


def make_pairs(x_fakes: jnp.ndarray, x_in: jnp.ndarray,
               conditional: bool = True) -> jnp.ndarray:
    """(N, B, H, W, C) fakes + (B, H, W, C) input -> (N, B, H, W, 2C) pairs.

    When ``conditional`` is False the council discriminator sees only the
    outputs (unconditional variant, config-gated in the reference)."""
    if not conditional:
        return x_fakes
    n = x_fakes.shape[0]
    x_rep = jnp.broadcast_to(x_in[None], (n,) + x_in.shape)
    return jnp.concatenate([x_fakes, x_rep], axis=-1)


def _pair_mask(n_dis: int, n_out: int, dis_offset: int, out_offset: int
               ) -> jnp.ndarray:
    """[j, i] indicator of j_global == i_global for (possibly shard-local)
    discriminator rows j and output columns i."""
    j = jnp.arange(n_dis, dtype=jnp.int32) + dis_offset
    i = jnp.arange(n_out, dtype=jnp.int32) + out_offset
    return (j[:, None] == i[None, :]).astype(jnp.float32)


def council_gen_loss(cdis_apply: Callable, cdis_params,
                     x_fakes: jnp.ndarray, x_in: jnp.ndarray,
                     gan_type: str = "lsgan",
                     conditional: bool = True,
                     dis_offset: int = 0,
                     out_offset: int = 0,
                     scan: bool = False,
                     polarity: str = "own_real") -> jnp.ndarray:
    """Generator-side agreement loss.

    Sum over ordered pairs (i, j≠i) of the per-pair generator GAN loss of
    D̂_j on member i's output — matching the reference's double loop, with
    means taken over batch and patch dims per pair. The generator targets
    the OWN-class label of D̂_j (1 under "own_real", 0 under "own_fake"):
    "make my output look like j's own work".

    ``dis_offset``/``out_offset``: global member indices of the first
    discriminator / first output row, for shard-local evaluation under
    member parallelism (parallel/council_shard.py); the diagonal (own-pair)
    exclusion is computed on GLOBAL indices.
    """
    pairs = make_pairs(x_fakes, x_in, conditional)
    grids = _pair_grid_logits(cdis_apply, cdis_params, pairs, scan=scan)
    n_dis, n_out = grids[0].shape[0], x_fakes.shape[0]
    off_diag = 1.0 - _pair_mask(n_dis, n_out, dis_offset, out_offset)
    own_real = polarity == "own_real"
    loss = 0.0
    for g in grids:  # (N_dis=j, N_out=i, B, h, w, 1)
        g = g.astype(jnp.float32)
        if gan_type == "lsgan":
            target = (g - 1.0) ** 2 if own_real else g ** 2
            per_pair = jnp.mean(target, axis=(2, 3, 4, 5))
        elif gan_type == "nsgan":
            target = (jax.nn.softplus(g) - g if own_real
                      else jax.nn.softplus(g))
            per_pair = jnp.mean(target, axis=(2, 3, 4, 5))
        else:
            raise ValueError(f"unsupported gan_type: {gan_type}")
        loss += jnp.sum(per_pair * off_diag)
    return loss


def council_dis_loss(cdis_apply: Callable, cdis_params,
                     x_fakes: jnp.ndarray, x_in: jnp.ndarray,
                     gan_type: str = "lsgan",
                     conditional: bool = True,
                     dis_offset: int = 0,
                     n_total: Optional[int] = None,
                     scan: bool = False,
                     polarity: str = "own_real") -> jnp.ndarray:
    """Council-discriminator loss (reference dis_council_update).

    Under "own_real" (default): D̂_i's real class = member i's own
    (output ‖ input) pairs (diagonal of the grid); fake class = the other
    members' pairs (off-diagonal row), averaged over the N−1 others so the
    two classes are balanced. Under "own_fake" the labels swap (diagonal =
    fake, off-diagonal = real). Caller must stop_gradient the fakes.

    ``dis_offset``: global index of the first local discriminator (member
    parallelism); ``x_fakes`` always carries ALL members' outputs.
    """
    n = n_total if n_total is not None else x_fakes.shape[0]
    if n < 2:
        return jnp.float32(0.0)
    pairs = make_pairs(x_fakes, x_in, conditional)
    grids = _pair_grid_logits(cdis_apply, cdis_params, pairs, scan=scan)
    n_dis, n_out = grids[0].shape[0], x_fakes.shape[0]
    eye = _pair_mask(n_dis, n_out, dis_offset, 0)
    off_diag = 1.0 - eye
    loss = 0.0
    for g in grids:
        g = g.astype(jnp.float32)
        if gan_type == "lsgan":
            real_term = jnp.mean((g - 1.0) ** 2, axis=(2, 3, 4, 5))
            fake_term = jnp.mean(g ** 2, axis=(2, 3, 4, 5))
        elif gan_type == "nsgan":
            real_term = jnp.mean(jax.nn.softplus(g) - g, axis=(2, 3, 4, 5))
            fake_term = jnp.mean(jax.nn.softplus(g), axis=(2, 3, 4, 5))
        else:
            raise ValueError(f"unsupported gan_type: {gan_type}")
        if polarity == "own_real":
            loss += jnp.sum(real_term * eye)
            loss += jnp.sum(fake_term * off_diag) / (n - 1)
        else:
            loss += jnp.sum(fake_term * eye)
            loss += jnp.sum(real_term * off_diag) / (n - 1)
    return loss
