"""On-device (jit'd XLA) image preprocessing.

The reference runs torchvision transforms (RandomHorizontalFlip -> Resize ->
RandomCrop -> ToTensor -> Normalize) in CPU DataLoader workers (utils.py::
get_data_loader_folder). Here the host delivers static-shape uint8 batches
and the randomized part — per-sample random crop, horizontal flip, and the
[-1, 1] normalization — runs as XLA ops on the accelerator, keyed by the
step PRNG, fusable into the train step (no host->device float traffic, 4x
less PCIe/ICI bandwidth than shipping f32).

Training augmentation is *distributionally* equivalent to the reference, not
bit-identical (different RNG stream, device bilinear vs PIL) — parity/FID
evals therefore bypass this path and use the PIL loader (SURVEY.md
hard-part #5).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def normalize_batch(batch_u8: jnp.ndarray,
                    dtype=jnp.float32) -> jnp.ndarray:
    """uint8 HWC batch -> float in [-1, 1] (ToTensor + Normalize(.5, .5))."""
    x = (batch_u8.astype(jnp.float32) - 127.5) * (1.0 / 127.5)
    return x.astype(dtype)


@partial(jax.jit, static_argnames=("crop_h", "crop_w", "train", "dtype"))
def augment_batch(rng: jax.Array, batch_u8: jnp.ndarray, crop_h: int,
                  crop_w: int, train: bool = True,
                  dtype=jnp.float32) -> jnp.ndarray:
    """(B, H, W, C) uint8 -> (B, crop_h, crop_w, C) float in [-1, 1].

    train=True: per-sample random crop + random horizontal flip.
    train=False: center crop only.
    """
    b, h, w, c = batch_u8.shape
    x = normalize_batch(batch_u8, dtype=jnp.float32)

    if train:
        k_crop_y, k_crop_x, k_flip = jax.random.split(rng, 3)
        off_y = jax.random.randint(k_crop_y, (b,), 0, h - crop_h + 1)
        off_x = jax.random.randint(k_crop_x, (b,), 0, w - crop_w + 1)

        def crop_one(img, oy, ox):
            return jax.lax.dynamic_slice(img, (oy, ox, 0),
                                         (crop_h, crop_w, c))

        x = jax.vmap(crop_one)(x, off_y, off_x)
        flip = jax.random.bernoulli(k_flip, 0.5, (b,))
        x = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)
    else:
        oy, ox = (h - crop_h) // 2, (w - crop_w) // 2
        x = x[:, oy:oy + crop_h, ox:ox + crop_w, :]
    return x.astype(dtype)


def resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Device-side bilinear resize (jax.image; NOT PIL-exact — training only)."""
    return jax.image.resize(x, x.shape[:-3] + (out_h, out_w, x.shape[-1]),
                            method="bilinear")
