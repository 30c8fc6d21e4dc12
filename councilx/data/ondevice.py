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


@partial(jax.jit, static_argnames=("crop_h", "crop_w", "train", "dtype",
                                   "row_offset"))
def augment_batch(rng: jax.Array, batch_u8: jnp.ndarray, crop_h: int,
                  crop_w: int, train: bool = True,
                  dtype=jnp.float32, row_offset: int = 0) -> jnp.ndarray:
    """(B, H, W, C) uint8 -> (B, crop_h, crop_w, C) float in [-1, 1].

    train=True: per-sample random crop + random horizontal flip.
    train=False: center crop only.

    Randomness is keyed PER GLOBAL ROW — fold_in(rng, row_offset + i) — so a
    multi-host run (each process augmenting its local slice with
    ``row_offset`` = its first global row) produces bit-identical pixels to
    a single-process run over the whole global batch. The multi-host
    equivalence test (tests/test_multihost.py) relies on this.
    """
    b, h, w, c = batch_u8.shape
    x = normalize_batch(batch_u8, dtype=jnp.float32)

    if train:
        keys = jax.vmap(lambda r: jax.random.fold_in(rng, r))(
            jnp.arange(b, dtype=jnp.int32) + row_offset)

        def aug_one(img, key):
            k_y, k_x, k_flip = jax.random.split(key, 3)
            oy = jax.random.randint(k_y, (), 0, h - crop_h + 1)
            ox = jax.random.randint(k_x, (), 0, w - crop_w + 1)
            out = jax.lax.dynamic_slice(img, (oy, ox, 0),
                                        (crop_h, crop_w, c))
            return jnp.where(jax.random.bernoulli(k_flip),
                             out[:, ::-1, :], out)

        x = jax.vmap(aug_one)(x, keys)
    else:
        oy, ox = (h - crop_h) // 2, (w - crop_w) // 2
        x = x[:, oy:oy + crop_h, ox:ox + crop_w, :]
    return x.astype(dtype)


def resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Device-side bilinear resize (jax.image; NOT PIL-exact — training only)."""
    return jax.image.resize(x, x.shape[:-3] + (out_h, out_w, x.shape[-1]),
                            method="bilinear")
