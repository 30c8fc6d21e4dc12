"""Batched feature extraction for FID/KID.

PIL-exact preprocessing (bilinear resize to 299, [-1,1] normalize) matching
pytorch-fid's input convention — the parity-eval rule from SURVEY.md hard
part #5 says quality evals bypass the on-device augmentation path.
"""

from __future__ import annotations

import os
from typing import Callable, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from councilx.data.dataset import is_image_file


def u8_to_inception_inputs(u8: np.ndarray, size: int = 299) -> np.ndarray:
    """(B,H,W,3) uint8 -> (B,size,size,3) float32 in [-1,1], PIL bilinear —
    the single array-level home of the pytorch-fid input convention (the
    file-based iter_image_batches below applies the identical transform to
    PIL images; keep the two in lockstep)."""
    from PIL import Image

    out: List[np.ndarray] = []
    for row in np.asarray(u8):
        img = Image.fromarray(row).resize((size, size), Image.BILINEAR)
        out.append(np.asarray(img, dtype=np.float32) / 127.5 - 1.0)
    return np.stack(out)


def iter_image_batches(folder: str, batch_size: int = 32,
                       size: int = 299) -> Iterable[np.ndarray]:
    """Yield (B, size, size, 3) float32 batches in [-1, 1], PIL-resized."""
    from PIL import Image

    paths = sorted(
        os.path.join(root, f)
        for root, _, files in os.walk(folder)
        for f in files if is_image_file(f))
    if not paths:
        raise FileNotFoundError(f"no images under {folder}")
    batch: List[np.ndarray] = []
    for p in paths:
        img = Image.open(p).convert("RGB").resize((size, size),
                                                  Image.BILINEAR)
        batch.append(np.asarray(img, dtype=np.float32) / 127.5 - 1.0)
        if len(batch) == batch_size:
            yield np.stack(batch)
            batch = []
    if batch:
        yield np.stack(batch)


def extract_features(apply_fn: Callable, batches: Iterable[np.ndarray],
                     pad_batch: Optional[int] = None) -> np.ndarray:
    """Run a jitted (B,H,W,3)->(B,D) feature fn over batches -> (N, D).

    Ragged final batches are zero-padded to ``pad_batch`` (static shapes for
    XLA) and the padding rows dropped after.
    """
    feats: List[np.ndarray] = []
    for b in batches:
        n = b.shape[0]
        if pad_batch and n < pad_batch:
            b = np.concatenate(
                [b, np.zeros((pad_batch - n,) + b.shape[1:], b.dtype)])
        out = np.asarray(jax.device_get(apply_fn(jnp.asarray(b))))
        feats.append(out[:n])
    return np.concatenate(feats)


def folder_features(folder: str, model, variables, batch_size: int = 32
                    ) -> np.ndarray:
    """Extract (N, 2048) Inception features for every image in a folder."""
    fn = jax.jit(lambda x: model.apply(variables, x))
    return extract_features(
        fn, iter_image_batches(folder, batch_size), pad_batch=batch_size)
