"""Sample-sheet image grids + static HTML index.

Reference parity: utils.py::{write_2images, __write_images, write_html}
(torchvision.utils.make_grid sample sheets + an index.html of saved samples).
Implemented host-side with numpy + PIL; inputs are NHWC float in [-1, 1].
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from councilx.inference.translate import denormalize_to_uint8


def make_grid(images: np.ndarray, nrow: int = 8, padding: int = 2,
              pad_value: int = 0) -> np.ndarray:
    """(K, H, W, C) uint8 -> one (gh, gw, C) uint8 grid image."""
    k, h, w, c = images.shape
    ncol = min(nrow, k)
    nrows = (k + ncol - 1) // ncol
    gh = nrows * (h + padding) + padding
    gw = ncol * (w + padding) + padding
    grid = np.full((gh, gw, c), pad_value, dtype=np.uint8)
    for i in range(k):
        r, col = divmod(i, ncol)
        y = padding + r * (h + padding)
        x = padding + col * (w + padding)
        grid[y:y + h, x:x + w] = images[i]
    return grid


def save_image_grid(path: str, images: np.ndarray, nrow: int = 8) -> None:
    """images: NHWC float in [-1,1] (or uint8). Saves a single grid image."""
    from PIL import Image

    if images.dtype != np.uint8:
        images = denormalize_to_uint8(images)
    Image.fromarray(make_grid(images, nrow=nrow)).save(path)


def write_sample_sheet(image_dir: str, name: str, x_in: np.ndarray,
                       member_outputs: np.ndarray,
                       masks: Optional[np.ndarray] = None) -> str:
    """One row per council member under a row of inputs — the TPU-side
    counterpart of the reference's write_2images sheets."""
    rows = [x_in] + [member_outputs[i] for i in range(member_outputs.shape[0])]
    if masks is not None:
        rows += [np.repeat(masks[i] * 2.0 - 1.0, 3, axis=-1)
                 for i in range(masks.shape[0])]
    stacked = np.concatenate(rows, axis=0)
    path = os.path.join(image_dir, f"{name}.jpg")
    save_image_grid(path, stacked, nrow=x_in.shape[0])
    return path


def write_html(html_path: str, image_dir: str, iterations: int,
               image_save_iter: int) -> None:
    """Static index of saved sample sheets (reference utils.py::write_html)."""
    rel = os.path.basename(image_dir)
    rows = []
    for it in range(iterations, -1, -image_save_iter if image_save_iter else -1):
        for name in (f"train_{it:08d}", f"test_{it:08d}"):
            fpath = os.path.join(image_dir, f"{name}.jpg")
            if os.path.exists(fpath):
                rows.append(f"<h3>iteration {it} — {name}</h3>"
                            f'<img src="{rel}/{name}.jpg" /><br/>')
        if image_save_iter == 0:
            break
    html = ("<!DOCTYPE html><html><head><title>samples</title></head>"
            "<body>" + "\n".join(rows) + "</body></html>")
    with open(html_path, "w") as f:
        f.write(html)
