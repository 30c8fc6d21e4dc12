"""Datasets: folder / filelist image sources (reference data.py).

Reference parity: data.py::{ImageFolder, ImageFilelist, is_image_file,
default_loader, make_dataset}. Unpaired domains are plain folders of images
(trainA/trainB, testA/testB).

Host-side processing is deliberately minimal and SHAPE-STATIC: decode with
PIL, resize the shorter side to ``new_size`` (PIL bilinear, matching
torchvision.Resize), center-crop to ``new_size`` square, return HWC uint8.
All randomized augmentation happens on-device (see ondevice.py). For
parity/FID evals the same PIL path is used with the eval crop size so the
resize kernel matches torchvision exactly (SURVEY.md hard-part #5).
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".pgm", ".webp")


def is_image_file(filename: str) -> bool:
    """Reference: data.py::is_image_file."""
    return filename.lower().endswith(IMG_EXTENSIONS)


def list_images(root: str) -> List[str]:
    """Recursively list image files under ``root`` (data.py::make_dataset),
    sorted for determinism."""
    paths = []
    for dirpath, _, filenames in os.walk(root):
        for fname in sorted(filenames):
            if is_image_file(fname):
                paths.append(os.path.join(dirpath, fname))
    return sorted(paths)


def resize_crop_image(img, new_size: int, crop: Optional[int] = None
                      ) -> np.ndarray:
    """Opened PIL image -> shorter-side resize (bilinear,
    torchvision.Resize semantics) -> center crop -> HWC uint8. The ONE
    implementation of the CLI/server preprocessing (serve.py uses it on
    request bytes; the datasets on paths)."""
    from PIL import Image

    img = img.convert("RGB")
    w, h = img.size
    if min(w, h) != new_size:
        if w <= h:
            nw, nh = new_size, max(1, round(h * new_size / w))
        else:
            nw, nh = max(1, round(w * new_size / h)), new_size
        img = img.resize((nw, nh), Image.BILINEAR)
    c = crop if crop is not None else new_size
    w, h = img.size
    left = (w - c) // 2
    top = (h - c) // 2
    img = img.crop((left, top, left + c, top + c))
    return np.asarray(img, dtype=np.uint8)


def _load_resize_crop(path: str, new_size: int, crop: Optional[int] = None
                      ) -> np.ndarray:
    """PIL decode from a path, then :func:`resize_crop_image`."""
    from PIL import Image

    return resize_crop_image(Image.open(path), new_size, crop)


class ImageFolderDataset:
    """Reference: data.py::ImageFolder — all images under a folder."""

    def __init__(self, root: str, new_size: int,
                 crop: Optional[int] = None, return_paths: bool = False):
        self.root = root
        self.paths = list_images(root)
        if not self.paths:
            raise FileNotFoundError(f"no images found under {root}")
        self.new_size = new_size
        self.crop = crop
        self.return_paths = return_paths

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, idx: int):
        arr = _load_resize_crop(self.paths[idx], self.new_size, self.crop)
        if self.return_paths:
            return arr, self.paths[idx]
        return arr


class ImageFilelistDataset:
    """Reference: data.py::ImageFilelist — image paths listed in a text file
    (one relative path per line, optionally 'path label')."""

    def __init__(self, root: str, flist: str, new_size: int,
                 crop: Optional[int] = None, return_paths: bool = False):
        with open(flist) as f:
            rels = [line.strip().split()[0] for line in f if line.strip()]
        self.paths = [os.path.join(root, r) for r in rels]
        self.new_size = new_size
        self.crop = crop
        self.return_paths = return_paths

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, idx: int):
        arr = _load_resize_crop(self.paths[idx], self.new_size, self.crop)
        if self.return_paths:
            return arr, self.paths[idx]
        return arr


class SyntheticImageDataset:
    """Deterministic synthetic images for tests and benchmarks — shaped and
    typed exactly like the folder datasets, no files needed."""

    def __init__(self, size: int, new_size: int, seed: int = 0):
        self.size = size
        self.new_size = new_size
        self.seed = seed

    def __len__(self) -> int:
        return self.size

    def __getitem__(self, idx: int) -> np.ndarray:
        rng = np.random.RandomState(self.seed + idx)
        return rng.randint(0, 256, size=(self.new_size, self.new_size, 3),
                           dtype=np.uint8)
