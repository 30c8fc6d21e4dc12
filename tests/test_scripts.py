"""Tests for the dataset-preparation scripts."""

import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scripts.prepare_celeba import parse_attr_file, split  # noqa: E402
from scripts.prepare_selfie2anime import prepare  # noqa: E402


def _make_celeba(root, n=8):
    img_dir = root / "img_align_celeba"
    img_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    rows = []
    parts = []
    for i in range(n):
        fname = f"{i:06d}.jpg"
        Image.fromarray(rng.randint(0, 255, (16, 16, 3), np.uint8)).save(
            img_dir / fname)
        male = 1 if i % 2 == 0 else -1
        glasses = 1 if i < 2 else -1
        rows.append(f"{fname} {male} {glasses}")
        parts.append(f"{fname} {2 if i >= n - 2 else 0}")
    (root / "list_attr_celeba.txt").write_text(
        f"{n}\nMale Eyeglasses\n" + "\n".join(rows) + "\n")
    (root / "list_eval_partition.txt").write_text("\n".join(parts) + "\n")


def test_celeba_attr_parse_and_split(tmp_path):
    _make_celeba(tmp_path / "celeba")
    names, table = parse_attr_file(str(tmp_path / "celeba"
                                       / "list_attr_celeba.txt"))
    assert names == ["Male", "Eyeglasses"]
    assert table["000000.jpg"]["Male"] == 1

    out = tmp_path / "m2f"
    counts = split(str(tmp_path / "celeba"), "Male", str(out), link=True)
    # 8 imgs: evens male; last two are test (000006 male, 000007 female)
    assert counts == {"trainA": 3, "trainB": 3, "testA": 1, "testB": 1}
    assert len(os.listdir(out / "trainA")) == 3
    # idempotent re-run
    counts2 = split(str(tmp_path / "celeba"), "Male", str(out), link=True)
    assert counts2 == counts


def test_celeba_polarity_flip(tmp_path):
    _make_celeba(tmp_path / "celeba")
    out = tmp_path / "flipped"
    counts = split(str(tmp_path / "celeba"), "Male", str(out),
                   a_positive=False, link=True)
    assert counts["trainA"] == 3  # females now domain A (3 train females)


def test_selfie2anime_layout(tmp_path):
    src = tmp_path / "src"
    for s in ("trainA", "trainB", "testA", "testB"):
        (src / s).mkdir(parents=True)
        (src / s / "x.jpg").write_bytes(b"\xff\xd8fake")
    out = tmp_path / "out"
    counts = prepare(str(src), str(out), link=True)
    assert counts == {"trainA": 1, "trainB": 1, "testA": 1, "testB": 1}
