#!/usr/bin/env python
"""Split CelebA into unpaired A/B domain folders by a binary attribute.

Reference parity: the Onr/Council-GAN README's dataset-prep step — CelebA
attribute split (Male for male2female, Eyeglasses for glasses removal) into
trainA/trainB (+ testA/testB) folder pairs consumed by the folder datasets.

This environment has no network access, so the script takes an already-
downloaded CelebA as input:

  img_align_celeba/          (aligned jpgs)
  list_attr_celeba.txt       (202599 rows, header with 40 attribute names)
  list_eval_partition.txt    (image -> 0 train / 1 val / 2 test)

Usage:
  python scripts/prepare_celeba.py --celeba_root /data/celeba \
      --attr Male --out datasets/male2female [--link] [--a_positive]

By Council-GAN convention: domain A = the attribute-POSITIVE class being
edited away/translated from (Male=+1 for m2f, Eyeglasses=+1 for glasses),
domain B = the negative class. --a_positive flips it if needed.
"""

import argparse
import os
import shutil
import sys


def parse_attr_file(path):
    """-> (attr_names, {filename: {attr: +1/-1}}) from list_attr_celeba.txt."""
    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    # first line may be the row count (original format) — skip if numeric
    start = 1 if lines[0].isdigit() else 0
    names = lines[start].split()
    table = {}
    for ln in lines[start + 1:]:
        parts = ln.split()
        fname, vals = parts[0], parts[1:]
        table[fname] = {n: int(v) for n, v in zip(names, vals)}
    return names, table


def parse_partition_file(path):
    """-> {filename: 0|1|2} from list_eval_partition.txt (missing file ->
    everything lands in train)."""
    out = {}
    with open(path) as f:
        for ln in f:
            parts = ln.split()
            if len(parts) >= 2:
                out[parts[0]] = int(parts[1])
    return out


def split(celeba_root, attr, out_dir, a_positive=True, link=False,
          img_dirname="img_align_celeba"):
    attr_path = os.path.join(celeba_root, "list_attr_celeba.txt")
    part_path = os.path.join(celeba_root, "list_eval_partition.txt")
    img_dir = os.path.join(celeba_root, img_dirname)
    names, table = parse_attr_file(attr_path)
    if attr not in names:
        raise SystemExit(f"attribute {attr!r} not in {names}")
    partition = (parse_partition_file(part_path)
                 if os.path.exists(part_path) else {})

    counts = {}
    place = os.symlink if link else shutil.copy2
    for split_name in ("trainA", "trainB", "testA", "testB"):
        os.makedirs(os.path.join(out_dir, split_name), exist_ok=True)
    for fname, attrs in table.items():
        src = os.path.join(img_dir, fname)
        if not os.path.exists(src):
            continue
        positive = attrs[attr] > 0
        domain = ("A" if positive == a_positive else "B")
        part = "test" if partition.get(fname, 0) == 2 else "train"
        dst_dir = f"{part}{domain}"
        dst = os.path.join(out_dir, dst_dir, fname)
        if not os.path.exists(dst):
            place(os.path.abspath(src), dst)
        counts[dst_dir] = counts.get(dst_dir, 0) + 1
    return counts


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--celeba_root", required=True)
    ap.add_argument("--attr", required=True,
                    help="e.g. Male or Eyeglasses")
    ap.add_argument("--out", required=True)
    ap.add_argument("--a_positive", action="store_true", default=True,
                    help="domain A = attribute-positive images (default)")
    ap.add_argument("--a_negative", dest="a_positive", action="store_false")
    ap.add_argument("--link", action="store_true",
                    help="symlink instead of copy")
    ap.add_argument("--img_dirname", default="img_align_celeba")
    args = ap.parse_args()
    counts = split(args.celeba_root, args.attr, args.out,
                   a_positive=args.a_positive, link=args.link,
                   img_dirname=args.img_dirname)
    print(counts or "no images found", file=sys.stdout)


if __name__ == "__main__":
    main()
