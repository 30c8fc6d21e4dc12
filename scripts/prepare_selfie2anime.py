#!/usr/bin/env python
"""Arrange the selfie2anime dataset (U-GAT-IT release) for councilx.

Reference parity: the Onr/Council-GAN README's anime dataset step — the
U-GAT-IT selfie2anime release already ships trainA/trainB/testA/testB; this
script validates the layout (or extracts a zip) and links/copies it into
place so configs can point ``data_root`` at it.

Usage:
  python scripts/prepare_selfie2anime.py --src /data/selfie2anime[.zip] \
      --out datasets/selfie2anime [--link]
"""

import argparse
import os
import shutil
import zipfile

SPLITS = ("trainA", "trainB", "testA", "testB")


def prepare(src, out, link=False):
    if src.endswith(".zip"):
        with zipfile.ZipFile(src) as zf:
            zf.extractall(out)
        root = out
        # the zip may nest a single top-level dir
        entries = os.listdir(out)
        if len(entries) == 1 and os.path.isdir(os.path.join(out, entries[0])):
            root = os.path.join(out, entries[0])
            for s in SPLITS:
                if os.path.isdir(os.path.join(root, s)):
                    shutil.move(os.path.join(root, s), os.path.join(out, s))
    else:
        os.makedirs(out, exist_ok=True)
        for s in SPLITS:
            sdir = os.path.join(src, s)
            if not os.path.isdir(sdir):
                raise SystemExit(f"missing split folder: {sdir}")
            dst = os.path.join(out, s)
            if os.path.exists(dst):
                continue
            if link:
                os.symlink(os.path.abspath(sdir), dst)
            else:
                shutil.copytree(sdir, dst)
    counts = {}
    for s in SPLITS:
        d = os.path.join(out, s)
        counts[s] = len(os.listdir(d)) if os.path.isdir(d) else 0
    return counts


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src", required=True,
                    help="extracted selfie2anime dir or the release zip")
    ap.add_argument("--out", required=True)
    ap.add_argument("--link", action="store_true")
    args = ap.parse_args()
    print(prepare(args.src, args.out, link=args.link))


if __name__ == "__main__":
    main()
