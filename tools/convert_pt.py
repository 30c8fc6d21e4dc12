#!/usr/bin/env python
"""Convert reference Council-GAN torch checkpoints (gen_*.pt) into councilx
.npz generator params.

The conversion logic lives in councilx.ckpt.torch_convert (so installed
users get it without the repo checkout); this tool is the CLI:

    python tools/convert_pt.py --pt gen_00100000.pt \
        --config configs/galsses_council_folder.yaml --out gen.npz
"""

from __future__ import annotations

import argparse
import sys

from councilx.ckpt.torch_convert import (  # noqa: F401  (re-exports: the
    convert_reference_gen_pt,              # historical import site for
    extract_member_state_dicts)            # these helpers was this module)

# backwards-compatible alias (pre-packaging name)
_extract_member_sds = extract_member_state_dicts


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pt", required=True)
    p.add_argument("--config", required=True)
    p.add_argument("--out", required=True, help=".npz output path")
    p.add_argument("--direction", default="a2b", choices=["a2b", "b2a"])
    args = p.parse_args()

    from councilx.ckpt.manager import save_params_npz
    from councilx.config import load_config

    cfg = load_config(args.config)
    params = convert_reference_gen_pt(args.pt, cfg, args.direction)
    save_params_npz(args.out, params)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
