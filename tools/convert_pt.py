#!/usr/bin/env python
"""Convert reference Council-GAN torch checkpoints (gen_*.pt) into councilx
.npz generator params — shim over councilx.cli.convert (installed entry
point: ``councilx-convert-pt``); the conversion logic lives in
councilx.ckpt.torch_convert so installed users get it without the repo
checkout.

    python tools/convert_pt.py --pt gen_00100000.pt \
        --config configs/galsses_council_folder.yaml --out gen.npz
"""

from __future__ import annotations

from councilx.ckpt.torch_convert import (  # noqa: F401  (re-exports: the
    convert_reference_gen_pt,              # historical import site for
    extract_member_state_dicts)            # these helpers was this module)
from councilx.cli.convert import main

# backwards-compatible alias (pre-packaging name)
_extract_member_sds = extract_member_state_dicts

if __name__ == "__main__":
    main()
