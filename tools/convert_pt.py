#!/usr/bin/env python
"""Convert reference Council-GAN torch checkpoints (gen_*.pt) into councilx
.npz generator params.

The reference saves per-member generator state dicts (trainer_council.py::
save); the exact outer dict keying is [VERIFY] (reference mount was empty) so
several plausible layouts are handled:
  * {'a2b_0': sd, 'a2b_1': sd, ...}   (per-member, per-direction)
  * {'a2b': [sd, ...]} / {'a2b': sd}  (MUNIT-style {'a': ..., 'b': ...})
  * {'0': sd, '1': sd} / [sd, ...]
  * a raw single state dict
Member state dicts are converted (ckpt/torch_convert.py) and stacked along a
leading council axis.

Usage:
    python tools/convert_pt.py --pt gen_00100000.pt \
        --config configs/galsses_council_folder.yaml --out gen.npz
"""

from __future__ import annotations

import argparse
import sys
from typing import Any, Dict, List

import numpy as np


def _extract_member_sds(payload, direction: str) -> List[Dict[str, Any]]:
    if isinstance(payload, (list, tuple)):
        return list(payload)
    if not isinstance(payload, dict):
        raise ValueError(f"unrecognized checkpoint payload: {type(payload)}")
    # raw state dict? (keys look like 'enc_content.model.0.conv.weight')
    if any("." in k for k in payload.keys()):
        return [payload]
    # direction-keyed
    keys = sorted(payload.keys())
    member_keys = [k for k in keys if k.startswith(f"{direction}_")]
    if member_keys:
        return [payload[k] for k in sorted(
            member_keys, key=lambda s: int(s.rsplit("_", 1)[1]))]
    short = {"a2b": "a", "b2a": "b"}[direction]
    for cand in (direction, short):
        if cand in payload:
            inner = payload[cand]
            return list(inner) if isinstance(inner, (list, tuple)) else [inner]
    if all(k.isdigit() for k in keys):
        return [payload[k] for k in sorted(keys, key=int)]
    raise ValueError(f"cannot find direction '{direction}' members among "
                     f"keys {keys}")


def convert_reference_gen_pt(pt_path: str, cfg, direction: str = "a2b"):
    """-> stacked (N, ...) flax params pytree for councilx.nn.AdaINGen."""
    import torch

    from councilx.ckpt.torch_convert import (convert_adain_gen,
                                             torch_state_dict_to_numpy)

    payload = torch.load(pt_path, map_location="cpu", weights_only=False)
    sds = _extract_member_sds(payload, direction)
    g = cfg.gen
    trees = [convert_adain_gen(torch_state_dict_to_numpy(
        sd if not hasattr(sd, "state_dict") else sd.state_dict()),
        n_downsample=g.n_downsample, n_res=g.n_res, mlp_n_blk=g.mlp_n_blk)
        for sd in sds]
    import jax
    return jax.tree_util.tree_map(lambda *ls: np.stack(ls), *trees)


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
