#!/usr/bin/env python
"""Export a councilx checkpoint back to reference-layout torch .pt files.

The inverse of tools/convert_pt.py: writes ``gen_<step>.pt``,
``dis_<step>.pt`` and ``dis_council_<step>.pt`` whose payloads are
``{"<direction>_<member>": state_dict}`` mappings in the reference module
naming (trainer_council.py::save layout family — the same keying
convert_pt.py accepts first), so a TPU-trained council can be resumed or
evaluated with the original PyTorch tooling.

Usage:
    python tools/export_pt.py --config configs/smoke_tiny.yaml \
        --checkpoint outputs/run/checkpoints --out /tmp/export
"""

from __future__ import annotations

import argparse
import os
import sys


def main():
    sys.path.insert(0, ".")
    from councilx.utils.platform import apply_env_platform
    apply_env_platform()

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", required=True,
                   help="orbax checkpoint root (outputs/<run>/checkpoints)")
    p.add_argument("--out", required=True, help="output directory")
    args = p.parse_args()

    import jax
    import torch

    from councilx.ckpt.manager import restore_checkpoint
    from councilx.ckpt.torch_export import (export_adain_gen,
                                            export_ms_image_dis,
                                            unstack_members)
    from councilx.config import load_config
    from councilx.train.trainer import CouncilTrainer

    cfg = load_config(args.config)
    trainer = CouncilTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state, step = restore_checkpoint(args.checkpoint, state)
    state = jax.device_get(state)

    g, d = cfg.gen, cfg.dis
    payloads = {"gen": {}, "dis": {}, "dis_council": {}}
    for direction in trainer.directions:
        groups = state.params[direction]
        for i, member in enumerate(unstack_members(groups["gen"])):
            payloads["gen"][f"{direction}_{i}"] = {
                k: torch.from_numpy(v) for k, v in export_adain_gen(
                    member, n_downsample=g.n_downsample, n_res=g.n_res,
                    mlp_n_blk=g.mlp_n_blk, dim=g.dim).items()}
        for name, group in (("dis", "dis"), ("dis_council", "cdis")):
            for i, member in enumerate(unstack_members(groups[group])):
                payloads[name][f"{direction}_{i}"] = {
                    k: torch.from_numpy(v) for k, v in export_ms_image_dis(
                        member, n_layer=d.n_layer,
                        num_scales=d.num_scales).items()}

    os.makedirs(args.out, exist_ok=True)
    for name, payload in payloads.items():
        path = os.path.join(args.out, f"{name}_{step:08d}.pt")
        torch.save(payload, path)
        print(f"wrote {path} ({len(payload)} member state dicts)")


if __name__ == "__main__":
    main()
