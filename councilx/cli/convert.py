"""Reference-checkpoint conversion entry point:

    councilx-convert-pt --pt gen_00100000.pt \
        --config configs/galsses_council_folder.yaml --out gen.npz

Converts a reference Council-GAN torch generator checkpoint (gen_*.pt,
per-member state dicts — trainer_council.py::save layout, SURVEY.md §3.4)
into a councilx .npz of stacked (N, ...) flax params. Requires torch
(``pip install councilx[torch]``). From a source checkout:
``python tools/convert_pt.py ...``.
"""

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pt", required=True)
    p.add_argument("--config", required=True)
    p.add_argument("--out", required=True, help=".npz output path")
    p.add_argument("--direction", default="a2b", choices=["a2b", "b2a"])
    args = p.parse_args()

    from councilx.ckpt.manager import save_params_npz
    from councilx.ckpt.torch_convert import convert_reference_gen_pt
    from councilx.config import load_config

    cfg = load_config(args.config)
    params = convert_reference_gen_pt(args.pt, cfg, args.direction)
    save_params_npz(args.out, params)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
