#!/usr/bin/env python
"""Convert a torch InceptionV3 state_dict to the flax .npz used by tools/fid.py.

Accepts either a torchvision ``inception_v3`` state_dict or pytorch-fid's
``pt_inception-2015-12-05`` FIDInceptionV3 state_dict (same tensor names for
the backbone). The classifier head (``fc``) and ``AuxLogits`` are dropped —
FID only needs the pool3 features.

Usage: python tools/convert_inception_pt.py weights.pth out.npz
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def convert(state_dict) -> dict:
    flat = {}
    for name, tensor in state_dict.items():
        if name.startswith(("fc.", "AuxLogits.")):
            continue
        arr = np.asarray(tensor)
        parts = name.split(".")
        # e.g. Mixed_5b.branch1x1.conv.weight / Conv2d_1a_3x3.bn.running_mean
        *scope, leaf = parts
        path = "/".join(scope)
        if leaf == "weight" and parts[-2] == "conv":
            # torch conv OIHW -> flax HWIO
            flat[f"params/{path}/kernel"] = arr.transpose(2, 3, 1, 0)
        elif leaf == "weight" and parts[-2] == "bn":
            flat[f"params/{path}/scale"] = arr
        elif leaf == "bias" and parts[-2] == "bn":
            flat[f"params/{path}/bias"] = arr
        elif leaf == "running_mean":
            flat[f"batch_stats/{path}/mean"] = arr
        elif leaf == "running_var":
            flat[f"batch_stats/{path}/var"] = arr
        elif leaf == "num_batches_tracked":
            continue
        else:
            raise ValueError(f"unrecognized tensor: {name}")
    return flat


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("pth")
    ap.add_argument("out_npz")
    args = ap.parse_args()

    import torch  # CPU-only conversion dependency

    obj = torch.load(args.pth, map_location="cpu", weights_only=False)
    state_dict = obj.get("state_dict", obj) if isinstance(obj, dict) else \
        obj.state_dict()
    flat = convert(state_dict)
    np.savez(args.out_npz, **flat)
    print(f"wrote {len(flat)} tensors to {args.out_npz}")


if __name__ == "__main__":
    main()
