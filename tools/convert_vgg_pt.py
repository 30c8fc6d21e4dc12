#!/usr/bin/env python
"""Convert a torch VGG16 state_dict to the flax .npz used by the perceptual
loss (councilx/nn/vgg.py).

Accepts torchvision ``vgg16().features`` state_dicts (keys ``features.N.*``)
or plain ``convX_Y.weight`` naming. Only the 13 conv layers are kept.

Usage: python tools/convert_vgg_pt.py vgg16.pth out.npz
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

# torchvision features-index -> our layer name
_IDX2NAME = {
    0: "conv1_1", 2: "conv1_2",
    5: "conv2_1", 7: "conv2_2",
    10: "conv3_1", 12: "conv3_2", 14: "conv3_3",
    17: "conv4_1", 19: "conv4_2", 21: "conv4_3",
    24: "conv5_1", 26: "conv5_2", 28: "conv5_3",
}


def convert(state_dict) -> dict:
    flat = {}
    for name, tensor in state_dict.items():
        arr = np.asarray(tensor)
        parts = name.split(".")
        if parts[0] == "features" and int(parts[1]) in _IDX2NAME:
            layer, leaf = _IDX2NAME[int(parts[1])], parts[2]
        elif parts[0].startswith("conv") and len(parts) == 2:
            layer, leaf = parts
        else:
            continue
        if leaf == "weight":
            flat[f"{layer}/kernel"] = arr.transpose(2, 3, 1, 0)  # OIHW->HWIO
        elif leaf == "bias":
            flat[f"{layer}/bias"] = arr
    if len(flat) != 26:
        raise ValueError(f"expected 26 tensors (13 convs), got {len(flat)}")
    return flat


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("pth")
    ap.add_argument("out_npz")
    args = ap.parse_args()

    import torch

    obj = torch.load(args.pth, map_location="cpu", weights_only=False)
    state_dict = obj.get("state_dict", obj) if isinstance(obj, dict) else \
        obj.state_dict()
    flat = convert(state_dict)
    np.savez(args.out_npz, **flat)
    print(f"wrote {len(flat)} tensors to {args.out_npz}")


if __name__ == "__main__":
    main()
