"""Convert reference (MUNIT / Council-GAN) PyTorch state dicts to councilx
flax parameter pytrees.

The reference saves per-member torch ``state_dict()``s (trainer_council.py::
save -> gen_%08d.pt with keys like ``enc_content.model.0.conv.weight``).
These functions take a ``{name: np.ndarray}`` mapping (torch tensors already
converted to numpy — keeps torch out of the core package) and emit the flax
params dict for councilx.nn.AdaINGen / MsImageDis.

Layout conversions:
  torch Conv2d weight (O, I, kH, kW) -> flax kernel (kH, kW, I, O)
  torch Linear weight (O, I)         -> flax kernel (I, O)
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

Array = np.ndarray
SD = Mapping[str, Array]


def _conv_kernel(w: Array) -> Array:
    return np.transpose(w, (2, 3, 1, 0))


def _conv_block(sd: SD, prefix: str, norm: str = "none") -> Dict[str, Any]:
    out: Dict[str, Any] = {"Conv_0": {
        "kernel": _conv_kernel(sd[f"{prefix}.conv.weight"]),
        "bias": sd[f"{prefix}.conv.bias"],
    }}
    if norm == "ln":
        out["MunitLayerNorm_0"] = {
            "gamma": sd[f"{prefix}.norm.gamma"],
            "beta": sd[f"{prefix}.norm.beta"],
        }
    return out


def _res_blocks(sd: SD, prefix: str, n_res: int, norm: str = "in"
                ) -> Dict[str, Any]:
    blocks: Dict[str, Any] = {}
    for i in range(n_res):
        blocks[f"ResBlock_{i}"] = {
            "Conv2dBlock_0": _conv_block(sd, f"{prefix}.model.{i}.model.0",
                                         norm=norm),
            "Conv2dBlock_1": _conv_block(sd, f"{prefix}.model.{i}.model.1",
                                         norm=norm),
        }
    return blocks


def convert_content_encoder(sd: SD, prefix: str = "enc_content",
                            n_downsample: int = 2, n_res: int = 4
                            ) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for i in range(1 + n_downsample):
        out[f"Conv2dBlock_{i}"] = _conv_block(sd, f"{prefix}.model.{i}")
    out["ResBlocks_0"] = _res_blocks(
        sd, f"{prefix}.model.{1 + n_downsample}", n_res, norm="in")
    return out


def convert_style_encoder(sd: SD, prefix: str = "enc_style",
                          n_downsample: int = 2) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    n_blocks = 1 + 2 + (n_downsample - 2)
    for i in range(n_blocks):
        out[f"Conv2dBlock_{i}"] = _conv_block(sd, f"{prefix}.model.{i}")
    final_idx = n_blocks + 1  # skip the AdaptiveAvgPool2d entry
    out["Conv_0"] = {
        "kernel": _conv_kernel(sd[f"{prefix}.model.{final_idx}.weight"]),
        "bias": sd[f"{prefix}.model.{final_idx}.bias"],
    }
    return out


def convert_decoder(sd: SD, prefix: str = "dec", n_upsample: int = 2,
                    n_res: int = 4) -> Dict[str, Any]:
    out: Dict[str, Any] = {
        "ResBlocks_0": _res_blocks(sd, f"{prefix}.model.0", n_res,
                                   norm="none"),  # adain has no stored params
    }
    # torch layout: model.0 = ResBlocks, then (Upsample, Conv2dBlock) pairs,
    # then the final Conv2dBlock
    for u in range(n_upsample):
        t_idx = 1 + 2 * u + 1  # skip the parameterless Upsample
        out[f"Conv2dBlock_{u}"] = _conv_block(sd, f"{prefix}.model.{t_idx}",
                                              norm="ln")
    final_idx = 1 + 2 * n_upsample
    out[f"Conv2dBlock_{n_upsample}"] = _conv_block(
        sd, f"{prefix}.model.{final_idx}")
    return out


def convert_mlp(sd: SD, prefix: str = "mlp", n_blk: int = 3
                ) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for i in range(n_blk):
        out[f"LinearBlock_{i}"] = {"Dense_0": {
            "kernel": sd[f"{prefix}.model.{i}.fc.weight"].T,
            "bias": sd[f"{prefix}.model.{i}.fc.bias"],
        }}
    return out


def convert_adain_gen(sd: SD, n_downsample: int = 2, n_res: int = 4,
                      mlp_n_blk: int = 3) -> Dict[str, Any]:
    """Full AdaINGen state dict -> flax params (for AdaINGen.apply)."""
    return {
        "enc_content": convert_content_encoder(sd, "enc_content",
                                               n_downsample, n_res),
        "enc_style": convert_style_encoder(sd, "enc_style", n_downsample),
        "dec": convert_decoder(sd, "dec", n_downsample, n_res),
        "mlp": convert_mlp(sd, "mlp", mlp_n_blk),
    }


def convert_ms_image_dis(sd: SD, n_layer: int = 4, num_scales: int = 3
                         ) -> Dict[str, Any]:
    """MsImageDis state dict (cnns.S.L.*) -> flax params."""
    out: Dict[str, Any] = {}
    for s in range(num_scales):
        scale: Dict[str, Any] = {}
        for layer in range(n_layer):
            scale[f"Conv2dBlock_{layer}"] = _conv_block(
                sd, f"cnns.{s}.{layer}")
        scale["Conv_0"] = {
            "kernel": _conv_kernel(sd[f"cnns.{s}.{n_layer}.weight"]),
            "bias": sd[f"cnns.{s}.{n_layer}.bias"],
        }
        out[f"scale_{s}"] = scale
    return out


def torch_state_dict_to_numpy(state_dict) -> Dict[str, Array]:
    """Detach a torch state dict to plain numpy (host-side tool helper)."""
    return {k: np.asarray(v.detach().cpu().numpy())
            for k, v in state_dict.items()}
