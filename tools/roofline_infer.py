#!/usr/bin/env python
"""Analytic HBM bytes-per-image roofline for single-member inference
(VERDICT r2 item 2 — the serving north-star bandwidth analysis).

The axon TPU runtime's `compiled.cost_analysis()` reports FLOPs but no
"bytes accessed", so the HBM side is computed analytically from the model
itself (no hardware needed — runs under eval_shape):

  * params:   actual parameter tree size at the serving dtype
  * acts:     every flax module output captured via capture_intermediates
              under jax.eval_shape -> total intermediate bytes

Two traffic estimates bracket reality:
  * fused floor:   params + input + output (perfect fusion, everything else
                   stays in VMEM — unreachable: VMEM is ~128 MB/core)
  * unfused est.:  params + 2 x acts + input + output (every module output
                   round-trips HBM once — XLA's elementwise fusion does
                   better, conv outputs dominate either way)

Combine with a measured img/s (tools/bench_infer.py) to get achieved GB/s:
    GB/s = bytes_per_img * img_s / 1e9     vs the v5e's ~819 GB/s.

Env: ROOF_SIZE (256), ROOF_BATCH (128), ROOF_IMG_S (optional measured img/s
to fold into the printed roofline percentages).
"""

import json
import os
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from councilx.config import Config
from councilx.inference.translate import Translator
from councilx.nn.generator import AdaINGen

V5E_PEAK_HBM = 819e9
V5E_PEAK_BF16 = 197e12


def tree_bytes(tree) -> int:
    return sum(int(np.prod(l.shape)) * jnp.dtype(l.dtype).itemsize
               for l in jax.tree_util.tree_leaves(tree))


def main():
    size = int(os.environ.get("ROOF_SIZE", "256"))
    batch = int(os.environ.get("ROOF_BATCH", "128"))
    img_s = float(os.environ.get("ROOF_IMG_S", "0"))
    cfg = Config.from_dict({
        "batch_size": batch, "compute_dtype": "bfloat16",
        "council": {"council_size": 1, "council_w": 0.0},
        "focus_loss": {"focus_enabled": True},
        "gen": {"dim": 64, "mlp_dim": 256, "style_dim": 8,
                "n_downsample": 2, "n_res": 4},
        "new_size": size + 14, "crop_image_height": size,
        "crop_image_width": size,
    })
    tr = Translator(cfg)
    x = jax.ShapeDtypeStruct((batch, size, size, 3), jnp.bfloat16)
    z = jax.ShapeDtypeStruct((batch, cfg.gen.style_dim), jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    p_shapes = jax.eval_shape(
        lambda k: tr.gen.init(k, jnp.zeros((1, size, size, 3)))["params"],
        key)

    def fwd(params, x, z):
        c, st1 = tr.gen.apply(
            {"params": params}, x, method=AdaINGen.encode_content,
            capture_intermediates=lambda mdl, method: True)
        out, st2 = tr.gen.apply(
            {"params": params}, c, z, method=AdaINGen.decode,
            capture_intermediates=lambda mdl, method: True)
        return out, (st1["intermediates"], st2["intermediates"])

    out, inters = jax.eval_shape(fwd, p_shapes, x, z)

    # params at serving dtype (bf16-resident weights: 2 bytes/param)
    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(p_shapes))
    param_b = 2 * n_params
    act_b = tree_bytes(inters)
    io_b = tree_bytes([x, out])
    floor_b = param_b + io_b
    unfused_b = param_b + 2 * act_b + io_b

    rec = {
        "metric": "inference_hbm_roofline",
        "size": size, "batch": batch,
        "params_millions": round(n_params / 1e6, 2),
        "param_mbytes_bf16": round(param_b / 1e6, 1),
        "act_mbytes_per_img": round(act_b / batch / 1e6, 2),
        "io_mbytes_per_img": round(io_b / batch / 1e6, 2),
        "traffic_mbytes_per_img_fused_floor": round(floor_b / batch / 1e6, 2),
        "traffic_mbytes_per_img_unfused": round(unfused_b / batch / 1e6, 2),
    }
    if img_s:
        for name, b in (("fused_floor", floor_b), ("unfused", unfused_b)):
            bytes_s = b / batch * img_s
            rec[f"achieved_gbytes_s_{name}"] = round(bytes_s / 1e9, 1)
            rec[f"hbm_roofline_pct_{name}"] = round(
                100 * bytes_s / V5E_PEAK_HBM, 1)
    print(json.dumps(rec))
    return rec


if __name__ == "__main__":
    main()
