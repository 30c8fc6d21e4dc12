#!/usr/bin/env python
"""Batched inference throughput benchmark (north-star: batched serving).

The reference test_on_folder.py translates one image at a time (batch 1,
fresh CUDA launches). Here translation is one jitted batched call; this tool
measures images/sec for a single member and for all-members-at-once, and
reports BOTH rooflines — compute (bf16 peak FLOP/s) and HBM bandwidth —
using XLA's own cost analysis of the compiled executable for the FLOP and
bytes-accessed counts (falling back to the analytic ~71 GMAC/img model if
cost_analysis is unavailable through the runtime).

Env: INFER_BATCH (64) or INFER_SWEEP="16,32,64,128" (one JSON line each),
INFER_STEPS (20), INFER_SIZE (256), INFER_PALLAS (0), INFER_IN_PRECISION
(f32/mixed/bf16), INFER_QUANT (none/w8a8: int8 generator convs,
ops/quant.py), INFER_BF16_PARAMS (0/1: keep the weights RESIDENT in
bfloat16 — halves weight-read traffic vs casting f32 params every call),
INFER_ALL_MEMBERS (1; 0 skips the all-members call — its effective batch
is 4x and OOMs HBM beyond ~batch 128 at 256px).
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from councilx.config import Config
from councilx.inference.translate import Translator

V5E_PEAK_BF16 = 197e12       # FLOP/s
V5E_PEAK_HBM = 819e9         # bytes/s


def cost_analysis(jitted, *args):
    """(flops, bytes_accessed) from XLA's analysis of the compiled exe."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(
            ca.get("bytes accessed", 0.0))
    except Exception:
        return None, None


def run_one(batch, size, steps, cfg, bf16_params):
    tr = Translator(cfg)
    r = np.random.RandomState(0)
    x = jnp.asarray(r.uniform(-1, 1, (batch, size, size, 3))
                    .astype(np.float32))
    dummy = jnp.zeros((1, size, size, 3), jnp.float32)
    n = cfg.council_size
    params = jax.vmap(tr.gen.init, in_axes=(0, None))(
        jax.random.split(jax.random.PRNGKey(0), n), dummy)["params"]
    p0 = jax.tree_util.tree_map(lambda l: l[0], params)
    if bf16_params:
        # weights resident in bf16: the executable reads 2-byte weights
        # instead of reading f32 and casting every call
        cast = lambda l: (l.astype(jnp.bfloat16)
                          if l.dtype == jnp.float32 else l)
        p0 = jax.tree_util.tree_map(cast, p0)
        params = jax.tree_util.tree_map(cast, params)
    z1 = jnp.zeros((batch, cfg.gen.style_dim), jnp.float32)
    zn = jnp.zeros((n, batch, cfg.gen.style_dim), jnp.float32)

    def timeit(fn, *args):
        out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0][:1])
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0][:1])
        return (time.perf_counter() - t0) / steps

    t1 = timeit(lambda: tr._translate(p0, x, z1))
    tn = (timeit(lambda: tr._translate_all_members(params, x, zn))
          if int(os.environ.get("INFER_ALL_MEMBERS", "1")) else None)
    flops, nbytes = cost_analysis(tr._translate, p0, x, z1)
    if flops is None:  # analytic fallback: ~71 GMAC/img at 256px
        flops = 2 * 71e9 * (size / 256) ** 2 * batch
        nbytes = 0.0

    ips1 = batch / t1
    out = {
        "metric": "inference_images_per_sec",
        "batch": batch, "size": size,
        "bf16_params": bool(bf16_params),
        "in_precision": cfg.in_precision,
        "quant": cfg.quant,
        "single_member_img_s": round(ips1, 1),
        "all4_members_img_s": (round(batch * n / tn, 1)
                               if tn is not None else None),
        "single_member_ms": round(t1 * 1e3, 1),
        "xla_gflops_per_img": round(flops / batch / 1e9, 1),
        "xla_mbytes_per_img": round(nbytes / batch / 1e6, 2),
        "achieved_tflops": round(flops / t1 / 1e12, 1),
        "achieved_gbytes_s": round(nbytes / t1 / 1e9, 1),
        "compute_roofline_pct": round(100 * flops / t1 / V5E_PEAK_BF16, 1),
        "hbm_roofline_pct": round(100 * nbytes / t1 / V5E_PEAK_HBM, 1),
        "reference_mode": "batch-1 python loop (unbatched)",
    }
    print(json.dumps(out))
    return out


def main():
    size = int(os.environ.get("INFER_SIZE", "256"))
    steps = int(os.environ.get("INFER_STEPS", "20"))
    sweep = os.environ.get("INFER_SWEEP")
    batches = ([int(b) for b in sweep.split(",")] if sweep
               else [int(os.environ.get("INFER_BATCH", "64"))])
    bf16_params = bool(int(os.environ.get("INFER_BF16_PARAMS", "0")))
    cfg_d = {
        "batch_size": batches[0], "compute_dtype": "bfloat16",
        "use_pallas": bool(int(os.environ.get("INFER_PALLAS", "0"))),
        "council": {"council_size": 4, "council_w": 0.2,
                    "council_start_at_iter": 0},
        "focus_loss": {"focus_enabled": True},
        "gen": {"dim": 64, "mlp_dim": 256, "style_dim": 8,
                "n_downsample": 2, "n_res": 4},
        "dis": {"dim": 64, "n_layer": 4, "num_scales": 3},
        "new_size": size + 14, "crop_image_height": size,
        "crop_image_width": size,
    }
    if "INFER_IN_PRECISION" in os.environ:
        cfg_d["in_precision"] = os.environ["INFER_IN_PRECISION"]
    if "INFER_QUANT" in os.environ:
        cfg_d["quant"] = os.environ["INFER_QUANT"]
    cfg = Config.from_dict(cfg_d)
    for b in batches:
        run_one(b, size, steps, cfg, bf16_params)


if __name__ == "__main__":
    main()
