#!/usr/bin/env python
"""Batched inference throughput benchmark (north-star: batched serving).

The reference test_on_folder.py translates one image at a time (batch 1,
fresh CUDA launches). Here translation is one jitted batched call; this tool
measures images/sec for a single member and for all-members-at-once, and
reports rooflines (compute at bf16 peak, HBM at peak bandwidth) so the gap
to speed-of-light is visible.

Env: INFER_BATCH (64), INFER_STEPS (20), INFER_SIZE (256), INFER_PALLAS (0).
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


def main():
    batch = int(os.environ.get("INFER_BATCH", "64"))
    steps = int(os.environ.get("INFER_STEPS", "20"))
    size = int(os.environ.get("INFER_SIZE", "256"))
    cfg = Config.from_dict({
        "batch_size": batch, "compute_dtype": "bfloat16",
        "use_pallas": bool(int(os.environ.get("INFER_PALLAS", "0"))),
        "council": {"council_size": 4, "council_w": 0.2,
                    "council_start_at_iter": 0},
        "focus_loss": {"focus_enabled": True},
        "gen": {"dim": 64, "mlp_dim": 256, "style_dim": 8,
                "n_downsample": 2, "n_res": 4},
        "dis": {"dim": 64, "n_layer": 4, "num_scales": 3},
        "new_size": size + 14, "crop_image_height": size,
        "crop_image_width": size,
    })
    tr = Translator(cfg)
    r = np.random.RandomState(0)
    x = jnp.asarray(r.uniform(-1, 1, (batch, size, size, 3))
                    .astype(np.float32))
    dummy = jnp.zeros((1, size, size, 3), jnp.float32)
    n = cfg.council_size
    params = jax.vmap(tr.gen.init, in_axes=(0, None))(
        jax.random.split(jax.random.PRNGKey(0), n), dummy)["params"]
    p0 = jax.tree_util.tree_map(lambda l: l[0], params)
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
    tn = timeit(lambda: tr._translate_all_members(params, x, zn))

    # generator fwd cost model (see SURVEY/profile): ~71 GMAC/img at 256px,
    # scaled by (size/256)^2
    gmac = 71e9 * (size / 256) ** 2
    flops1 = 2 * gmac * batch
    ips1 = batch / t1
    ipsn = batch * n / tn
    out = {
        "metric": "inference_images_per_sec",
        "batch": batch, "size": size,
        "single_member_img_s": round(ips1, 1),
        "all4_members_img_s": round(ipsn, 1),
        "single_member_ms": round(t1 * 1e3, 1),
        "compute_roofline_pct": round(100 * flops1 / t1 / V5E_PEAK_BF16, 1),
        "reference_mode": "batch-1 python loop (unbatched)",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
