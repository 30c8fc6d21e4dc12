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
(f32/mixed/bf16), INFER_QUANT (none/w8a8/w8a8_static: int8 generator
convs, ops/quant.py; static scales are calibrated in-process on random
data — scale VALUES don't affect timing, only graph structure),
INFER_BF16_PARAMS (0/1: keep the weights RESIDENT in bfloat16 — halves
weight-read traffic vs casting f32 params every call), INFER_ALL_MEMBERS
(1; 0 skips the all-members call — its effective batch is 4x and OOMs HBM
beyond ~batch 128 at 256px), INFER_AB ("none,w8a8_static": interleave the
listed quant variants in ONE process — run-to-run drift across processes
is ~2x, so only interleaved ratios are trustworthy; CLAUDE.md),
INFER_ROUNDS (3, A/B interleave rounds).
"""

import dataclasses
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


def calibrate_stats(gen, params, x, z):
    """Run one w8a8_calib pass in-process and return host quant_stats.

    Scale VALUES don't affect throughput (they bake in as constants), only
    the graph structure does, so random-data calibration is a valid timing
    stand-in for tools/calibrate_quant.py output.
    """
    from councilx.nn.generator import AdaINGen

    gen_c = gen.copy(quant="w8a8_calib")
    dummy = jnp.zeros((1,) + x.shape[1:], jnp.float32)
    stats0 = gen_c.init(jax.random.PRNGKey(1), dummy)["quant_stats"]

    @jax.jit
    def calib(stats, x, z):
        c, upd = gen_c.apply({"params": params, "quant_stats": stats},
                             x, method=AdaINGen.encode_content,
                             mutable=["quant_stats"])
        _, upd = gen_c.apply(
            {"params": params, "quant_stats": upd["quant_stats"]},
            c, z, method=AdaINGen.decode, mutable=["quant_stats"])
        return upd["quant_stats"]

    return jax.device_get(calib(stats0, x[:8], z[:8]))


def run_one(batch, size, steps, cfg, bf16_params):
    r = np.random.RandomState(0)
    x = jnp.asarray(r.uniform(-1, 1, (batch, size, size, 3))
                    .astype(np.float32))
    dummy = jnp.zeros((1, size, size, 3), jnp.float32)
    n = cfg.council_size
    probe = Translator(dataclasses.replace(cfg, quant="none")
                       if cfg.quant != "none" else cfg)
    params = jax.vmap(probe.gen.init, in_axes=(0, None))(
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

    ab = os.environ.get("INFER_AB")

    def parse_variant(s):
        # "field=value" or a bare quant value ("none"/"w8a8_static"/...)
        f, _, v = s.strip().partition("=")
        if not v:
            return ("quant", f)
        if v.lower() in ("true", "false"):   # bool fields: "False" is a
            v = v.lower() == "true"          # truthy STRING otherwise
        return (f, v)

    variants = ([parse_variant(v) for v in ab.split(",")] if ab
                else [("quant", cfg.quant)])
    labels = [f"{f}={v}" for f, v in variants]
    rounds = (int(os.environ.get("INFER_ROUNDS", "3"))
              if len(variants) > 1 else 1)
    all_members = int(os.environ.get("INFER_ALL_MEMBERS", "1"))

    trs = {}
    for (f, v), label in zip(variants, labels):
        cfg_v = dataclasses.replace(cfg, **{f: v})
        qs = (calibrate_stats(
                  probe.gen.copy(quant_scope=cfg_v.quant_scope,
                                 boundary_engine=cfg_v.boundary_engine),
                  p0, x, z1)
              if cfg_v.quant == "w8a8_static" else None)
        trs[label] = Translator(cfg_v, quant_stats=qs)

    def timeit(fn):
        out = fn()
        jax.device_get(jax.tree_util.tree_leaves(out)[0][:1])
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn()
        jax.device_get(jax.tree_util.tree_leaves(out)[0][:1])
        return (time.perf_counter() - t0) / steps

    t1s = {v: 0.0 for v in labels}
    tns = {v: 0.0 for v in labels}
    for _ in range(rounds):
        for v, tr in trs.items():
            t1s[v] += timeit(lambda tr=tr: tr._translate(p0, x, z1))
            if all_members:
                tns[v] += timeit(
                    lambda tr=tr: tr._translate_all_members(params, x, zn))

    results = {}
    for v, tr in trs.items():
        t1 = t1s[v] / rounds
        tn = tns[v] / rounds if all_members else None
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
            "quant": tr.cfg.quant,
            "variant": v,
            "single_member_img_s": round(ips1, 1),
            "all4_members_img_s": (round(batch * n / tn, 1)
                                   if tn else None),
            "single_member_ms": round(t1 * 1e3, 1),
            "xla_gflops_per_img": round(flops / batch / 1e9, 1),
            "xla_mbytes_per_img": round(nbytes / batch / 1e6, 2),
            "achieved_tflops": round(flops / t1 / 1e12, 1),
            "achieved_gbytes_s": round(nbytes / t1 / 1e9, 1),
            "compute_roofline_pct": round(
                100 * flops / t1 / V5E_PEAK_BF16, 1),
            "hbm_roofline_pct": round(100 * nbytes / t1 / V5E_PEAK_HBM, 1),
            "reference_mode": "batch-1 python loop (unbatched)",
        }
        print(json.dumps(out))
        results[v] = out
    if len(labels) == 2:
        a, b = labels
        print(json.dumps({
            "metric": "inference_ab_ratio", "batch": batch,
            "a": a, "b": b, "rounds": rounds,
            "ratio_b_over_a": round(
                results[b]["single_member_img_s"]
                / results[a]["single_member_img_s"], 3)}))
    return results[labels[0]]


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
