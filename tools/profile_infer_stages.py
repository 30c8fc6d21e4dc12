#!/usr/bin/env python
"""Per-stage time attribution of the 256px serving forward (VERDICT r3
item 1 — the 869.8 img/s bf16 / 892.4 w8a8_static record leaves ~37% of
the MXU idle with no per-op profile saying where).

Method: PREFIX-DIFFERENCE timing. The serving graph is decomposed into its
nine sequential stages (the exact shipped modules, applied standalone with
the same param subtrees the full forward uses); prefix_k jits stages
1..k; stage cost = t(prefix_k) - t(prefix_{k-1}). Prefixes keep every real
producer->consumer fusion boundary at true serving shapes, unlike isolated
per-op chains. All prefixes + the REAL full forward (Translator
._translate_u8) are interleaved in ONE process (run-to-run drift across
processes is ~2x; CLAUDE.md), and the residual
``full - sum(stage diffs)`` is reported as the cross-stage fusion delta.

Per stage: ms, analytic conv GFLOPs, achieved TF/s, % of the 197 TF/s bf16
peak, % of step. Timing barriers are jax.device_get readbacks (tunnel-safe).

Env: PROF_BATCH (384), PROF_SIZE (256), PROF_STEPS (10), PROF_ROUNDS (3),
PROF_QUANT (none|w8a8_static — static scales are calibrated in-process on
random data; scale VALUES don't affect timing, only graph structure),
PROF_QUANT_SCOPE (resblocks|heavy — which conv classes quantize, matching
cfg.quant_scope; nn/generator.py),
PROF_IN_PRECISION (mixed), PROF_FUSE_UP (1), PROF_FUSE_PAD (1 — the
boundary 7x7 convs' pad_conv engine, matching the shipped generator; TF/s
for those stages is reported against the reference 7x7 FLOPs, so it reads
as effective speedup).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

V5E_PEAK_BF16 = 197e12


def build_stages(cfg, gen, params, quant_stats):
    """[(name, conv_gmacs_per_img, fn(carry)->carry)] — the serving path as
    standalone applications of the SAME module classes/param subtrees the
    full forward runs (nn/generator.py setup wiring)."""
    import jax.numpy as jnp

    from councilx.nn.blocks import MLP, Conv2dBlock, ResBlocks
    from councilx.nn.generator import Decoder, composite_with_mask

    d = cfg.gen.dim                      # 64
    cd = d * (2 ** cfg.gen.n_downsample)  # content dim, 256
    n_res = cfg.gen.n_res
    size = cfg.data.crop_image_height
    dtype = jnp.bfloat16
    common = dict(pad_type="reflect", kernel_init=gen.kernel_init,
                  dtype=dtype, in_precision=cfg.in_precision)
    q = cfg.quant
    # scope: "heavy" quantizes downs + resblocks + upsamples; "resblocks"
    # only the 3x3 resblock convs (the shipped default; nn/generator.py)
    q_heavy = q if cfg.quant_scope == "heavy" else "none"

    def vs(sub, scope):
        v = {"params": sub}
        if quant_stats is not None and scope is not None:
            v["quant_stats"] = quant_stats[scope[0]][scope[1]]
        return v

    p_enc = params["enc_content"]
    p_dec = params["dec"]
    s2, s4 = size // 2, size // 4

    # analytic conv GMACs/img (kh*kw*Cin*Cout*H_out*W_out / 1e9)
    def gmacs(kh, cin, cout, hw):
        return kh * kh * cin * cout * hw * hw / 1e9

    stages = []

    def add(name, gm, fn):
        stages.append((name, gm, fn))

    fpad = bool(int(os.environ.get("PROF_FUSE_PAD", "1")))
    cb0 = Conv2dBlock(d, 7, 1, 3, norm="in", activation="relu",
                      fuse_pad=fpad, **common)
    add("enc_conv7x7_3_64", gmacs(7, 3, d, size),
        lambda c: dict(c, x=cb0.apply(vs(p_enc["Conv2dBlock_0"], None),
                                      c["x"])))

    cb1 = Conv2dBlock(2 * d, 4, 2, 1, norm="in", activation="relu",
                      quant=q_heavy, **common)
    add("enc_down1_64_128", gmacs(4, d, 2 * d, s2),
        lambda c: dict(c, x=cb1.apply(
            vs(p_enc["Conv2dBlock_1"], ("enc_content", "Conv2dBlock_1")),
            c["x"])))

    cb2 = Conv2dBlock(4 * d, 4, 2, 1, norm="in", activation="relu",
                      quant=q_heavy, **common)
    add("enc_down2_128_256", gmacs(4, 2 * d, 4 * d, s4),
        lambda c: dict(c, x=cb2.apply(
            vs(p_enc["Conv2dBlock_2"], ("enc_content", "Conv2dBlock_2")),
            c["x"])))

    rb_in = ResBlocks(n_res, cd, norm="in", activation="relu",
                      quant=q, **common)
    add("enc_resblocks_in", 2 * n_res * gmacs(3, cd, cd, s4),
        lambda c: dict(c, x=rb_in.apply(
            vs(p_enc["ResBlocks_0"], ("enc_content", "ResBlocks_0")),
            c["x"])))

    mlp = MLP(out_dim=Decoder.num_adain_params(cd, n_res), dim=cfg.gen.mlp_dim,
              n_blk=3, norm="none", activation="relu",
              kernel_init=gen.kernel_init, dtype=dtype)

    def run_mlp(c):
        vec = mlp.apply({"params": params["mlp"]}, c["z"])
        pairs, cur = [], 0
        for _ in range(2 * n_res):  # Decoder.__call__ slicing order
            beta = vec[:, cur:cur + cd]
            gamma = vec[:, cur + cd:cur + 2 * cd]
            pairs.append((gamma, beta))
            cur += 2 * cd
        # poke one MLP element into x so the prefix ENDING here can't DCE
        # the MLP (prefixes return c["x"] only); +0.0 downstream, ~free
        x = c["x"] + (vec[:, :1] * 0).reshape(-1, 1, 1, 1).astype(c["x"].dtype)
        return dict(c, x=x, pairs=pairs)

    add("mlp_style_to_adain", 0.0, run_mlp)

    rb_ad = ResBlocks(n_res, cd, norm="adain", activation="relu",
                      quant=q, **common)
    add("dec_resblocks_adain", 2 * n_res * gmacs(3, cd, cd, s4),
        lambda c: dict(c, x=rb_ad.apply(
            vs(p_dec["ResBlocks_0"], ("dec", "ResBlocks_0")),
            c["x"], c["pairs"])))

    fuse = bool(int(os.environ.get("PROF_FUSE_UP", "1")))
    up0 = Conv2dBlock(cd // 2, 5, 1, 2, norm="ln", activation="relu",
                      upsample2x=True, fuse_upsample=fuse, quant=q_heavy,
                      **common)
    add("dec_up1_256_128", gmacs(5, cd, cd // 2, s2) * (9 / 25 if fuse else 1),
        lambda c: dict(c, x=up0.apply(
            vs(p_dec["Conv2dBlock_0"], ("dec", "Conv2dBlock_0")), c["x"])))

    up1 = Conv2dBlock(cd // 4, 5, 1, 2, norm="ln", activation="relu",
                      upsample2x=True, fuse_upsample=fuse, quant=q_heavy,
                      **common)
    add("dec_up2_128_64", gmacs(5, cd // 2, cd // 4, size)
        * (9 / 25 if fuse else 1),
        lambda c: dict(c, x=up1.apply(
            vs(p_dec["Conv2dBlock_1"], ("dec", "Conv2dBlock_1")), c["x"])))

    out_dim = 4 if cfg.council.focus_enabled else 3
    cbf = Conv2dBlock(out_dim, 7, 1, 3, norm="none", activation="tanh",
                      pad_type="reflect", kernel_init=gen.kernel_init,
                      dtype=dtype, fuse_pad=fpad)
    add("dec_final7x7_tanh", gmacs(7, cd // 4, out_dim, size),
        lambda c: dict(c, x=cbf.apply({"params": p_dec["Conv2dBlock_2"]},
                                      c["x"])))

    def finish(c):
        x_t, _ = composite_with_mask(c["x"].astype(jnp.float32), c["x0"])
        arr = jnp.clip((x_t + 1.0) * 0.5, 0.0, 1.0)
        return dict(c, x=(arr * 255.0 + 0.5).astype(jnp.uint8))

    add("composite_u8", 0.0, finish)
    return stages


def main():
    from councilx.utils.platform import apply_env_platform
    apply_env_platform()

    import jax
    import jax.numpy as jnp

    from councilx.config import Config
    from councilx.inference.translate import Translator
    from councilx.nn.generator import AdaINGen

    batch = int(os.environ.get("PROF_BATCH", "384"))
    size = int(os.environ.get("PROF_SIZE", "256"))
    steps = int(os.environ.get("PROF_STEPS", "10"))
    rounds = int(os.environ.get("PROF_ROUNDS", "3"))
    quant = os.environ.get("PROF_QUANT", "none")
    qscope = os.environ.get("PROF_QUANT_SCOPE", "resblocks")

    cfg = Config.from_dict({
        "batch_size": batch, "compute_dtype": "bfloat16",
        "in_precision": os.environ.get("PROF_IN_PRECISION", "mixed"),
        "quant": quant, "quant_scope": qscope,
        "council": {"council_size": 1, "council_w": 0.0},
        "focus_loss": {"focus_enabled": True},
        "gen": {"dim": 64, "mlp_dim": 256, "style_dim": 8,
                "n_downsample": 2, "n_res": 4},
        "new_size": size + 14, "crop_image_height": size,
        "crop_image_width": size,
    })

    r = np.random.RandomState(0)
    x = jnp.asarray(r.uniform(-1, 1, (batch, size, size, 3))
                    .astype(np.float32), jnp.bfloat16)
    z = jnp.asarray(r.randn(batch, cfg.gen.style_dim).astype(np.float32),
                    jnp.bfloat16)

    # init params quant-agnostically (tree is identical in every mode)
    probe = Translator(Config.from_dict({
        "batch_size": batch, "compute_dtype": "bfloat16",
        "in_precision": cfg.in_precision, "quant_scope": qscope,
        "council": {"council_size": 1, "council_w": 0.0},
        "focus_loss": {"focus_enabled": True},
        "gen": {"dim": 64, "mlp_dim": 256, "style_dim": 8,
                "n_downsample": 2, "n_res": 4},
        "new_size": size + 14, "crop_image_height": size,
        "crop_image_width": size}))
    dummy = jnp.zeros((1, size, size, 3), jnp.float32)
    params = probe.gen.init(jax.random.PRNGKey(0), dummy)["params"]
    params = jax.tree_util.tree_map(
        lambda l: l.astype(jnp.bfloat16) if l.dtype == jnp.float32 else l,
        params)

    quant_stats = None
    if quant == "w8a8_static":
        gen_c = probe.gen.copy(quant="w8a8_calib")
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

        quant_stats = jax.device_get(calib(stats0, x[:8], z[:8]))

    tr = Translator(cfg, quant_stats=quant_stats)
    stages = build_stages(cfg, tr.gen, params, quant_stats)

    # prefix_k = stages[0..k] jitted as one graph
    def make_prefix(k):
        def run(x, z):
            c = dict(x=x, x0=x, z=z)
            for _, _, fn in stages[:k + 1]:
                c = fn(c)
            return c["x"]
        return jax.jit(run)

    prefixes = [make_prefix(k) for k in range(len(stages))]
    full = lambda: tr._translate_u8(params, x, z)

    def timeit(fn):
        out = fn()
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn()
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        return (time.perf_counter() - t0) / steps

    # compile everything first (one pass), then interleave timing rounds
    times = np.zeros(len(prefixes) + 1)
    for _ in range(rounds):
        for i, p in enumerate(prefixes):
            times[i] += timeit(lambda p=p: p(x, z))
        times[-1] += timeit(full)
    times /= rounds

    full_t = times[-1]
    prev = 0.0
    rows = []
    for i, (name, gm, _) in enumerate(stages):
        dt = times[i] - prev
        prev = times[i]
        flops = 2 * gm * 1e9 * batch
        rows.append({
            "stage": name, "ms": round(dt * 1e3, 2),
            "gflops_per_img": round(2 * gm, 1),
            "tf_s": round(flops / dt / 1e12, 1) if dt > 0 else None,
            "pct_peak": (round(100 * flops / dt / V5E_PEAK_BF16, 1)
                         if dt > 0 else None),
            "pct_step": round(100 * dt / full_t, 1),
        })
    out = {
        "metric": "serving_stage_profile",
        "batch": batch, "size": size, "quant": quant,
        "in_precision": cfg.in_precision,
        "full_forward_ms": round(full_t * 1e3, 2),
        "img_s": round(batch / full_t, 1),
        "sum_stages_ms": round(times[-2] * 1e3, 2),
        "fusion_delta_ms": round((full_t - times[-2]) * 1e3, 2),
        "stages": rows,
    }
    print(json.dumps(out, indent=1))
    return out


if __name__ == "__main__":
    main()
