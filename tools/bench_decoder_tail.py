#!/usr/bin/env python
"""Bisect the serving graph's SLOW stages (profile_infer_stages r4: the two
upsample stages run at 30-38% of peak and the final 7x7->4ch conv at 11.5%,
vs 66% for the resblock chains). Chained same-shape links inside ONE jit
(dispatch-latency-free, bench_ops.py method), variants interleaved in one
process.

Variants per upsample stage (shapes of dec_up1 / dec_up2 at PROF_BATCH):
  conv_fused       phase-decomposed upsample2x+5x5 only (ops/upsample_conv)
  conv_lhs_dilated the SAME math as ONE conv_general_dilated with
                   lhs_dilation=2 and the 6x6 kernel (ones2x2 ⊛ 5x5) —
                   nearest-up(x) = zero-insert(x) ⊛ ones2x2, so
                   up+conv5x5 = zero-insert ⊛ (ones2x2 ⊛ w5x5): does XLA's
                   own phase handling of input dilation beat ours?
  conv_unfused     materialized nearest-up + plain 5x5 conv (the naive path)
  +ln              conv_fused + MUNIT LayerNorm (f32 stats, unbiased std)
  +ln+relu         the full shipped stage
  ln_only          the LayerNorm alone at the stage's OUTPUT shape

Final-stage variants (7x7 64->4 + tanh at 256px):
  reflect (shipped) / zero-pad / valid (no pad) — is the reflect-pad COPY
  the cost? — plus tanh and the composite+u8 tail.

Env: TAIL_BATCH (384; OOM-minded — each link holds 2 activations),
TAIL_STEPS (10), TAIL_CHAIN (4), TAIL_STAGE (both|up1|up2|final).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

V5E_PEAK_BF16 = 197e12


def main():
    from councilx.utils.platform import apply_env_platform
    apply_env_platform()

    import jax
    import jax.numpy as jnp

    from councilx.nn.blocks import pad2d
    from councilx.ops.upsample_conv import upsample2x_conv5x5

    batch = int(os.environ.get("TAIL_BATCH", "384"))
    steps = int(os.environ.get("TAIL_STEPS", "10"))
    chain = int(os.environ.get("TAIL_CHAIN", "4"))
    which = os.environ.get("TAIL_STAGE", "both")
    r = np.random.RandomState(0)

    def timeit(fn, *args):
        out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        return (time.perf_counter() - t0) / steps

    def bf16(*shape, scale=0.1):
        return jnp.asarray((r.randn(*shape) * scale).astype(np.float32),
                           jnp.bfloat16)

    def munit_ln(y, mixed=True):
        y32 = y.astype(jnp.float32) if mixed else y
        mean = jnp.mean(y32, axis=(1, 2, 3), keepdims=True)
        var = jnp.var(y32, axis=(1, 2, 3), keepdims=True)
        n = y32.size // y32.shape[0]
        std = jnp.sqrt(var * (n / (n - 1)))
        out = (y32 - mean) / (std + 1e-5)
        return out.astype(jnp.bfloat16) if mixed else out

    results = {"metric": "decoder_tail_bench", "batch": batch,
               "chain": chain, "steps": steps}

    def report(stage, name, t_link, flops_link):
        key = f"{stage}.{name}"
        results[key] = {
            "ms": round(t_link * 1e3, 2),
            "tf_s": round(flops_link / t_link / 1e12, 1),
            "pct_peak": round(100 * flops_link / t_link / V5E_PEAK_BF16, 1)}
        print(f"{key:28s}: {t_link*1e3:7.2f} ms "
              f"{flops_link/t_link/1e12:6.1f} TF/s", flush=True)

    def up_stage(tag, hw_in, cin, cout):
        # carry stays at (B, hw_in, hw_in, cin): upsample-conv to
        # (B, 2hw, 2hw, cout) then fold back with a stride-2 2x2 conv
        # whose cost is identical across variants (subtracted via the
        # "_folddown" baseline)
        x = bf16(batch, hw_in, hw_in, cin)
        k5 = bf16(chain, 5, 5, cin, cout, scale=0.02)
        k6 = jnp.zeros((chain, 6, 6, cin, cout), jnp.bfloat16)
        ones2 = jnp.ones((2, 2), jnp.float32)
        import numpy as _np
        k6_host = _np.zeros((chain, 6, 6, cin, cout), _np.float32)
        k5_host = _np.asarray(k5, _np.float32)
        for dy in range(2):
            for dx in range(2):
                k6_host[:, dy:dy + 5, dx:dx + 5] += k5_host
        del ones2
        k6 = jnp.asarray(k6_host, jnp.bfloat16)
        kd = bf16(chain, 2, 2, cout, cin, scale=0.02)

        conv_flops = 2 * batch * (2 * hw_in) ** 2 * 9 * cin * cout
        fold_flops = 2 * batch * hw_in * hw_in * 4 * cout * cin

        def folddown(u, i):
            return jax.lax.conv_general_dilated(
                u, kd[i], (2, 2), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def chain_of(step_fn):
            def run(x):
                y = x
                for i in range(chain):
                    y = folddown(step_fn(y, i), i)
                return y
            return jax.jit(run)

        def v_fused(y, i):
            return upsample2x_conv5x5(y, k5[i], None, "reflect")

        def v_dilated(y, i):
            # zero-insert dilation + 6x6 kernel == nearest-up + 5x5 reflect?
            # padding: up+pad2(reflect) vs dilated conv zero-pad — border
            # semantics differ; timing comparison only (same MAC count)
            return jax.lax.conv_general_dilated(
                y, k6[i], (1, 1), [(4, 3), (4, 3)], lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def v_unfused(y, i):
            u = jnp.repeat(jnp.repeat(y, 2, axis=1), 2, axis=2)
            return jax.lax.conv_general_dilated(
                pad2d(u, 2, "reflect"), k5[i], (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def v_full(y, i):
            return jax.nn.relu(munit_ln(v_fused(y, i)))

        def v_conv_ln(y, i):
            return munit_ln(v_fused(y, i))

        # baseline: the updown scaffold alone (materialized 2x repeat to
        # cout channels + the folddown conv), to gauge the non-conv floor
        t_base = timeit(chain_of(lambda y, i: jnp.repeat(
            jnp.repeat(y[..., :cout], 2, axis=1), 2, axis=2) * 1.0),
            x) / chain
        report(tag, "updown_baseline", t_base, fold_flops)

        for name, fn, fl in (
                ("conv_fused", v_fused, conv_flops),
                ("conv_lhs_dilated", v_dilated,
                 2 * batch * (2 * hw_in) ** 2 * 36 * cin * cout // 4),
                ("conv_unfused", v_unfused,
                 2 * batch * (2 * hw_in) ** 2 * 25 * cin * cout),
                ("conv_ln", v_conv_ln, conv_flops),
                ("conv_ln_relu", v_full, conv_flops)):
            t = timeit(chain_of(fn), x) / chain
            report(tag, name, t, fl + fold_flops)

        # LN alone at the OUTPUT shape
        yo = bf16(batch, 2 * hw_in, 2 * hw_in, cout)

        def ln_chain(y):
            for _ in range(chain):
                y = munit_ln(y) * jnp.bfloat16(1.001)
            return y

        t = timeit(jax.jit(ln_chain), yo) / chain
        nbytes = yo.size * 2 * 3  # stats read + normalize read/write
        results[f"{tag}.ln_only"] = {"ms": round(t * 1e3, 2),
                                     "gb_s_eff": round(nbytes / t / 1e9, 1)}
        print(f"{tag+'.ln_only':28s}: {t*1e3:7.2f} ms "
              f"{nbytes/t/1e9:6.1f} GB/s eff", flush=True)

    def final_stage():
        hw, cin, cout = 256, 64, 4
        x = bf16(batch, hw, hw, cin)
        x0 = bf16(batch, hw, hw, 3)
        k7 = bf16(chain, 7, 7, cin, cout, scale=0.02)
        kb = bf16(chain, 1, 1, cout, cin, scale=0.02)  # fold back 4->64
        conv_flops = 2 * batch * hw * hw * 49 * cin * cout
        fold_flops = 2 * batch * hw * hw * cout * cin

        def foldup(y, i):
            return jax.lax.conv_general_dilated(
                y, kb[i], (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def conv(y, i, pad):
            if pad == "valid":
                yp, padding = y, [(3, 3), (3, 3)]
            else:
                yp, padding = pad2d(y, 3, pad), "VALID"
            return jax.lax.conv_general_dilated(
                yp, k7[i], (1, 1), padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def chain_of(step_fn):
            def run(x):
                y = x
                for i in range(chain):
                    y = foldup(step_fn(y, i), i)
                return y
            return jax.jit(run)

        for name, fn in (
                ("conv_reflect", lambda y, i: conv(y, i, "reflect")),
                ("conv_zeropad", lambda y, i: conv(y, i, "zero")),
                ("conv_valid", lambda y, i: conv(y, i, "valid")),
                ("conv_reflect_tanh",
                 lambda y, i: jnp.tanh(conv(y, i, "reflect")))):
            t = timeit(chain_of(fn), x) / chain
            report("final", name, t, conv_flops + fold_flops)

        # the full shipped tail once (conv+tanh+composite+u8), not chained
        from councilx.nn.generator import composite_with_mask

        @jax.jit
        def tail(x, x0):
            y = jnp.tanh(conv(x, 0, "reflect")).astype(jnp.float32)
            x_t, _ = composite_with_mask(y, x0)
            arr = jnp.clip((x_t + 1.0) * 0.5, 0.0, 1.0)
            return (arr * 255.0 + 0.5).astype(jnp.uint8)

        t = timeit(tail, x, x0)
        report("final", "full_tail_once", t, conv_flops)

    if which in ("both", "up1"):
        up_stage("up1", 64, 256, 128)
    if which in ("both", "up2"):
        up_stage("up2", 128, 128, 64)
    if which in ("both", "final"):
        final_stage()
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
