#!/usr/bin/env python
"""Train-step MFU: how many of the chip's bf16 FLOP/s the fused train step
actually uses (VERDICT r3 item 2 — convert "we believe XLA's convs are the
ceiling" into one arguable number).

Two FLOP sources, cross-checked:
  * lowered:  ``jit(step).lower(...).cost_analysis()['flops']`` — the
    UNOPTIMIZED StableHLO count. Runs anywhere (CPU, no compile). Slightly
    OVERCOUNTS the executed graph when z_mode="shared" lets XLA CSE one
    council forward (the duplicate translate feeding the detached fakes).
  * compiled (MFU_COMPILED=1, TPU): ``.compile().cost_analysis()`` — the
    optimized module the chip executes; 5-15 min tunnel compile. The honest
    numerator for MFU.

A StableHLO walk also splits conv vs dot_general FLOPs so the gap to the
measured conv baseline (generator convs run at ~35% of bf16 peak on this
chip — BASELINE.md) can be attributed: predicted step time at the conv
baseline = conv_flops / (0.35 * peak); the remainder is non-conv compute +
schedule overhead.

    MFU = flops / step_time / PEAK       (v5e: 197e12 bf16 FLOP/s)

Env: MFU_BATCH (8), MFU_COUNCIL (4), MFU_IMG_S (13.533 — the BASELINE.md
headline; sets step_time = batch / img_s), MFU_COMPILED (0/1),
MFU_MEASURE (0/1: also time MFU_STEPS real steps in-process and use that,
TPU only), MFU_STEPS (30), plus all BENCH_* overrides (the config comes
from bench.headline_config, so this analyzes EXACTLY the benchmarked step).
"""

import json
import os
import re
import sys
import time

sys.path.insert(0, ".")

V5E_PEAK_BF16 = 197e12
CONV_BASELINE_FRAC = 0.35  # measured XLA conv efficiency, BASELINE.md

_TENSOR = re.compile(r"tensor<([0-9x]+)x[a-z0-9]+>")
_CONV_KERNEL_SPEC = re.compile(r"\]x\[([^\]]*)\]->")
_LHS_DILATE = re.compile(r"lhs_dilate = \[([0-9, ]*)\]")
_DOT_CONTRACT_PRETTY = re.compile(r"contracting_dims = \[([0-9, ]*)\]")
_DOT_CONTRACT_FULL = re.compile(r"lhs_contracting_dimensions = \[([0-9, ]*)\]")


def _dims(s: str):
    return [int(d) for d in s.split("x") if d]


def _line_tensors(line: str):
    """All tensor<...> shapes on the line, in textual order. For an op line
    ``... : (tensor<A>, tensor<B>) -> tensor<C>`` the last is the result
    and the ones before it (after the ':') are the operands."""
    return [_dims(m) for m in _TENSOR.findall(line)]


def _prod(xs):
    out = 1
    for x in xs:
        out *= x
    return out


def stablehlo_matmul_flops(text: str):
    """(conv_flops, dot_flops) summed over every stablehlo.convolution /
    dot_general in the module text.

    conv: 2 * out_elements * prod(kernel dims except the 'o' dim) — the
    kernel's input-feature dim is already Cin/feature_group_count, so
    grouped convs (the vmapped council axis lowers to feature_group_count=N)
    come out right. dot: 2 * out_elements * prod(lhs contracting dims).
    """
    conv = 0
    dot = 0
    for line in text.splitlines():
        line = line.strip()
        if "stablehlo.convolution" in line:
            shapes = _line_tensors(line)
            if len(shapes) < 3:
                continue
            out_shape, kernel = shapes[-1], shapes[-2]
            spec = _CONV_KERNEL_SPEC.search(line)
            if not spec:
                continue
            toks = [t.strip() for t in spec.group(1).split(",")]
            o_idx = toks.index("o")
            k_elems = _prod(d for i, d in enumerate(kernel) if i != o_idx)
            flops = 2 * _prod(out_shape) * k_elems
            # input-dilated convs (grad-wrt-input of strided convs): only
            # ~1/prod(dilation) of kernel taps hit non-inserted-zero inputs
            dil = _LHS_DILATE.search(line)
            if dil:
                flops //= _prod(
                    int(t) for t in dil.group(1).split(",") if t.strip())
            conv += flops
        elif "stablehlo.dot_general" in line:
            shapes = _line_tensors(line)
            if len(shapes) < 3:
                continue
            out_shape, lhs = shapes[-1], shapes[-3]
            m = (_DOT_CONTRACT_PRETTY.search(line)
                 or _DOT_CONTRACT_FULL.search(line))
            if not m:
                continue
            cdims = [int(t) for t in m.group(1).split(",") if t.strip()]
            k = _prod(lhs[c] for c in cdims)
            dot += 2 * _prod(out_shape) * k
    return conv, dot


def main():
    from councilx.utils.platform import apply_env_platform
    apply_env_platform()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import headline_config
    from councilx.train.trainer import CouncilTrainer

    batch = int(os.environ.get("MFU_BATCH", "8"))
    council = int(os.environ.get("MFU_COUNCIL", "4"))
    img_s = float(os.environ.get("MFU_IMG_S", "13.533"))
    cfg = headline_config(batch, council)

    trainer = CouncilTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    x = jax.ShapeDtypeStruct((batch, cfg.data.crop_image_height,
                              cfg.data.crop_image_width, 3), jnp.float32)

    lowered = jax.jit(trainer._step, donate_argnums=(0,)).lower(state, x, x)
    la = lowered.cost_analysis() or {}
    lowered_flops = float(la.get("flops", 0.0))
    conv_f, dot_f = stablehlo_matmul_flops(lowered.as_text())

    rec = {
        "metric": "train_step_mfu",
        "batch": batch, "council": council,
        "lowered_tflops_per_step": round(lowered_flops / 1e12, 3),
        "lowered_conv_tflops": round(conv_f / 1e12, 3),
        "lowered_dot_tflops": round(dot_f / 1e12, 3),
    }

    flops = lowered_flops
    flops_kind = "lowered_unoptimized"
    if int(os.environ.get("MFU_COMPILED", "0")):
        compiled = lowered.compile()
        ca = compiled.cost_analysis() or {}
        cflops = float(ca.get("flops", 0.0))
        rec["compiled_tflops_per_step"] = round(cflops / 1e12, 3)
        if cflops:
            flops, flops_kind = cflops, "compiled_optimized"
        if int(os.environ.get("MFU_MEASURE", "0")):
            steps = int(os.environ.get("MFU_STEPS", "30"))
            rng = np.random.RandomState(0)
            xa = jnp.asarray(rng.uniform(
                -1, 1, x.shape).astype(np.float32))
            xb = jnp.asarray(rng.uniform(
                -1, 1, x.shape).astype(np.float32))
            for _ in range(5):
                state, metrics = compiled(state, xa, xb)
            jax.device_get(metrics)  # tunnel-safe barrier (CLAUDE.md)
            t0 = time.perf_counter()
            for _ in range(steps):
                state, metrics = compiled(state, xa, xb)
            jax.device_get(metrics)
            dt = (time.perf_counter() - t0) / steps
            img_s = batch / dt
            rec["measured_img_s"] = round(img_s, 3)

    step_s = batch / img_s
    rec.update({
        "img_s": img_s,
        "step_ms": round(step_s * 1e3, 1),
        "flops_kind": flops_kind,
        "mfu_pct": round(100 * flops / step_s / V5E_PEAK_BF16, 1),
        # where the time would go if every matmul/conv hit the measured
        # XLA conv baseline (~35% of peak): the residual is non-conv
        # compute + schedule overhead
        "conv_baseline_step_ms": round(
            1e3 * conv_f / (CONV_BASELINE_FRAC * V5E_PEAK_BF16), 1),
    })
    print(json.dumps(rec))
    return rec


if __name__ == "__main__":
    main()
