#!/usr/bin/env python
"""Quality gate for quantized serving: bf16 vs W8A8 on a real checkpoint.

Before enabling ``--quant w8a8_static`` in production, measure what int8
does to YOUR checkpoint's outputs on YOUR data: this tool translates the
same inputs (same injected z) through the unquantized serving path and the
quantized one(s) and reports per-image PSNR and uint8-level deltas in
output space — exactly what a served client would see.

    python tools/quant_quality.py --config cfg.yaml --checkpoint ckpt \
        --calibration quant_stats.npz [--input_folder imgs/] \
        [--modes w8a8_static,w8a8] [--sheet side_by_side.jpg]

Prints one JSON line per mode:
  {"mode": "w8a8_static", "psnr_mean_db": ..., "psnr_min_db": ...,
   "maxabs_u8": ..., "meanabs_u8": ..., "images": N}

Reading the numbers: PSNR >= ~40 dB mean / maxabs within a few tens of
uint8 levels on saturated pixels is visually lossless for GAN outputs;
large drops localized to a few images usually mean the calibration set
missed their activation range — recalibrate with more/representative
images (tools/calibrate_quant.py).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

# NOTE: apply_env_platform() runs in main(), NOT at import: this module is
# imported by tests, and at import time it would re-apply the ambient
# JAX_PLATFORMS (=the TPU backend on tunnel images) over the test
# harness's forced-CPU config — connecting the whole pytest process to
# the TPU tunnel (which BLOCKS if another process holds the chip).
# Backend init is lazy, so calling it first thing in main() is equivalent
# for CLI use.


PSNR_CAP_DB = 99.0   # identical images report this, keeping the JSON finite


def psnr_u8(a: np.ndarray, b: np.ndarray) -> float:
    """PSNR in dB between two uint8 images (capped at PSNR_CAP_DB when
    identical — float('inf') would serialize as the non-JSON token
    'Infinity')."""
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return PSNR_CAP_DB
    return min(PSNR_CAP_DB, 10.0 * np.log10(255.0 ** 2 / mse))


def compare(cfg_path: str, checkpoint: str, member: int, direction: str,
            modes, calibration=None, input_folder=None, batch_size=8,
            num_batches=4, seed=0, sheet_path=None):
    """Translate identical (x, z) through quant='none' and each quant mode;
    return {mode: metrics dict} measured on the uint8 serving outputs.
    With ``sheet_path``, also save a [input | bf16 | mode...] comparison
    JPEG built from the FIRST measured batch (the same outputs the metrics
    cover, no recompiles)."""
    from councilx.ckpt.manager import load_params_npz
    from councilx.config import load_config
    from councilx.data.ondevice import normalize_batch
    from councilx.inference.translate import Translator
    from councilx.ckpt.manager import load_generator_params

    if "w8a8_static" in modes and calibration is None:
        raise SystemExit("--calibration is required for w8a8_static "
                         "(tools/calibrate_quant.py)")

    cfg = load_config(cfg_path)
    cfg.quant = "none"
    stacked = load_generator_params(checkpoint, cfg, direction)
    params = jax.tree_util.tree_map(lambda l: l[member], stacked)
    hw = cfg.data.crop_image_height

    translators = {"none": Translator(cfg)}
    for mode in modes:
        mcfg = load_config(cfg_path)
        mcfg.quant = mode
        stats = (load_params_npz(calibration) if mode == "w8a8_static"
                 else None)
        translators[mode] = Translator(mcfg, quant_stats=stats)

    ds = None
    if input_folder:
        from councilx.data.dataset import ImageFolderDataset
        ds = ImageFolderDataset(input_folder, new_size=cfg.data.new_size,
                                crop=hw)
        if not len(ds):
            raise SystemExit(f"no images in {input_folder}")
    r = np.random.RandomState(seed)
    key = jax.random.PRNGKey(seed)

    per_mode = {m: {"psnr": [], "absdiff": []} for m in modes}
    n_images = 0
    sheet_rows = None
    for b in range(num_batches):
        if ds is not None:
            arrs = np.stack([ds[(b * batch_size + i) % len(ds)]
                             for i in range(batch_size)])
            x = jnp.asarray(np.asarray(normalize_batch(jnp.asarray(arrs))))
        else:
            x = jnp.asarray(r.uniform(-1, 1, (batch_size, hw, hw, 3))
                            .astype(np.float32))
        key, sub = jax.random.split(key)
        z = jax.random.normal(sub, (batch_size, cfg.gen.style_dim))
        ref = translators["none"].translate_u8(params, x, z=z)
        n_images += x.shape[0]
        if b == 0 and sheet_path:
            sheet_rows = [np.asarray((x + 1.0) * 127.5).astype(np.uint8),
                          ref]
        for mode in modes:
            out = translators[mode].translate_u8(params, x, z=z)
            d = np.abs(out.astype(np.int16) - ref.astype(np.int16))
            per_mode[mode]["absdiff"].append(d)
            per_mode[mode]["psnr"].extend(
                psnr_u8(out[i], ref[i]) for i in range(out.shape[0]))
            if b == 0 and sheet_path:
                sheet_rows.append(out)

    if sheet_path and sheet_rows is not None:
        from councilx.utils.images import save_image_grid

        sheet = np.concatenate(
            [np.concatenate(list(np.asarray(row)), axis=1)
             for row in sheet_rows], axis=0)
        save_image_grid(sheet_path, sheet[None], nrow=1)

    results = {}
    for mode in modes:
        psnr = np.array(per_mode[mode]["psnr"])
        d = np.concatenate([a.reshape(a.shape[0], -1)
                            for a in per_mode[mode]["absdiff"]], axis=0)
        results[mode] = {
            "mode": mode,
            "psnr_mean_db": round(float(np.mean(psnr)), 2),
            "psnr_min_db": round(float(np.min(psnr)), 2),
            "maxabs_u8": int(d.max()),
            "meanabs_u8": round(float(d.mean()), 3),
            "images": int(n_images),
        }
    return results


def main():
    from councilx.utils.platform import apply_env_platform

    apply_env_platform()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--member", type=int, default=0)
    p.add_argument("--direction", default="a2b", choices=["a2b", "b2a"])
    p.add_argument("--calibration", default=None,
                   help="quant_stats .npz (required for w8a8_static)")
    p.add_argument("--input_folder", default=None,
                   help="eval images; omit for synthetic noise")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--num_batches", type=int, default=4)
    p.add_argument("--num_style", type=int, default=1,
                   help="unused placeholder for symmetry with calibrate "
                        "(one z per batch is compared)")
    p.add_argument("--modes", default="w8a8_static",
                   help="comma-separated: w8a8_static and/or w8a8")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--sheet", default=None,
                   help="save a [input | bf16 | quant...] comparison JPEG "
                        "of the first batch")
    args = p.parse_args()

    modes = [m.strip() for m in args.modes.split(",") if m.strip()]
    for m in modes:
        if m not in ("w8a8", "w8a8_static"):
            raise SystemExit(f"unknown quant mode {m!r}")

    results = compare(args.config, args.checkpoint, args.member,
                      args.direction, modes, calibration=args.calibration,
                      input_folder=args.input_folder,
                      batch_size=args.batch_size,
                      num_batches=args.num_batches, seed=args.seed,
                      sheet_path=args.sheet)
    for mode in modes:
        print(json.dumps(results[mode]))
    if args.sheet:
        print(f"sheet -> {args.sheet}")


if __name__ == "__main__":
    main()
