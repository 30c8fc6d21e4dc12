#!/usr/bin/env python
"""Calibrate static W8A8 activation scales for quantized serving.

Runs the serving forward (encode_content -> decode) in ``w8a8_calib`` mode
over a folder of images (or synthetic noise), accumulating each quantized
conv's running activation absmax into the flax ``quant_stats`` collection,
and saves the stats pytree as an .npz. Serve with them:

    python tools/calibrate_quant.py --config cfg.yaml --checkpoint gen.npz \
        --member 0 --input_folder imgs/ [--num_batches 8] [--num_style 4] \
        --out quant_stats.npz
    python serve.py --config cfg.yaml --checkpoint gen.npz --member 0 \
        --quant w8a8_static --calibration quant_stats.npz

Why static scales: the dynamic per-conv max-reduces of plain ``w8a8``
measured 0.86x vs bf16 end-to-end, while the same int8 convs with
precomputed scales measured 1.03-1.06x (BASELINE.md W8A8 section). Scales
bake into the serving executable as constants.

Calibration spans styles as well as content: each batch is decoded with
``--num_style`` fresh z draws so the AdaIN-conditioned decoder activations
see the style distribution they will serve.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

# apply_env_platform() runs in main(), not at import — importable modules
# must not re-apply the ambient JAX_PLATFORMS over a test harness's
# forced-CPU config (see tools/quant_quality.py for the full story).


def main():
    from councilx.utils.platform import apply_env_platform

    apply_env_platform()
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--member", type=int, default=0)
    p.add_argument("--direction", default="a2b", choices=["a2b", "b2a"])
    p.add_argument("--input_folder", default=None,
                   help="calibration images; omit for synthetic noise")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--num_batches", type=int, default=8)
    p.add_argument("--num_style", type=int, default=4,
                   help="fresh style draws decoded per batch")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="quant_stats.npz")
    args = p.parse_args()

    from councilx.ckpt.manager import save_params_npz
    from councilx.config import load_config
    from councilx.nn.generator import AdaINGen
    from councilx.inference.translate import Translator
    from councilx.ckpt.manager import load_generator_params

    cfg = load_config(args.config)
    cfg.quant = "w8a8_calib"
    # Translator refuses calib mode (its jits are immutable); build the
    # module the same way it would, then drive apply(mutable=) directly.
    cfg_probe = load_config(args.config)
    cfg_probe.quant = "none"
    tr = Translator(cfg_probe)
    gen = tr.gen.copy(quant="w8a8_calib")

    stacked = load_generator_params(args.checkpoint, cfg, args.direction)
    params = jax.tree_util.tree_map(lambda l: l[args.member], stacked)

    hw = cfg.data.crop_image_height
    dummy = jnp.zeros((1, hw, hw, 3), jnp.float32)
    stats = gen.init(jax.random.PRNGKey(0), dummy)["quant_stats"]

    @jax.jit
    def calib_step(stats, x, zs):
        variables = {"params": params, "quant_stats": stats}
        c, upd = gen.apply(variables, x.astype(tr.dtype),
                           method=AdaINGen.encode_content,
                           mutable=["quant_stats"])
        stats = upd["quant_stats"]

        def body(st, z):
            variables = {"params": params, "quant_stats": st}
            _, upd = gen.apply(variables, c, z.astype(tr.dtype),
                               method=AdaINGen.decode,
                               mutable=["quant_stats"])
            return upd["quant_stats"], None

        stats, _ = jax.lax.scan(body, stats, zs)
        return stats

    ds = None
    if args.input_folder:
        from councilx.data.dataset import ImageFolderDataset
        ds = ImageFolderDataset(args.input_folder,
                                new_size=cfg.data.new_size,
                                crop=cfg.data.crop_image_height)
        if not len(ds):
            raise SystemExit(f"no images in {args.input_folder}")
    from councilx.data.ondevice import normalize_batch
    r = np.random.RandomState(args.seed)
    key = jax.random.PRNGKey(args.seed)
    n_seen = 0
    for b in range(args.num_batches):
        if ds is not None:
            arrs = np.stack(
                [ds[(b * args.batch_size + i) % len(ds)]
                 for i in range(args.batch_size)])
            x = np.asarray(normalize_batch(jnp.asarray(arrs)))
        else:
            x = r.uniform(-1, 1, (args.batch_size, hw, hw, 3)
                          ).astype(np.float32)
        key, sub = jax.random.split(key)
        zs = jax.random.normal(
            sub, (args.num_style, x.shape[0], cfg.gen.style_dim))
        stats = calib_step(stats, jnp.asarray(x), zs)
        n_seen += x.shape[0]

    stats = jax.device_get(stats)
    maxima = np.array([float(l) for l in jax.tree_util.tree_leaves(stats)])
    save_params_npz(args.out, stats)
    print(f"calibrated {maxima.size} conv scales over {n_seen} images x "
          f"{args.num_style} styles -> {args.out} "
          f"(absmax range [{maxima.min():.3g}, {maxima.max():.3g}])")


if __name__ == "__main__":
    main()
