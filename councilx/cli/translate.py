"""Folder inference CLI, mirroring the reference test_on_folder.py:

    councilx-translate --config configs/galsses_council_folder.yaml \
        --checkpoint outputs/run/checkpoints --input_folder in/ \
        --output_folder out/ [--seed 1] [--num_style 1] [--member 0|all]

Checkpoint may be: an orbax snapshot dir produced by training (or its parent
checkpoints/ dir — newest is used), an .npz generator export, or a reference
gen_*.pt file (converted on the fly via councilx.ckpt.torch_convert; requires
torch). Unlike the reference's per-image Python loop, images run BATCHED
through one jitted translate. (From a source checkout:
``python test_on_folder.py ...``.)
"""

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp

from councilx.config import load_config
from councilx.ckpt.manager import load_generator_params
from councilx.data.dataset import ImageFolderDataset
from councilx.data.ondevice import normalize_batch
from councilx.inference.translate import Translator


def main():
    from councilx.utils.platform import apply_env_platform
    apply_env_platform()
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--input_folder", required=True)
    p.add_argument("--output_folder", required=True)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--num_style", type=int, default=1,
                   help="style samples per input image")
    p.add_argument("--member", default="0",
                   help="council member index, or 'all'")
    p.add_argument("--direction", default="a2b", choices=["a2b", "b2a"])
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--style_image", default=None,
                   help="style-guided mode: take the style code from this "
                        "example image instead of sampling z (uses the "
                        "generator's style encoder)")
    p.add_argument("--data_parallel", type=int, default=0,
                   help="shard each batch over this many devices "
                        "(0 = single device; batch_size must divide evenly)")
    args = p.parse_args()

    cfg = load_config(args.config)
    if args.data_parallel > 1:
        from councilx.inference.translate import ShardedTranslator
        from councilx.parallel.mesh import make_mesh
        if args.batch_size % args.data_parallel:
            raise SystemExit(f"--batch_size {args.batch_size} not divisible "
                             f"by --data_parallel {args.data_parallel}")
        translator = ShardedTranslator(
            cfg, make_mesh(n_devices=args.data_parallel))
    else:
        translator = Translator(cfg)
    params = load_generator_params(args.checkpoint, cfg, args.direction)
    os.makedirs(args.output_folder, exist_ok=True)

    n_members = jax.tree_util.tree_leaves(params)[0].shape[0]
    members = (list(range(n_members)) if args.member == "all"
               else [int(args.member)])

    ds = ImageFolderDataset(args.input_folder, new_size=cfg.data.new_size,
                            crop=cfg.data.crop_image_height)

    from PIL import Image

    style_z = None
    if args.style_image:
        from councilx.data.dataset import _load_resize_crop
        arr = _load_resize_crop(args.style_image, cfg.data.new_size,
                                cfg.data.crop_image_height)
        xs = normalize_batch(jnp.asarray(arr[None]))
        # per-member style code of the example image: (n_members, 1, S)
        style_z = {m: translator.encode_style(params, xs, member=m)
                   for m in members}
        if args.num_style > 1:
            print("note: --style_image fixes the style; num_style ignored")
            args.num_style = 1

    rng = jax.random.PRNGKey(args.seed)
    count = 0
    bs = args.batch_size
    for start in range(0, len(ds), bs):
        idxs = list(range(start, min(start + bs, len(ds))))
        arrs = np.stack([ds[i] for i in idxs])
        # pad the tail batch to the full size to avoid a recompile
        pad = bs - arrs.shape[0]
        if pad:
            arrs = np.concatenate([arrs, np.repeat(arrs[-1:], pad, axis=0)])
        x = normalize_batch(jnp.asarray(arrs))
        for m in members:
            for s in range(args.num_style):
                rng, k = jax.random.split(rng)
                z = (jnp.broadcast_to(style_z[m], (x.shape[0],
                                                   style_z[m].shape[-1]))
                     if style_z is not None else None)
                out_u8 = translator.translate_u8(params, x, z=z, rng=k,
                                                 member=m)
                for j, i in enumerate(idxs):
                    base = os.path.splitext(os.path.basename(ds.paths[i]))[0]
                    suffix = (f"_m{m}" if len(members) > 1 else "") + (
                        f"_s{s}" if args.num_style > 1 else "")
                    Image.fromarray(out_u8[j]).save(os.path.join(
                        args.output_folder, f"{base}{suffix}.jpg"))
        count += len(idxs)
    print(f"translated {count} images -> {args.output_folder}")


if __name__ == "__main__":
    main()
