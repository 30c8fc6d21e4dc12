"""One-command checkpoint -> FID/KID evaluation (VERDICT r2 item 3):

    councilx-eval --config configs/male2female_council_folder.yaml \
        --checkpoint outputs/run/checkpoints --input_folder testA/ \
        --target_folder testB/ --weights inception.npz [--kid] \
        [--member 0 | --member all]

Implements the north-star FID-parity protocol end to end (BASELINE.md
§protocol): translate every image in ``--input_folder`` with the checkpointed
generator (batched, jitted — reference test_on_folder.py runs per-image), then
score the translations against ``--target_folder`` with InceptionV3 pool3
features (pytorch-fid protocol: 299px PIL-bilinear, Fréchet in float64).

Checkpoint formats: orbax snapshot dir (or its checkpoints/ parent — newest
used), .npz generator export, or a reference gen_*.pt (converted on the fly).
Features are computed from the translated uint8 arrays directly — identical
to writing lossless PNGs and re-reading them, without the disk round trip;
pass --save_translations DIR to also keep the images. Prints one JSON line:
{"fid": ..., "kid": ..., "n_translated": ..., ...}. (From a source checkout:
``python tools/eval_checkpoint.py ...``.)
"""

import argparse
import json
import os
import sys


def translated_feature_batches(translator, params, ds, member, rng,
                               batch_size, save_dir=None):
    """Yield 299px [-1,1] feature batches of the translated input folder."""
    import numpy as np
    from PIL import Image
    import jax
    import jax.numpy as jnp

    from councilx.data.ondevice import normalize_batch
    from councilx.inference.translate import denormalize_to_uint8

    for start in range(0, len(ds), batch_size):
        idxs = list(range(start, min(start + batch_size, len(ds))))
        arrs = np.stack([ds[i] for i in idxs])
        pad = batch_size - arrs.shape[0]
        if pad:  # pad tail batch -> one jit signature
            arrs = np.concatenate([arrs, np.repeat(arrs[-1:], pad, axis=0)])
        x = normalize_batch(jnp.asarray(arrs))
        rng, k = jax.random.split(rng)
        out, _ = translator.translate(params, x, rng=k, member=member)
        out_u8 = denormalize_to_uint8(np.asarray(out))[:len(idxs)]
        feats = []
        for j, i in enumerate(idxs):
            img = Image.fromarray(out_u8[j])
            if save_dir:
                base = os.path.splitext(os.path.basename(ds.paths[i]))[0]
                img.save(os.path.join(save_dir, f"{base}.png"))
            img = img.resize((299, 299), Image.BILINEAR)
            feats.append(np.asarray(img, dtype=np.float32) / 127.5 - 1.0)
        yield np.stack(feats)


def per_member_features(translator, params, ds, rng, batch_size, feat_fn,
                        save_dir=None):
    """Inception features of every member's translations in ONE pass.

    The dataset is read once and each batch is translated by ALL council
    members in a single vmapped device call (inference/translate.py
    ``_translate_all_members``) — only the host-side Inception feature
    passes multiply with council_size. Each member draws its own style z
    per batch (the translate_all_members convention), matching N
    independent single-member runs distributionally. Returns a list of
    (n_images, 2048) arrays indexed by member.
    """
    import numpy as np
    from PIL import Image
    import jax
    import jax.numpy as jnp

    from councilx.data.ondevice import normalize_batch
    from councilx.eval.features import (extract_features,
                                        u8_to_inception_inputs)
    from councilx.inference.translate import denormalize_to_uint8

    feats = None
    for start in range(0, len(ds), batch_size):
        idxs = list(range(start, min(start + batch_size, len(ds))))
        arrs = np.stack([ds[i] for i in idxs])
        pad = batch_size - arrs.shape[0]
        if pad:  # pad tail batch -> one jit signature
            arrs = np.concatenate([arrs, np.repeat(arrs[-1:], pad, axis=0)])
        x = normalize_batch(jnp.asarray(arrs))
        rng, k = jax.random.split(rng)
        out, _ = translator.translate_all_members(params, x, rng=k)
        out_u8 = denormalize_to_uint8(np.asarray(out))[:, :len(idxs)]
        if feats is None:
            feats = [[] for _ in range(out_u8.shape[0])]
        for m in range(out_u8.shape[0]):
            if save_dir:
                mdir = os.path.join(save_dir, f"m{m}")
                os.makedirs(mdir, exist_ok=True)
                for j, i in enumerate(idxs):
                    base = os.path.splitext(
                        os.path.basename(ds.paths[i]))[0]
                    Image.fromarray(out_u8[m, j]).save(
                        os.path.join(mdir, f"{base}.png"))
            feats[m].append(extract_features(
                feat_fn, [u8_to_inception_inputs(out_u8[m])],
                pad_batch=batch_size))
    return [np.concatenate(f) for f in feats]


def main(argv=None):
    from councilx.utils.platform import apply_env_platform
    apply_env_platform()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--input_folder", required=True)
    ap.add_argument("--target_folder", required=True)
    ap.add_argument("--weights", default=None,
                    help="InceptionV3 .npz (tools/convert_inception_pt.py)")
    ap.add_argument("--allow-random", action="store_true",
                    help="permit random Inception weights (smoke tests only)")
    ap.add_argument("--kid", action="store_true", help="also compute KID")
    ap.add_argument("--kid-subset-size", type=int, default=1000)
    ap.add_argument("--member", default="0",
                    help="council member index, or 'all' for the paper's "
                         "best-member protocol (per-member FID/KID in one "
                         "run + the argmin)")
    ap.add_argument("--direction", default="a2b", choices=["a2b", "b2a"])
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--feature_batch_size", type=int, default=32)
    ap.add_argument("--save_translations", default=None,
                    help="also write the translated images here (png)")
    args = ap.parse_args(argv)

    import jax

    from councilx.config import load_config
    from councilx.data.dataset import ImageFolderDataset
    from councilx.eval.features import extract_features, folder_features
    from councilx.eval.inception import (InceptionV3Features,
                                         init_random_params, load_params_npz)
    from councilx.eval.metrics import fid_from_features, kid_from_features
    from councilx.inference.translate import Translator
    from councilx.ckpt.manager import load_generator_params

    if args.weights:
        model = InceptionV3Features()
        variables = load_params_npz(args.weights)
    elif args.allow_random:
        print("WARNING: random Inception weights — numbers are NOT "
              "comparable FID/KID values", file=sys.stderr)
        model, variables = init_random_params(jax.random.PRNGKey(0))
    else:
        ap.error("--weights required (or --allow-random for smoke tests)")

    cfg = load_config(args.config)
    translator = Translator(cfg)
    params = load_generator_params(args.checkpoint, cfg, args.direction)
    ds = ImageFolderDataset(args.input_folder, new_size=cfg.data.new_size,
                            crop=cfg.data.crop_image_height)
    if args.save_translations:
        os.makedirs(args.save_translations, exist_ok=True)

    feat_fn = jax.jit(lambda x: model.apply(variables, x))
    f_target = folder_features(args.target_folder, model, variables,
                               args.feature_batch_size)

    if args.member == "all":
        # paper protocol: score every member, report the best (min FID)
        member_feats = per_member_features(
            translator, params, ds, jax.random.PRNGKey(args.seed),
            args.batch_size, feat_fn, save_dir=args.save_translations)
        fids = [fid_from_features(f, f_target) for f in member_feats]
        best = min(range(len(fids)), key=lambda m: fids[m])
        out = {"fid": fids[best], "fid_per_member": fids,
               "best_member": best,
               "n_translated": int(member_feats[0].shape[0]),
               "n_target": int(f_target.shape[0]),
               "member": "all", "direction": args.direction,
               "checkpoint": args.checkpoint}
        if args.kid:
            out["kid_per_member"] = [
                kid_from_features(f, f_target,
                                  subset_size=args.kid_subset_size)
                for f in member_feats]
            out["kid"] = out["kid_per_member"][best]
        print(json.dumps(out))
        return out

    member = int(args.member)
    f_trans = extract_features(
        feat_fn,
        translated_feature_batches(
            translator, params, ds, member,
            jax.random.PRNGKey(args.seed), args.batch_size,
            save_dir=args.save_translations),
        pad_batch=args.batch_size)

    out = {"fid": fid_from_features(f_trans, f_target),
           "n_translated": int(f_trans.shape[0]),
           "n_target": int(f_target.shape[0]),
           "member": member, "direction": args.direction,
           "checkpoint": args.checkpoint}
    if args.kid:
        out["kid"] = kid_from_features(f_trans, f_target,
                                       subset_size=args.kid_subset_size)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
