#!/usr/bin/env python
"""FID/KID between two image folders.

Usage:
  python tools/fid.py PATH_A PATH_B --weights inception.npz [--kid]

The reference repo ships no metric code (paper numbers were computed with
external tools); this CLI reproduces the pytorch-fid protocol: InceptionV3
pool3 features at 299px bilinear, Fréchet distance in float64.

``--weights`` is a converted InceptionV3 weight file (see
tools/convert_inception_pt.py). Without it the tool refuses to print an FID
(random-weight FID numbers are not comparable with anything) unless
``--allow-random`` is passed for smoke testing.
"""

import argparse
import json
import sys

sys.path.insert(0, ".")  # repo root


def main():
    from councilx.utils.platform import apply_env_platform
    apply_env_platform()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("folder_a")
    ap.add_argument("folder_b")
    ap.add_argument("--weights", default=None,
                    help=".npz from tools/convert_inception_pt.py")
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--kid", action="store_true", help="also compute KID")
    ap.add_argument("--kid-subset-size", type=int, default=1000)
    ap.add_argument("--allow-random", action="store_true",
                    help="permit random-weight features (smoke tests only)")
    args = ap.parse_args()

    import jax

    from councilx.eval.features import folder_features
    from councilx.eval.inception import (InceptionV3Features,
                                         init_random_params, load_params_npz)
    from councilx.eval.metrics import fid_from_features, kid_from_features

    if args.weights:
        model = InceptionV3Features()
        variables = load_params_npz(args.weights)
    elif args.allow_random:
        print("WARNING: random Inception weights — numbers are NOT "
              "comparable FID/KID values", file=sys.stderr)
        model, variables = init_random_params(jax.random.PRNGKey(0))
    else:
        ap.error("--weights required (or --allow-random for smoke tests)")

    fa = folder_features(args.folder_a, model, variables, args.batch_size)
    fb = folder_features(args.folder_b, model, variables, args.batch_size)

    out = {"fid": fid_from_features(fa, fb),
           "n_a": int(fa.shape[0]), "n_b": int(fb.shape[0])}
    if args.kid:
        kid_mean, kid_std = kid_from_features(
            fa, fb, subset_size=args.kid_subset_size)
        out["kid_mean"] = kid_mean
        out["kid_std"] = kid_std
    print(json.dumps(out))


if __name__ == "__main__":
    main()
