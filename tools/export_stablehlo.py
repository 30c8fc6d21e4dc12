#!/usr/bin/env python
"""Export the batched translation function as serialized StableHLO.

Production-serving path: the jitted encode -> style -> decode -> composite
function (optionally all council members at once) exports via ``jax.export``
into a self-contained artifact that any StableHLO-compatible runtime (XLA
AOT, IFRT serving stacks) can load without Python — plus a .npz of the
generator parameters.

Usage:
  python tools/export_stablehlo.py --config cfg.yaml --checkpoint ckpt \
      --out model.stablehlo [--batch 64] [--all-members]

Round-trip check: --selftest deserializes the artifact and compares against
the live function on random inputs.
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--all-members", action="store_true")
    ap.add_argument("--direction", default="a2b")
    ap.add_argument("--selftest", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jexport

    from councilx.ckpt.manager import save_params_npz
    from councilx.config import load_config
    from councilx.inference.translate import Translator
    from councilx.ckpt.manager import load_generator_params

    cfg = load_config(args.config)
    tr = Translator(cfg)
    params = load_generator_params(args.checkpoint, cfg, args.direction)
    n = jax.tree_util.tree_leaves(params)[0].shape[0]
    h = cfg.data.crop_image_height
    sd = cfg.gen.style_dim

    if args.all_members:
        fn = jax.jit(lambda p, x, z: tr._translate_all_members.__wrapped__(
            tr, p, x, z))
        z_shape = (n, args.batch, sd)
        p_arg = params
    else:
        p_arg = jax.tree_util.tree_map(lambda l: l[0], params)
        fn = jax.jit(lambda p, x, z: tr._translate.__wrapped__(tr, p, x, z))
        z_shape = (args.batch, sd)

    x_spec = jax.ShapeDtypeStruct((args.batch, h, h, 3), jnp.float32)
    z_spec = jax.ShapeDtypeStruct(z_shape, jnp.float32)
    p_spec = jax.tree_util.tree_map(
        lambda l: jax.ShapeDtypeStruct(l.shape, l.dtype), p_arg)

    exported = jexport.export(fn)(p_spec, x_spec, z_spec)
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    save_params_npz(args.out + ".params.npz", p_arg)
    print(f"wrote {len(blob)} bytes of StableHLO to {args.out} "
          f"(+ params npz); in_avals={[str(a) for a in exported.in_avals][-2:]}")

    if args.selftest:
        r = np.random.RandomState(0)
        x = jnp.asarray(r.uniform(-1, 1, x_spec.shape).astype(np.float32))
        z = jnp.asarray(r.randn(*z_shape).astype(np.float32))
        live = fn(p_arg, x, z)
        reloaded = jexport.deserialize(blob)
        again = reloaded.call(p_arg, x, z)
        a = np.asarray(jax.device_get(live[0]))
        b = np.asarray(jax.device_get(again[0]))
        err = float(np.max(np.abs(a - b)))
        print(f"selftest max|diff| = {err:.2e}")
        assert err < 1e-4
        print("selftest ok")


if __name__ == "__main__":
    main()
