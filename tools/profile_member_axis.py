#!/usr/bin/env python
"""Measure how the council member axis maps to hardware: vmapped stacked
params (lowers convs to feature_group_count=N grouped convolutions) vs a
lax.map loop over members (N dense convs). Whichever wins becomes the
default member-application strategy."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from councilx.config import Config
from councilx.inference.translate import Translator


def timeit(fn, *args, steps=10):
    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        jax.device_get(jnp.sum(leaf.astype(jnp.float32)))

    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / steps


def main():
    batch, n = 8, 4
    cfg = Config.from_dict({
        "batch_size": batch, "compute_dtype": "bfloat16",
        "council": {"council_size": n},
        "focus_loss": {"focus_enabled": True},
        "gen": {"dim": 64, "mlp_dim": 256, "style_dim": 8,
                "n_downsample": 2, "n_res": 4},
        "new_size": 270, "crop_image_height": 256, "crop_image_width": 256,
    })
    tr = Translator(cfg)
    r = np.random.RandomState(0)
    x = jnp.asarray(r.uniform(-1, 1, (batch, 256, 256, 3)),
                    jnp.bfloat16)
    dummy = jnp.zeros((1, 256, 256, 3), jnp.float32)
    params = jax.vmap(tr.gen.init, in_axes=(0, None))(
        jax.random.split(jax.random.PRNGKey(0), n), dummy)["params"]
    z = jnp.zeros((n, batch, cfg.gen.style_dim), jnp.bfloat16)
    p0 = jax.tree_util.tree_map(lambda l: l[0], params)

    def one(p, z_i):
        c = tr.gen.apply({"params": p}, x, method="encode_content")
        return tr.gen.apply({"params": p}, c, z_i, method="decode")

    def report(name, thunk):
        try:
            t = thunk()
            print(f"{name:24s}: {t*1e3:7.1f} ms", flush=True)
            return t
        except Exception as e:  # OOM etc.
            print(f"{name:24s}: FAILED ({type(e).__name__})", flush=True)
            return None

    report("single member fwd",
           lambda: timeit(jax.jit(lambda p: one(p, z[0])), p0))
    report(f"vmap x{n} fwd",
           lambda: timeit(jax.jit(lambda ps: jax.vmap(one)(ps, z)), params))
    report(f"lax.map x{n} fwd",
           lambda: timeit(jax.jit(lambda ps: jax.lax.map(
               lambda pz: one(pz[0], pz[1]), (ps, z))), params))

    # backward too — training is fwd+bwd
    def loss_vmap(ps):
        return jnp.mean(jax.vmap(one)(ps, z).astype(jnp.float32) ** 2)

    def loss_map(ps):
        def one_ckpt(pz):
            return one(pz[0], pz[1])
        return jnp.mean(jax.lax.map(
            jax.checkpoint(one_ckpt), (ps, z)).astype(jnp.float32) ** 2)

    def loss_single(p):
        return jnp.mean(one(p, z[0]).astype(jnp.float32) ** 2)

    report("single member fwd+bwd",
           lambda: timeit(jax.jit(jax.grad(loss_single)), p0))
    report(f"vmap x{n} fwd+bwd",
           lambda: timeit(jax.jit(jax.grad(loss_vmap)), params))
    report(f"lax.map x{n} fwd+bwd",
           lambda: timeit(jax.jit(jax.grad(loss_map)), params))


if __name__ == "__main__":
    main()
