#!/usr/bin/env python
"""Component-wise timing of the fused train step on the current device.

Times (readback barriers — block_until_ready is unreliable under the
remote-TPU tunnel) the full step and isolated pieces to guide kernel work.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from councilx.config import Config
from councilx.train.trainer import CouncilTrainer


def timeit(fn, *args, steps=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / steps


def main():
    batch = 8
    cfg = Config.from_dict({
        "batch_size": batch, "compute_dtype": "bfloat16",
        "council": {"council_size": 4, "council_w": 0.2,
                    "council_start_at_iter": 0},
        "focus_loss": {"focus_enabled": True},
        "gen": {"dim": 64, "mlp_dim": 256, "style_dim": 8,
                "n_downsample": 2, "n_res": 4},
        "dis": {"dim": 64, "n_layer": 4, "num_scales": 3},
        "new_size": 270, "crop_image_height": 256, "crop_image_width": 256,
    })
    trainer = CouncilTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    r = np.random.RandomState(0)
    x = jnp.asarray(r.uniform(-1, 1, (batch, 256, 256, 3)).astype(np.float32))
    z = jnp.asarray(r.randn(4, batch, 8).astype(np.float32)).astype(
        trainer.dtype)
    xb = x.astype(trainer.dtype)

    # copy params out so the donating full-step timing (run LAST) can't
    # delete the buffers the component probes use
    gp = jax.tree_util.tree_map(jnp.copy, state.params["a2b"]["gen"])
    dp = jax.tree_util.tree_map(jnp.copy, state.params["a2b"]["dis"])
    cp = jax.tree_util.tree_map(jnp.copy, state.params["a2b"]["cdis"])

    fwd = jax.jit(lambda gp, xb, z: trainer._translate_members(gp, xb, z)[0])
    t_fwd = timeit(fwd, gp, xb, z)

    def gen_fwd_bwd(gp, xb, z):
        def loss(gp):
            x_t, mask, _ = trainer._translate_members(gp, xb, z)
            return jnp.mean(x_t.astype(jnp.float32) ** 2)
        return jax.grad(loss)(gp)

    t_fwdbwd = timeit(jax.jit(gen_fwd_bwd), gp, xb, z)

    fakes = fwd(gp, xb, z)

    def dis_loss(dp, fakes, real):
        return trainer._dis_loss_dir(dp, fakes, real, state.step)

    t_dis = timeit(jax.jit(lambda dp: jax.grad(
        lambda p: dis_loss(p, fakes, xb))(dp)), dp)

    from councilx.losses.council import council_dis_loss

    t_cdis = timeit(jax.jit(lambda cp: jax.grad(
        lambda p: council_dis_loss(trainer._cdis_apply, p, fakes, xb,
                                   "lsgan", True))(cp)), cp)

    def gen_full_loss(gp):
        l, _ = trainer._gen_loss_dir(gp, dp, cp, xb, z, state.step)
        return l

    t_genloss = timeit(jax.jit(lambda gp: jax.grad(gen_full_loss)(gp)), gp)

    # term-by-term: rebuild the gen loss with single terms enabled, grad each
    def term_times():
        import dataclasses
        base = dict(gan_w=0.0, recon_x_w=0.0, recon_s_w=0.0, recon_c_w=0.0)
        out = {}
        variants = {
            "adv only": dict(gan_w=1.0),
            "recon_x only": dict(recon_x_w=10.0),
            "recon_s only": dict(recon_s_w=1.0),
            "recon_c only": dict(recon_c_w=1.0),
            "council only": {},
            "mask only": {},
        }
        for name, ov in variants.items():
            kw = dict(base, **ov)
            c2 = dataclasses.replace(cfg, **kw)
            if name == "mask only":
                c2 = dataclasses.replace(
                    c2, council=dataclasses.replace(c2.council,
                                                    council_w=0.0))
            elif name == "council only":
                # keep council_w, zero the mask terms (the focus branch
                # otherwise rides along and double-counts)
                c2 = dataclasses.replace(
                    c2, council=dataclasses.replace(
                        c2.council, focus_enabled=True,
                        mask_total_w=0.0, mask_zero_or_one_w=0.0))
            else:
                c2 = dataclasses.replace(
                    c2, council=dataclasses.replace(
                        c2.council, council_w=0.0, focus_enabled=True,
                        mask_total_w=0.0, mask_zero_or_one_w=0.0))
            t2 = CouncilTrainer(c2)

            def loss(gp):
                l, _ = t2._gen_loss_dir(gp, dp, cp, xb, z, state.step)
                return l

            out[name] = timeit(jax.jit(lambda gp: jax.grad(loss)(gp)), gp)
        return out

    terms = term_times()

    # full step LAST: the jitted step donates its input state each call, so
    # re-feed the returned state
    def time_full(state, steps=10, warmup=3):
        for _ in range(warmup):
            state, m = trainer._jit_step(state, x, x)
        jax.device_get(m)
        t0 = time.perf_counter()
        for _ in range(steps):
            state, m = trainer._jit_step(state, x, x)
        jax.device_get(m)
        return (time.perf_counter() - t0) / steps, state

    t_full, state = time_full(state)

    print(f"full step            : {t_full*1e3:8.1f} ms "
          f"({batch / t_full:6.2f} img/s)")
    print(f"gen fwd (4 members)  : {t_fwd*1e3:8.1f} ms")
    print(f"gen fwd+bwd          : {t_fwdbwd*1e3:8.1f} ms")
    print(f"dis update grad      : {t_dis*1e3:8.1f} ms")
    print(f"council-dis grad     : {t_cdis*1e3:8.1f} ms")
    print(f"gen full loss grad   : {t_genloss*1e3:8.1f} ms")
    for name, t in terms.items():
        print(f"  gen grad {name:12s}: {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
