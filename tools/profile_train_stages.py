#!/usr/bin/env python
"""Measured phase/component attribution of the fused train step (VERDICT r4
item 4: give training the same stage table serving got, so the "non-conv
residual" decomposes into named, MEASURED items instead of conv-baseline
arithmetic).

The step is three sequential update phases inside ONE donated jit
(trainer._step): fakes forward -> council-dis update -> domain-dis update ->
generator update. A serving-style prefix-diff does not apply to a
fwd+bwd+optimizer graph, so each phase/component is timed as its OWN jit on
the same params/inputs the full step uses, interleaved round-robin in one
process (sequential whole-process numbers drift ~2x — CLAUDE.md):

  fakes_fwd       the detached council translation feeding both dis phases
  cdis_update     council-dis value_and_grad + adam
  dis_update      domain-dis value_and_grad + adam
  gen_loss_fwd    generator full loss, forward only
  gen_grad        generator value_and_grad (fwd + bwd)
  gen_opt_apply   adam update on precomputed gen grads (param-sized, no
                  activations — the optimizer cost row)
  full_step       the shipping donated jit

``sum(components) - full`` is the cross-phase fusion/CSE delta (z_mode=
"shared" deliberately lets XLA CSE the fakes forward into the gen phase, so
the components OVERCOUNT and the delta is expected negative).

Also reports the norm-stats marginal measured directly: gen_grad timed under
norm_stats=one_pass AND two_pass in the same process — the stats-read cost
that used to be attributed by arithmetic.

Env: PTS_BATCH (8), PTS_COUNCIL (4), PTS_STEPS (10), PTS_ROUNDS (3), plus
BENCH_* overrides via bench.headline_config. Timing barriers are
jax.device_get readbacks (block_until_ready is a no-op under the axon
tunnel — CLAUDE.md).
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    from councilx.utils.platform import apply_env_platform
    apply_env_platform()

    import jax
    import jax.numpy as jnp

    from bench import headline_config
    from councilx.losses.council import council_dis_loss
    from councilx.train.trainer import CouncilTrainer

    batch = int(os.environ.get("PTS_BATCH", "8"))
    council = int(os.environ.get("PTS_COUNCIL", "4"))
    steps = int(os.environ.get("PTS_STEPS", "10"))
    rounds = int(os.environ.get("PTS_ROUNDS", "3"))

    cfg = headline_config(batch, council)
    if "PTS_SIZE" in os.environ:       # CPU smoke: shrink the spatial size
        s = int(os.environ["PTS_SIZE"])
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(
                cfg.data, new_size=s + 14,
                crop_image_height=s, crop_image_width=s))
    trainer = CouncilTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    n, sd = trainer.n, cfg.gen.style_dim
    r = np.random.RandomState(0)
    hw = cfg.data.crop_image_height
    x_a = jnp.asarray(r.uniform(-1, 1, (batch, hw, hw, 3))
                      .astype(np.float32)).astype(trainer.dtype)
    x_b = jnp.asarray(r.uniform(-1, 1, (batch, hw, hw, 3))
                      .astype(np.float32)).astype(trainer.dtype)
    z = jnp.asarray(r.randn(n, batch, sd).astype(np.float32)).astype(
        trainer.dtype)
    d = trainer.directions[0]           # headline config: a2b only
    x_in, x_real = (x_a, x_b) if d == "a2b" else (x_b, x_a)

    gp = jax.tree_util.tree_map(jnp.copy, state.params[d]["gen"])
    dp = jax.tree_util.tree_map(jnp.copy, state.params[d]["dis"])
    cp = jax.tree_util.tree_map(jnp.copy, state.params[d]["cdis"])
    step0 = jnp.zeros((), jnp.int32)

    # ---- component jits (no donation: buffers are reused across rounds) --

    trace_only = int(os.environ.get("PTS_TRACE_ONLY", "0"))

    def fakes_fwd(gp):
        x_t, _, _ = trainer._translate_members(gp, x_in, z)
        return jax.lax.stop_gradient(x_t)

    if trace_only:   # shapes only — no compile
        fakes = jnp.zeros(jax.eval_shape(fakes_fwd, gp).shape,
                          trainer.dtype)
    else:
        fakes = jax.jit(fakes_fwd)(gp)
        jax.device_get(fakes[0, 0, 0, 0])

    def cdis_update(cp, opt):
        def loss_fn(t):
            return council_dis_loss(
                trainer._cdis_apply, t, fakes, x_in, trainer.gan_type,
                trainer.conditional, scan=cfg.remat,
                polarity=cfg.council.council_polarity)
        loss, grads = jax.value_and_grad(loss_fn)(cp)
        new, opt, _ = trainer._apply_if_finite(cp, grads, trainer.cdis_tx,
                                               opt)
        return new, loss

    def dis_update(dp, opt):
        def loss_fn(t):
            return trainer._dis_loss_dir(t, fakes, x_real, step0)
        loss, grads = jax.value_and_grad(loss_fn)(dp)
        new, opt, _ = trainer._apply_if_finite(dp, grads, trainer.dis_tx,
                                               opt)
        return new, loss

    def gen_loss(gp):
        ld, _ = trainer._gen_loss_dir(gp, dp, cp, x_in, z, step0)
        return ld

    gen_grad_fn = jax.value_and_grad(gen_loss)
    if trace_only:
        ggrads = jax.tree_util.tree_map(jnp.zeros_like, gp)
    else:
        _, ggrads = jax.jit(gen_grad_fn)(gp)
        ggrads = jax.tree_util.tree_map(jnp.copy, ggrads)
        jax.device_get(jax.tree_util.tree_leaves(ggrads)[0].ravel()[0])

    def gen_opt_apply(gp, opt):
        new, opt, _ = trainer._apply_if_finite(gp, ggrads, trainer.gen_tx,
                                               opt)
        return new

    # two_pass twin of gen_grad for the measured norm-stats marginal
    tr2 = CouncilTrainer(dataclasses.replace(cfg, norm_stats="two_pass"))

    def gen_loss_2p(gp):
        ld, _ = tr2._gen_loss_dir(gp, dp, cp, x_in, z, step0)
        return ld

    # optimizer states for the update components (cheap; re-fed, never
    # donated)
    opt_cdis = trainer.cdis_tx.init(cp)
    opt_dis = trainer.dis_tx.init(dp)
    opt_gen = trainer.gen_tx.init(gp)

    components = {
        "fakes_fwd": (jax.jit(fakes_fwd), (gp,)),
        "cdis_update": (jax.jit(cdis_update), (cp, opt_cdis)),
        "dis_update": (jax.jit(dis_update), (dp, opt_dis)),
        "gen_loss_fwd": (jax.jit(gen_loss), (gp,)),
        "gen_grad": (jax.jit(gen_grad_fn), (gp,)),
        "gen_grad_two_pass": (jax.jit(jax.value_and_grad(gen_loss_2p)),
                              (gp,)),
        "gen_opt_apply": (jax.jit(gen_opt_apply), (gp, opt_gen)),
    }

    def barrier(out):
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])

    if trace_only:
        # cheap CI/CPU check: trace every component (catches signature and
        # shape bugs) without paying the compiles
        for name, (fn, args) in components.items():
            fn.lower(*args)
            print(f"traced {name}", file=sys.stderr, flush=True)
        jax.jit(trainer._step, donate_argnums=(0,)).lower(state, x_a, x_b)
        print(json.dumps({"metric": "train_stage_profile",
                          "trace_only": True, "ok": True}))
        return

    # compile everything once
    for name, (fn, args) in components.items():
        barrier(fn(*args))
        print(f"compiled {name}", file=sys.stderr, flush=True)

    # full step last (donated): its state is threaded through the timing
    full_state = trainer.train_step(state, x_a, x_b)[0]
    jax.device_get(full_state.step)
    print("compiled full_step", file=sys.stderr)

    acc = {name: 0.0 for name in components}
    acc["full_step"] = 0.0
    for _ in range(rounds):
        for name, (fn, args) in components.items():
            t0 = time.perf_counter()
            for _ in range(steps):
                out = fn(*args)
            barrier(out)
            acc[name] += time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(steps):
            full_state, metrics = trainer.train_step(full_state, x_a, x_b)
        jax.device_get(metrics["loss_gen_total"])
        acc["full_step"] += time.perf_counter() - t0

    ms = {name: round(v / (rounds * steps) * 1e3, 1)
          for name, v in acc.items()}
    # the phases the full step actually runs once each
    phase_sum = (ms["fakes_fwd"] + ms["cdis_update"] + ms["dis_update"]
                 + ms["gen_grad"] + ms["gen_opt_apply"])
    rec = {
        "metric": "train_stage_profile",
        "batch": batch, "council": council,
        "rounds": rounds, "steps_per_block": steps,
        "ms": ms,
        "gen_bwd_ms": round(ms["gen_grad"] - ms["gen_loss_fwd"], 1),
        "norm_stats_marginal_ms": round(
            ms["gen_grad_two_pass"] - ms["gen_grad"], 1),
        "sum_phases_ms": round(phase_sum, 1),
        "fusion_delta_ms": round(ms["full_step"] - phase_sum, 1),
        "img_s_full": round(batch / (ms["full_step"] / 1e3), 2),
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
