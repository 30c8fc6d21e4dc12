"""Council trainer: stacked-member parameters + one fused, jitted train step.

Reference parity: trainer_council.py::Council_Trainer (gen_update /
dis_update / dis_council_update / sample / forward). Differences — all
TPU-first by design, none semantic:

  * the council is a LEADING PARAMETER AXIS: one AdaINGen parameter pytree of
    shape (N, ...) per direction, applied via jax.vmap — the reference's
    Python lists (gen_a2b_s, dis_a2b_s, dis_council_a2b_s) run members
    serially on the GPU;
  * the three reference update methods fuse into ONE jit region per step
    (council-dis -> dis -> gen, same order and same "gen sees the freshly
    updated discriminators" semantics as the reference's in-place updates);
  * torch's .detach() fake-handling becomes jax.lax.stop_gradient;
  * the two discriminator updates share one set of detached fakes (the
    reference recomputes them per update with fresh z — distributionally
    identical, one fewer full council forward per step);
  * three optax groups with torch-Adam semantics (train/optim.py) replace
    the three torch.optim.Adam groups + StepLR schedulers.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from councilx.config import Config
from councilx.losses.council import council_dis_loss, council_gen_loss
from councilx.losses.focus import mask_binary_loss, mask_size_loss, mask_tv_loss
from councilx.losses.gan import gan_dis_loss, gan_gen_loss
from councilx.nn.blocks import make_kernel_init
from councilx.nn.discriminator import MsImageDis
from councilx.nn.generator import AdaINGen, composite_with_mask
from councilx.train.optim import make_optimizers


def draw_phase_zs(draw, directions, z_mode: str):
    """Per-phase style draws (reference: trainer_council.py draws
    torch.randn independently inside gen_update / dis_update /
    dis_council_update — SURVEY.md §3.2/§3.3).

    ``draw(fold)`` produces one (N, B, style_dim) draw from a fold constant;
    fold families: gen = di, dis fakes = 100 + di, cdis fakes = 200 + di
    (di = direction index). Returns ``(zs_gen, zs_cdis, zs_dis)`` dicts
    keyed by direction — the SAME dict object where phases share a stream,
    so callers can reuse the already-computed fakes (``zs_cdis is zs_dis``).

    Known micro-gap vs the reference stream (deliberate, not worth fixing):
    the ``cdis_ratio_mode="k_per_step"`` repeat draws
    (``fold_in(k_z, 1000 + it*8 + di)`` in ``_step``) derive from the SAME
    per-step base key ``k_z`` as the phase draws above, whereas the
    reference's ``torch.randn`` calls share only the global generator state
    — no structural coupling. Every fold constant is distinct, so all draws
    remain mutually independent standard normals; the coupling is purely in
    the counter-mode key derivation and is distributionally irrelevant.
    """
    zs_gen = {d: draw(di) for di, d in enumerate(directions)}
    if z_mode == "shared":
        return zs_gen, zs_gen, zs_gen
    zs_dis = {d: draw(100 + di) for di, d in enumerate(directions)}
    if z_mode == "dis_shared":
        return zs_gen, zs_dis, zs_dis
    if z_mode != "per_phase":
        raise ValueError(f"unsupported z_mode: {z_mode}")
    zs_cdis = {d: draw(200 + di) for di, d in enumerate(directions)}
    return zs_gen, zs_cdis, zs_dis


class TrainState(struct.PyTreeNode):
    """Everything that changes during training, as one donatable pytree."""

    step: jnp.ndarray
    rng: jax.Array
    # params[direction][group]; direction in {'a2b','b2a'}, group in
    # {'gen','dis','cdis'}; every leaf has a leading council axis (N, ...)
    params: Dict[str, Dict[str, Any]]
    opt_gen: Any
    opt_dis: Any
    opt_cdis: Any


class CouncilTrainer:
    """Builds models/optimizers and exposes the fused train step.

    Host-side orchestration (logging cadence, checkpointing) lives in
    train/loop.py; everything here is jit-compiled.
    """

    def __init__(self, cfg: Config):
        self.cfg = cfg
        use_pallas = cfg.use_pallas and not cfg.parity_mode
        use_pallas_norm = cfg.use_pallas_norm and not cfg.parity_mode
        self.n = cfg.council.council_size
        self.directions = [d for d, on in (("a2b", cfg.do_a2b),
                                           ("b2a", cfg.do_b2a)) if on]
        self.focus = cfg.council.focus_enabled
        self.gan_type = cfg.dis.gan_type
        self.conditional = cfg.council.council_conditional_input
        self.dtype = (jnp.float32 if cfg.parity_mode
                      or cfg.compute_dtype == "float32" else jnp.bfloat16)

        g = cfg.gen
        self.gen = AdaINGen(
            input_dim=cfg.data.input_dim_a, dim=g.dim, style_dim=g.style_dim,
            n_downsample=g.n_downsample, n_res=g.n_res, activ=g.activ,
            pad_type=g.pad_type, mlp_dim=g.mlp_dim, mlp_n_blk=g.mlp_n_blk,
            focus_mask=self.focus, kernel_init=make_kernel_init(cfg.init),
            dtype=self.dtype,
            fuse_upsample=cfg.fuse_upsample and not cfg.parity_mode,
            use_pallas=use_pallas, use_pallas_norm=use_pallas_norm,
            in_precision="f32" if cfg.parity_mode else cfg.in_precision,
            in_stats="two_pass" if cfg.parity_mode else cfg.norm_stats,
            boundary_engine=("reference" if cfg.parity_mode
                             else cfg.boundary_engine),
            upsample_engine=cfg.upsample_engine,
            resblock_fuse_pad=(cfg.resblock_fuse_pad
                               and not cfg.parity_mode),
            mask_activation=cfg.council.mask_activation,
            remat_stages=cfg.remat_stages)
        self.mask_activation = cfg.council.mask_activation
        d = cfg.dis
        dis_kwargs = dict(dim=d.dim, n_layer=d.n_layer, norm=d.norm,
                          activ=d.activ, num_scales=d.num_scales,
                          pad_type=d.pad_type, gan_type=d.gan_type,
                          kernel_init=make_kernel_init("gaussian"),
                          dtype=self.dtype, use_pallas=use_pallas,
                          use_pallas_norm=use_pallas_norm)
        self.dis = MsImageDis(input_dim=cfg.data.input_dim_a, **dis_kwargs)
        cdis_in = cfg.data.input_dim_a * (2 if self.conditional else 1)
        self.cdis = MsImageDis(input_dim=cdis_in, **dis_kwargs)

        self.gen_tx, self.dis_tx, self.cdis_tx = make_optimizers(cfg)
        self.has_council = self.n > 1 and cfg.council.council_w > 0

        # MUNIT-inherited VGG perceptual loss (vgg_w is 0 in all shipped
        # council configs); weights are frozen constants in the jit closure
        self.vgg_params = None
        if cfg.vgg_w:
            from councilx.nn.vgg import load_vgg_npz
            path = cfg.extras.get("vgg_model_path")
            if not path:
                raise ValueError(
                    "vgg_w > 0 requires extras.vgg_model_path (a converted "
                    "VGG16 .npz; see tools/convert_vgg_pt.py)")
            self.vgg_params = load_vgg_npz(path)

        self._jit_step = jax.jit(self._step, donate_argnums=(0,))
        self._jit_sample = jax.jit(self._sample_members)

    # ------------------------------------------------------------------
    # initialization
    # ------------------------------------------------------------------

    def init_state(self, rng: jax.Array) -> TrainState:
        cfg = self.cfg
        h, w = cfg.data.crop_image_height, cfg.data.crop_image_width
        dummy = jnp.zeros((1, h, w, cfg.data.input_dim_a), jnp.float32)
        dummy_pair = jnp.zeros((1, h, w, self.cdis.input_dim), jnp.float32)

        params: Dict[str, Dict[str, Any]] = {}
        for d in self.directions:
            rng, kg, kd, kc = jax.random.split(rng, 4)
            gen_p = jax.vmap(self.gen.init, in_axes=(0, None))(
                jax.random.split(kg, self.n), dummy)["params"]
            dis_p = jax.vmap(self.dis.init, in_axes=(0, None))(
                jax.random.split(kd, self.n), dummy)["params"]
            cdis_p = jax.vmap(self.cdis.init, in_axes=(0, None))(
                jax.random.split(kc, self.n), dummy_pair)["params"]
            params[d] = {"gen": gen_p, "dis": dis_p, "cdis": cdis_p}

        rng, state_rng = jax.random.split(rng)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            rng=state_rng,
            params=params,
            opt_gen=self.gen_tx.init({d: params[d]["gen"]
                                      for d in self.directions}),
            opt_dis=self.dis_tx.init({d: params[d]["dis"]
                                      for d in self.directions}),
            opt_cdis=self.cdis_tx.init({d: params[d]["cdis"]
                                        for d in self.directions}),
        )

    # ------------------------------------------------------------------
    # model application helpers (member axis vmapped)
    # ------------------------------------------------------------------

    def _translate_members(self, gen_params, x: jnp.ndarray, z: jnp.ndarray
                           ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray],
                                      jnp.ndarray]:
        """All members translate the same batch: x (B,H,W,C), z (N,B,S) ->
        (x_t (N,B,H,W,C), mask (N,B,H,W,1) | None, content (N,B,h,w,Cc))."""

        def one(p, z_i):
            c = self.gen.apply({"params": p}, x,
                               method=AdaINGen.encode_content)
            out = self.gen.apply({"params": p}, c, z_i,
                                 method=AdaINGen.decode)
            return out, c

        if self.cfg.remat:
            one = jax.checkpoint(one)
        outs, contents = jax.vmap(one)(gen_params, z)
        if self.focus:
            x_t, mask = composite_with_mask(outs, x, self.mask_activation)
            return x_t, mask, contents
        return outs, None, contents

    def _dis_apply(self, p, x):
        return self.dis.apply({"params": p}, x)

    def _cdis_apply(self, p, x):
        return self.cdis.apply({"params": p}, x)

    # ------------------------------------------------------------------
    # per-phase losses
    # ------------------------------------------------------------------

    def _w(self, name: str, base, step):
        """Effective loss weight at the traced ``step``.

        Constant weights (the default) return the Python float unchanged so
        the XLA graph is identical to the pre-schedule code; dict-valued
        YAML weights evaluate their warmup/annealing schedule in-jit
        (councilx/schedules.py; SURVEY.md §2.2 misc config-gated extras).
        """
        sched = self.cfg.loss_schedules.get(name)
        if sched is None or sched.is_constant:
            return base
        return sched.value(step)

    def _dis_loss_dir(self, dis_params, fakes, real, step):
        def member(p, f):
            return gan_dis_loss(self._dis_apply(p, f),
                                self._dis_apply(p, real), self.gan_type)

        # gan_w weights the discriminator objective too (MUNIT semantics:
        # trainer.py::dis_update's loss_dis_total = gan_w * sum) — a no-op
        # at the shipped gan_w=1.0
        w = self._w("gan_w", self.cfg.gan_w, step)
        return w * jnp.sum(jax.vmap(member, in_axes=(0, 0))(dis_params,
                                                            fakes))

    def _gen_loss_dir(self, gen_params, dis_params, cdis_params,
                      x_in, z, step, out_offset: int = 0,
                      member_scale: float = 1.0
                      ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        """Generator loss for the members in ``gen_params``.

        ``out_offset``/``member_scale`` support shard-local evaluation under
        member parallelism: gen_params may hold only a contiguous slice of
        the council starting at global index ``out_offset``, with
        ``member_scale = local/total`` rescaling the mean-over-members mask
        losses so that shard-local sums reproduce the global loss.
        """
        cfg = self.cfg
        cc = cfg.council
        x_t, mask, contents = self._translate_members(gen_params, x_in, z)

        m: Dict[str, Any] = {}

        # adversarial (reference: dis_a2b_s[i].calc_gen_loss, summed over i)
        def member_adv(p_dis, x_i):
            return gan_gen_loss(self._dis_apply(p_dis, x_i), self.gan_type)

        if cfg.remat:
            member_adv = jax.checkpoint(member_adv)
        loss_adv = jnp.sum(jax.vmap(member_adv)(dis_params, x_t))
        m["loss_gen_adv"] = loss_adv
        total = self._w("gan_w", cfg.gan_w, step) * loss_adv

        # council mutual-agreement (gated by council_start_at_iter);
        # under remat the pairwise grid scans one discriminator at a time
        if self.has_council:
            loss_c = council_gen_loss(self._cdis_apply, cdis_params, x_t,
                                      x_in, self.gan_type, self.conditional,
                                      out_offset=out_offset,
                                      scan=cfg.remat,
                                      polarity=cc.council_polarity)
            gate = (step >= cc.council_start_at_iter).astype(jnp.float32)
            m["loss_gen_council"] = loss_c
            total += self._w("council_w", cc.council_w, step) * gate * loss_c

        # focus-mask losses (mean over members -> rescaled by member_scale
        # so shard-local sums equal the global mean)
        if self.focus:
            gate_f = (step >= cc.focus_start_at_iter).astype(jnp.float32)
            ls = mask_size_loss(mask) * member_scale
            lb = mask_binary_loss(mask) * member_scale
            m["loss_gen_mask_size"] = ls
            m["loss_gen_mask_binary"] = lb
            total += gate_f * (
                self._w("mask_total_w", cc.mask_total_w, step) * ls
                + self._w("mask_zero_or_one_w", cc.mask_zero_or_one_w,
                          step) * lb)
            if cc.mask_tv_w:
                lt = mask_tv_loss(mask) * member_scale
                m["loss_gen_mask_tv"] = lt
                total += gate_f * self._w("mask_tv_w", cc.mask_tv_w,
                                          step) * lt

        # MUNIT-inherited reconstruction terms (config-gated; reference keeps
        # recon_x_w / recon_s_w / recon_c_w in the YAMLs)
        if cfg.recon_x_w:
            # reuse the content codes already computed for the translation
            # (the reference re-runs enc_content here; same value, same
            # gradient path, one fewer content-encoder pass per member)
            def member_recon(p, c_i):
                s = self.gen.apply({"params": p}, x_in,
                                   method=AdaINGen.encode_style)
                out = self.gen.apply({"params": p}, c_i, s,
                                     method=AdaINGen.decode)
                if self.focus:
                    xr, _ = composite_with_mask(out, x_in,
                                                self.mask_activation)
                else:
                    xr = out
                return jnp.mean(jnp.abs(xr.astype(jnp.float32)
                                        - x_in.astype(jnp.float32)))

            if cfg.remat:
                member_recon = jax.checkpoint(member_recon)
            loss_rx = jnp.sum(jax.vmap(member_recon)(gen_params, contents))
            m["loss_gen_recon_x"] = loss_rx
            total += self._w("recon_x_w", cfg.recon_x_w, step) * loss_rx

        if cfg.recon_s_w:
            def member_s(p, x_i):
                return self.gen.apply({"params": p}, x_i,
                                      method=AdaINGen.encode_style)

            if cfg.remat:
                member_s = jax.checkpoint(member_s)
            s_rec = jax.vmap(member_s)(gen_params, x_t)
            # mean over (members, B, s) x member-count == sum over members
            # of per-member means (x_t.shape[0] = LOCAL member count, so
            # this stays correct shard-locally)
            loss_rs = jnp.mean(jnp.abs(s_rec.astype(jnp.float32)
                                       - z.astype(jnp.float32))
                               ) * x_t.shape[0]
            m["loss_gen_recon_s"] = loss_rs
            total += self._w("recon_s_w", cfg.recon_s_w, step) * loss_rs

        if cfg.vgg_w and self.vgg_params is not None:
            from councilx.nn.vgg import compute_vgg_loss

            def member_vgg(x_i):
                return compute_vgg_loss(self.vgg_params, x_i, x_in)

            loss_vgg = jnp.sum(jax.vmap(member_vgg)(x_t))
            m["loss_gen_vgg"] = loss_vgg
            total += self._w("vgg_w", cfg.vgg_w, step) * loss_vgg

        if cfg.recon_c_w:
            def member_c(p, x_i):
                return self.gen.apply({"params": p}, x_i,
                                      method=AdaINGen.encode_content)

            if cfg.remat:
                member_c = jax.checkpoint(member_c)
            c_rec = jax.vmap(member_c)(gen_params, x_t)
            loss_rc = jnp.mean(
                jnp.abs(c_rec.astype(jnp.float32)
                        - jax.lax.stop_gradient(contents).astype(jnp.float32))
            ) * x_t.shape[0]
            m["loss_gen_recon_c"] = loss_rc
            total += self._w("recon_c_w", cfg.recon_c_w, step) * loss_rc

        return total, m

    # ------------------------------------------------------------------
    # the fused step
    # ------------------------------------------------------------------

    def _apply_if_finite(self, tree, grads, tx, opt, axis=None):
        """One optimizer phase, guarded by cfg.skip_nonfinite_updates.

        Returns (new_tree, new_opt, ok). With the guard on and ANY
        non-finite gradient coordinate, params and optimizer state keep
        their previous values (traced jnp.where select — no host sync)
        and ok is 0.0; a poisoned batch then cannot blow up a long run.
        ``axis``: mesh axis name whose shards hold disjoint member
        gradients — the gate reduces over it (pmin) so one member's
        blow-up skips the phase GLOBALLY, matching single-chip semantics.
        Guard off: plain optax update, ok constant 1.0."""
        updates, opt_new = tx.update(grads, opt, tree)
        new_tree = optax.apply_updates(tree, updates)
        if not self.cfg.skip_nonfinite_updates:
            return new_tree, opt_new, jnp.ones((), jnp.float32)
        ok = jnp.ones((), jnp.bool_)
        for leaf in jax.tree_util.tree_leaves(grads):
            ok = jnp.logical_and(ok, jnp.all(jnp.isfinite(leaf)))
        if axis is not None:
            ok = jax.lax.pmin(ok.astype(jnp.int32), axis).astype(jnp.bool_)

        def sel(a, b):
            return jnp.where(ok, a, b)

        new_tree = jax.tree_util.tree_map(sel, new_tree, tree)
        opt_new = jax.tree_util.tree_map(sel, opt_new, opt)
        return new_tree, opt_new, ok.astype(jnp.float32)

    def _step(self, state: TrainState, x_a: jnp.ndarray,
              x_b: jnp.ndarray):
        cfg = self.cfg
        n, sd = self.n, cfg.gen.style_dim
        b = x_a.shape[0]
        x_a = x_a.astype(self.dtype)
        x_b = x_b.astype(self.dtype)
        inputs = {"a2b": (x_a, x_b), "b2a": (x_b, x_a)}

        rng, k_z = jax.random.split(state.rng)
        metrics: Dict[str, Any] = {}

        # Per-phase style draws — see draw_phase_zs. z_mode="shared" (the
        # TPU-fast default) feeds ONE draw per direction to all three
        # phases (XLA CSEs one full council forward); "per_phase" restores
        # the exact reference semantics of fresh z inside each of the three
        # update methods.
        def draw(fold):
            return jax.random.normal(jax.random.fold_in(k_z, fold),
                                     (n, b, sd), self.dtype)

        zs, zs_cdis, zs_dis = draw_phase_zs(draw, self.directions,
                                            cfg.z_mode)

        # detached fakes for the domain-dis update (and, unless
        # z_mode="per_phase", the council-dis update too)
        def make_fakes(z_by_dir):
            out: Dict[str, jnp.ndarray] = {}
            for d in self.directions:
                x_in, _ = inputs[d]
                x_t, _, _ = self._translate_members(state.params[d]["gen"],
                                                    x_in, z_by_dir[d])
                out[d] = jax.lax.stop_gradient(x_t)
            return out

        fakes = make_fakes(zs_dis)
        fakes_cdis = fakes if zs_cdis is zs_dis else make_fakes(zs_cdis)

        params = {d: dict(state.params[d]) for d in self.directions}

        # ---- phase 1: council discriminators (reference dis_council_update).
        # The update ratio (council_dis_relative_iteration = k) supports both
        # [VERIFY] readings of the reference key, selected by
        # cdis_ratio_mode and resolved entirely INSIDE the jit (round 1
        # gated on a host readback of state.step, serializing dispatch):
        #   k_per_step: k updates per train step, fresh fakes per update;
        #   every_kth:  one update on steps where step % k == 0 (lax.cond).
        opt_cdis = state.opt_cdis
        if self.has_council:
            def one_cdis_update(tree, opt, fakes_k):
                def cdis_loss_fn(t):
                    loss = 0.0
                    for d in self.directions:
                        loss += council_dis_loss(
                            self._cdis_apply, t[d], fakes_k[d], inputs[d][0],
                            self.gan_type, self.conditional,
                            scan=self.cfg.remat,
                            polarity=cfg.council.council_polarity)
                    return loss

                loss, grads = jax.value_and_grad(cdis_loss_fn)(tree)
                new_tree, opt, ok = self._apply_if_finite(
                    tree, grads, self.cdis_tx, opt)
                return new_tree, opt, loss, ok

            ratio = max(1, cfg.council.council_dis_relative_iteration)
            tree = {d: params[d]["cdis"] for d in self.directions}
            if ratio == 1:
                tree, opt_cdis, loss_cdis, ok_cdis = one_cdis_update(
                    tree, opt_cdis, fakes_cdis)
            elif cfg.council.cdis_ratio_mode == "k_per_step":
                tree, opt_cdis, loss_cdis, ok_cdis = one_cdis_update(
                    tree, opt_cdis, fakes_cdis)
                for it in range(1, ratio):
                    fakes_i: Dict[str, jnp.ndarray] = {}
                    for di, d in enumerate(self.directions):
                        z_i = jax.random.normal(
                            jax.random.fold_in(k_z, 1000 + it * 8 + di),
                            (n, b, sd), self.dtype)
                        x_t, _, _ = self._translate_members(
                            params[d]["gen"], inputs[d][0], z_i)
                        fakes_i[d] = jax.lax.stop_gradient(x_t)
                    tree, opt_cdis, loss_cdis, ok_i = one_cdis_update(
                        tree, opt_cdis, fakes_i)
                    ok_cdis = ok_cdis * ok_i
            else:  # "every_kth" (round-1 semantics), traced gate
                def run(args):
                    return one_cdis_update(*args, fakes_cdis)

                def skip(args):
                    t, o = args
                    return (t, o, jnp.zeros((), jnp.float32),
                            jnp.ones((), jnp.float32))

                tree, opt_cdis, loss_cdis, ok_cdis = jax.lax.cond(
                    state.step % ratio == 0, run, skip, (tree, opt_cdis))
                # skipped steps produce no real loss — flag them so the
                # logger can mask the placeholder instead of writing a
                # sawtooth of literal zeros to the TB curves
                metrics["cdis_updated"] = (
                    state.step % ratio == 0).astype(jnp.float32)
            for d in self.directions:
                params[d]["cdis"] = tree[d]
            metrics["loss_dis_council"] = loss_cdis
            if cfg.skip_nonfinite_updates:
                metrics["finite_cdis"] = ok_cdis

        # ---- phase 2: domain discriminators (reference dis_update)
        def dis_loss_fn(tree):
            loss = 0.0
            for d in self.directions:
                _, real = inputs[d]
                loss += self._dis_loss_dir(tree[d], fakes[d], real,
                                           state.step)
            return loss

        tree = {d: params[d]["dis"] for d in self.directions}
        loss_dis, grads = jax.value_and_grad(dis_loss_fn)(tree)
        new_tree, opt_dis, ok_dis = self._apply_if_finite(
            tree, grads, self.dis_tx, state.opt_dis)
        for d in self.directions:
            params[d]["dis"] = new_tree[d]
        metrics["loss_dis_adv"] = loss_dis
        if cfg.skip_nonfinite_updates:
            metrics["finite_dis"] = ok_dis

        # ---- phase 3: generators (reference gen_update), seeing the freshly
        # updated discriminators, exactly like the reference's in-place order
        tree = {d: params[d]["gen"] for d in self.directions}
        if cfg.gen_member_chunks > 1:
            loss_gen, aux, grads = self._gen_grads_chunked(
                tree, params, inputs, zs, state.step)
        else:
            def gen_loss_fn(tree):
                loss = 0.0
                aux: Dict[str, Any] = {}
                for d in self.directions:
                    x_in, _ = inputs[d]
                    ld, md = self._gen_loss_dir(
                        tree[d], jax.lax.stop_gradient(params[d]["dis"]),
                        jax.lax.stop_gradient(params[d]["cdis"]),
                        x_in, zs[d], state.step)
                    loss += ld
                    for k, v in md.items():
                        aux[f"{k}_{d}"] = v
                return loss, aux

            (loss_gen, aux), grads = jax.value_and_grad(
                gen_loss_fn, has_aux=True)(tree)
        new_tree, opt_gen, ok_gen = self._apply_if_finite(
            tree, grads, self.gen_tx, state.opt_gen)
        for d in self.directions:
            params[d]["gen"] = new_tree[d]
        metrics["loss_gen_total"] = loss_gen
        metrics.update(aux)
        if cfg.skip_nonfinite_updates:
            metrics["finite_gen"] = ok_gen

        new_state = TrainState(
            step=state.step + 1, rng=rng, params=params,
            opt_gen=opt_gen, opt_dis=opt_dis, opt_cdis=opt_cdis)
        return new_state, metrics

    def _gen_grads_chunked(self, tree, params, inputs, zs, step):
        """Gen-phase gradients accumulated over member chunks
        (Config.gen_member_chunks) — the single-chip council-8 path.

        The member axis splits into ``chunks`` contiguous groups; a
        ``lax.map`` runs one value_and_grad per group SEQUENTIALLY, so the
        backward pass holds at most one group's activations (council-8
        batch-8 at 256px overflows a 16 GB v5e by ~1.8 GB with the full
        council in one backward — BASELINE.md council-scaling table). The
        per-member losses are separable (same property member parallelism
        exploits, parallel/council_shard.py), so summed chunk gradients
        equal the unchunked gradients up to float reassociation:
        ``out_offset`` keeps the council-loss diagonal global,
        ``member_scale`` rescales the mean-over-members mask losses.
        """
        cfg = self.cfg
        chunks = cfg.gen_member_chunks
        n = self.n
        if n % chunks:
            raise ValueError(f"gen_member_chunks {chunks} must divide "
                             f"council_size {n}")
        m = n // chunks
        cdis_sg = {d: jax.lax.stop_gradient(params[d]["cdis"])
                   for d in self.directions}

        def split(l):
            return l.reshape((chunks, m) + l.shape[1:])

        tree_c = jax.tree_util.tree_map(split, tree)
        # member i's adversarial term pairs D_i with G_i's output, so the
        # (stop-gradient) domain-dis tree chunks alongside the gen tree;
        # the council term needs EVERY member's cdis -> stays whole
        dis_c = {d: jax.tree_util.tree_map(
                     split, jax.lax.stop_gradient(params[d]["dis"]))
                 for d in self.directions}
        zs_c = {d: split(zs[d]) for d in self.directions}
        offsets = jnp.arange(chunks, dtype=jnp.int32) * m

        def one_chunk(args):
            tc, dc, zc, off = args

            def loss_fn(tc):
                loss = 0.0
                aux: Dict[str, Any] = {}
                for d in self.directions:
                    x_in, _ = inputs[d]
                    ld, md = self._gen_loss_dir(
                        tc[d], dc[d], cdis_sg[d], x_in, zc[d], step,
                        out_offset=off, member_scale=m / n)
                    loss += ld
                    for k, v in md.items():
                        aux[f"{k}_{d}"] = v
                return loss, aux

            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(tc)
            return loss, aux, grads

        losses, auxes, grads_c = jax.lax.map(
            one_chunk, (tree_c, dis_c, zs_c, offsets))
        loss_gen = jnp.sum(losses)
        aux = {k: jnp.sum(v) for k, v in auxes.items()}
        grads = jax.tree_util.tree_map(
            lambda g: g.reshape((n,) + g.shape[2:]), grads_c)
        return loss_gen, aux, grads

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def place_state(self, state_host) -> TrainState:
        """Place a host-side (numpy) TrainState (e.g. a restored checkpoint)
        on the default device. Parallel trainers override with their mesh
        shardings."""
        return jax.device_put(state_host)

    def train_step(self, state: TrainState, x_a, x_b) -> Tuple[TrainState,
                                                               Dict]:
        """One full iteration: council-dis -> dis -> gen, jitted and fused.

        The council-dis update ratio (council_dis_relative_iteration /
        cdis_ratio_mode) is resolved inside the jit — no host readback of
        state.step in the hot loop."""
        return self._jit_step(state, x_a, x_b)

    def _sample_members(self, gen_params, x: jnp.ndarray, z: jnp.ndarray):
        """Translations from every member for visualization: -> (N,B,H,W,C)."""
        x_t, mask, _ = self._translate_members(gen_params, x, z)
        return x_t, mask

    def sample(self, state: TrainState, x: jnp.ndarray,
               direction: str = "a2b", rng: Optional[jax.Array] = None):
        """Reference Council_Trainer.sample: per-member sample sheets."""
        if rng is None:
            rng = jax.random.fold_in(state.rng, 7)
        z = jax.random.normal(rng, (self.n, x.shape[0], self.cfg.gen.style_dim),
                              self.dtype)
        return self._jit_sample(state.params[direction]["gen"],
                                x.astype(self.dtype), z)
