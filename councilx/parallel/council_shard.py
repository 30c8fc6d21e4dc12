"""Member (council) parallelism via shard_map + explicit ICI collectives.

GSPMD cannot auto-partition the vmapped member axis: stacked-parameter convs
lower to grouped convolutions whose per-group feature counts (1-4 channels)
are unsplittable. So member parallelism is written the explicit TPU way —
``shard_map`` over a 2-D ``('data', 'council')`` mesh with hand-placed
collectives, all riding ICI:

  * every parameter / Adam-moment leaf is (N, ...) member-stacked (the
    framework's core design) and shards over 'council';
  * the batch shards over 'data';
  * each shard trains its own members' generator/discriminators locally —
    the per-member losses are separable, so shard-local losses give exactly
    the global gradients for the local parameter shards;
  * two collectives couple the members: an ``all_gather`` of the fake stack
    over 'council' for the council-discriminator update (D̂_i must see every
    member's output), and an ``all_gather`` of the (stop-gradient) council-
    discriminator parameters for the generator's mutual-agreement term
    (member i is scored by every OTHER member's D̂_j);
  * batch-mean losses become ``pmean`` over 'data' (the DP all-reduce).

Step math is identical to single-chip training at the same global batch and
seeds — asserted by tests/test_council_shard.py on the 8-device CPU mesh.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.4.35
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from councilx.config import Config
from councilx.losses.council import council_dis_loss
from councilx.train.trainer import CouncilTrainer, TrainState


def det_pmean(x, axis: str):
    """Mean over mesh axis ``axis`` with a topology-independent summation
    order: all_gather the per-shard values (pure data movement, no
    arithmetic) and sum them in an explicit axis-index chain. The closing
    pmax re-types the (identical) per-shard results as axis-invariant for
    the VMA checker — all_gather outputs stay typed varying — and max over
    equal floats is exact in any reduction order, unlike sum.

    Measured caveat (tests/test_multihost.py::test_two_process_det_reduction):
    this removes the reduction-ORDER divergence between process layouts,
    but does NOT make cross-topology training equal — the per-topology
    executables already differ in shard-local numerics, which Adam
    amplifies to ±lr sign flips on near-zero-gradient coords. Ships as an
    off-by-default experiment; costs ``axis_size`` x the bytes of a psum.
    """
    k = jax.lax.axis_size(axis)
    g = jax.lax.all_gather(x, axis)  # (k, ...) in axis-index order
    s = g[0]
    for i in range(1, k):
        s = s + g[i]
    return jax.lax.pmax(s / k, axis)


class CouncilShardTrainer(CouncilTrainer):
    """CouncilTrainer with members sharded over the mesh's 'council' axis."""

    def __init__(self, cfg: Config, mesh: Mesh):
        if tuple(mesh.axis_names) != ("data", "council"):
            raise ValueError("CouncilShardTrainer needs a ('data','council') "
                             "mesh (parallel.mesh.make_mesh(council_parallel=k))")
        super().__init__(cfg)
        self.mesh = mesh
        self.k = mesh.shape["council"]
        if self.n % self.k:
            raise ValueError(f"council_size {self.n} not divisible by "
                             f"council axis {self.k}")
        self.m = self.n // self.k
        self.det_reduce = bool(getattr(cfg, "det_data_reduction", False))
        self._replicated = NamedSharding(mesh, P())
        self._state_sharding = None
        self._jit_step_fn = None

    # -- sharding specs ------------------------------------------------

    def _leaf_spec(self, leaf) -> P:
        # member-stacked leaves are (N, ...) with ndim >= 2; rng/step/opt
        # counters replicate even if a dim equals N
        if getattr(leaf, "ndim", 0) >= 2 and leaf.shape[0] == self.n:
            return P("council")
        return P()

    def _build(self, state: TrainState) -> None:
        specs = jax.tree_util.tree_map(self._leaf_spec, state)
        self._state_sharding = jax.tree_util.tree_map(
            lambda s: NamedSharding(self.mesh, s), specs)
        fn = shard_map(
            self._step_local,
            mesh=self.mesh,
            in_specs=(specs, P("data"), P("data")),
            out_specs=(specs, P()),
            # check_vma=True is load-bearing, not a lint: params are
            # replicated along 'data', and only the VMA machinery makes
            # jax.grad insert the psum-over-'data' of their gradients.
            # With check_vma=False each shard silently applies only its
            # local-batch gradient and the 'data' replicas diverge.
            check_vma=True,
        )
        self._jit_step_fn = jax.jit(fn, donate_argnums=(0,))

    def init_state(self, rng: jax.Array) -> TrainState:
        if self._state_sharding is None:
            # _build only needs leaf shapes/structure — use the abstract
            # state so no throwaway full init happens on one device
            self._build(jax.eval_shape(super().init_state, rng))
        # jitted init with out_shardings: valid on multi-host meshes where
        # device_put of host-local values is not
        return jax.jit(super().init_state,
                       out_shardings=self._state_sharding)(rng)

    def place_state(self, state_host) -> TrainState:
        """Place a host-side (numpy) TrainState (restored checkpoint) onto
        the mesh with the member/data sharding. Multi-host safe."""
        if self._state_sharding is None:
            self._build(state_host)
        return jax.jit(lambda s: s,
                       out_shardings=self._state_sharding)(state_host)

    # -- cross-'data' reductions ------------------------------------------

    def _vg_data(self, local_loss_fn, tree, has_aux: bool = False):
        """value_and_grad of a loss over 'data'-replicated params, with the
        cross-'data' reduction made explicit.

        ``local_loss_fn(tree)`` must return the SHARD-LOCAL loss (no 'data'
        collectives inside). Default mode reproduces pmean-over-'data' +
        the VMA-inserted psum of replicated-param gradients — the fast
        psum path. ``det_data_reduction`` instead computes purely local
        gradients (params pcast to 'data'-varying so jax.grad inserts no
        psum) and reduces them with det_pmean's fixed-order chain:
        bitwise-identical results on any process layout of the mesh.
        """
        if not self.det_reduce:
            if has_aux:
                def wrapped(t):
                    loss, aux = local_loss_fn(t)
                    return jax.lax.pmean(loss, "data"), aux
            else:
                def wrapped(t):
                    return jax.lax.pmean(local_loss_fn(t), "data")
            return jax.value_and_grad(wrapped, has_aux=has_aux)(tree)
        tree_v = jax.tree_util.tree_map(
            lambda x: jax.lax.pcast(x, "data", to="varying"), tree)
        out, grads = jax.value_and_grad(
            local_loss_fn, has_aux=has_aux)(tree_v)
        grads = jax.tree_util.tree_map(
            lambda g: det_pmean(g, "data"), grads)
        if has_aux:
            loss, aux = out
            return (det_pmean(loss, "data"), aux), grads
        return det_pmean(out, "data"), grads

    def _pmean_data(self, v):
        """'data'-mean for metrics: order-fixed under det_data_reduction."""
        if self.det_reduce:
            return det_pmean(v, "data")
        return jax.lax.pmean(v, "data")

    # -- the shard-local step -------------------------------------------

    def _step_local(self, state: TrainState, x_a, x_b):
        cfg = self.cfg
        n, m, sd = self.n, self.m, cfg.gen.style_dim
        b_local = x_a.shape[0]
        b_global = b_local * jax.lax.axis_size("data")
        c_idx = jax.lax.axis_index("council")
        d_idx = jax.lax.axis_index("data")
        off = c_idx * m

        x_a = x_a.astype(self.dtype)
        x_b = x_b.astype(self.dtype)
        inputs = {"a2b": (x_a, x_b), "b2a": (x_b, x_a)}

        rng, k_z = jax.random.split(state.rng)
        metrics: Dict[str, Any] = {}

        # reproduce the single-chip z stream exactly: build the global
        # (N, B_global, sd) draw (cheap) and slice this shard's
        # (members, batch) block
        def shard_z(fold: int) -> jnp.ndarray:
            z_full = jax.random.normal(jax.random.fold_in(k_z, fold),
                                       (n, b_global, sd), self.dtype)
            return jax.lax.dynamic_slice(
                z_full, (off, d_idx * b_local, 0), (m, b_local, sd))

        # per-phase draws — same fold offsets as trainer._step so
        # shard == single-chip in every z_mode (see draw_phase_zs)
        from councilx.train.trainer import draw_phase_zs
        zs, zs_cdis, zs_dis = draw_phase_zs(shard_z, self.directions,
                                            cfg.z_mode)

        # local fakes + the all-gathered member stack (ICI collective #1)
        def make_fakes(z_by_dir):
            loc: Dict[str, jnp.ndarray] = {}
            allm: Dict[str, jnp.ndarray] = {}
            for d in self.directions:
                x_in, _ = inputs[d]
                x_t, _, _ = self._translate_members(state.params[d]["gen"],
                                                    x_in, z_by_dir[d])
                loc[d] = jax.lax.stop_gradient(x_t)
                allm[d] = jax.lax.all_gather(loc[d], "council",
                                             axis=0, tiled=True)
            return loc, allm

        fakes_l, fakes_all = make_fakes(zs_dis)
        if zs_cdis is zs_dis:
            fakes_cdis_all = fakes_all
        else:  # z_mode="per_phase": the council-dis phase gets its own draw
            _, fakes_cdis_all = make_fakes(zs_cdis)

        params = {d: dict(state.params[d]) for d in self.directions}

        # ---- phase 1: council discriminators (local D-hat members see the
        # full gathered fake stack; diagonal masks use global indices).
        # The update ratio resolves inside the jit exactly as in
        # trainer._step — both cdis_ratio_mode readings, no host sync.
        opt_cdis = state.opt_cdis
        if self.has_council:
            def one_cdis_update(tree, opt, fakes_k):
                def cdis_loss_fn(t):
                    loss = 0.0
                    for d in self.directions:
                        loss += council_dis_loss(
                            self._cdis_apply, t[d], fakes_k[d],
                            inputs[d][0], self.gan_type, self.conditional,
                            dis_offset=off, n_total=n, scan=cfg.remat,
                            polarity=cfg.council.council_polarity)
                    return loss

                loss, grads = self._vg_data(cdis_loss_fn, tree)
                new_tree, opt, ok = self._apply_if_finite(
                    tree, grads, self.cdis_tx, opt, axis="council")
                return new_tree, opt, loss, ok

            ratio = max(1, cfg.council.council_dis_relative_iteration)
            tree = {d: params[d]["cdis"] for d in self.directions}
            if ratio == 1:
                tree, opt_cdis, loss_cdis, ok_cdis = one_cdis_update(
                    tree, opt_cdis, fakes_cdis_all)
            elif cfg.council.cdis_ratio_mode == "k_per_step":
                tree, opt_cdis, loss_cdis, ok_cdis = one_cdis_update(
                    tree, opt_cdis, fakes_cdis_all)
                for it in range(1, ratio):
                    fakes_i: Dict[str, jnp.ndarray] = {}
                    for di, d in enumerate(self.directions):
                        # same global z stream as the single-chip step,
                        # sliced to this shard's (members, batch) block
                        z_full = jax.random.normal(
                            jax.random.fold_in(k_z, 1000 + it * 8 + di),
                            (n, b_global, sd), self.dtype)
                        z_i = jax.lax.dynamic_slice(
                            z_full, (off, d_idx * b_local, 0),
                            (m, b_local, sd))
                        x_t, _, _ = self._translate_members(
                            params[d]["gen"], inputs[d][0], z_i)
                        fakes_i[d] = jax.lax.all_gather(
                            jax.lax.stop_gradient(x_t), "council",
                            axis=0, tiled=True)
                    tree, opt_cdis, loss_cdis, ok_i = one_cdis_update(
                        tree, opt_cdis, fakes_i)
                    ok_cdis = ok_cdis * ok_i
            else:  # "every_kth" (round-1 semantics), traced gate
                def run(args):
                    return one_cdis_update(*args, fakes_cdis_all)

                def skip(args):
                    t, o = args
                    # run's loss is council-varying (per-local-member sums);
                    # match its VMA type so lax.cond branches agree. The ok
                    # flag is invariant in both branches (run pmins it over
                    # 'council').
                    return (t, o,
                            jax.lax.pcast(jnp.zeros((), jnp.float32),
                                          "council", to="varying"),
                            jnp.ones((), jnp.float32))

                tree, opt_cdis, loss_cdis, ok_cdis = jax.lax.cond(
                    state.step % ratio == 0, run, skip, (tree, opt_cdis))
                # mirror trainer._step: flag skipped steps so the logger
                # masks the placeholder zero (replicated value — derived
                # from state.step only)
                metrics["cdis_updated"] = (
                    state.step % ratio == 0).astype(jnp.float32)
            for d in self.directions:
                params[d]["cdis"] = tree[d]
            metrics["loss_dis_council"] = jax.lax.psum(loss_cdis, "council")
            if cfg.skip_nonfinite_updates:
                metrics["finite_cdis"] = ok_cdis

        # ---- phase 2: domain discriminators (fully member-local)
        def dis_loss_fn(tree):
            loss = 0.0
            for d in self.directions:
                _, real = inputs[d]
                loss += self._dis_loss_dir(tree[d], fakes_l[d], real,
                                           state.step)
            return loss

        tree = {d: params[d]["dis"] for d in self.directions}
        loss_dis, grads = self._vg_data(dis_loss_fn, tree)
        new_tree, opt_dis, ok_dis = self._apply_if_finite(
            tree, grads, self.dis_tx, state.opt_dis, axis="council")
        for d in self.directions:
            params[d]["dis"] = new_tree[d]
        metrics["loss_dis_adv"] = jax.lax.psum(loss_dis, "council")
        if cfg.skip_nonfinite_updates:
            metrics["finite_dis"] = ok_dis

        # ---- phase 3: generators. The agreement term scores local members
        # under EVERY member's (freshly updated) council discriminator ->
        # gather the stop-gradient D-hat params over ICI (collective #2).
        cdis_all = {
            d: jax.tree_util.tree_map(
                lambda l: jax.lax.all_gather(l, "council", axis=0,
                                             tiled=True),
                jax.lax.stop_gradient(params[d]["cdis"]))
            for d in self.directions}

        def gen_loss_fn(tree):
            loss = 0.0
            aux: Dict[str, Any] = {}
            for d in self.directions:
                x_in, _ = inputs[d]
                ld, md = self._gen_loss_dir(
                    tree[d], jax.lax.stop_gradient(params[d]["dis"]),
                    cdis_all[d], x_in, zs[d], state.step,
                    out_offset=off, member_scale=m / n)
                loss += ld
                for k, v in md.items():
                    aux[f"{k}_{d}"] = v
            return loss, aux

        tree = {d: params[d]["gen"] for d in self.directions}
        (loss_gen, aux), grads = self._vg_data(
            gen_loss_fn, tree, has_aux=True)
        new_tree, opt_gen, ok_gen = self._apply_if_finite(
            tree, grads, self.gen_tx, state.opt_gen, axis="council")
        for d in self.directions:
            params[d]["gen"] = new_tree[d]
        metrics["loss_gen_total"] = jax.lax.psum(loss_gen, "council")
        if cfg.skip_nonfinite_updates:
            metrics["finite_gen"] = ok_gen
        for k, v in aux.items():
            metrics[k] = jax.lax.psum(self._pmean_data(v), "council")

        new_state = TrainState(
            step=state.step + 1, rng=rng, params=params,
            opt_gen=opt_gen, opt_dis=opt_dis, opt_cdis=opt_cdis)
        return new_state, metrics

    # -- public API -------------------------------------------------------

    def train_step(self, state: TrainState, x_a, x_b
                   ) -> Tuple[TrainState, Dict]:
        n_data = self.mesh.shape["data"]
        if x_a.shape[0] % n_data:
            raise ValueError(f"global batch {x_a.shape[0]} not divisible by "
                             f"data-axis size {n_data}")
        if self._state_sharding is None:
            self._build(state)
        from councilx.parallel.mesh import shard_batch
        x_a = shard_batch(self.mesh, x_a)
        x_b = shard_batch(self.mesh, x_b)
        with self.mesh:
            return self._jit_step_fn(state, x_a, x_b)

    def sample(self, state: TrainState, x, direction: str = "a2b",
               rng=None):
        """Gather the member-sharded generator params, then sample as usual
        (sampling is rare; a one-off all-gather is fine). Uses
        fetch_state_host, which handles non-fully-addressable arrays on
        multi-process meshes — so under multi-host EVERY process must call
        sample (it is a collective); see train/loop.py."""
        from councilx.ckpt.manager import fetch_state_host

        full = fetch_state_host(state.params[direction]["gen"])
        if rng is None:
            rng = jax.random.fold_in(fetch_state_host(state.rng), 7)
        z = jax.random.normal(rng, (self.n, x.shape[0],
                                    self.cfg.gen.style_dim), self.dtype)
        return self._jit_sample(full, x.astype(self.dtype), z)
