"""Batched translation (reference test_on_folder.py, §3.4 of SURVEY.md).

The reference runs inference unbatched (batch size 1 per image, Python loop,
fresh CUDA launches each time). Here translation is a single jitted function
over a batch, optionally over all council members at once (vmapped member
axis), with the style code injectable for reproducibility/parity.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from councilx.config import Config
from councilx.nn.blocks import make_kernel_init
from councilx.nn.generator import AdaINGen, composite_with_mask

try:
    from jax import shard_map as _shard_map
    _SHARD_MAP_NOCHECK = {"check_vma": False}
except ImportError:                      # pre-public-API jax: the
    from jax.experimental.shard_map import shard_map as _shard_map
    _SHARD_MAP_NOCHECK = {"check_rep": False}   # old kwarg spelling


class Translator:
    """Holds the generator definition and jitted translate functions.

    ``params`` may be a single member's pytree or the stacked (N, ...) tree;
    pass ``member=i`` to slice one member out of a stacked tree.
    """

    def __init__(self, cfg: Config, quant_stats=None):
        self.cfg = cfg
        g = cfg.gen
        self.focus = cfg.council.focus_enabled
        dtype = (jnp.float32 if cfg.parity_mode
                 or cfg.compute_dtype == "float32" else jnp.bfloat16)
        self.dtype = dtype
        # calibrated activation scales for quant="w8a8_static"
        # (tools/calibrate_quant.py). Set-at-construction only: self is the
        # static jit arg, so the scales bake into the executable as
        # constants — mutating them later would NOT retrace.
        if cfg.quant == "w8a8_static" and quant_stats is None \
                and not cfg.parity_mode:
            raise ValueError(
                "quant='w8a8_static' needs calibrated stats: pass "
                "quant_stats= (from tools/calibrate_quant.py)")
        if cfg.quant == "w8a8_calib":
            raise ValueError(
                "quant='w8a8_calib' is the calibration-pass mode "
                "(mutable quant_stats); use tools/calibrate_quant.py, "
                "then serve with quant='w8a8_static'")
        self.quant_stats = quant_stats
        self.gen = AdaINGen(
            input_dim=cfg.data.input_dim_a, dim=g.dim, style_dim=g.style_dim,
            n_downsample=g.n_downsample, n_res=g.n_res, activ=g.activ,
            pad_type=g.pad_type, mlp_dim=g.mlp_dim, mlp_n_blk=g.mlp_n_blk,
            focus_mask=self.focus, kernel_init=make_kernel_init(cfg.init),
            dtype=dtype,
            fuse_upsample=cfg.fuse_upsample and not cfg.parity_mode,
            use_pallas=cfg.use_pallas and not cfg.parity_mode,
            use_pallas_norm=cfg.use_pallas_norm and not cfg.parity_mode,
            in_precision="f32" if cfg.parity_mode else cfg.in_precision,
            in_stats="two_pass" if cfg.parity_mode else cfg.norm_stats,
            quant="none" if cfg.parity_mode else cfg.quant,
            quant_scope=cfg.quant_scope,
            boundary_engine=("reference" if cfg.parity_mode
                             else cfg.boundary_engine),
            upsample_engine=cfg.upsample_engine,
            resblock_fuse_pad=(cfg.resblock_fuse_pad
                               and not cfg.parity_mode),
            mask_activation=cfg.council.mask_activation)
        self.mask_activation = cfg.council.mask_activation
        if self.quant_stats is not None and self.gen.quant == "w8a8_static":
            self._validate_quant_stats(cfg)

    def _validate_quant_stats(self, cfg: Config) -> None:
        """Fail fast, by name, when the calibration doesn't cover the scope.

        Calibration stats and the serving quant_scope must agree: stats
        recorded under quant_scope="resblocks" lack the downsample/upsample
        conv entries that scope "heavy" consumes, and serving would
        otherwise die later with a raw flax missing-variable error that
        never mentions quant_scope. Extra entries (heavy-calibrated stats
        served at resblocks scope) are fine — flax only looks up what the
        scoped convs ask for."""
        calib = self.gen.copy(quant="w8a8_calib")
        hw = cfg.data.crop_image_height
        expected = jax.eval_shape(
            lambda: calib.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, hw, hw, 3), jnp.float32))
        )["quant_stats"]

        def paths(tree):
            flat, _ = jax.tree_util.tree_flatten_with_path(tree)
            return {jax.tree_util.keystr(p) for p, _ in flat}

        missing = paths(expected) - paths(self.quant_stats)
        if missing:
            raise ValueError(
                f"quant_stats does not cover quant_scope="
                f"'{self.gen.quant_scope}': missing "
                f"{sorted(missing)[:4]}{'...' if len(missing) > 4 else ''} "
                f"({len(missing)} entries). Recalibrate with "
                "tools/calibrate_quant.py under the SAME config "
                "(calibration scope must match serving scope).")

    def _vars(self, params) -> dict:
        """Variable collections for gen.apply (+ calibrated quant scales)."""
        if self.quant_stats is not None and self.gen.quant == "w8a8_static":
            return {"params": params, "quant_stats": self.quant_stats}
        return {"params": params}

    @partial(jax.jit, static_argnums=0)
    def _translate(self, params, x: jnp.ndarray, z: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        x = x.astype(self.dtype)
        c = self.gen.apply(self._vars(params), x,
                           method=AdaINGen.encode_content)
        out = self.gen.apply(self._vars(params), c, z.astype(self.dtype),
                             method=AdaINGen.decode)
        if self.focus:
            x_t, mask = composite_with_mask(out, x, self.mask_activation)
            return x_t.astype(jnp.float32), mask.astype(jnp.float32)
        return out.astype(jnp.float32), None

    @partial(jax.jit, static_argnums=0)
    def _translate_all_members(self, stacked_params, x: jnp.ndarray,
                               z: jnp.ndarray):
        """x (B,...), z (N,B,S) -> (N,B,H,W,3) translations from all members
        in one batched call."""
        return jax.vmap(lambda p, z_i: self._translate.__wrapped__(
            self, p, x, z_i))(stacked_params, z)

    @partial(jax.jit, static_argnums=0)
    def _translate_u8(self, params, x: jnp.ndarray, z: jnp.ndarray
                      ) -> jnp.ndarray:
        """Serving fast path: translate + denormalize to uint8 ON DEVICE —
        the device->host copy is 4x smaller than the f32 path, and the
        scale/clip/round runs fused on the VPU instead of on the host.
        Numerics match denormalize_to_uint8 exactly (same scale-clamp-round
        at f32)."""
        out, _ = self._translate.__wrapped__(self, params, x, z)
        arr = (out + 1.0) * 0.5
        arr = jnp.clip(arr, 0.0, 1.0)
        return (arr * 255.0 + 0.5).astype(jnp.uint8)

    @partial(jax.jit, static_argnums=0)
    def _translate_u8io(self, params, x_u8: jnp.ndarray, z: jnp.ndarray
                        ) -> jnp.ndarray:
        """Serving wire path: uint8 in, uint8 out. The host->device copy is
        4x smaller than shipping f32 (images arrive as uint8 anyway — a
        server normalizing host-side just inflates the wire), and the
        normalize ``(x - 127.5) / 127.5`` runs fused on the VPU with the
        EXACT formula the CLI/host path uses, so numerics match the f32-wire
        path bit for bit."""
        x = (x_u8.astype(jnp.float32) - 127.5) / 127.5
        return self._translate_u8.__wrapped__(self, params, x, z)

    @partial(jax.jit, static_argnums=0)
    def _translate_all_u8(self, stacked_params, x: jnp.ndarray,
                          z: jnp.ndarray) -> jnp.ndarray:
        """Council-ensemble serving: x (B,...) and ONE z (B,S) shared by
        every member -> (N,B,H,W,3) uint8 — all members translate the same
        inputs under the same style draw in one vmapped device call, so a
        client can compare/pick (the council's whole point; GUI parity)."""
        return jax.vmap(lambda p: self._translate_u8.__wrapped__(
            self, p, x, z))(stacked_params)

    @partial(jax.jit, static_argnums=0)
    def _translate_all_u8io(self, stacked_params, x_u8: jnp.ndarray,
                            z: jnp.ndarray) -> jnp.ndarray:
        """uint8-wire variant of _translate_all_u8 (see _translate_u8io)."""
        x = (x_u8.astype(jnp.float32) - 127.5) / 127.5
        return self._translate_all_u8.__wrapped__(self, stacked_params, x, z)

    def translate_all_u8_device(self, stacked_params, x, z):
        return self._translate_all_u8(stacked_params, x, z)

    def translate_all_u8io_device(self, stacked_params, x_u8, z):
        return self._translate_all_u8io(stacked_params, x_u8, z)

    @partial(jax.jit, static_argnums=0)
    def _encode_style(self, params, x: jnp.ndarray) -> jnp.ndarray:
        return self.gen.apply(self._vars(params), x.astype(self.dtype),
                              method=AdaINGen.encode_style
                              ).astype(jnp.float32)

    # ------------------------------------------------------------------

    def encode_style(self, params, x: jnp.ndarray,
                     member: Optional[int] = None) -> jnp.ndarray:
        """Style code(s) of example image(s) x (B,H,W,3) in [-1,1] —
        style-guided translation (the MUNIT capability the architecture
        retains via StyleEncoder)."""
        if member is not None:
            params = jax.tree_util.tree_map(lambda l: l[member], params)
        return self._encode_style(params, x)

    def translate(self, params, x: jnp.ndarray,
                  z: Optional[jnp.ndarray] = None,
                  rng: Optional[jax.Array] = None,
                  member: Optional[int] = None):
        """Translate a batch. x: (B,H,W,3) float in [-1,1]. Returns
        (images (B,H,W,3) in [-1,1], mask | None)."""
        if member is not None:
            params = jax.tree_util.tree_map(lambda l: l[member], params)
        if z is None:
            if rng is None:
                rng = jax.random.PRNGKey(0)
            z = jax.random.normal(rng, (x.shape[0], self.cfg.gen.style_dim))
        return self._translate(params, x, z)

    def translate_u8(self, params, x: jnp.ndarray,
                     z: Optional[jnp.ndarray] = None,
                     rng: Optional[jax.Array] = None,
                     member: Optional[int] = None) -> np.ndarray:
        """Translate and return uint8 images (B,H,W,3), denormalized on
        device (see _translate_u8)."""
        return np.asarray(self.translate_u8_device(params, x, z=z, rng=rng,
                                                   member=member))

    def translate_u8_device(self, params, x: jnp.ndarray,
                            z: Optional[jnp.ndarray] = None,
                            rng: Optional[jax.Array] = None,
                            member: Optional[int] = None) -> jax.Array:
        """Like translate_u8 but returns the DEVICE array without the
        blocking host readback — the serving engine's pipelining hook
        (dispatch batch k+1 while batch k's D2H copy is in flight)."""
        if member is not None:
            params = jax.tree_util.tree_map(lambda l: l[member], params)
        if z is None:
            if rng is None:
                rng = jax.random.PRNGKey(0)
            z = jax.random.normal(rng, (x.shape[0], self.cfg.gen.style_dim))
        return self._translate_u8(params, x, z)

    def translate_u8io_device(self, params, x_u8: jnp.ndarray,
                              z: Optional[jnp.ndarray] = None,
                              rng: Optional[jax.Array] = None,
                              member: Optional[int] = None) -> jax.Array:
        """uint8-in/uint8-out translate returning the device array (see
        _translate_u8io); the batching server's default wire format."""
        if member is not None:
            params = jax.tree_util.tree_map(lambda l: l[member], params)
        if z is None:
            if rng is None:
                rng = jax.random.PRNGKey(0)
            z = jax.random.normal(rng,
                                  (x_u8.shape[0], self.cfg.gen.style_dim))
        return self._translate_u8io(params, x_u8, z)

    def translate_u8io(self, params, x_u8: jnp.ndarray,
                       z: Optional[jnp.ndarray] = None,
                       rng: Optional[jax.Array] = None,
                       member: Optional[int] = None) -> np.ndarray:
        return np.asarray(self.translate_u8io_device(params, x_u8, z=z,
                                                     rng=rng, member=member))

    def translate_all_members(self, stacked_params, x: jnp.ndarray,
                              z: Optional[jnp.ndarray] = None,
                              rng: Optional[jax.Array] = None):
        n = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
        if z is None:
            if rng is None:
                rng = jax.random.PRNGKey(0)
            z = jax.random.normal(rng,
                                  (n, x.shape[0], self.cfg.gen.style_dim))
        return self._translate_all_members(stacked_params, x, z)


class ShardedTranslator(Translator):
    """Translator with the batch axis sharded over a device mesh — serving-
    side data parallelism (the inference analogue of SURVEY.md §5.8; the
    reference serves one image at a time on one GPU).

    One jitted call translates a GLOBAL batch laid out over every chip of a
    1-D ``('data',)`` mesh: params replicate, the batch shards on axis 0,
    and because every image is independent XLA inserts no collectives at
    all — throughput scales linearly with chip count and ICI stays idle.
    Single-chip numerics are preserved exactly (batch sharding never splits
    the spatial or channel dims a conv reduces over).

    Use :meth:`place_params` once to pin the weights replicated on the mesh
    (repeat callers otherwise pay a host->device transfer per call).
    """

    def __init__(self, cfg: Config, mesh, quant_stats=None):
        from jax.sharding import NamedSharding, PartitionSpec as P
        if tuple(mesh.axis_names) != ("data",):
            raise ValueError(
                f"ShardedTranslator takes a 1-D ('data',) mesh, got axes "
                f"{mesh.axis_names}")
        super().__init__(cfg, quant_stats=quant_stats)
        self.mesh = mesh
        self._rep = NamedSharding(mesh, P())
        self._bsh = NamedSharding(mesh, P("data"))
        shardings = (self._rep, self._bsh, self._bsh)
        # in_shardings pin the layout; outputs inherit the batch sharding
        # through GSPMD propagation (no out_shardings needed).
        self._sh_translate = jax.jit(
            partial(Translator._translate.__wrapped__, self),
            in_shardings=shardings)
        self._sh_translate_u8 = jax.jit(
            partial(Translator._translate_u8.__wrapped__, self),
            in_shardings=shardings)
        self._sh_translate_u8io = jax.jit(
            partial(Translator._translate_u8io.__wrapped__, self),
            in_shardings=shardings)

    def place_params(self, params, member: Optional[int] = None):
        """Replicate (a member slice of) the generator params on the mesh."""
        if member is not None:
            params = jax.tree_util.tree_map(lambda l: l[member], params)
        return jax.device_put(params, self._rep)

    def _check_batch(self, x):
        n_dev = self.mesh.shape["data"]
        if x.shape[0] % n_dev:
            raise ValueError(
                f"global batch {x.shape[0]} not divisible by data-axis "
                f"size {n_dev} (pad the tail batch — see test_on_folder.py)")

    def translate(self, params, x, z=None, rng=None,
                  member: Optional[int] = None):
        if member is not None:
            params = jax.tree_util.tree_map(lambda l: l[member], params)
        self._check_batch(x)
        if z is None:
            if rng is None:
                rng = jax.random.PRNGKey(0)
            z = jax.random.normal(rng, (x.shape[0], self.cfg.gen.style_dim))
        return self._sh_translate(params, x, z)

    def translate_u8(self, params, x, z=None, rng=None,
                     member: Optional[int] = None) -> np.ndarray:
        return np.asarray(self.translate_u8_device(params, x, z=z, rng=rng,
                                                   member=member))

    def translate_u8_device(self, params, x, z=None, rng=None,
                            member: Optional[int] = None):
        if member is not None:
            params = jax.tree_util.tree_map(lambda l: l[member], params)
        self._check_batch(x)
        if z is None:
            if rng is None:
                rng = jax.random.PRNGKey(0)
            z = jax.random.normal(rng, (x.shape[0], self.cfg.gen.style_dim))
        return self._sh_translate_u8(params, x, z)

    def translate_u8io_device(self, params, x_u8, z=None, rng=None,
                              member: Optional[int] = None):
        if member is not None:
            params = jax.tree_util.tree_map(lambda l: l[member], params)
        self._check_batch(x_u8)
        if z is None:
            if rng is None:
                rng = jax.random.PRNGKey(0)
            z = jax.random.normal(rng,
                                  (x_u8.shape[0], self.cfg.gen.style_dim))
        return self._sh_translate_u8io(params, x_u8, z)


class MemberShardedTranslator(Translator):
    """Council-ensemble translation with the MEMBER axis sharded over a 1-D
    ``('council',)`` mesh (parallel.mesh.make_member_mesh) — council-8
    ensemble serving at single-member latency.

    GSPMD cannot partition the vmapped member axis (the per-member convs
    lower to grouped convolutions whose group dim XLA refuses to split —
    the same constraint that makes member-parallel TRAINING the explicit
    shard_map trainer, parallel/council_shard.py). So this is shard_map:
    each device holds council_size / mesh_size members' stacked params,
    the batch and the shared style draw replicate, every device runs the
    vmapped local translate with NO collectives at all, and the
    (N, B, H, W, 3) output stays member-sharded until the host readback
    gathers it. Numerics are exactly the single-device all-members path
    (each member's program is untouched; tests assert bitwise equality).

    Quantized ensemble serving stays rejected here for the same reason
    serve.py rejects it: activation scales are calibrated per member.
    """

    def __init__(self, cfg: Config, mesh, quant_stats=None):
        from jax.sharding import NamedSharding, PartitionSpec as P

        axes = tuple(mesh.axis_names)
        if axes not in (("council",), ("data", "council")):
            raise ValueError(
                "MemberShardedTranslator takes a ('council',) or "
                "('data','council') mesh (parallel.mesh.make_member_mesh), "
                f"got axes {mesh.axis_names}")
        n = cfg.council.council_size
        k = mesh.shape["council"]
        if n % k:
            raise ValueError(f"council_size {n} not divisible by member-"
                             f"mesh size {k}")
        if quant_stats is not None:
            raise ValueError("quantized ensemble serving is unsupported: "
                             "activation scales are calibrated per member "
                             "(tools/calibrate_quant.py --member)")
        super().__init__(cfg)
        self.mesh = mesh
        self._data_size = int(mesh.shape.get("data", 1))
        has_data = "data" in axes
        self._rep = NamedSharding(mesh, P())
        self._msh = NamedSharding(mesh, P("council"))
        batch_spec = P("data") if has_data else P()
        out_spec = P("council", "data") if has_data else P("council")

        def all_u8(params, x, z):
            return Translator._translate_all_u8.__wrapped__(
                self, params, x, z)

        def all_u8io(params, x_u8, z):
            return Translator._translate_all_u8io.__wrapped__(
                self, params, x_u8, z)

        specs = dict(mesh=mesh,
                     in_specs=(P("council"), batch_spec, batch_spec),
                     out_specs=out_spec, **_SHARD_MAP_NOCHECK)
        # no-check mode: unlike the trainer there is NO cross-member
        # term here — params enter device-varying (council-sharded), the
        # batch enters either replicated or data-sharded, and the output
        # is sharded over both axes it computes locally; nothing needs a
        # collective, so there is no psum placement for vma checking to
        # protect.
        self._sh_all_u8 = jax.jit(_shard_map(all_u8, **specs))
        self._sh_all_u8io = jax.jit(_shard_map(all_u8io, **specs))

    def place_params(self, stacked_params):
        """Pin the stacked (N, ...) tree with the member axis sharded
        (and, on a 2-D mesh, replicated along 'data')."""
        return jax.device_put(stacked_params, self._msh)

    def _check_batch(self, x):
        if x.shape[0] % self._data_size:
            raise ValueError(
                f"global batch {x.shape[0]} not divisible by the serving "
                f"mesh's data-axis size {self._data_size} (the engine's "
                "bucket ladder guarantees this; pad manual calls)")

    def translate_all_u8_device(self, stacked_params, x, z):
        self._check_batch(x)
        return self._sh_all_u8(stacked_params, x, z)

    def translate_all_u8io_device(self, stacked_params, x_u8, z):
        self._check_batch(x_u8)
        return self._sh_all_u8io(stacked_params, x_u8, z)

    def translate_all_members(self, stacked_params, x, z=None, rng=None):
        """(N,B,H,W,3) float translations + masks — CLI-compatible
        all-members path, member-sharded. z is (N,B,S) like the base
        class (each member may get its own draw)."""
        from jax.sharding import PartitionSpec as P

        if z is None:
            if rng is None:
                rng = jax.random.PRNGKey(0)
            n = self.cfg.council.council_size
            z = jax.random.normal(
                rng, (n, x.shape[0], self.cfg.gen.style_dim))
        if not hasattr(self, "_sh_all_f32"):
            has_data = "data" in self.mesh.axis_names
            bspec = P("data") if has_data else P()
            mspec = (P("council", "data") if has_data else P("council"))

            def all_f32(params, x, z):
                return Translator._translate_all_members.__wrapped__(
                    self, params, x, z)
            self._sh_all_f32 = jax.jit(_shard_map(
                all_f32, mesh=self.mesh,
                in_specs=(P("council"), bspec, mspec),
                out_specs=mspec, **_SHARD_MAP_NOCHECK))
        self._check_batch(x)
        return self._sh_all_f32(stacked_params, x, z)


def denormalize_to_uint8(img: np.ndarray) -> np.ndarray:
    """[-1,1] float -> uint8, matching the reference's save path
    (vutils.save_image((out+1)/2): scale, clamp, round)."""
    arr = (np.asarray(img, dtype=np.float32) + 1.0) * 0.5
    arr = np.clip(arr, 0.0, 1.0)
    return (arr * 255.0 + 0.5).astype(np.uint8)
