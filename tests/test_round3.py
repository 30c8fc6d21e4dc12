"""Round-3 additions (VERDICT r2 items 4, 5, 7 + ADVICE fixes):

  * z_mode tri-state — per-phase style draws (reference trainer_council.py
    draws torch.randn inside each of the three update methods)
  * every_kth skipped-step metric masking (no fake-zero sawtooth in TB)
  * multi-host input partitioning — disjoint index shards per process
  * instance-norm precision lever (f32/mixed/bf16)
  * pallas conv3x3 XLA fallback when no VMEM plan fits
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from councilx.config import Config
from councilx.train.trainer import CouncilTrainer, draw_phase_zs

from test_train_step import synthetic_batch, tiny_config


# ---------------------------------------------------------------------------
# z_mode tri-state
# ---------------------------------------------------------------------------


class TestZMode:
    DIRS = ["a2b", "b2a"]

    def _folds(self, z_mode):
        seen = []

        def draw(fold):
            seen.append(fold)
            return fold

        zs_gen, zs_cdis, zs_dis = draw_phase_zs(draw, self.DIRS, z_mode)
        return zs_gen, zs_cdis, zs_dis, seen

    def test_shared_one_draw_for_all_phases(self):
        zs_gen, zs_cdis, zs_dis, seen = self._folds("shared")
        assert zs_gen is zs_cdis is zs_dis
        assert seen == [0, 1]  # one draw per direction, nothing else

    def test_dis_shared_two_streams(self):
        zs_gen, zs_cdis, zs_dis, seen = self._folds("dis_shared")
        assert zs_cdis is zs_dis and zs_gen is not zs_dis
        assert sorted(seen) == [0, 1, 100, 101]

    def test_per_phase_three_distinct_streams(self):
        zs_gen, zs_cdis, zs_dis, seen = self._folds("per_phase")
        # the three phases consume pairwise-distinct fold families
        assert sorted(seen) == [0, 1, 100, 101, 200, 201]
        for d in self.DIRS:
            assert len({zs_gen[d], zs_cdis[d], zs_dis[d]}) == 3

    def test_legacy_shared_z_maps_to_z_mode(self):
        assert Config.from_dict({"shared_z": True}).z_mode == "shared"
        assert Config.from_dict({"shared_z": False}).z_mode == "dis_shared"
        # explicit z_mode wins over the legacy bool
        assert Config.from_dict({"shared_z": True,
                                 "z_mode": "per_phase"}).z_mode == "per_phase"
        with pytest.raises(ValueError, match="z_mode"):
            Config.from_dict({"z_mode": "bogus"})

    def test_per_phase_trains(self, rng):
        cfg = tiny_config(z_mode="per_phase")
        trainer = CouncilTrainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0))
        x_a, x_b = synthetic_batch(rng)
        state, m = trainer.train_step(state, x_a, x_b)
        assert all(np.isfinite(np.asarray(v)).all() for v in m.values())

    def test_per_phase_changes_dis_losses_only_via_fakes(self, rng):
        """Same seed, z_mode dis_shared vs per_phase: the gen update
        consumes the same stream (fold di), so loss_gen differences come
        only through the differently-trained discriminators; the cdis
        phase must see different fakes (different loss) on step one."""
        x_a, x_b = synthetic_batch(rng)
        losses = {}
        for mode in ("dis_shared", "per_phase"):
            cfg = tiny_config(z_mode=mode)
            trainer = CouncilTrainer(cfg)
            state = trainer.init_state(jax.random.PRNGKey(0))
            _, m = trainer.train_step(state, x_a, x_b)
            losses[mode] = {k: float(np.asarray(v)) for k, v in m.items()}
        assert (losses["dis_shared"]["loss_dis_council"]
                != losses["per_phase"]["loss_dis_council"])
        # the domain-dis fakes use the same fold family (100+di) -> equal
        np.testing.assert_allclose(losses["dis_shared"]["loss_dis_adv"],
                                   losses["per_phase"]["loss_dis_adv"],
                                   rtol=1e-6)


# ---------------------------------------------------------------------------
# every_kth metric masking
# ---------------------------------------------------------------------------


class TestSkippedStepMetrics:
    def test_flag_and_masking(self, rng):
        from councilx.train.loop import mask_skipped_metrics
        cfg = tiny_config(
            council={"council_size": 2, "council_w": 0.2,
                     "council_dis_relative_iteration": 2,
                     "cdis_ratio_mode": "every_kth"})
        trainer = CouncilTrainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0))
        x_a, x_b = synthetic_batch(rng)

        state, m0 = trainer.train_step(state, x_a, x_b)   # step 0: runs
        assert float(m0["cdis_updated"]) == 1.0
        logged0 = mask_skipped_metrics(dict(m0))
        assert "loss_dis_council" in logged0
        assert float(logged0["loss_dis_council"]) != 0.0

        state, m1 = trainer.train_step(state, x_a, x_b)   # step 1: skipped
        assert float(m1["cdis_updated"]) == 0.0
        logged1 = mask_skipped_metrics(dict(m1))
        # the placeholder zero never reaches the log stream
        assert "loss_dis_council" not in logged1
        assert "cdis_updated" not in logged1

    def test_no_flag_outside_every_kth(self, rng):
        from councilx.train.loop import mask_skipped_metrics
        cfg = tiny_config()
        trainer = CouncilTrainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0))
        x_a, x_b = synthetic_batch(rng)
        _, m = trainer.train_step(state, x_a, x_b)
        assert "cdis_updated" not in m
        logged = mask_skipped_metrics(dict(m))
        assert "loss_dis_council" in logged


# ---------------------------------------------------------------------------
# multi-host input partitioning
# ---------------------------------------------------------------------------


class TestShardedLoader:
    def test_disjoint_slices_cover_global_batch(self):
        from councilx.data.dataset import SyntheticImageDataset
        from councilx.data.loader import DataLoader

        ds = SyntheticImageDataset(20, 16, seed=0)
        loaders = [DataLoader(ds, batch_size=3, shuffle=True, seed=7,
                              shard_index=i, shard_count=2)
                   for i in range(2)]
        streams = [ld._index_stream() for ld in loaders]
        # one reference stream with the same seed, unsharded global batches
        ref = DataLoader(ds, batch_size=6, shuffle=True,
                         seed=7)._index_stream()
        for _ in range(8):  # spans an epoch boundary (20 // 6 = 3 per epoch)
            parts = [next(s) for s in streams]
            assert len(parts[0]) == len(parts[1]) == 3
            assert not set(parts[0]) & set(parts[1])  # disjoint
            whole = next(ref)
            np.testing.assert_array_equal(np.concatenate(parts), whole)

    def test_shard_validation(self):
        from councilx.data.dataset import SyntheticImageDataset
        from councilx.data.loader import DataLoader

        ds = SyntheticImageDataset(8, 16, seed=0)
        with pytest.raises(ValueError, match="shard_index"):
            DataLoader(ds, 2, shard_index=2, shard_count=2)
        with pytest.raises(ValueError, match="drop_last"):
            DataLoader(ds, 2, shard_count=2, drop_last=False)
        with pytest.raises(ValueError, match="global"):
            DataLoader(ds, 5, shard_count=2)

    def test_augment_per_global_row_shard_invariant(self):
        """Per-global-row augmentation keys: two processes augmenting their
        halves (row_offset 0 and B/2) produce bit-identically the pixels a
        single process produces for the whole batch — the property the
        multi-host loop relies on."""
        from councilx.data.ondevice import augment_batch

        r = np.random.RandomState(0)
        batch = jnp.asarray(r.randint(0, 255, (8, 40, 40, 3), np.uint8))
        k = jax.random.PRNGKey(9)
        full = np.asarray(augment_batch(k, batch, 32, 32, train=True))
        h0 = np.asarray(augment_batch(k, batch[:4], 32, 32, train=True,
                                      row_offset=0))
        h1 = np.asarray(augment_batch(k, batch[4:], 32, 32, train=True,
                                      row_offset=4))
        np.testing.assert_array_equal(np.concatenate([h0, h1]), full)

    def test_get_all_data_loaders_shards_train_only(self):
        from councilx.data.loader import get_all_data_loaders

        cfg = tiny_config()
        tr_a, _, te_a, _ = get_all_data_loaders(
            cfg, synthetic=True, shard_index=1, shard_count=2)
        assert (tr_a.shard_index, tr_a.shard_count) == (1, 2)
        assert (te_a.shard_index, te_a.shard_count) == (0, 1)


# ---------------------------------------------------------------------------
# instance-norm precision lever
# ---------------------------------------------------------------------------


class TestInPrecision:
    def test_variants_coincide_at_f32(self):
        from councilx.nn.blocks import apply_adain, apply_instance_norm

        r = np.random.RandomState(0)
        y = jnp.asarray(r.randn(2, 8, 8, 4).astype(np.float32))
        g = jnp.asarray(r.randn(2, 4).astype(np.float32))
        b = jnp.asarray(r.randn(2, 4).astype(np.float32))
        base = apply_instance_norm(y, "f32")
        base_a = apply_adain(y, g, b, "f32")
        for p in ("mixed", "bf16"):
            np.testing.assert_array_equal(np.asarray(apply_instance_norm(y, p)),
                                          np.asarray(base))
            np.testing.assert_array_equal(np.asarray(apply_adain(y, g, b, p)),
                                          np.asarray(base_a))

    def test_bf16_variants_close_to_f32(self):
        from councilx.nn.blocks import apply_instance_norm

        r = np.random.RandomState(1)
        y = jnp.asarray(r.randn(2, 16, 16, 8).astype(np.float32),
                        jnp.bfloat16)
        out = {p: np.asarray(apply_instance_norm(y, p), np.float32)
               for p in ("f32", "mixed", "bf16")}
        for p in ("mixed", "bf16"):
            # normalized activations are O(1); bf16 has ~3 decimal digits
            assert np.max(np.abs(out[p] - out["f32"])) < 0.1

    def test_invalid_precision_rejected(self):
        from councilx.nn.blocks import apply_instance_norm
        with pytest.raises(ValueError, match="in_precision"):
            apply_instance_norm(jnp.zeros((1, 4, 4, 2)), "fp8")
        with pytest.raises(ValueError, match="in_precision"):
            Config.from_dict({"in_precision": "fp8"})

    def test_trains_under_bf16_in(self, rng):
        cfg = tiny_config(compute_dtype="bfloat16", in_precision="bf16")
        trainer = CouncilTrainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0))
        x_a, x_b = synthetic_batch(rng)
        state, m = trainer.train_step(state, x_a, x_b)
        assert all(np.isfinite(np.asarray(v)).all() for v in m.values())

    def test_param_tree_identical_across_precisions(self):
        from councilx.nn.generator import AdaINGen

        x = jnp.zeros((1, 32, 32, 3), jnp.float32)
        trees = []
        for p in ("f32", "bf16"):
            gen = AdaINGen(input_dim=3, dim=8, style_dim=3, n_downsample=2,
                           n_res=2, dtype=jnp.bfloat16, in_precision=p)
            v = gen.init(jax.random.PRNGKey(0), x)
            trees.append(jax.tree_util.tree_structure(v))
        assert trees[0] == trees[1]


# ---------------------------------------------------------------------------
# member-chunked (grad-accumulated) generator phase — single-chip council-8
# ---------------------------------------------------------------------------


class TestGenMemberChunks:
    def _gen_grads(self, chunks, x_a, x_b):
        import jax.numpy as jnp

        cfg = tiny_config(gen_member_chunks=chunks)
        trainer = CouncilTrainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0))
        inputs = {"a2b": (x_a, x_b)}
        n, b, sd = trainer.n, x_a.shape[0], cfg.gen.style_dim
        zs = {"a2b": jax.random.normal(jax.random.PRNGKey(3), (n, b, sd))}
        params = {d: dict(state.params[d]) for d in trainer.directions}
        tree = {d: params[d]["gen"] for d in trainer.directions}
        return trainer._gen_grads_chunked(tree, params, inputs, zs,
                                          jnp.zeros((), jnp.int32))

    def test_chunked_grads_match_unchunked(self, rng):
        """gen_member_chunks=2 must reproduce the single-chunk gradients:
        the gen loss is separable over members (stop-gradient
        discriminators), so chunk-accumulated gradients equal the
        full-council gradients up to float reassociation. (Post-Adam params
        are NOT compared — Adam's ~sign(g) normalization amplifies
        reassociation noise on near-zero gradients to O(lr).)"""
        x_a, x_b = synthetic_batch(rng)
        loss1, aux1, g1 = self._gen_grads(1, x_a, x_b)
        loss2, aux2, g2 = self._gen_grads(2, x_a, x_b)
        np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
        assert set(aux1) == set(aux2)
        for k in aux1:
            np.testing.assert_allclose(float(aux1[k]), float(aux2[k]),
                                       rtol=1e-5, err_msg=f"metric {k}")
        for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(g1)),
                        jax.tree_util.tree_leaves(jax.device_get(g2))):
            assert a.shape == b.shape
            # different chunk counts compile to different XLA fusions;
            # measured reassociation noise is <1e-5 abs on O(0.1) grads
            # under two_pass stats and up to ~5e-5 under the round-5
            # norm_stats=one_pass default (E[x2]-E[x]2 cancellation)
            np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-4)

    def test_chunked_step_trains(self, rng):
        cfg = tiny_config(gen_member_chunks=2)
        trainer = CouncilTrainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0))
        x_a, x_b = synthetic_batch(rng)
        state, m = trainer.train_step(state, x_a, x_b)
        assert all(np.isfinite(np.asarray(v)).all() for v in m.values())

    def test_invalid_chunks_rejected(self):
        with pytest.raises(ValueError, match="gen_member_chunks"):
            tiny_config(gen_member_chunks=3)  # council_size 2
        with pytest.raises(ValueError, match="gen_member_chunks"):
            tiny_config(gen_member_chunks=0)


# ---------------------------------------------------------------------------
# on-device uint8 serving output
# ---------------------------------------------------------------------------


def test_translate_u8_matches_host_denormalize(rng):
    """The serving fast path (uint8 produced on device, 4x smaller D2H)
    must match the host-side denormalize of the f32 path exactly."""
    from councilx.inference.translate import Translator, denormalize_to_uint8

    cfg = tiny_config()
    tr = Translator(cfg)
    dummy = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = tr.gen.init(jax.random.PRNGKey(0), dummy)["params"]
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    z = jnp.asarray(rng.randn(2, cfg.gen.style_dim).astype(np.float32))
    f32_out, _ = tr.translate(params, x, z=z)
    want = denormalize_to_uint8(np.asarray(f32_out))
    got = tr.translate_u8(params, x, z=z)
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# sharded (data-parallel) serving
# ---------------------------------------------------------------------------


class TestShardedTranslator:
    @pytest.fixture(scope="class")
    def setup(self):
        from councilx.inference.translate import ShardedTranslator, Translator
        from councilx.parallel.mesh import make_mesh

        cfg = tiny_config()
        mesh = make_mesh(4)
        base = Translator(cfg)
        sharded = ShardedTranslator(cfg, mesh)
        dummy = jnp.zeros((1, 32, 32, 3), jnp.float32)
        params = base.gen.init(jax.random.PRNGKey(0), dummy)["params"]
        return base, sharded, params, mesh

    def test_matches_single_device(self, setup, rng):
        """Batch sharding never splits the dims a conv reduces over, so the
        sharded translate matches single-device up to compilation-level
        float reassociation (XLA tiles a batch-2 shard differently than the
        batch-8 whole; measured diff <=1.3e-6 abs on CPU)."""
        base, sharded, params, _ = setup
        x = jnp.asarray(rng.uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32))
        z = jnp.asarray(rng.randn(8, 3).astype(np.float32))
        want, want_mask = base.translate(params, x, z=z)
        got, got_mask = sharded.translate(sharded.place_params(params), x,
                                          z=z)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
        if want_mask is not None:
            np.testing.assert_allclose(np.asarray(got_mask),
                                       np.asarray(want_mask),
                                       rtol=1e-5, atol=1e-5)

    def test_u8_matches(self, setup, rng):
        base, sharded, params, _ = setup
        x = jnp.asarray(rng.uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32))
        z = jnp.asarray(rng.randn(8, 3).astype(np.float32))
        np.testing.assert_array_equal(sharded.translate_u8(params, x, z=z),
                                      base.translate_u8(params, x, z=z))

    def test_output_is_batch_sharded(self, setup, rng):
        """The translated batch must actually live sharded over the mesh
        (one shard per device, split on axis 0)."""
        base, sharded, params, mesh = setup
        x = jnp.asarray(rng.uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32))
        z = jnp.asarray(rng.randn(8, 3).astype(np.float32))
        out, _ = sharded.translate(params, x, z=z)
        shards = out.addressable_shards
        assert len(shards) == 4
        assert all(s.data.shape[0] == 2 for s in shards)

    def test_ragged_batch_rejected(self, setup, rng):
        _, sharded, params, _ = setup
        x = jnp.zeros((6, 32, 32, 3), jnp.float32)  # 6 % 4 != 0
        with pytest.raises(ValueError, match="not divisible"):
            sharded.translate(params, x)

    def test_requires_data_mesh(self, setup):
        from councilx.inference.translate import ShardedTranslator
        from jax.sharding import Mesh

        devs = np.asarray(jax.devices()[:4]).reshape(2, 2)
        with pytest.raises(ValueError, match="1-D"):
            ShardedTranslator(tiny_config(),
                              Mesh(devs, axis_names=("data", "council")))


# ---------------------------------------------------------------------------
# host prefetch pipeline
# ---------------------------------------------------------------------------


def test_host_prefetch_loop_equivalence(tmp_path):
    """host_prefetch stages batch k+1 in a worker thread while step k runs;
    the staged work is keyed by step number and consumes the loader in step
    order, so the trained parameters must be BITWISE identical to the
    synchronous loop's."""
    import orbax.checkpoint as ocp

    from councilx.config import load_config
    from councilx.train.loop import train

    smoke = os.path.join(os.path.dirname(__file__), "..", "configs",
                         "smoke_tiny.yaml")

    def run(prefetch, name):
        cfg = load_config(smoke)
        cfg.host_prefetch = prefetch
        train(cfg, output_path=str(tmp_path), run_name=name, synthetic=True,
              max_steps=3)
        path = os.path.join(str(tmp_path), name, "checkpoints",
                            "step_00000003")
        return ocp.PyTreeCheckpointer().restore(os.path.abspath(path))

    on = run(True, "prefetch_on")
    off = run(False, "prefetch_off")
    leaves_on = jax.tree_util.tree_leaves(on["params"])
    leaves_off = jax.tree_util.tree_leaves(off["params"])
    assert len(leaves_on) == len(leaves_off)
    for a, b in zip(leaves_on, leaves_off):
        np.testing.assert_array_equal(a, b)


# ---------------------------------------------------------------------------
# pallas conv fallback
# ---------------------------------------------------------------------------


def test_conv3x3_valid_falls_back_when_no_vmem_plan():
    from councilx.ops.pallas_conv import _pick_hb, conv3x3_valid

    h = w = 64
    c = o = 512
    assert _pick_hb(h, w, c, o, itemsize=4) is None  # the ungated case
    r = np.random.RandomState(0)
    xp = jnp.asarray(r.randn(1, h + 2, w + 2, c).astype(np.float32) * 0.1)
    k = jnp.asarray(r.randn(3, 3, c, o).astype(np.float32) * 0.02)
    got = conv3x3_valid(xp, k)
    want = jax.lax.conv_general_dilated(
        xp, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
