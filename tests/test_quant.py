"""W8A8 int8 serving quantization (ops/quant.py + Conv2dBlock/generator
plumbing, round 3).

Pins down:
  * conv_w8a8's error vs the f32 conv is pure symmetric roundoff (small,
    bounded) and the int32 accumulation is exact for integer-valued inputs
  * per-channel weight scales cancel exactly under instance norm (the
    quality argument for quantizing only IN/AdaIN convs)
  * the quant Conv2dBlock branch has an IDENTICAL parameter tree to the
    plain branch (checkpoints work unchanged)
  * the fused upsample's quantized interior stays close to the exact path
  * AdaINGen(quant="w8a8") runs end to end, stays finite, and its uint8
    translation stays close to the unquantized one
  * config validation + Translator gating (parity_mode forces quant off)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_train_step import tiny_config


def f32_conv(x, k, b=None, stride=1):
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), k.astype(jnp.float32),
        (stride, stride), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b if b is not None else y


class TestConvW8A8:
    def test_exact_for_integer_grids(self):
        """Inputs/weights already on the int8 grid -> bit-exact conv (the
        int32 MXU accumulation adds no error)."""
        from councilx.ops.quant import conv_w8a8

        r = np.random.RandomState(0)
        x = r.randint(-127, 128, (2, 8, 8, 4)).astype(np.float32)
        k = r.randint(-127, 128, (3, 3, 4, 4)).astype(np.float32)
        # pin the per-image / per-out-channel maxima to exactly 127 so the
        # dynamic scales are exactly 1.0 and quantization is lossless
        x[:, 0, 0, 0] = 127.0
        k[0, 0, 0, :] = 127.0
        got = conv_w8a8(jnp.asarray(x), jnp.asarray(k),
                        out_dtype=jnp.float32)
        want = f32_conv(jnp.asarray(x), jnp.asarray(k))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-2)

    def test_roundoff_error_bounded(self):
        """Random f32 data: relative error of the quantized conv stays in
        the few-percent band expected from 8-bit symmetric roundoff."""
        from councilx.ops.quant import conv_w8a8

        r = np.random.RandomState(1)
        x = (r.randn(2, 16, 16, 32) * 0.5).astype(np.float32)
        k = (r.randn(3, 3, 32, 32) * 0.05).astype(np.float32)
        got = np.asarray(conv_w8a8(jnp.asarray(x), jnp.asarray(k),
                                   out_dtype=jnp.float32))
        want = np.asarray(f32_conv(jnp.asarray(x), jnp.asarray(k)))
        rel = (np.linalg.norm(got - want) / np.linalg.norm(want))
        assert rel < 0.02, f"relative error {rel:.4f}"

    def test_per_channel_scale_cancels_under_instance_norm(self):
        """Scaling output channel o of the kernel by any positive factor
        leaves instance_norm(conv(x)) unchanged up to the eps in
        1/sqrt(var + eps) — the reason the IN/AdaIN convs are the safe ones
        to quantize (only roundoff survives, never the scale)."""
        from councilx.nn.blocks import instance_norm

        r = np.random.RandomState(2)
        x = jnp.asarray((r.randn(1, 12, 12, 8) * 0.3).astype(np.float32))
        k = jnp.asarray((r.randn(3, 3, 8, 8) * 0.1).astype(np.float32))
        scales = jnp.asarray(r.uniform(0.25, 4.0, 8).astype(np.float32))
        a = instance_norm(f32_conv(x, k))
        b = instance_norm(f32_conv(x, k * scales))
        # eps=1e-5 vs per-channel variance bounds the residual: not exact,
        # but orders below the int8 roundoff this argument is about
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=2e-3)

    def test_strided(self):
        from councilx.ops.quant import conv_w8a8

        r = np.random.RandomState(3)
        x = (r.randn(1, 10, 10, 8) * 0.5).astype(np.float32)
        k = (r.randn(4, 4, 8, 16) * 0.05).astype(np.float32)
        got = np.asarray(conv_w8a8(jnp.asarray(x), jnp.asarray(k), stride=2,
                                   out_dtype=jnp.float32))
        want = np.asarray(f32_conv(jnp.asarray(x), jnp.asarray(k), stride=2))
        assert got.shape == want.shape == (1, 4, 4, 16)
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert rel < 0.03


class TestBlockAndGenerator:
    def test_param_tree_identical(self):
        """quant='w8a8' must not change the parameter tree (same Conv_0
        kernel/bias names+shapes as the nn.Conv branch)."""
        from councilx.nn.blocks import Conv2dBlock

        x = jnp.zeros((1, 8, 8, 4), jnp.float32)
        p0 = Conv2dBlock(8, 3, 1, 1, norm="in")\
            .init(jax.random.PRNGKey(0), x)["params"]
        p1 = Conv2dBlock(8, 3, 1, 1, norm="in", quant="w8a8")\
            .init(jax.random.PRNGKey(0), x)["params"]
        assert (jax.tree_util.tree_structure(p0)
                == jax.tree_util.tree_structure(p1))
        for a, b in zip(jax.tree_util.tree_leaves(p0),
                        jax.tree_util.tree_leaves(p1)):
            assert a.shape == b.shape
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_fused_upsample_quant_close(self):
        from councilx.ops.upsample_conv import (upsample2x_conv5x5,
                                                upsample2x_conv5x5_reference)

        r = np.random.RandomState(4)
        x = jnp.asarray((r.randn(1, 8, 8, 8) * 0.4).astype(np.float32))
        k = jnp.asarray((r.randn(5, 5, 8, 4) * 0.08).astype(np.float32))
        b = jnp.asarray(r.randn(4).astype(np.float32) * 0.1)
        want = np.asarray(upsample2x_conv5x5_reference(x, k, b))
        got = np.asarray(upsample2x_conv5x5(x, k, b, quant=True))
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert rel < 0.03, f"relative error {rel:.4f}"

    def test_generator_quant_translation_close(self):
        """Full quantized generator vs the unquantized one on the serving
        path: uint8 outputs should agree closely (random init — a weaker
        input than trained weights, so the tolerance is loose)."""
        from councilx.inference.translate import Translator

        cfg_q = tiny_config(quant="w8a8")
        cfg_f = tiny_config()
        tr_q, tr_f = Translator(cfg_q), Translator(cfg_f)
        dummy = np.zeros((1, 32, 32, 3), np.float32)
        params = tr_f.gen.init(jax.random.PRNGKey(0), dummy)["params"]
        r = np.random.RandomState(5)
        x = jnp.asarray(r.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
        z = jnp.asarray(r.randn(2, cfg_f.gen.style_dim).astype(np.float32))
        u_f = tr_f.translate_u8(params, x, z=z).astype(np.int32)
        u_q = tr_q.translate_u8(params, x, z=z).astype(np.int32)
        assert np.isfinite(u_q).all()
        mad = np.abs(u_f - u_q).mean()
        assert mad < 8.0, f"mean abs uint8 diff {mad:.2f}"

    def test_parity_mode_forces_quant_off(self):
        from councilx.inference.translate import Translator

        cfg = tiny_config(quant="w8a8", parity_mode=True)
        assert Translator(cfg).gen.quant == "none"

    def test_config_rejects_unknown_quant(self):
        with pytest.raises(ValueError, match="quant"):
            tiny_config(quant="int4")


class TestStaticQuant:
    """w8a8_calib records activation absmax into the quant_stats
    collection; w8a8_static consumes the calibrated scales (the fast mode —
    no dynamic reduces; BASELINE.md 1.03-1.06x)."""

    @pytest.fixture(scope="class")
    def calibrated(self):
        from councilx.inference.translate import Translator
        from councilx.nn.generator import AdaINGen

        cfg = tiny_config()
        tr = Translator(cfg)
        dummy = np.zeros((1, 32, 32, 3), np.float32)
        params = tr.gen.init(jax.random.PRNGKey(0), dummy)["params"]
        gen_c = tr.gen.copy(quant="w8a8_calib")
        stats = gen_c.init(jax.random.PRNGKey(0), dummy)["quant_stats"]
        r = np.random.RandomState(7)
        x = jnp.asarray(r.uniform(-1, 1, (4, 32, 32, 3)).astype(np.float32))
        z = jnp.asarray(r.randn(4, cfg.gen.style_dim).astype(np.float32))
        for _ in range(2):
            c, upd = gen_c.apply({"params": params, "quant_stats": stats},
                                 x, method=AdaINGen.encode_content,
                                 mutable=["quant_stats"])
            stats = upd["quant_stats"]
            _, upd = gen_c.apply({"params": params, "quant_stats": stats},
                                 c, z, method=AdaINGen.decode,
                                 mutable=["quant_stats"])
            stats = upd["quant_stats"]
        return cfg, params, stats, x, z

    def test_calibration_fills_positive_stats(self, calibrated):
        _, _, stats, _, _ = calibrated
        leaves = jax.tree_util.tree_leaves(stats)
        assert leaves, "no quantized convs recorded stats"
        assert all(float(l) > 0.0 for l in leaves)

    def test_static_close_to_dynamic(self, calibrated):
        from councilx.inference.translate import Translator

        cfg, params, stats, x, z = calibrated
        tr_d = Translator(tiny_config(quant="w8a8"))
        tr_s = Translator(tiny_config(quant="w8a8_static"),
                          quant_stats=stats)
        u_d = tr_d.translate_u8(params, x, z=z).astype(np.int32)
        u_s = tr_s.translate_u8(params, x, z=z).astype(np.int32)
        # same int8 convs, only the activation scale granularity differs
        # (per-image dynamic vs calibrated per-tensor)
        mad = np.abs(u_d - u_s).mean()
        assert mad < 6.0, f"mean abs uint8 diff {mad:.2f}"

    def test_static_close_to_bf16(self, calibrated):
        from councilx.inference.translate import Translator

        cfg, params, stats, x, z = calibrated
        tr_f = Translator(tiny_config())
        tr_s = Translator(tiny_config(quant="w8a8_static"),
                          quant_stats=stats)
        u_f = tr_f.translate_u8(params, x, z=z).astype(np.int32)
        u_s = tr_s.translate_u8(params, x, z=z).astype(np.int32)
        mad = np.abs(u_f - u_s).mean()
        assert mad < 8.0, f"mean abs uint8 diff {mad:.2f}"

    @pytest.mark.parametrize("scope", ["resblocks", "heavy"])
    def test_quant_scope_selects_conv_classes(self, scope):
        """quant_scope controls WHICH convs grow quant branches: 'resblocks'
        records stats only under the ResBlocks subtrees; 'heavy' also under
        the encoder down-convs and decoder upsample convs (nn/generator.py —
        round-4 stage profile: int8 wins on resblocks, loses elsewhere)."""
        from councilx.inference.translate import Translator

        cfg = tiny_config()
        cfg.quant_scope = scope
        tr = Translator(cfg)
        gen_c = tr.gen.copy(quant="w8a8_calib")
        dummy = np.zeros((1, 32, 32, 3), np.float32)
        stats = gen_c.init(jax.random.PRNGKey(0), dummy)["quant_stats"]
        tops = {k: set(v.keys()) for k, v in stats.items()}
        assert "ResBlocks_0" in tops.get("enc_content", set())
        assert "ResBlocks_0" in tops.get("dec", set())
        non_res = [k for sub in tops.values() for k in sub
                   if not k.startswith("ResBlocks")]
        if scope == "resblocks":
            assert not non_res, non_res
        else:
            assert any(k.startswith("Conv2dBlock") for k in non_res)

    def test_static_requires_stats(self):
        from councilx.inference.translate import Translator

        with pytest.raises(ValueError, match="calibrated stats"):
            Translator(tiny_config(quant="w8a8_static"))

    def test_scope_mismatch_names_quant_scope(self, calibrated):
        """Stats calibrated at scope=resblocks lack the downsample/upsample
        entries scope=heavy consumes — Translator must fail AT CONSTRUCTION
        with an error naming quant_scope, not a raw flax missing-variable
        error mid-serve (ADVICE r4)."""
        from councilx.inference.translate import Translator

        _, _, stats, _, _ = calibrated   # default scope: resblocks
        with pytest.raises(ValueError, match="quant_scope"):
            Translator(tiny_config(quant="w8a8_static",
                                   quant_scope="heavy"),
                       quant_stats=stats)

    def test_heavy_stats_cover_resblocks_scope(self, calibrated):
        """The reverse direction (heavy-calibrated stats served at
        resblocks scope) is a superset and must construct fine."""
        from councilx.inference.translate import Translator

        cfg_h = tiny_config(quant="w8a8_static", quant_scope="heavy")
        tr_probe = Translator(tiny_config(quant_scope="heavy"))
        gen_c = tr_probe.gen.copy(quant="w8a8_calib")
        dummy = np.zeros((1, 32, 32, 3), np.float32)
        heavy_stats = gen_c.init(jax.random.PRNGKey(0),
                                 dummy)["quant_stats"]
        Translator(tiny_config(quant="w8a8_static"),
                   quant_stats=heavy_stats)   # no raise

    def test_calib_mode_rejected_by_translator(self):
        from councilx.inference.translate import Translator

        with pytest.raises(ValueError, match="calibration-pass"):
            Translator(tiny_config(quant="w8a8_calib"))

    def test_sharded_translator_static_quant(self, calibrated):
        """Static quant under the data-parallel serving mesh: the scales
        bake into the GSPMD executable; output matches the single-device
        static path exactly (same program, replicated params)."""
        from jax.sharding import Mesh
        from councilx.inference.translate import ShardedTranslator, Translator

        cfg, params, stats, x, z = calibrated
        mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
        tr_m = ShardedTranslator(tiny_config(quant="w8a8_static"), mesh,
                                 quant_stats=stats)
        tr_s = Translator(tiny_config(quant="w8a8_static"),
                          quant_stats=stats)
        p_m = tr_m.place_params(params)
        u_m = tr_m.translate_u8(p_m, x, z=z)
        u_s = tr_s.translate_u8(params, x, z=z)
        np.testing.assert_array_equal(u_m, u_s)

    def test_stats_roundtrip_npz(self, calibrated, tmp_path):
        from councilx.ckpt.manager import load_params_npz, save_params_npz

        _, _, stats, _, _ = calibrated
        path = str(tmp_path / "qs.npz")
        save_params_npz(path, stats)
        loaded = load_params_npz(path)
        assert (jax.tree_util.tree_structure(jax.device_get(stats))
                == jax.tree_util.tree_structure(loaded))
        for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(stats)),
                        jax.tree_util.tree_leaves(loaded)):
            np.testing.assert_allclose(a, b)


class TestQuantQualityTool:
    """tools/quant_quality.py — the pre-production quality gate: same
    (x, z) through the bf16 and quantized serving paths, PSNR/uint8 deltas
    in output space."""

    def test_compare_end_to_end(self, tmp_path):
        import yaml

        from councilx.ckpt.manager import save_params_npz
        from councilx.nn.generator import AdaINGen
        from councilx.inference.translate import Translator
        from tools.quant_quality import compare

        raw = {
            "batch_size": 2,
            "compute_dtype": "float32",
            "gen": {"dim": 8, "mlp_dim": 16, "style_dim": 3,
                    "n_downsample": 2, "n_res": 2},
            "dis": {"dim": 8, "n_layer": 2, "num_scales": 2},
            "council": {"council_size": 2, "council_w": 0.2},
            "data": {"new_size": 36, "crop_image_height": 32,
                     "crop_image_width": 32},
        }
        cfg_path = tmp_path / "cfg.yaml"
        cfg_path.write_text(yaml.safe_dump(raw))

        # stacked random-init generator checkpoint
        from councilx.config import Config
        cfg = Config.from_dict(raw)
        tr = Translator(cfg)
        dummy = np.zeros((1, 32, 32, 3), np.float32)
        stacked = jax.vmap(tr.gen.init, in_axes=(0, None))(
            jax.random.split(jax.random.PRNGKey(0), 2), dummy)["params"]
        ckpt = tmp_path / "gen.npz"
        save_params_npz(str(ckpt), stacked)

        # mini calibration for the static mode (member 0)
        params0 = jax.tree_util.tree_map(lambda l: l[0], stacked)
        gen_c = tr.gen.copy(quant="w8a8_calib")
        stats = gen_c.init(jax.random.PRNGKey(0), dummy)["quant_stats"]
        r = np.random.RandomState(3)
        x = jnp.asarray(r.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
        z = jnp.asarray(r.randn(2, 3).astype(np.float32))
        c, upd = gen_c.apply({"params": params0, "quant_stats": stats},
                             x, method=AdaINGen.encode_content,
                             mutable=["quant_stats"])
        stats = upd["quant_stats"]
        _, upd = gen_c.apply({"params": params0, "quant_stats": stats},
                             c, z, method=AdaINGen.decode,
                             mutable=["quant_stats"])
        calib = tmp_path / "qs.npz"
        save_params_npz(str(calib), jax.device_get(upd["quant_stats"]))

        results = compare(str(cfg_path), str(ckpt), member=0,
                          direction="a2b", modes=["w8a8", "w8a8_static"],
                          calibration=str(calib), batch_size=2,
                          num_batches=2, seed=0)
        for mode in ("w8a8", "w8a8_static"):
            m = results[mode]
            assert m["images"] == 4
            assert m["psnr_min_db"] > 20.0, m   # quant is CLOSE, not exact
            assert m["maxabs_u8"] < 128, m
            assert m["meanabs_u8"] < 8.0, m

    def test_static_requires_calibration(self, tmp_path):
        import yaml

        from tools.quant_quality import compare

        cfg_path = tmp_path / "cfg.yaml"
        cfg_path.write_text(yaml.safe_dump({
            "gen": {"dim": 8, "mlp_dim": 16, "style_dim": 3,
                    "n_downsample": 2, "n_res": 2},
            "council": {"council_size": 2},
            "data": {"crop_image_height": 32, "crop_image_width": 32},
        }))
        with pytest.raises(SystemExit):
            compare(str(cfg_path), "missing.npz", 0, "a2b",
                    ["w8a8_static"], calibration=None)
