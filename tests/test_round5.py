"""Round-5 surface: the LN-fused upsample engine (ops/upsample_conv.py::
upsample2x_conv5x5_ln_fused — VERDICT r4 item 2) and odd-shape hardening of
the boundary-conv engines (VERDICT r4 item 7).

The LN-fused path must be the exact same function as
upsample -> pad -> conv -> MunitLayerNorm -> affine -> act up to float
summation order (stats pool over the phase layout, which holds the same
element set), with an IDENTICAL parameter pytree.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.smoke  # <5-min pre-commit tier

from councilx.nn.blocks import Conv2dBlock, MunitLayerNorm
from councilx.ops.upsample_conv import (upsample2x_conv5x5,
                                        upsample2x_conv5x5_ln_fused,
                                        upsample2x_conv5x5_reference)


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


def _ln_reference(y, gamma, beta, act=None, stats="two_pass"):
    """The unfused tail: MunitLayerNorm formula + affine (+ activation)."""
    ln = MunitLayerNorm(num_features=y.shape[-1], precision="f32",
                        stats=stats)
    out = ln.apply({"params": {"gamma": gamma, "beta": beta}}, y)
    return act(out) if act is not None else out


class TestLnFusedUpsample:
    @pytest.mark.parametrize("pad_type", ["reflect", "replicate", "zero"])
    @pytest.mark.parametrize("hw", [(4, 4), (8, 6), (16, 12)])
    def test_matches_reference(self, pad_type, hw):
        r = np.random.default_rng(0)
        h, w = hw
        x = _rand(r, 2, h, w, 6)
        k = _rand(r, 5, 5, 6, 8) * 0.1
        b = _rand(r, 8) * 0.1
        gamma = jnp.abs(_rand(r, 8)) + 0.5
        beta = _rand(r, 8) * 0.1
        ref = _ln_reference(
            upsample2x_conv5x5_reference(x, k, b, pad_type,
                                         precision="highest"),
            gamma, beta, act=jax.nn.relu)
        fused = upsample2x_conv5x5_ln_fused(
            x, k, b, pad_type, gamma, beta, ln_precision="f32",
            act=jax.nn.relu, precision="highest")
        assert fused.shape == ref.shape == (2, 2 * h, 2 * w, 8)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                                   atol=3e-5, rtol=1e-4)

    def test_tiny_input_falls_back(self):
        r = np.random.default_rng(1)
        x = _rand(r, 1, 3, 3, 4)   # h < 4: reference conv + full-res LN
        k = _rand(r, 5, 5, 4, 4) * 0.1
        b = _rand(r, 4) * 0.1
        gamma = jnp.ones((4,))
        beta = jnp.zeros((4,))
        ref = _ln_reference(
            upsample2x_conv5x5_reference(x, k, b, "reflect",
                                         precision="highest"),
            gamma, beta)
        fused = upsample2x_conv5x5_ln_fused(
            x, k, b, "reflect", gamma, beta, ln_precision="f32",
            precision="highest")
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                                   atol=3e-5, rtol=1e-4)

    def test_gradients_match(self):
        r = np.random.default_rng(2)
        x = _rand(r, 1, 8, 8, 4)
        k = _rand(r, 5, 5, 4, 3) * 0.1
        b = _rand(r, 3) * 0.1
        gamma = jnp.abs(_rand(r, 3)) + 0.5
        beta = _rand(r, 3) * 0.1

        def loss_ref(x, k, b, g, bt):
            y = _ln_reference(
                upsample2x_conv5x5_reference(x, k, b, "reflect",
                                             precision="highest"),
                g, bt, act=jax.nn.relu)
            return jnp.sum(jnp.sin(y))

        def loss_fused(x, k, b, g, bt):
            y = upsample2x_conv5x5_ln_fused(
                x, k, b, "reflect", g, bt, ln_precision="f32",
                act=jax.nn.relu, precision="highest")
            return jnp.sum(jnp.sin(y))

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
            x, k, b, gamma, beta)
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(
            x, k, b, gamma, beta)
        for a, bb in zip(g_ref, g_fused):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                       atol=5e-5, rtol=1e-3)

    @pytest.mark.parametrize("mode", ["f32", "mixed", "bf16"])
    @pytest.mark.parametrize("stats", ["two_pass", "one_pass"])
    def test_precision_and_stats_modes(self, mode, stats):
        """At float32 input all precision modes coincide with the reference
        formula (MunitLayerNorm semantics are a no-op split at f32)."""
        r = np.random.default_rng(3)
        x = _rand(r, 2, 6, 6, 4)
        k = _rand(r, 5, 5, 4, 4) * 0.1
        b = _rand(r, 4) * 0.1
        gamma = jnp.abs(_rand(r, 4)) + 0.5
        beta = _rand(r, 4) * 0.1
        ref = _ln_reference(
            upsample2x_conv5x5_reference(x, k, b, "reflect",
                                         precision="highest"),
            gamma, beta, stats=stats)
        fused = upsample2x_conv5x5_ln_fused(
            x, k, b, "reflect", gamma, beta, ln_precision=mode,
            ln_stats=stats, precision="highest")
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                                   atol=3e-5, rtol=1e-4)

    def test_conv2dblock_param_tree_identical_and_output_close(self):
        r = np.random.default_rng(4)
        x = _rand(r, 2, 8, 8, 6)
        kwargs = dict(out_dim=4, kernel_size=5, stride=1, padding=2,
                      norm="ln", activation="relu", pad_type="reflect",
                      upsample2x=True, fuse_upsample=True)
        blk_sep = Conv2dBlock(upsample_engine="dilated", **kwargs)
        blk_fus = Conv2dBlock(upsample_engine="ln_fused", **kwargs)
        v_sep = blk_sep.init(jax.random.PRNGKey(0), x)
        v_fus = blk_fus.init(jax.random.PRNGKey(0), x)
        # identical pytree structure AND values (same init streams)
        assert (jax.tree_util.tree_structure(v_sep)
                == jax.tree_util.tree_structure(v_fus))
        for a, b in zip(jax.tree_util.tree_leaves(v_sep),
                        jax.tree_util.tree_leaves(v_fus)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        y_sep = blk_sep.apply(v_sep, x)
        y_fus = blk_fus.apply(v_sep, x)
        np.testing.assert_allclose(np.asarray(y_fus), np.asarray(y_sep),
                                   atol=3e-5, rtol=1e-4)

    def test_generator_engine_parity(self):
        """AdaINGen(upsample_engine='ln_fused') ~== the dilated default on
        the same params — the whole-model wiring check."""
        from councilx.nn.generator import AdaINGen

        r = np.random.default_rng(5)
        x = _rand(r, 1, 16, 16, 3)
        common = dict(input_dim=3, dim=8, style_dim=3, n_downsample=2,
                      n_res=2, mlp_dim=16, focus_mask=True)
        g_d = AdaINGen(upsample_engine="dilated", **common)
        g_f = AdaINGen(upsample_engine="ln_fused", **common)
        v = g_d.init(jax.random.PRNGKey(0), x)
        y_d = g_d.apply(v, x)
        y_f = g_f.apply(v, x)
        np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_d),
                                   atol=5e-5, rtol=1e-3)

    def test_config_validation(self):
        from test_train_step import tiny_config

        cfg = tiny_config(upsample_engine="ln_fused")   # accepted
        assert cfg.upsample_engine == "ln_fused"
        with pytest.raises(ValueError, match="upsample_engine"):
            tiny_config(upsample_engine="bogus")


class TestResblockFusePad:
    """Config.resblock_fuse_pad routes the 16 resblock 3x3 convs through
    the strips engine (no padded HBM copy) — exact up to summation order,
    identical param tree (the strips path reuses nn.Conv-compatible
    _ConvParams)."""

    def test_generator_parity_and_param_tree(self):
        from councilx.nn.generator import AdaINGen

        r = np.random.default_rng(8)
        x = _rand(r, 1, 16, 16, 3)
        common = dict(input_dim=3, dim=8, style_dim=3, n_downsample=2,
                      n_res=2, mlp_dim=16, focus_mask=True)
        g_off = AdaINGen(resblock_fuse_pad=False, **common)
        g_on = AdaINGen(resblock_fuse_pad=True, **common)
        v_off = g_off.init(jax.random.PRNGKey(0), x)
        v_on = g_on.init(jax.random.PRNGKey(0), x)
        assert (jax.tree_util.tree_structure(v_off)
                == jax.tree_util.tree_structure(v_on))
        y_off = g_off.apply(v_off, x)
        y_on = g_on.apply(v_off, x)
        np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off),
                                   atol=5e-5, rtol=1e-3)

    def test_gradients_match(self):
        from councilx.nn.blocks import ResBlock

        r = np.random.default_rng(9)
        x = _rand(r, 1, 8, 8, 8)
        rb_off = ResBlock(dim=8, norm="in", pad_type="reflect",
                          fuse_pad=False)
        rb_on = ResBlock(dim=8, norm="in", pad_type="reflect",
                         fuse_pad=True)
        v = rb_off.init(jax.random.PRNGKey(0), x)

        def loss(blk, v, x):
            return jnp.sum(jnp.sin(blk.apply(v, x)))

        g_off = jax.grad(loss, argnums=(1, 2))(rb_off, v, x)
        g_on = jax.grad(loss, argnums=(1, 2))(rb_on, v, x)
        for a, b in zip(jax.tree_util.tree_leaves(g_off),
                        jax.tree_util.tree_leaves(g_on)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5, rtol=1e-3)


class TestOddShapeBoundary:
    """VERDICT r4 item 7: the phase/phase_fused boundary engines require
    even H, W and must FALL BACK (silently but exactly) on odd inputs —
    e.g. 127px eval crops. The fallback paths are the least-exercised
    code in ops/; pin them."""

    @pytest.mark.parametrize("engine",
                             ["auto", "phase_fused", "phase", "strips"])
    @pytest.mark.parametrize("hw", [(31, 29), (31, 32), (32, 29)])
    def test_conv2d_same_odd_inputs_match_reference(self, engine, hw):
        from councilx.ops.pad_conv import conv2d_same, conv2d_same_reference

        r = np.random.default_rng(6)
        h, w = hw
        x = _rand(r, 2, h, w, 3)
        k = _rand(r, 7, 7, 3, 4) * 0.1
        b = _rand(r, 4) * 0.1
        ref = conv2d_same_reference(x, k, b, "reflect", precision="highest")
        eng = "auto" if engine == "phase_fused" else engine
        got = conv2d_same(x, k, b, "reflect", precision="highest",
                          engine=eng)
        assert got.shape == ref.shape == (2, h, w, 4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=3e-5, rtol=1e-4)

    @pytest.mark.parametrize("engine", ["auto", "phase_fused", "phase",
                                        "strips", "reference"])
    def test_conv2dblock_fuse_pad_odd_input(self, engine):
        """Conv2dBlock's phase_fused gate requires even H,W: on a 31x29
        input every engine must route to an exact fallback — all engines
        agree with the reference engine."""
        r = np.random.default_rng(7)
        x = _rand(r, 1, 31, 29, 3)
        mk = lambda eng: Conv2dBlock(
            out_dim=4, kernel_size=7, stride=1, padding=3, norm="in",
            activation="relu", pad_type="reflect", fuse_pad=True,
            boundary_engine=eng)
        v = mk("reference").init(jax.random.PRNGKey(0), x)
        ref = mk("reference").apply(v, x)
        got = mk(engine).apply(v, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=3e-5, rtol=1e-4)
