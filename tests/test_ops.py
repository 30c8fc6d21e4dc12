"""Tests for TPU-optimized ops: optimized paths must match the exact
reference formulations (forward AND gradients) on CPU at fp32."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.smoke  # <5-min pre-commit tier

from councilx.ops.upsample_conv import (upsample2x_conv5x5,
                                        upsample2x_conv5x5_reference)


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


@pytest.mark.parametrize("engine", ["dilated", "phase"])
@pytest.mark.parametrize("pad_type", ["reflect", "replicate", "zero"])
@pytest.mark.parametrize("hw", [(4, 4), (5, 7), (8, 8), (16, 12)])
def test_fused_upsample_conv_matches_reference(rng, pad_type, hw, engine):
    r = np.random.default_rng(0)
    h, w = hw
    x = _rand(r, 2, h, w, 6)
    k = _rand(r, 5, 5, 6, 8) * 0.1
    b = _rand(r, 8) * 0.1
    ref = upsample2x_conv5x5_reference(x, k, b, pad_type,
                                       precision="highest")
    fast = upsample2x_conv5x5(x, k, b, pad_type, precision="highest",
                              engine=engine)
    assert fast.shape == ref.shape == (2, 2 * h, 2 * w, 8)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("engine", ["dilated", "phase"])
def test_fused_upsample_conv_gradients_match(rng, engine):
    r = np.random.default_rng(1)
    x = _rand(r, 1, 8, 8, 4)
    k = _rand(r, 5, 5, 4, 3) * 0.1
    b = _rand(r, 3) * 0.1

    def loss_ref(x, k, b):
        y = upsample2x_conv5x5_reference(x, k, b, "reflect",
                                         precision="highest")
        return jnp.sum(jnp.sin(y))

    def loss_fast(x, k, b):
        y = upsample2x_conv5x5(x, k, b, "reflect", precision="highest",
                               engine=engine)
        return jnp.sum(jnp.sin(y))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, k, b)
    g_fast = jax.grad(loss_fast, argnums=(0, 1, 2))(x, k, b)
    for a, bb in zip(g_ref, g_fast):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=3e-5, rtol=1e-4)


@pytest.mark.parametrize("engine", ["strips", "phase", "auto"])
@pytest.mark.parametrize("pad_type", ["reflect", "replicate", "zero"])
@pytest.mark.parametrize("ksize", [3, 5, 7])
def test_pad_fused_conv_matches_reference(rng, pad_type, ksize, engine):
    from councilx.ops.pad_conv import conv2d_same, conv2d_same_reference

    r = np.random.default_rng(4)
    # phase needs even HW; strips/auto run the odd-HW shape (auto then
    # takes the strips path, covering its even-ness gate)
    hw = (10, 12) if engine == "phase" else (9, 12)
    x = _rand(r, 2, *hw, 5)
    k = _rand(r, ksize, ksize, 5, 6) * 0.1
    b = _rand(r, 6) * 0.1
    ref = conv2d_same_reference(x, k, b, pad_type, precision="highest")
    fast = conv2d_same(x, k, b, pad_type, precision="highest", engine=engine)
    assert fast.shape == ref.shape == (2, *hw, 6)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("cin,cout", [(3, 64), (64, 3)])
def test_pad_fused_conv_phase_boundary_shapes(rng, cin, cout):
    # the two shipped phase-engine sites: generator first (Cin=3) and
    # final (Cout=3) 7x7 convs; auto must pick phase (even HW, starved)
    from councilx.ops.pad_conv import conv2d_same, conv2d_same_reference

    r = np.random.default_rng(7)
    x = _rand(r, 1, 16, 16, cin)
    k = _rand(r, 7, 7, cin, cout) * 0.1
    b = _rand(r, cout) * 0.1
    ref = conv2d_same_reference(x, k, b, "reflect", precision="highest")
    fast = conv2d_same(x, k, b, "reflect", precision="highest")
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("engine", ["strips", "phase"])
def test_pad_fused_conv_gradients_match(rng, engine):
    import functools

    from councilx.ops.pad_conv import conv2d_same, conv2d_same_reference

    r = np.random.default_rng(5)
    x = _rand(r, 1, 8, 8, 4)
    k = _rand(r, 7, 7, 4, 3) * 0.1
    b = _rand(r, 3) * 0.1

    def loss(fn):
        def go(x, k, b):
            return jnp.sum(jnp.sin(fn(x, k, b, "reflect",
                                      precision="highest")))
        return go

    g_ref = jax.grad(loss(conv2d_same_reference), (0, 1, 2))(x, k, b)
    g_fast = jax.grad(loss(functools.partial(conv2d_same, engine=engine)),
                      (0, 1, 2))(x, k, b)
    for a, bb in zip(g_ref, g_fast):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=3e-5, rtol=1e-4)


def test_pad_fused_conv_small_input_falls_back(rng):
    from councilx.ops.pad_conv import conv2d_same, conv2d_same_reference

    r = np.random.default_rng(6)
    x = _rand(r, 1, 5, 5, 2)   # < 2*p for k=7
    k = _rand(r, 7, 7, 2, 2) * 0.1
    ref = conv2d_same_reference(x, k, None, "reflect")
    fast = conv2d_same(x, k, None, "reflect")
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("norm,act", [("in", "relu"), ("in", "none"),
                                      ("none", "tanh"), ("none", "relu")])
@pytest.mark.parametrize("pad_type", ["reflect", "replicate"])
def test_phase_fused_norm_act_matches_reference(rng, norm, act, pad_type):
    # conv2d_same_phase_fused == pad+conv -> IN -> act (the Conv2dBlock
    # tail), with IN stats pooled over the parity groups pre-d2s
    from councilx.nn.blocks import apply_instance_norm, make_activation
    from councilx.ops.pad_conv import (conv2d_same_phase_fused,
                                       conv2d_same_reference)

    r = np.random.default_rng(8)
    x = _rand(r, 2, 12, 16, 3)
    k = _rand(r, 7, 7, 3, 6) * 0.1
    b = _rand(r, 6) * 0.1
    a_fn = make_activation(act)
    ref = conv2d_same_reference(x, k, b, pad_type, precision="highest")
    if norm == "in":
        ref = apply_instance_norm(ref, "f32")
    if a_fn is not None:
        ref = a_fn(ref)
    fast = conv2d_same_phase_fused(x, k, b, pad_type, norm=norm,
                                   in_precision="f32", act=a_fn,
                                   precision="highest")
    assert fast.shape == ref.shape
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_phase_fused_in_precision_modes(rng):
    # the three in_precision modes coincide exactly at f32 input
    from councilx.ops.pad_conv import conv2d_same_phase_fused

    r = np.random.default_rng(9)
    x = _rand(r, 1, 8, 8, 3)
    k = _rand(r, 7, 7, 3, 4) * 0.1
    outs = [conv2d_same_phase_fused(x, k, None, "reflect", norm="in",
                                    in_precision=p, precision="highest")
            for p in ("f32", "mixed", "bf16")]
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(outs[1]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(outs[2]),
                               atol=1e-6)


def test_phase_fused_gradients_match(rng):
    from councilx.nn.blocks import apply_instance_norm
    from councilx.ops.pad_conv import (conv2d_same_phase_fused,
                                       conv2d_same_reference)

    r = np.random.default_rng(10)
    x = _rand(r, 1, 8, 8, 3)
    k = _rand(r, 7, 7, 3, 4) * 0.1
    b = _rand(r, 4) * 0.1

    def loss_ref(x, k, b):
        y = apply_instance_norm(
            conv2d_same_reference(x, k, b, "reflect", precision="highest"),
            "f32")
        return jnp.sum(jnp.sin(y))

    def loss_fast(x, k, b):
        y = conv2d_same_phase_fused(x, k, b, "reflect", norm="in",
                                    in_precision="f32", precision="highest")
        return jnp.sum(jnp.sin(y))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, k, b)
    g_fast = jax.grad(loss_fast, argnums=(0, 1, 2))(x, k, b)
    for a, bb in zip(g_ref, g_fast):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=3e-5, rtol=1e-4)


def test_conv2dblock_fuse_pad_phase_fused_parity(rng):
    # Conv2dBlock(fuse_pad) output is unchanged by the phase-fused tail
    # (same params, same function) vs the generic norm/act tail
    from councilx.nn.blocks import Conv2dBlock

    r = np.random.default_rng(11)
    x = _rand(r, 2, 12, 12, 3)
    blk_fused = Conv2dBlock(8, 7, 1, 3, norm="in", activation="relu",
                            pad_type="reflect", fuse_pad=True)
    blk_plain = Conv2dBlock(8, 7, 1, 3, norm="in", activation="relu",
                            pad_type="reflect", fuse_pad=False)
    params = blk_fused.init(jax.random.PRNGKey(0), x)
    y_fused = blk_fused.apply(params, x)
    y_plain = blk_plain.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_plain),
                               atol=2e-5, rtol=1e-5)


def test_tiny_input_falls_back(rng):
    r = np.random.default_rng(2)
    x = _rand(r, 1, 3, 3, 2)
    k = _rand(r, 5, 5, 2, 2)
    ref = upsample2x_conv5x5_reference(x, k, None, "reflect")
    fast = upsample2x_conv5x5(x, k, None, "reflect")
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=1e-5)


def test_decoder_fused_matches_unfused(rng):
    """Same params through fused vs unfused Decoder -> same output."""
    from councilx.nn.generator import Decoder

    r = np.random.default_rng(3)
    content = _rand(r, 2, 8, 8, 32)
    adain_vec = _rand(r, 2, 2 * 32 * 2 * 2)  # 2 resblocks x 2 convs x 2*dim
    dec_ref = Decoder(dim=32, output_dim=4, n_upsample=2, n_res=2,
                      fuse_upsample=False)
    dec_fast = Decoder(dim=32, output_dim=4, n_upsample=2, n_res=2,
                       fuse_upsample=True)
    params = dec_ref.init(jax.random.PRNGKey(0), content, adain_vec)["params"]
    # identical param trees by construction
    params_fast = dec_fast.init(jax.random.PRNGKey(0), content,
                                adain_vec)["params"]
    ref_paths = jax.tree_util.tree_structure(params)
    fast_paths = jax.tree_util.tree_structure(params_fast)
    assert ref_paths == fast_paths

    y_ref = dec_ref.apply({"params": params}, content, adain_vec)
    y_fast = dec_fast.apply({"params": params}, content, adain_vec)
    np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_ref),
                               atol=1e-4, rtol=1e-4)
