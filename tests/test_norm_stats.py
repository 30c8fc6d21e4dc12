"""One-pass norm statistics (Config.norm_stats / blocks.norm_mean_var).

"one_pass" computes E[x] and E[x^2] as sibling reductions (one HBM read)
instead of jnp.mean followed by the mean-dependent jnp.var (two reads).
It is a different rounding class (cancellation in E[x^2] - mean^2), so the
contract tested here is *closeness at f32*, plus exact plumbing semantics:
parity mode and the default stay two_pass.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.smoke  # <5-min pre-commit tier

from councilx.config import Config
from councilx.nn.blocks import (Conv2dBlock, MunitLayerNorm, instance_norm,
                                norm_mean_var)
from councilx.nn.generator import AdaINGen
from councilx.ops.pad_conv import conv2d_same_phase_fused


def _rand(seed, *shape):
    r = np.random.default_rng(seed)
    return jnp.asarray(r.standard_normal(shape).astype(np.float32))


def test_norm_mean_var_one_pass_close():
    # offset mean well away from zero: the cancellation-prone regime
    x = _rand(0, 3, 16, 16, 8) * 2.0 + 5.0
    m2, v2 = norm_mean_var(x, (-3, -2), "two_pass")
    m1, v1 = norm_mean_var(x, (-3, -2), "one_pass")
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=2e-4, atol=1e-5)
    assert np.all(np.asarray(v1) >= 0.0)


def test_norm_mean_var_rejects_unknown_mode():
    with pytest.raises(ValueError):
        norm_mean_var(_rand(1, 2, 4, 4, 2), (-3, -2), "three_pass")


def test_instance_norm_one_pass_close():
    x = _rand(2, 2, 12, 12, 6) + 3.0
    ref = instance_norm(x, stats="two_pass")
    fast = instance_norm(x, stats="one_pass")
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_munit_layer_norm_one_pass_close():
    x = _rand(3, 2, 8, 8, 4) - 2.0
    ref_m = MunitLayerNorm(num_features=4, stats="two_pass")
    one_m = MunitLayerNorm(num_features=4, stats="one_pass")
    params = ref_m.init(jax.random.PRNGKey(0), x)
    ref = ref_m.apply(params, x)
    one = one_m.apply(params, x)
    np.testing.assert_allclose(np.asarray(one), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_phase_fused_conv_one_pass_close():
    x = _rand(4, 2, 16, 16, 3)
    k = _rand(5, 7, 7, 3, 8) * 0.1
    b = _rand(6, 8) * 0.1
    ref = conv2d_same_phase_fused(x, k, b, "reflect", norm="in",
                                  in_stats="two_pass", act=jax.nn.relu)
    one = conv2d_same_phase_fused(x, k, b, "reflect", norm="in",
                                  in_stats="one_pass", act=jax.nn.relu)
    np.testing.assert_allclose(np.asarray(one), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_generator_forward_one_pass_close():
    """Full AdaINGen forward at f32: one_pass tracks two_pass to ~1e-4."""
    kw = dict(input_dim=3, dim=8, style_dim=3, n_downsample=2, n_res=2,
              mlp_dim=16, focus_mask=False)
    g2 = AdaINGen(in_stats="two_pass", **kw)
    g1 = AdaINGen(in_stats="one_pass", **kw)
    x = _rand(7, 2, 32, 32, 3)
    params = g2.init(jax.random.PRNGKey(1), x)
    y2 = g2.apply(params, x)
    y1 = g1.apply(params, x)
    # identical parameter tree is part of the contract
    assert jax.tree.structure(g1.init(jax.random.PRNGKey(1), x)) \
        == jax.tree.structure(params)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=5e-4, atol=5e-4)


def test_one_pass_gradients_finite_and_close():
    x = _rand(8, 2, 8, 8, 4) + 1.0

    def loss(x, stats):
        return jnp.sum(jnp.square(instance_norm(x, stats=stats)))

    g2 = jax.grad(lambda t: loss(t, "two_pass"))(x)
    g1 = jax.grad(lambda t: loss(t, "one_pass"))(x)
    assert np.all(np.isfinite(np.asarray(g1)))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-3, atol=1e-3)


def test_config_norm_stats_validation():
    cfg = Config.from_dict({"norm_stats": "two_pass"})
    assert cfg.norm_stats == "two_pass"
    # one_pass is the default since the round-5 A/B (+11% on the fused
    # train step — BASELINE.md norm_stats section)
    assert Config.from_dict({}).norm_stats == "one_pass"
    with pytest.raises(ValueError):
        Config.from_dict({"norm_stats": "welford"})


def test_parity_mode_forces_two_pass():
    """Trainer/Translator force two_pass under parity_mode (rounding-class
    guarantee for the pixel-exact path)."""
    from councilx.inference.translate import Translator

    cfg = Config.from_dict({"norm_stats": "one_pass", "parity_mode": True,
                            "gen": {"dim": 8, "style_dim": 3, "mlp_dim": 16},
                            "new_size": 16, "crop_image_height": 16,
                            "crop_image_width": 16})
    assert Translator(cfg).gen.in_stats == "two_pass"
    cfg2 = Config.from_dict({"norm_stats": "one_pass",
                             "gen": {"dim": 8, "style_dim": 3,
                                     "mlp_dim": 16}})
    assert Translator(cfg2).gen.in_stats == "one_pass"
