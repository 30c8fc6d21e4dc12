"""Pallas 3x3 conv kernel vs lax.conv (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from councilx.ops.pallas_conv import conv3x3_eligible, conv3x3_valid


def _interp(fn):
    @functools.wraps(fn)
    def run(*args, **kw):
        with pltpu.force_tpu_interpret_mode():
            return fn(*args, **kw)
    return run


def _xla_conv(xp, k):
    return jax.lax.conv_general_dilated(
        xp, k.astype(xp.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("shape", [(2, 8, 8, 128), (1, 16, 8, 256)])
def test_fwd_matches_xla(shape):
    r = np.random.default_rng(0)
    b, h, w, c = shape
    xp = jnp.asarray(r.standard_normal((b, h + 2, w + 2, c)),
                     jnp.float32)
    k = jnp.asarray(r.standard_normal((3, 3, c, c)) * 0.05, jnp.float32)
    assert conv3x3_eligible(xp.shape, k.shape)
    ref = _xla_conv(xp, k)
    got = _interp(conv3x3_valid)(xp, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


def test_eligibility():
    assert not conv3x3_eligible((1, 10, 10, 64), (3, 3, 64, 64))    # c%128
    assert not conv3x3_eligible((1, 10, 10, 128), (5, 5, 128, 128))  # 5x5
    assert not conv3x3_eligible((1, 9, 10, 128), (3, 3, 128, 128))  # h%8
    assert conv3x3_eligible((1, 34, 34, 128), (3, 3, 128, 128))


def test_eligibility_scales_with_itemsize():
    """The headline resblock shape fits the bf16 VMEM plan but NOT f32;
    callers pass the real itemsize so an f32 model falls back to XLA
    instead of crashing on a None row-block plan."""
    shape = ((32, 66, 66, 256), (3, 3, 256, 256))
    assert conv3x3_eligible(*shape)                  # bf16 (default)
    assert not conv3x3_eligible(*shape, itemsize=4)  # f32 must gate out


def test_grad_matches_xla():
    r = np.random.default_rng(1)
    b, h, w, c = 1, 8, 8, 128
    xp = jnp.asarray(r.standard_normal((b, h + 2, w + 2, c)), jnp.float32)
    k = jnp.asarray(r.standard_normal((3, 3, c, c)) * 0.05, jnp.float32)

    def loss_ref(xp, k):
        return jnp.sum(jnp.sin(_xla_conv(xp, k)))

    def loss_pal(xp, k):
        return jnp.sum(jnp.sin(conv3x3_valid(xp, k)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(xp, k)
    g_pal = _interp(jax.grad(loss_pal, argnums=(0, 1)))(xp, k)
    for a, b_ in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   atol=5e-3, rtol=5e-3)


def test_vmap_members():
    r = np.random.default_rng(2)
    xp = jnp.asarray(r.standard_normal((3, 2, 10, 10, 128)), jnp.float32)
    k = jnp.asarray(r.standard_normal((3, 3, 3, 128, 128)) * 0.05,
                    jnp.float32)
    ref = jax.vmap(_xla_conv)(xp, k)
    got = _interp(jax.vmap(conv3x3_valid))(xp, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)
