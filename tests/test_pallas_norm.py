"""Pallas fused instance-norm kernel vs the XLA reference (interpret mode
on CPU; the same code compiles on TPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from councilx.nn.blocks import adain, instance_norm
from councilx.ops.pallas_norm import instance_norm_pallas


def _interp(fn):
    @functools.wraps(fn)
    def run(*args, **kw):
        with pltpu.force_tpu_interpret_mode():
            return fn(*args, **kw)
    return run


@pytest.mark.parametrize("shape", [(2, 8, 8, 16), (1, 5, 7, 8),
                                   (3, 16, 16, 32)])
def test_fwd_matches_xla(shape):
    r = np.random.default_rng(0)
    x = jnp.asarray(r.standard_normal(shape).astype(np.float32)) * 3 + 1
    ref = instance_norm(x)
    got = _interp(instance_norm_pallas)(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fwd_affine_matches_adain():
    r = np.random.default_rng(1)
    b, h, w, c = 2, 6, 6, 16
    x = jnp.asarray(r.standard_normal((b, h, w, c)).astype(np.float32))
    g = jnp.asarray(r.standard_normal((b, c)).astype(np.float32))
    bt = jnp.asarray(r.standard_normal((b, c)).astype(np.float32))
    ref = adain(x, g, bt)
    got = _interp(instance_norm_pallas)(x, g, bt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_grad_matches_xla():
    r = np.random.default_rng(2)
    x = jnp.asarray(r.standard_normal((2, 4, 4, 8)).astype(np.float32))

    def loss_ref(x):
        return jnp.sum(jnp.sin(instance_norm(x)))

    def loss_pal(x):
        return jnp.sum(jnp.sin(instance_norm_pallas(x)))

    g_ref = jax.grad(loss_ref)(x)
    g_pal = _interp(jax.grad(loss_pal))(x)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               atol=1e-5, rtol=1e-4)


def test_grad_affine_matches_adain():
    r = np.random.default_rng(3)
    b, c = 2, 8
    x = jnp.asarray(r.standard_normal((b, 4, 4, c)).astype(np.float32))
    g = jnp.asarray(r.standard_normal((b, c)).astype(np.float32))
    bt = jnp.asarray(r.standard_normal((b, c)).astype(np.float32))

    def loss_ref(x, g, bt):
        return jnp.sum(jnp.sin(adain(x, g, bt)))

    def loss_pal(x, g, bt):
        return jnp.sum(jnp.sin(instance_norm_pallas(x, g, bt)))

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, g, bt)
    gp = _interp(jax.grad(loss_pal, argnums=(0, 1, 2)))(x, g, bt)
    for a, b_ in zip(gr, gp):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   atol=1e-5, rtol=1e-4)


def test_vmap_over_members():
    """The member axis is vmapped over the whole generator apply — the
    kernel must batch correctly under vmap."""
    r = np.random.default_rng(4)
    x = jnp.asarray(r.standard_normal((3, 2, 4, 4, 8)).astype(np.float32))
    ref = jax.vmap(instance_norm)(x)
    got = _interp(jax.vmap(instance_norm_pallas))(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_bf16_input_fp32_stats():
    r = np.random.default_rng(5)
    x32 = r.standard_normal((2, 8, 8, 16)).astype(np.float32) * 5
    x16 = jnp.asarray(x32).astype(jnp.bfloat16)
    ref = instance_norm(x16.astype(jnp.float32)).astype(jnp.bfloat16)
    got = _interp(instance_norm_pallas)(x16)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=0.06)
