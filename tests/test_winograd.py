"""Numerics of the Winograd F(2x2,3x3) conv vs lax.conv (the XLA oracle).

The kernel is a benchmarked experiment (BASELINE.md: it loses ~10x on TPU
to the HBM blowup of its 16x transform intermediates) but its math must
stay correct so the measurement stands.
"""

import jax
import jax.numpy as jnp
import numpy as np

from councilx.ops.winograd import conv3x3_winograd, winograd_eligible


def _ref(xp, k):
    return jax.lax.conv_general_dilated(
        xp, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_winograd_matches_lax_conv_fp32():
    r = np.random.RandomState(0)
    for (b, h, w, c, o) in [(2, 8, 8, 5, 7), (1, 16, 12, 8, 8),
                            (3, 4, 6, 3, 4)]:
        xp = jnp.asarray(r.standard_normal((b, h + 2, w + 2, c)),
                         jnp.float32)
        k = jnp.asarray(r.standard_normal((3, 3, c, o)) * 0.1, jnp.float32)
        assert winograd_eligible(xp.shape, k.shape)
        got = conv3x3_winograd(xp, k)
        want = _ref(xp, k)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)


def test_winograd_grads_match_lax_conv():
    r = np.random.RandomState(1)
    xp = jnp.asarray(r.standard_normal((2, 10, 10, 4)), jnp.float32)
    k = jnp.asarray(r.standard_normal((3, 3, 4, 6)) * 0.1, jnp.float32)
    ct = jnp.asarray(r.standard_normal((2, 8, 8, 6)), jnp.float32)

    def loss(fn):
        def f(xp_, k_):
            return jnp.sum(fn(xp_, k_) * ct)
        return jax.grad(f, argnums=(0, 1))

    gx_w, gk_w = loss(conv3x3_winograd)(xp, k)
    gx_r, gk_r = loss(_ref)(xp, k)
    np.testing.assert_allclose(np.asarray(gx_w), np.asarray(gx_r),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_w), np.asarray(gk_r),
                               atol=1e-4, rtol=1e-4)


def test_winograd_eligibility_gate():
    # odd spatial dims, wrong kernel size, channel mismatch -> ineligible
    assert not winograd_eligible((1, 9, 10, 4), (3, 3, 4, 4))   # odd H
    assert not winograd_eligible((1, 10, 10, 4), (5, 5, 4, 4))  # 5x5
    assert not winograd_eligible((1, 10, 10, 4), (3, 3, 8, 4))  # C mismatch
    assert not winograd_eligible((1, 4, 4, 4), (3, 3, 4, 4))    # H=2 < 4
    assert winograd_eligible((1, 6, 6, 4), (3, 3, 4, 4))
