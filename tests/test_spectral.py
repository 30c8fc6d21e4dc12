"""SpectralConv (networks.py::SpectralNorm equivalent): power-iteration
state, spectral scaling, and torch parity."""

import jax
import jax.numpy as jnp
import numpy as np

from councilx.nn.blocks import Conv2dBlock, SpectralConv


def test_spectral_conv_scales_by_sigma():
    """Output of the sn-conv equals the plain conv with kernel / sigma,
    where sigma is the power-iteration estimate from the stored u."""
    r = np.random.default_rng(0)
    x = jnp.asarray(r.standard_normal((2, 8, 8, 4)), jnp.float32)
    m = SpectralConv(features=6, kernel_size=(3, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    y, mutated = m.apply(variables, x, mutable=["spectral_stats"])

    kernel = variables["params"]["kernel"]
    bias = variables["params"]["bias"]
    u = variables["spectral_stats"]["u"]
    w_mat = np.asarray(kernel).transpose(3, 0, 1, 2).reshape(6, -1)
    # one power iteration from stored u (what the forward does)
    v = w_mat.T @ np.asarray(u)
    v /= np.linalg.norm(v) + 1e-12
    u2 = w_mat @ v
    u2 /= np.linalg.norm(u2) + 1e-12
    sigma = float(u2 @ (w_mat @ v))

    ref = jax.lax.conv_general_dilated(
        x, kernel / sigma, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    # u was updated in the mutable collection (training behavior)
    assert not np.allclose(np.asarray(mutated["spectral_stats"]["u"]),
                           np.asarray(u))


def test_spectral_u_converges_and_bounds_sigma():
    """Repeated application converges u; sigma approaches the true largest
    singular value from below-ish."""
    r = np.random.default_rng(1)
    x = jnp.asarray(r.standard_normal((1, 6, 6, 3)), jnp.float32)
    m = SpectralConv(features=5, kernel_size=(3, 3))
    variables = m.init(jax.random.PRNGKey(1), x)
    kernel = np.asarray(variables["params"]["kernel"])
    w_mat = kernel.transpose(3, 0, 1, 2).reshape(5, -1)
    true_sigma = np.linalg.svd(w_mat, compute_uv=False)[0]

    state = variables
    for _ in range(50):
        _, mut = m.apply(state, x, mutable=["spectral_stats"])
        state = {"params": variables["params"], **mut}
    u = np.asarray(state["spectral_stats"]["u"])
    v = w_mat.T @ u
    v /= np.linalg.norm(v)
    sigma = float(u @ (w_mat @ v))
    np.testing.assert_allclose(sigma, true_sigma, rtol=1e-3)


def test_conv2dblock_sn_norm():
    """Conv2dBlock(norm='sn') routes through SpectralConv."""
    r = np.random.default_rng(2)
    x = jnp.asarray(r.standard_normal((1, 8, 8, 3)), jnp.float32)
    blk = Conv2dBlock(4, 3, 1, 1, norm="sn", activation="lrelu",
                      pad_type="reflect")
    variables = blk.init(jax.random.PRNGKey(0), x)
    assert "SpectralConv_0" in variables["params"]
    y, _ = blk.apply(variables, x, mutable=["spectral_stats"])
    assert y.shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(y)).all()
