"""Tests for the FID/KID evaluation pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from councilx.eval.metrics import (fid_from_features, frechet_distance,
                                   gaussian_stats, kid_from_features)


def test_fid_identical_distributions_is_zero():
    rng = np.random.RandomState(0)
    f = rng.randn(500, 16)
    mu, s = gaussian_stats(f)
    assert abs(frechet_distance(mu, s, mu, s)) < 1e-8


def test_fid_mean_shift_closed_form():
    """For equal covariances, FID == ||mu1 - mu2||^2."""
    rng = np.random.RandomState(1)
    f = rng.randn(2000, 8)
    mu, s = gaussian_stats(f)
    shift = np.full(8, 0.5)
    val = frechet_distance(mu, s, mu + shift, s)
    np.testing.assert_allclose(val, float(shift @ shift), rtol=1e-6)


def test_fid_diagonal_gaussians_closed_form():
    """Diagonal case: FID = |mu|^2 + sum (sqrt(s1) - sqrt(s2))^2."""
    d = 6
    s1 = np.diag(np.linspace(1.0, 2.0, d))
    s2 = np.diag(np.linspace(0.5, 1.5, d))
    mu1, mu2 = np.zeros(d), np.ones(d) * 0.3
    expected = (0.09 * d
                + np.sum((np.sqrt(np.diag(s1)) - np.sqrt(np.diag(s2))) ** 2))
    np.testing.assert_allclose(frechet_distance(mu1, s1, mu2, s2), expected,
                               rtol=1e-8)


def test_fid_detects_distribution_gap():
    rng = np.random.RandomState(2)
    a = rng.randn(400, 12)
    b = rng.randn(400, 12) + 1.0
    assert fid_from_features(a, b) > fid_from_features(a, a[::-1]) + 5.0


def test_kid_same_features_near_zero():
    rng = np.random.RandomState(3)
    f = rng.randn(300, 10)
    mean, _ = kid_from_features(f, f, n_subsets=10, subset_size=100)
    assert abs(mean) < 0.05


def test_kid_separates_distributions():
    rng = np.random.RandomState(4)
    a = rng.randn(300, 10)
    b = rng.randn(300, 10) * 2.0 + 1.0
    same, _ = kid_from_features(a, a[::-1], n_subsets=5, subset_size=100)
    diff, _ = kid_from_features(a, b, n_subsets=5, subset_size=100)
    assert diff > same + 1.0


@pytest.mark.slow
def test_inception_forward_and_npz_roundtrip(tmp_path):
    from councilx.eval.inception import (InceptionV3Features,
                                         init_random_params, load_params_npz)

    model, variables = init_random_params(jax.random.PRNGKey(0))
    x = jnp.zeros((2, 299, 299, 3), jnp.float32)
    feats = model.apply(variables, x)
    assert feats.shape == (2, 2048)

    # flatten -> npz -> load -> identical output
    flat = {}

    def walk(node, prefix):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, prefix + k + "/")
            else:
                flat[prefix + k] = np.asarray(v)

    walk(variables, "")
    path = tmp_path / "incep.npz"
    np.savez(path, **flat)
    loaded = load_params_npz(str(path))
    feats2 = InceptionV3Features().apply(loaded, x)
    np.testing.assert_allclose(np.asarray(feats2), np.asarray(feats),
                               atol=1e-6)
