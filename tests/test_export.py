"""StableHLO export round-trip: serialized translation must reproduce the
live jitted function exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import export as jexport

from councilx.config import Config
from councilx.inference.translate import Translator


@pytest.mark.slow
def test_export_roundtrip_exact():
    cfg = Config.from_dict({
        "batch_size": 2, "compute_dtype": "float32",
        "council": {"council_size": 2},
        "focus_loss": {"focus_enabled": True},
        "gen": {"dim": 4, "mlp_dim": 8, "style_dim": 2,
                "n_downsample": 2, "n_res": 1},
        "new_size": 20, "crop_image_height": 16, "crop_image_width": 16,
    })
    tr = Translator(cfg)
    dummy = jnp.zeros((1, 16, 16, 3), jnp.float32)
    params = tr.gen.init(jax.random.PRNGKey(0), dummy)["params"]

    def fn(p, x, z):
        return tr._translate.__wrapped__(tr, p, x, z)

    r = np.random.RandomState(0)
    x = jnp.asarray(r.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32))
    z = jnp.asarray(r.randn(2, 2).astype(np.float32))

    p_spec = jax.tree_util.tree_map(
        lambda l: jax.ShapeDtypeStruct(l.shape, l.dtype), params)
    exported = jexport.export(jax.jit(fn))(
        p_spec, jax.ShapeDtypeStruct(x.shape, x.dtype),
        jax.ShapeDtypeStruct(z.shape, z.dtype))
    blob = exported.serialize()
    assert len(blob) > 1000

    live_img, live_mask = fn(params, x, z)
    re_img, re_mask = jexport.deserialize(blob).call(params, x, z)
    # the deserialized computation recompiles through a slightly different
    # pipeline; allow fp reassociation noise
    np.testing.assert_allclose(np.asarray(live_img), np.asarray(re_img),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(live_mask), np.asarray(re_mask),
                               atol=1e-5)
