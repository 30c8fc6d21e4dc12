"""Test config: run on CPU with 8 virtual devices so mesh/sharding tests work
without TPU hardware (SURVEY.md §4 item 4).

Note: this image's sitecustomize force-registers the 'axon' TPU backend and
overrides JAX_PLATFORMS, so the env-var route doesn't stick; updating
jax.config after import (before first backend use) does.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Pin the ENV VAR too, not just jax.config below: tunnel images export
# JAX_PLATFORMS=<tpu backend>, and any test that imports a CLI module
# calling utils.platform.apply_env_platform() would re-apply that value
# over our CPU config — silently moving the suite onto the TPU (and
# BLOCKING whenever another process holds the chip; measured round 3).
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# the suite is dominated by XLA CPU compiles; the persistent cache makes
# re-runs of unchanged tests start in seconds (COUNCILX_NO_COMPILE_CACHE=1
# disables, e.g. when timing cold compiles)
from councilx.utils.platform import enable_compile_cache  # noqa: E402

enable_compile_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
