"""Make JAX_PLATFORMS work for the CLIs on images whose sitecustomize
force-registers a TPU backend.

On such images (e.g. the axon tunnel), backend registration at interpreter
startup clobbers the JAX_PLATFORMS environment variable, so
``JAX_PLATFORMS=cpu python train.py ...`` silently runs on the TPU.
Re-applying the env var through ``jax.config`` AFTER import is the route
that sticks (the same one tests/conftest.py uses). Every CLI entry point
calls :func:`apply_env_platform` before its first JAX use.
"""

from __future__ import annotations

import os


def apply_env_platform() -> None:
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax
        jax.config.update("jax_platforms", want)
