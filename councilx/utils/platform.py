"""Platform plumbing for the CLIs: JAX_PLATFORMS and the persistent
XLA compilation cache.

On images whose sitecustomize force-registers a TPU backend (e.g. the axon
tunnel), backend registration at interpreter startup clobbers the
JAX_PLATFORMS environment variable, so ``JAX_PLATFORMS=cpu python
train.py ...`` silently runs on the TPU. Re-applying the env var through
``jax.config`` AFTER import is the route that sticks (the same one
tests/conftest.py uses). Every CLI entry point calls
:func:`apply_env_platform` before its first JAX use.

The persistent compilation cache is enabled by default at
``~/.cache/councilx/xla``. Measured through the axon AOT tunnel: small
graphs hit the cache and reload ~30x faster, but the full 256px train
step does NOT get faster end-to-end (cached 455s vs uncached ~440s — the
tunnel-side AOT compile appears to re-run regardless), so treat it as a
CPU/small-graph win. ``JAX_COMPILATION_CACHE_DIR`` overrides the
location; ``COUNCILX_NO_COMPILE_CACHE=1`` disables.
"""

from __future__ import annotations

import os


def apply_env_platform() -> None:
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax
        jax.config.update("jax_platforms", want)
    enable_compile_cache()


def enable_compile_cache() -> None:
    if os.environ.get("COUNCILX_NO_COMPILE_CACHE"):
        return
    import jax
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "councilx", "xla"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except Exception:  # older jax without the option: cache is best-effort
        pass
