"""Trace-time toggles for optimized kernels.

Flax modules can't see the Config, so kernel choices that don't change
parameter trees (pallas vs XLA instance norm) are trace-time globals set by
the trainer/translator from ``Config.use_pallas`` BEFORE the first jit
trace. They are baked into each compiled executable at trace time.
"""

from __future__ import annotations

import contextlib

_USE_PALLAS = False


def use_pallas() -> bool:
    return _USE_PALLAS


def set_use_pallas(value: bool) -> None:
    global _USE_PALLAS
    _USE_PALLAS = bool(value)


@contextlib.contextmanager
def pallas_enabled(value: bool = True):
    global _USE_PALLAS
    old = _USE_PALLAS
    _USE_PALLAS = bool(value)
    try:
        yield
    finally:
        _USE_PALLAS = old
