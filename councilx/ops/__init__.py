"""TPU-optimized compute ops (XLA rewrites + Pallas kernels).

Every op here has a reference-exact fallback path; the optimized paths are
validated against the fallbacks in tests/test_ops.py.
"""

from councilx.ops.upsample_conv import (  # noqa: F401
    upsample2x_conv5x5_reference,
    upsample2x_conv5x5,
)
