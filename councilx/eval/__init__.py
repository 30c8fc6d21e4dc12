"""Quality-metric evaluation (FID / KID) pipeline.

The reference repo ships NO metric code (SURVEY.md §4 — paper numbers were
computed offline); this subsystem provides what the paper's evaluation needs:
batched jit'd feature extraction (InceptionV3 pool3), Fréchet Inception
Distance, and Kernel Inception Distance.
"""

from councilx.eval.metrics import (  # noqa: F401
    frechet_distance,
    gaussian_stats,
    kid_from_features,
)
