"""Neural network modules (flax.linen, NHWC, TPU-native).

Semantics mirror the reference networks.py (MUNIT-derived) exactly at fp32 so
converted checkpoints reproduce reference outputs; the implementation is
idiomatic JAX (functional AdaIN instead of module-state mutation, explicit
spectral-norm power-iteration state, NHWC layout for TPU convs).
"""

from councilx.nn.blocks import (  # noqa: F401
    Conv2dBlock,
    LinearBlock,
    MLP,
    ResBlock,
    ResBlocks,
    adain,
    instance_norm,
    make_activation,
    make_kernel_init,
)
from councilx.nn.generator import (  # noqa: F401
    AdaINGen,
    ContentEncoder,
    Decoder,
    StyleEncoder,
)
from councilx.nn.discriminator import MsImageDis  # noqa: F401
