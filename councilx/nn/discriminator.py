"""Multi-scale PatchGAN discriminator (reference networks.py::MsImageDis).

``num_scales`` PatchGAN CNNs applied to an average-pool image pyramid
(AvgPool2d(3, stride=2, padding=1, count_include_pad=False) between scales).
Each CNN: 4x4 stride-2 conv (no norm, LeakyReLU 0.2) x n_layer with channel
doubling, then a 1x1 conv to a single logit map.

The same module doubles as the *council* discriminator with
``input_dim = 2 * channels`` (generated output concatenated channel-wise with
the input image -> conditional discrimination), as the reference does in
trainer_council.py::__init__.

LSGAN loss helpers live in councilx.losses.gan (the reference keeps
calc_dis_loss / calc_gen_loss as methods; functional here so they can be
vmapped over the council axis).
"""

from __future__ import annotations

from typing import Any, Callable, List

import jax.numpy as jnp
from flax import linen as nn

from councilx.nn.blocks import Conv2dBlock, avg_pool_3x3_s2

Dtype = Any


class _PatchDis(nn.Module):
    """One PatchGAN CNN (reference MsImageDis._make_net)."""

    input_dim: int
    dim: int = 64
    n_layer: int = 4
    norm: str = "none"
    activ: str = "lrelu"
    pad_type: str = "reflect"
    kernel_init: Callable = nn.initializers.normal(stddev=0.02)
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    use_pallas_norm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = self.dim
        x = Conv2dBlock(dim, 4, 2, 1, norm="none", activation=self.activ,
                        pad_type=self.pad_type, kernel_init=self.kernel_init,
                        dtype=self.dtype, use_pallas=self.use_pallas,
                        use_pallas_norm=self.use_pallas_norm)(x)
        for _ in range(self.n_layer - 1):
            x = Conv2dBlock(2 * dim, 4, 2, 1, norm=self.norm,
                            activation=self.activ, pad_type=self.pad_type,
                            kernel_init=self.kernel_init, dtype=self.dtype,
                            use_pallas=self.use_pallas,
                            use_pallas_norm=self.use_pallas_norm)(x)
            dim *= 2
        x = nn.Conv(1, (1, 1), padding="VALID",
                    kernel_init=self.kernel_init,
                    bias_init=nn.initializers.zeros,
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        return x


class MsImageDis(nn.Module):
    """Reference: networks.py::MsImageDis. Returns a list of per-scale logit
    maps (shapes differ per scale, so a list rather than a stacked tensor —
    each entry is still fully batched and jit-friendly)."""

    input_dim: int = 3
    dim: int = 64
    n_layer: int = 4
    norm: str = "none"
    activ: str = "lrelu"
    num_scales: int = 3
    pad_type: str = "reflect"
    gan_type: str = "lsgan"
    kernel_init: Callable = nn.initializers.normal(stddev=0.02)
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    use_pallas_norm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        outputs = []
        for s in range(self.num_scales):
            outputs.append(_PatchDis(
                input_dim=self.input_dim, dim=self.dim, n_layer=self.n_layer,
                norm=self.norm, activ=self.activ, pad_type=self.pad_type,
                kernel_init=self.kernel_init, dtype=self.dtype,
                use_pallas=self.use_pallas,
                use_pallas_norm=self.use_pallas_norm,
                name=f"scale_{s}")(x))
            if s != self.num_scales - 1:
                x = avg_pool_3x3_s2(x)
        return outputs
