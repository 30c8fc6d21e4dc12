"""InceptionV3 pool3 feature extractor (flax, NHWC) for FID/KID.

Faithful reimplementation of torchvision ``inception_v3`` up to the 2048-d
average-pool features, with the ``pytorch-fid`` pooling modifications
(``fid_variant=True``: branch avg-pools use count_include_pad=False and
Mixed_7c's pool branch uses max pooling) so that, given converted
``pt_inception-2015-12-05`` or torchvision weights, FID numbers are
comparable with the standard tooling.

No pretrained weights ship with this repo (and none can be downloaded in
this environment); load converted weights via :func:`load_params_npz`
(produced by tools/convert_inception_pt.py from a torch state_dict). The
architecture + converter are the deliverable; the metric math is in
eval/metrics.py and is extractor-agnostic.

Input convention: (B, H, W, 3) float in [-1, 1] (pytorch-fid's
normalize_input), resized to 299x299 bilinear by the caller or via
``resize_input=True``.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def _avg_pool_3x3_s1_valid_count(x: jnp.ndarray) -> jnp.ndarray:
    """AvgPool2d(3, stride=1, padding=1, count_include_pad=False), NHWC."""
    dims, strides = (1, 3, 3, 1), (1, 1, 1, 1)
    pads = ((0, 0), (1, 1), (1, 1), (0, 0))
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims, strides, pads)
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, dims, strides,
                                   pads)
    return summed / counts


def _avg_pool_3x3_s1_incl_pad(x: jnp.ndarray) -> jnp.ndarray:
    """torchvision default: count_include_pad=True."""
    dims, strides = (1, 3, 3, 1), (1, 1, 1, 1)
    pads = ((0, 0), (1, 1), (1, 1), (0, 0))
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims, strides, pads)
    return summed / 9.0


def _max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                                 (1, 2, 2, 1), "VALID")


def _max_pool_3x3_s1_p1(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                                 (1, 1, 1, 1),
                                 ((0, 0), (1, 1), (1, 1), (0, 0)))


class BasicConv2d(nn.Module):
    """conv(no bias) + BatchNorm(eps=1e-3, inference) + relu."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = (0, 0)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = self.padding
        if isinstance(pad, tuple) and isinstance(pad[0], int):
            pad = ((pad[0], pad[0]), (pad[1], pad[1]))
        x = nn.Conv(self.features, self.kernel_size, strides=self.strides,
                    padding=pad, use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         momentum=0.9, name="bn")(x)
        return jax.nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int
    fid_variant: bool = True

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        pool = (_avg_pool_3x3_s1_valid_count(x) if self.fid_variant
                else _avg_pool_3x3_s1_incl_pad(x))
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(pool)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _max_pool_3x3_s2(x)], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    fid_variant: bool = True

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        pool = (_avg_pool_3x3_s1_valid_count(x) if self.fid_variant
                else _avg_pool_3x3_s1_incl_pad(x))
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(pool)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _max_pool_3x3_s2(x)], axis=-1)


class InceptionE(nn.Module):
    # pytorch-fid: Mixed_7b uses count_include_pad=False avg pool,
    # Mixed_7c uses MAX pool in the pool branch
    pool_mode: str = "avg"          # 'avg' | 'max'
    fid_variant: bool = True

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1),
                          name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0),
                          name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_mode == "max":
            pool = _max_pool_3x3_s1_p1(x)
        elif self.fid_variant:
            pool = _avg_pool_3x3_s1_valid_count(x)
        else:
            pool = _avg_pool_3x3_s1_incl_pad(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(pool)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """Backbone up to the 2048-d global-average-pool features."""

    fid_variant: bool = True
    resize_input: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, H, W, 3) in [-1, 1] -> (B, 2048) features."""
        if self.resize_input and x.shape[1:3] != (299, 299):
            x = jax.image.resize(x, (x.shape[0], 299, 299, 3), "bilinear")
        fv = self.fid_variant
        x = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = _max_pool_3x3_s2(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool_3x3_s2(x)
        x = InceptionA(32, fid_variant=fv, name="Mixed_5b")(x)
        x = InceptionA(64, fid_variant=fv, name="Mixed_5c")(x)
        x = InceptionA(64, fid_variant=fv, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, fid_variant=fv, name="Mixed_6b")(x)
        x = InceptionC(160, fid_variant=fv, name="Mixed_6c")(x)
        x = InceptionC(160, fid_variant=fv, name="Mixed_6d")(x)
        x = InceptionC(192, fid_variant=fv, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(pool_mode="avg", fid_variant=fv, name="Mixed_7b")(x)
        x = InceptionE(pool_mode="max" if fv else "avg", fid_variant=fv,
                       name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))


def init_random_params(rng: jax.Array, fid_variant: bool = True):
    """Random-weight init (for shape tests / smoke runs only — NOT valid for
    comparable FID numbers; load converted pretrained weights instead)."""
    model = InceptionV3Features(fid_variant=fid_variant)
    dummy = jnp.zeros((1, 299, 299, 3), jnp.float32)
    return model, model.init(rng, dummy)


def load_params_npz(path: str):
    """Load a converted flat .npz (produced by tools/convert_inception_pt.py)
    back into the nested flax variables dict."""
    flat = dict(np.load(path))
    tree: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)
    return tree
