"""VGG16 perceptual ("domain-invariant") loss, inherited by Council-GAN
from MUNIT (reference networks.py::Vgg16 + trainer compute_vgg_loss).

All shipped council configs set ``vgg_w: 0`` — this exists for full config
compatibility. Semantics mirror MUNIT:

  * ``vgg_preprocess``: [-1,1] RGB -> 0..255 BGR minus ImageNet channel
    means (the caffe-VGG convention of the reference's .t7 weights);
  * ``Vgg16Features``: the 13-conv VGG16 trunk, returning relu5_3;
  * ``compute_vgg_loss``: MSE between *instance-normalized* features of
    translated output and input.

Weights: load a converted .npz via :func:`load_vgg_npz` (convert a torch
VGG16 state_dict with tools/convert_vgg_pt.py). Training with ``vgg_w > 0``
without weights raises — random-weight perceptual loss is meaningless.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from councilx.nn.blocks import instance_norm

# VGG16 conv plan: (name, out_channels); 'M' = 2x2 max pool
_VGG16_PLAN = [
    ("conv1_1", 64), ("conv1_2", 64), "M",
    ("conv2_1", 128), ("conv2_2", 128), "M",
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), "M",
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), "M",
    ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512),
]

# ImageNet channel means, BGR order, 0..255 scale (caffe convention)
_BGR_MEANS = (103.939, 116.779, 123.680)


def vgg_preprocess(x: jnp.ndarray) -> jnp.ndarray:
    """[-1, 1] RGB NHWC -> caffe-VGG input (BGR, 0..255, mean-subtracted).

    Reference: utils.py::vgg_preprocess (MUNIT)."""
    x = (x + 1.0) * 127.5                    # [0, 255]
    x = x[..., ::-1]                         # RGB -> BGR
    mean = jnp.asarray(_BGR_MEANS, x.dtype)
    return x - mean


class Vgg16Features(nn.Module):
    """VGG16 trunk up to relu5_3 (reference networks.py::Vgg16)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for item in _VGG16_PLAN:
            if item == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                name, ch = item
                x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)),
                            name=name)(x)
                x = jax.nn.relu(x)
        return x


def compute_vgg_loss(vgg_params: Dict[str, Any], img: jnp.ndarray,
                     target: jnp.ndarray) -> jnp.ndarray:
    """MSE between instance-normalized relu5_3 features.

    Reference: trainer compute_vgg_loss (MUNIT, retained by the fork)."""
    model = Vgg16Features()
    f_img = model.apply({"params": vgg_params}, vgg_preprocess(img))
    f_tgt = model.apply({"params": vgg_params}, vgg_preprocess(target))
    return jnp.mean((instance_norm(f_img.astype(jnp.float32))
                     - instance_norm(f_tgt.astype(jnp.float32))) ** 2)


def load_vgg_npz(path: str) -> Dict[str, Any]:
    """Flat npz (from tools/convert_vgg_pt.py) -> nested params dict."""
    flat = dict(np.load(path))
    tree: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)
    return tree


def init_random_vgg(rng: jax.Array) -> Dict[str, Any]:
    """Random init (tests only)."""
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    return Vgg16Features().init(rng, dummy)["params"]
