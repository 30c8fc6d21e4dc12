"""Reverse checkpoint interop: councilx flax params -> reference-layout
torch state dicts (ckpt/torch_export.py), proven three ways:

1. exact numeric round-trip through the import converters,
2. ``load_state_dict(strict=True)`` into the MUNIT-layout torch oracle plus
   fp32 forward parity (the exported checkpoint WORKS in torch), and
3. the export_pt CLI writes .pt files that tools/convert_pt.py reads back
   into the original stacked member params (full circle).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from councilx.ckpt.torch_convert import (
    convert_adain_gen,
    convert_ms_image_dis,
)
from councilx.ckpt.torch_export import (
    export_adain_gen,
    export_ms_image_dis,
    unstack_members,
)
from councilx.nn.discriminator import MsImageDis
from councilx.nn.generator import AdaINGen

from torch_ref import AdaINGenT, MsImageDisT

ATOL = 3e-5


def nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def to_nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def _assert_trees_equal(a, b):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=0, rtol=0)


@pytest.fixture(scope="module")
def gen_and_params():
    gen = AdaINGen(input_dim=3, dim=8, style_dim=3, n_downsample=2, n_res=2,
                   activ="relu", pad_type="reflect", mlp_dim=16, mlp_n_blk=3,
                   focus_mask=True)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = jax.device_get(gen.init(jax.random.PRNGKey(3), x)["params"])
    return gen, params


def test_gen_export_import_roundtrip(gen_and_params):
    _, params = gen_and_params
    sd = export_adain_gen(params, n_downsample=2, n_res=2, mlp_n_blk=3,
                          dim=8)
    back = convert_adain_gen(sd, n_downsample=2, n_res=2, mlp_n_blk=3)
    _assert_trees_equal(params, back)


def test_gen_export_strict_load_and_forward_parity(gen_and_params):
    gen, params = gen_and_params
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in export_adain_gen(
        params, n_downsample=2, n_res=2, mlp_n_blk=3, dim=8).items()}
    tgen = AdaINGenT(input_dim=3, dim=8, style_dim=3, n_downsample=2,
                     n_res=2, activ="relu", pad_type="reflect", mlp_dim=16,
                     output_dim=4)
    tgen.load_state_dict(sd, strict=True)   # every key, exact layout
    tgen.eval()

    r = np.random.RandomState(0)
    x = r.randn(2, 32, 32, 3).astype(np.float32)
    z = r.randn(2, 3).astype(np.float32)
    with torch.no_grad():
        c_ref, _ = tgen.encode(nchw(x))
        out_ref = tgen.decode(c_ref, torch.from_numpy(z))
    c = gen.apply({"params": params}, jnp.asarray(x),
                  method=AdaINGen.encode_content)
    out = gen.apply({"params": params}, c, jnp.asarray(z),
                    method=AdaINGen.decode)
    np.testing.assert_allclose(np.asarray(out), to_nhwc(out_ref), atol=ATOL,
                               rtol=0)


def test_dis_export_roundtrip_and_torch_forward():
    dis = MsImageDis(input_dim=3, dim=8, n_layer=3, norm="none",
                     activ="lrelu", num_scales=3, pad_type="reflect")
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = jax.device_get(dis.init(jax.random.PRNGKey(5), x0)["params"])

    sd = export_ms_image_dis(params, n_layer=3, num_scales=3)
    _assert_trees_equal(params, convert_ms_image_dis(sd, n_layer=3,
                                                     num_scales=3))

    tdis = MsImageDisT(input_dim=3, n_layer=3, dim=8, norm="none",
                       activ="lrelu", num_scales=3, pad_type="reflect")
    tdis.load_state_dict({k: torch.from_numpy(np.asarray(v))
                          for k, v in sd.items()}, strict=True)
    tdis.eval()
    r = np.random.RandomState(1)
    x = r.randn(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        refs = tdis(nchw(x))
    outs = dis.apply({"params": params}, jnp.asarray(x))
    for out, ref in zip(outs, refs):
        np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), atol=ATOL,
                                   rtol=0)


def test_unstack_members_roundtrip():
    stacked = {"a": np.arange(12, dtype=np.float32).reshape(3, 4),
               "b": {"c": np.arange(6, dtype=np.float32).reshape(3, 2)}}
    members = unstack_members(stacked)
    assert len(members) == 3
    np.testing.assert_array_equal(members[1]["a"], stacked["a"][1])
    np.testing.assert_array_equal(members[2]["b"]["c"], stacked["b"]["c"][2])


def test_export_pt_full_circle(tmp_path):
    """Stacked council gen params -> export_pt-style payload -> torch.save
    -> tools/convert_pt.py reads it back bit-identically."""
    from councilx.config import Config
    from tools.convert_pt import convert_reference_gen_pt

    gen = AdaINGen(input_dim=3, dim=8, style_dim=3, n_downsample=2, n_res=2,
                   activ="relu", pad_type="reflect", mlp_dim=16, mlp_n_blk=3,
                   focus_mask=True)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    stacked = jax.device_get(jax.vmap(gen.init, in_axes=(0, None))(
        jax.random.split(jax.random.PRNGKey(0), 2), x)["params"])

    payload = {}
    for i, member in enumerate(unstack_members(stacked)):
        payload[f"a2b_{i}"] = {
            k: torch.from_numpy(np.asarray(v)) for k, v in export_adain_gen(
                member, n_downsample=2, n_res=2, mlp_n_blk=3, dim=8).items()}
    pt = str(tmp_path / "gen_00000007.pt")
    torch.save(payload, pt)

    cfg = Config.from_dict({
        "gen": {"dim": 8, "style_dim": 3, "n_downsample": 2, "n_res": 2,
                "mlp_dim": 16, "mlp_n_blk": 3}})
    back = convert_reference_gen_pt(pt, cfg, "a2b")
    _assert_trees_equal(stacked, back)
