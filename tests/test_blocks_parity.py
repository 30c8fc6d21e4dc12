"""Golden-tensor parity: councilx flax blocks vs the PyTorch oracle
(tests/torch_ref.py) at fp32. SURVEY.md §4 test-pyramid level 1."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from councilx.ckpt.torch_convert import (
    _conv_block,
    convert_adain_gen,
    convert_ms_image_dis,
    torch_state_dict_to_numpy,
)
from councilx.nn.blocks import (
    Conv2dBlock,
    MunitLayerNorm,
    avg_pool_3x3_s2,
    instance_norm,
    upsample_nearest_2x,
)
from councilx.nn.discriminator import MsImageDis
from councilx.nn.generator import AdaINGen

from torch_ref import AdaINGenT, Conv2dBlockT, LayerNormT, MsImageDisT

ATOL = 3e-5


def nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def to_nhwc(t: torch.Tensor) -> np.ndarray:
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("norm,activation,pad_type,stride,k,p", [
    ("none", "relu", "reflect", 1, 7, 3),
    ("in", "relu", "reflect", 2, 4, 1),
    ("ln", "relu", "reflect", 1, 5, 2),
    ("none", "lrelu", "reflect", 2, 4, 1),
    ("none", "tanh", "reflect", 1, 7, 3),
    ("in", "relu", "zero", 1, 3, 1),
    ("none", "relu", "replicate", 1, 3, 1),
])
def test_conv2dblock_parity(rng, norm, activation, pad_type, stride, k, p):
    cin, cout = 5, 6
    x = rng.randn(2, 16, 16, cin).astype(np.float32)
    tblock = Conv2dBlockT(cin, cout, k, stride, p, norm=norm,
                          activation=activation, pad_type=pad_type)
    tblock.eval()
    with torch.no_grad():
        ref = to_nhwc(tblock(nchw(x)))

    jblock = Conv2dBlock(cout, k, stride, p, norm=norm,
                         activation=activation, pad_type=pad_type)
    sd = torch_state_dict_to_numpy(tblock.state_dict())
    # _conv_block expects a "<prefix>.conv.weight" key layout
    params = _conv_block({f"x.{key}": v for key, v in sd.items()}, "x",
                         norm=norm)
    out = jblock.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=ATOL, rtol=0)


def test_instance_norm_matches_torch(rng):
    x = rng.randn(2, 9, 11, 7).astype(np.float32)
    ref = to_nhwc(torch.nn.InstanceNorm2d(7)(nchw(x)))
    out = instance_norm(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=ATOL, rtol=0)


def test_munit_layernorm_parity(rng):
    x = rng.randn(3, 8, 8, 5).astype(np.float32)
    tln = LayerNormT(5)
    with torch.no_grad():
        ref = to_nhwc(tln(nchw(x)))
    jln = MunitLayerNorm(num_features=5)
    params = {"gamma": tln.gamma.detach().numpy(),
              "beta": tln.beta.detach().numpy()}
    out = jln.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=ATOL, rtol=0)


def test_munit_layernorm_precision_modes(rng):
    # the three precision modes coincide exactly at f32 input, and the
    # mixed/bf16 modes stay close to the f32 round-trip at bf16 input
    # (per-sample scalar stats; round-4 serving traffic fix)
    x = rng.randn(3, 8, 8, 5).astype(np.float32)
    params = {"gamma": rng.rand(5).astype(np.float32),
              "beta": rng.randn(5).astype(np.float32)}
    outs = [MunitLayerNorm(num_features=5, precision=p).apply(
                {"params": params}, jnp.asarray(x))
            for p in ("f32", "mixed", "bf16")]
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(outs[1]),
                               atol=1e-6, rtol=0)
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(outs[2]),
                               atol=1e-6, rtol=0)
    xb = jnp.asarray(x, jnp.bfloat16)
    o_f32 = MunitLayerNorm(num_features=5, precision="f32").apply(
        {"params": params}, xb).astype(jnp.float32)
    o_mix = MunitLayerNorm(num_features=5, precision="mixed").apply(
        {"params": params}, xb).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(o_mix), np.asarray(o_f32),
                               atol=0.05, rtol=0.02)


def test_avg_pool_count_include_pad_false(rng):
    x = rng.randn(2, 15, 17, 3).astype(np.float32)
    pool = torch.nn.AvgPool2d(3, stride=2, padding=[1, 1],
                              count_include_pad=False)
    ref = to_nhwc(pool(nchw(x)))
    out = avg_pool_3x3_s2(jnp.asarray(x))
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, atol=ATOL, rtol=0)


def test_upsample_nearest_parity(rng):
    x = rng.randn(2, 7, 9, 4).astype(np.float32)
    ref = to_nhwc(torch.nn.Upsample(scale_factor=2)(nchw(x)))
    out = upsample_nearest_2x(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=0, rtol=0)


class TestAdaINGenParity:
    """Full generator parity with converted weights and injected style z —
    the SURVEY.md hard-part #1 (exact AdaIN slicing order, LN formula,
    reflect pad, nearest upsample)."""

    @pytest.fixture(scope="class")
    def models(self):
        torch.manual_seed(0)
        tgen = AdaINGenT(input_dim=3, dim=8, style_dim=3, n_downsample=2,
                         n_res=2, activ="relu", pad_type="reflect",
                         mlp_dim=16, output_dim=4)
        tgen.eval()
        jgen = AdaINGen(input_dim=3, dim=8, style_dim=3, n_downsample=2,
                        n_res=2, activ="relu", pad_type="reflect", mlp_dim=16,
                        mlp_n_blk=3, focus_mask=True)
        sd = torch_state_dict_to_numpy(tgen.state_dict())
        params = convert_adain_gen(sd, n_downsample=2, n_res=2, mlp_n_blk=3)
        return tgen, jgen, params

    def test_encode_parity(self, models, rng):
        tgen, jgen, params = models
        x = rng.randn(2, 32, 32, 3).astype(np.float32)
        with torch.no_grad():
            c_ref, s_ref = tgen.encode(nchw(x))
        c, s = jgen.apply({"params": params}, jnp.asarray(x),
                          method=AdaINGen.encode)
        np.testing.assert_allclose(np.asarray(c), to_nhwc(c_ref), atol=ATOL,
                                   rtol=0)
        np.testing.assert_allclose(
            np.asarray(s), s_ref.detach().numpy().reshape(2, 3),
            atol=ATOL, rtol=0)

    def test_decode_parity(self, models, rng):
        tgen, jgen, params = models
        x = rng.randn(2, 32, 32, 3).astype(np.float32)
        z = rng.randn(2, 3).astype(np.float32)
        with torch.no_grad():
            c_ref, _ = tgen.encode(nchw(x))
            out_ref = tgen.decode(c_ref, torch.from_numpy(z))
        c = jgen.apply({"params": params}, jnp.asarray(x),
                       method=AdaINGen.encode_content)
        out = jgen.apply({"params": params}, c, jnp.asarray(z),
                         method=AdaINGen.decode)
        assert out.shape == (2, 32, 32, 4)
        np.testing.assert_allclose(np.asarray(out), to_nhwc(out_ref),
                                   atol=ATOL, rtol=0)

    def test_autoencode_parity(self, models, rng):
        tgen, jgen, params = models
        x = rng.randn(1, 32, 32, 3).astype(np.float32)
        with torch.no_grad():
            ref = to_nhwc(tgen(nchw(x)))
        out = jgen.apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), ref, atol=ATOL, rtol=0)


def test_ms_image_dis_parity(rng):
    torch.manual_seed(1)
    tdis = MsImageDisT(input_dim=3, n_layer=3, dim=8, norm="none",
                       activ="lrelu", num_scales=3, pad_type="reflect")
    tdis.eval()
    x = rng.randn(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        refs = tdis(nchw(x))
    jdis = MsImageDis(input_dim=3, dim=8, n_layer=3, norm="none",
                      activ="lrelu", num_scales=3, pad_type="reflect")
    sd = torch_state_dict_to_numpy(tdis.state_dict())
    params = convert_ms_image_dis(sd, n_layer=3, num_scales=3)
    outs = jdis.apply({"params": params}, jnp.asarray(x))
    assert len(outs) == 3
    for out, ref in zip(outs, refs):
        np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), atol=ATOL,
                                   rtol=0)


def test_conditional_council_dis_shapes(rng):
    """Council discriminator = MsImageDis with doubled input channels."""
    jdis = MsImageDis(input_dim=6, dim=8, n_layer=3, num_scales=2)
    x = jnp.asarray(rng.randn(2, 32, 32, 6).astype(np.float32))
    params = jdis.init(jax.random.PRNGKey(0), x)["params"]
    outs = jdis.apply({"params": params}, x)
    assert len(outs) == 2
    assert outs[0].shape[0] == 2 and outs[0].shape[-1] == 1
