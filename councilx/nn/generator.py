"""AdaIN generator (reference networks.py::AdaINGen and submodules).

Architecture (MUNIT, retained by Council-GAN):

  ContentEncoder: 7x7 conv (IN) -> n_downsample x stride-2 4x4 convs (IN,
      channel doubling) -> n_res ResBlocks (IN)
  StyleEncoder:   7x7 conv -> 2 x stride-2 doubling convs ->
      (n_downsample-2) x stride-2 convs -> global avg pool -> 1x1 conv to
      style_dim   (no norm anywhere — style must keep mean/var)
  Decoder:        n_res AdaIN ResBlocks -> n_upsample x [nearest-2x upsample +
      5x5 conv (MUNIT LayerNorm)] -> 7x7 conv -> tanh
  MLP:            style code -> concatenated per-AdaIN-layer (beta, gamma)

Council-GAN additions: when the focus mechanism is on, the decoder emits
RGB + 1 mask channel; the final translation is
``mask * rgb + (1 - mask) * input`` (compositing lives in
councilx.losses.focus / the trainer, mirroring trainer_council.py).

Functional AdaIN: the reference mutates AdaptiveInstanceNorm2d.weight/.bias
via AdaINGen.assign_adain_params, consuming the MLP output sequentially over
``model.modules()`` in definition order, bias-half first then weight-half per
layer. Here the decoder slices the same flat vector in the same order and
passes (gamma, beta) down as call arguments — same numerics, no mutation.
"""

from __future__ import annotations

from typing import Any, Callable, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from councilx.nn.blocks import (
    MLP,
    Conv2dBlock,
    ResBlocks,
    adaptive_avg_pool_1,
)

Dtype = Any


class ContentEncoder(nn.Module):
    """Reference: networks.py::ContentEncoder."""

    dim: int = 64
    n_downsample: int = 2
    n_res: int = 4
    activ: str = "relu"
    pad_type: str = "reflect"
    kernel_init: Callable = nn.initializers.he_normal()
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    use_pallas_norm: bool = False
    in_precision: str = "f32"   # internal precision of the in/adain norms
    in_stats: str = "two_pass"  # norm stats scheme (blocks.norm_mean_var)
    # W8A8 int8 serving quantization (ops/quant.py) for the HEAVY convs
    # only: the downsample convs and resblocks (all IN-normalized, where
    # per-channel quant scales cancel exactly). The first 7x7-from-RGB conv
    # stays in the compute dtype (tiny FLOPs, quality-critical input edge).
    quant: str = "none"
    # which conv classes quantize when quant != "none" (see AdaINGen).
    # Default matches AdaINGen/Config ("resblocks", the measured round-4
    # winner) so code constructing this module directly agrees with the
    # full generator; AdaINGen always passes it explicitly anyway.
    quant_scope: str = "resblocks"
    # boundary-conv engine for the fuse_pad 7x7 (see Conv2dBlock)
    boundary_engine: str = "auto"
    # fold the reflect pad into the resblock 3x3 convs (strips engine,
    # ops/pad_conv.py) — see Config.resblock_fuse_pad
    resblock_fuse_pad: bool = False
    # stage-granular rematerialization (see Decoder.remat_stages): at 256px
    # batch>8 the encoder's (B,64,64,256) resblock internals are the other
    # half of the memory peak; per-stage checkpointing bounds the backward
    # to one stage's internals. Explicit names keep the parameter tree
    # identical to the unremat path. (The StyleEncoder is deliberately NOT
    # stage-rematted: measured, it RAISES the whole-step peak by ~134 MB —
    # forcing its stage boundaries live interacts badly with XLA's own
    # scheduling of the style branch.)
    remat_stages: bool = False

    @property
    def output_dim(self) -> int:
        return self.dim * (2 ** self.n_downsample)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        CB = nn.remat(Conv2dBlock) if self.remat_stages else Conv2dBlock
        RB = nn.remat(ResBlocks) if self.remat_stages else ResBlocks
        dim = self.dim
        x = CB(dim, 7, 1, 3, norm="in", activation=self.activ,
               pad_type=self.pad_type, kernel_init=self.kernel_init,
               dtype=self.dtype, use_pallas=self.use_pallas,
               use_pallas_norm=self.use_pallas_norm,
               in_precision=self.in_precision,
               in_stats=self.in_stats, fuse_pad=True,
               boundary_engine=self.boundary_engine,
               name="Conv2dBlock_0")(x)
        for i in range(self.n_downsample):
            x = CB(2 * dim, 4, 2, 1, norm="in",
                   activation=self.activ, pad_type=self.pad_type,
                   kernel_init=self.kernel_init, dtype=self.dtype,
                   use_pallas=self.use_pallas,
                   use_pallas_norm=self.use_pallas_norm,
                   in_precision=self.in_precision,
               in_stats=self.in_stats,
                   quant=(self.quant if self.quant_scope == "heavy"
                          else "none"),
                   name=f"Conv2dBlock_{i + 1}")(x)
            dim *= 2
        x = RB(self.n_res, dim, norm="in", activation=self.activ,
               pad_type=self.pad_type, kernel_init=self.kernel_init,
               dtype=self.dtype, fuse_pad=self.resblock_fuse_pad,
               use_pallas=self.use_pallas,
               use_pallas_norm=self.use_pallas_norm,
               in_precision=self.in_precision,
               in_stats=self.in_stats,
               quant=self.quant,
               name="ResBlocks_0")(x)
        return x


class StyleEncoder(nn.Module):
    """Reference: networks.py::StyleEncoder. Returns (B, style_dim)."""

    dim: int = 64
    style_dim: int = 8
    n_downsample: int = 2
    activ: str = "relu"
    pad_type: str = "reflect"
    kernel_init: Callable = nn.initializers.he_normal()
    dtype: Dtype = jnp.float32
    boundary_engine: str = "auto"   # see Conv2dBlock

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = self.dim
        x = Conv2dBlock(dim, 7, 1, 3, norm="none", activation=self.activ,
                        pad_type=self.pad_type, kernel_init=self.kernel_init,
                        dtype=self.dtype, fuse_pad=True,
                        boundary_engine=self.boundary_engine)(x)
        for _ in range(2):
            x = Conv2dBlock(2 * dim, 4, 2, 1, norm="none",
                            activation=self.activ, pad_type=self.pad_type,
                            kernel_init=self.kernel_init, dtype=self.dtype)(x)
            dim *= 2
        for _ in range(self.n_downsample - 2):
            x = Conv2dBlock(dim, 4, 2, 1, norm="none", activation=self.activ,
                            pad_type=self.pad_type,
                            kernel_init=self.kernel_init, dtype=self.dtype)(x)
        x = adaptive_avg_pool_1(x)
        x = nn.Conv(self.style_dim, (1, 1), padding="VALID",
                    kernel_init=self.kernel_init,
                    bias_init=nn.initializers.zeros,
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        return x.reshape(x.shape[0], self.style_dim)


class Decoder(nn.Module):
    """Reference: networks.py::Decoder (AdaIN resblocks + upsample convs).

    ``adain_vec`` is the flat MLP output of length ``2 * dim * 2 * n_res``;
    it is sliced sequentially — per AdaIN layer: beta first, then gamma —
    matching AdaINGen.assign_adain_params.
    """

    dim: int               # channel width entering the decoder (= content dim)
    output_dim: int = 3    # 3 (RGB) or 4 (RGB + focus mask)
    n_upsample: int = 2
    n_res: int = 4
    activ: str = "relu"
    pad_type: str = "reflect"
    kernel_init: Callable = nn.initializers.he_normal()
    dtype: Dtype = jnp.float32
    # phase-decomposed upsample+conv (ops/upsample_conv.py): exact rewrite,
    # 9/25 the MACs; off in parity mode (summation order differs slightly)
    fuse_upsample: bool = True
    use_pallas: bool = False
    use_pallas_norm: bool = False
    in_precision: str = "f32"   # internal precision of the adain norms
    in_stats: str = "two_pass"  # norm stats scheme (blocks.norm_mean_var)
    # W8A8 int8 serving quantization for the heavy convs (adain resblocks +
    # upsample convs); the final 7x7-to-RGB/mask conv stays in the compute
    # dtype (quality-critical output edge, negligible FLOPs). See
    # ops/quant.py for the scheme and ContentEncoder.quant for the policy.
    quant: str = "none"
    # which conv classes quantize when quant != "none" (see AdaINGen).
    # Default matches AdaINGen/Config ("resblocks", the measured round-4
    # winner) so code constructing this module directly agrees with the
    # full generator; AdaINGen always passes it explicitly anyway.
    quant_scope: str = "resblocks"
    # boundary-conv engine for the fuse_pad final 7x7 (see Conv2dBlock)
    boundary_engine: str = "auto"
    # interior engine of the fused upsample+conv stages ("dilated" |
    # "phase" | "ln_fused" — see Conv2dBlock.upsample_engine)
    upsample_engine: str = "dilated"
    # fold the reflect pad into the resblock 3x3 convs (strips engine)
    resblock_fuse_pad: bool = False
    # mask-channel activation ([VERIFY] dual, see CouncilConfig): with
    # "sigmoid" the final conv emits raw pre-activations; tanh is applied to
    # the RGB channels only, the mask channel stays a logit for the caller's
    # sigmoid. Parameter tree is identical in both modes.
    mask_activation: str = "tanh_affine"
    # stage-granular rematerialization: checkpoint each decoder stage
    # (resblocks / each upsample conv / final conv) separately so a
    # backward pass keeps at most ONE stage's internals live — the peak at
    # 256px batch>8 is the (B,256,256,64) tail-stage temporaries
    # (BASELINE.md batch-scaling notes). Explicit names keep the parameter
    # tree identical to the unremat path (nn.remat would otherwise rename
    # modules to Checkpoint*).
    remat_stages: bool = False

    @staticmethod
    def num_adain_params(dim: int, n_res: int) -> int:
        """Reference: AdaINGen.get_num_adain_params — 2 params x dim features
        x (2 AdaIN convs per resblock) x n_res blocks."""
        return 2 * dim * 2 * n_res

    @nn.compact
    def __call__(self, x: jnp.ndarray, adain_vec: jnp.ndarray) -> jnp.ndarray:
        dim = self.dim
        # slice the flat adain vector: per layer, beta then gamma (the
        # reference assigns bias = first half, weight = second half)
        pairs: List[Tuple[jnp.ndarray, jnp.ndarray]] = []
        cursor = 0
        for _ in range(2 * self.n_res):
            beta = adain_vec[:, cursor:cursor + dim]
            gamma = adain_vec[:, cursor + dim:cursor + 2 * dim]
            pairs.append((gamma, beta))
            cursor += 2 * dim
        RB = nn.remat(ResBlocks) if self.remat_stages else ResBlocks
        CB = nn.remat(Conv2dBlock) if self.remat_stages else Conv2dBlock
        x = RB(self.n_res, dim, norm="adain", activation=self.activ,
               pad_type=self.pad_type, kernel_init=self.kernel_init,
               dtype=self.dtype, fuse_pad=self.resblock_fuse_pad,
               use_pallas=self.use_pallas,
               use_pallas_norm=self.use_pallas_norm,
               in_precision=self.in_precision,
               in_stats=self.in_stats,
               quant=self.quant,
               name="ResBlocks_0")(x, pairs)
        idx = 0
        for _ in range(self.n_upsample):
            x = CB(dim // 2, 5, 1, 2, norm="ln",
                   activation=self.activ, pad_type=self.pad_type,
                   kernel_init=self.kernel_init, dtype=self.dtype,
                   upsample2x=True,
                   fuse_upsample=self.fuse_upsample,
                   use_pallas=self.use_pallas,
                   use_pallas_norm=self.use_pallas_norm,
                   in_precision=self.in_precision,
                   in_stats=self.in_stats,
                   quant=(self.quant if self.quant_scope == "heavy"
                          else "none"),
                   upsample_engine=self.upsample_engine,
                   name=f"Conv2dBlock_{idx}")(x)
            dim //= 2
            idx += 1
        sigmoid_mask = (self.mask_activation == "sigmoid"
                        and self.output_dim > 3)
        x = CB(self.output_dim, 7, 1, 3, norm="none",
               activation="none" if sigmoid_mask else "tanh",
               pad_type=self.pad_type, fuse_pad=True,
               boundary_engine=self.boundary_engine,
               kernel_init=self.kernel_init, dtype=self.dtype,
               name=f"Conv2dBlock_{idx}")(x)
        if sigmoid_mask:
            x = jnp.concatenate([jnp.tanh(x[..., :3]), x[..., 3:]], axis=-1)
        return x


class AdaINGen(nn.Module):
    """Reference: networks.py::AdaINGen — full encoder/decoder generator.

    Methods mirror the reference API: ``encode`` (content + style),
    ``decode`` (style -> MLP -> AdaIN decode), ``__call__`` (autoencode).
    """

    input_dim: int = 3
    dim: int = 64
    style_dim: int = 8
    n_downsample: int = 2
    n_res: int = 4
    activ: str = "relu"
    pad_type: str = "reflect"
    mlp_dim: int = 256
    mlp_n_blk: int = 3
    focus_mask: bool = True     # emit an extra alpha-mask output channel
    kernel_init: Callable = nn.initializers.he_normal()
    dtype: Dtype = jnp.float32
    fuse_upsample: bool = True  # see Decoder.fuse_upsample
    use_pallas: bool = False    # per-object kernel choices (no process global)
    use_pallas_norm: bool = False
    in_precision: str = "f32"   # internal precision of the in/adain norms
    in_stats: str = "two_pass"  # norm stats scheme (blocks.norm_mean_var)
    quant: str = "none"         # W8A8 serving quantization (ops/quant.py)
    # which conv classes quantize when quant != "none":
    #   "heavy"     — downsample convs + resblocks + upsample convs (the
    #                 round-3 scheme; every IN/AdaIN conv)
    #   "resblocks" — the 16 3x3 resblock convs ONLY. The round-4 stage
    #     profile showed int8 WINS on the resblocks (103 vs 114.5 ms per
    #     group, batch-384 256px serving) but LOSES on the stride-2 downs
    #     (27.9 vs 19.5 / 14.6 vs 12.1) and on the upsamples (the quant
    #     path forces the phase engine over the faster bf16 dilated one:
    #     72.3 vs 51.3 at up2) — so quantizing only where int8 wins is the
    #     fastest serving config.
    quant_scope: str = "resblocks"
    # boundary-conv engine for the fuse_pad 7x7s (A/B surface; Conv2dBlock)
    boundary_engine: str = "auto"
    # fused-upsample interior engine (A/B surface; Conv2dBlock)
    upsample_engine: str = "dilated"
    # strips-engine pad folding on the resblock 3x3 convs (A/B surface)
    resblock_fuse_pad: bool = False
    mask_activation: str = "tanh_affine"  # see Decoder.mask_activation
    remat_stages: bool = False  # see Decoder.remat_stages

    @property
    def content_dim(self) -> int:
        return self.dim * (2 ** self.n_downsample)

    @property
    def output_dim(self) -> int:
        return self.input_dim + (1 if self.focus_mask else 0)

    def setup(self):
        self.enc_content = ContentEncoder(
            dim=self.dim, n_downsample=self.n_downsample, n_res=self.n_res,
            activ=self.activ, pad_type=self.pad_type,
            kernel_init=self.kernel_init, dtype=self.dtype,
            use_pallas=self.use_pallas,
            use_pallas_norm=self.use_pallas_norm,
            in_precision=self.in_precision,
               in_stats=self.in_stats,
            quant=self.quant, quant_scope=self.quant_scope,
            boundary_engine=self.boundary_engine,
            resblock_fuse_pad=self.resblock_fuse_pad,
            remat_stages=self.remat_stages)
        self.enc_style = StyleEncoder(
            dim=self.dim, style_dim=self.style_dim,
            n_downsample=self.n_downsample, activ=self.activ,
            pad_type=self.pad_type, kernel_init=self.kernel_init,
            dtype=self.dtype, boundary_engine=self.boundary_engine)
        self.dec = Decoder(
            dim=self.content_dim, output_dim=self.output_dim,
            n_upsample=self.n_downsample, n_res=self.n_res, activ=self.activ,
            pad_type=self.pad_type, kernel_init=self.kernel_init,
            dtype=self.dtype, fuse_upsample=self.fuse_upsample,
            use_pallas=self.use_pallas,
            use_pallas_norm=self.use_pallas_norm,
            in_precision=self.in_precision,
               in_stats=self.in_stats,
            quant=self.quant, quant_scope=self.quant_scope,
            boundary_engine=self.boundary_engine,
            upsample_engine=self.upsample_engine,
            resblock_fuse_pad=self.resblock_fuse_pad,
            mask_activation=self.mask_activation,
            remat_stages=self.remat_stages)
        self.mlp = MLP(
            out_dim=Decoder.num_adain_params(self.content_dim, self.n_res),
            dim=self.mlp_dim, n_blk=self.mlp_n_blk, norm="none",
            activation=self.activ, kernel_init=self.kernel_init,
            dtype=self.dtype)

    def encode(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """-> (content (B,h,w,C), style (B, style_dim))."""
        return self.enc_content(x), self.enc_style(x)

    def encode_content(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.enc_content(x)

    def encode_style(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.enc_style(x)

    def decode(self, content: jnp.ndarray, style: jnp.ndarray) -> jnp.ndarray:
        """Style (B, style_dim) -> AdaIN params -> decoded image.

        Returns (B, H, W, output_dim); channel 3 (if present) is the raw
        tanh mask channel — compositing happens in the caller.
        """
        adain_vec = self.mlp(style)
        return self.dec(content, adain_vec)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """Autoencode with the image's own style (reference AdaINGen.forward)."""
        content, style = self.encode(x)
        return self.decode(content, style)


def composite_with_mask(decoded: jnp.ndarray, x_in: jnp.ndarray,
                        mask_activation: str = "tanh_affine"
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Focus-mask compositing (reference: trainer_council.py gen_update).

    ``decoded`` is the 4-channel decoder output. With
    ``mask_activation="tanh_affine"`` the mask channel is tanh output mapped
    from [-1, 1] to [0, 1]; with ``"sigmoid"`` it is a raw logit (the decoder
    left it unactivated — see Decoder.mask_activation) squashed by sigmoid.
    The translated image is ``mask * rgb + (1 - mask) * input``.
    Returns (composited_rgb, mask).
    """
    rgb = decoded[..., :3]
    m = decoded[..., 3:4]
    if mask_activation == "sigmoid":
        mask = jax.nn.sigmoid(m)
    else:
        mask = (m + 1.0) * 0.5
    return mask * rgb + (1.0 - mask) * x_in, mask
