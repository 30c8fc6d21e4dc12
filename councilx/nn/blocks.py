"""Building blocks mirroring the reference networks.py (MUNIT-derived).

Reference parity targets (symbol-level, per SURVEY.md §2.1 row 7):
  * networks.py::Conv2dBlock  — pad(reflect/replicate/zero) -> conv -> norm
    (bn/in/ln/adain/sn/none) -> activation (relu/lrelu/prelu/selu/tanh/none)
  * networks.py::LinearBlock
  * networks.py::ResBlock / ResBlocks
  * networks.py::MLP
  * networks.py::AdaptiveInstanceNorm2d — here the functional :func:`adain`
    (instance-norm then externally-supplied scale/shift), replacing the
    reference's mutable ``assign_adain_params`` module-state hack
  * networks.py::LayerNorm — MUNIT's custom per-sample CHW layer norm with the
    idiosyncratic ``(x - mean) / (std_unbiased + eps)`` formula (NOT
    ``sqrt(var + eps)``) and per-channel affine
  * networks.py::SpectralNorm — power iteration as explicit flax variable
    state instead of in-place parameter mutation

Everything is NHWC (TPU-native); the torch reference is NCHW. fp32 numerics
match PyTorch exactly (see tests/test_blocks_parity.py).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# ---------------------------------------------------------------------------
# initializers — reference utils.py::weights_init
# ---------------------------------------------------------------------------


def make_kernel_init(name: str) -> Callable:
    """Kernel initializer matching reference utils.py::weights_init.

    'kaiming'   -> kaiming_normal_(fan_in, gain=sqrt(2))  == he_normal
    'gaussian'  -> normal(0, 0.02)        (used for discriminators)
    'xavier'    -> xavier_normal_(gain=sqrt(2))
    'orthogonal'-> orthogonal(gain=sqrt(2))
    'default'   -> flax default (lecun_normal)
    """
    if name == "kaiming":
        return nn.initializers.he_normal()
    if name == "gaussian":
        return nn.initializers.normal(stddev=0.02)
    if name == "xavier":
        # torch xavier_normal_ with gain=sqrt(2): std = gain*sqrt(2/(fan_in+fan_out))
        return nn.initializers.variance_scaling(2.0, "fan_avg", "normal")
    if name == "orthogonal":
        return nn.initializers.orthogonal(scale=jnp.sqrt(2.0))
    if name == "default":
        return nn.initializers.lecun_normal()
    raise ValueError(f"unknown init: {name}")


# ---------------------------------------------------------------------------
# activations
# ---------------------------------------------------------------------------


def make_activation(name: str) -> Optional[Callable[[jnp.ndarray], jnp.ndarray]]:
    """Activation factory matching reference Conv2dBlock's activation choices."""
    if name == "relu":
        return jax.nn.relu
    if name == "lrelu":
        return lambda x: jax.nn.leaky_relu(x, negative_slope=0.2)
    if name == "prelu":
        # reference uses nn.PReLU() (learned alpha, init 0.25); the learned
        # parameter variant lives in Conv2dBlock; standalone fallback uses 0.25
        return lambda x: jnp.where(x >= 0, x, 0.25 * x)
    if name == "selu":
        return jax.nn.selu
    if name == "tanh":
        return jnp.tanh
    if name == "none":
        return None
    raise ValueError(f"unknown activation: {name}")


# ---------------------------------------------------------------------------
# padding — reference uses nn.ReflectionPad2d / ReplicationPad2d / ZeroPad2d
# ---------------------------------------------------------------------------


def pad2d(x: jnp.ndarray, padding: int, pad_type: str) -> jnp.ndarray:
    """Spatial padding on NHWC input, matching torch pad modules at fp32."""
    if padding == 0:
        return x
    widths = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    if pad_type == "reflect":
        return jnp.pad(x, widths, mode="reflect")
    if pad_type == "replicate":
        return jnp.pad(x, widths, mode="edge")
    if pad_type == "zero":
        return jnp.pad(x, widths, mode="constant")
    raise ValueError(f"unknown pad_type: {pad_type}")


# ---------------------------------------------------------------------------
# norms (functional)
# ---------------------------------------------------------------------------


def norm_mean_var(x: jnp.ndarray, axes, stats: str = "two_pass"):
    """Mean and *biased* variance over ``axes`` (keepdims), two ways.

    "two_pass" — ``jnp.mean`` then ``jnp.var``: the var reduction depends on
    the already-computed mean, so XLA must read the tensor TWICE for stats
    (plus once more to normalize). Torch-parity rounding class.

    "one_pass" — ``E[x]`` and ``E[x^2]`` as two SIBLING reductions of the
    same input with no interdependence: XLA multi-output-fuses them into a
    single read, halving norm-stats HBM traffic (stats passes are pure
    bandwidth — every IN/AdaIN/LN tensor in the generator is read 3x under
    two_pass, 2x under one_pass). ``var = max(E[x^2] - mean^2, 0)`` differs
    from the two-pass value by float *cancellation* (~|mean|^2/var * eps_f32
    relative), not merely summation order — so this mode is config-gated
    (Config.norm_stats) and forced off in parity mode.
    """
    mean = jnp.mean(x, axis=axes, keepdims=True)
    if stats == "one_pass":
        ex2 = jnp.mean(jnp.square(x), axis=axes, keepdims=True)
        var = jnp.maximum(ex2 - jnp.square(mean), 0.0)
    elif stats == "two_pass":
        var = jnp.var(x, axis=axes, keepdims=True)
    else:
        raise ValueError(f"unknown norm_stats mode: {stats}")
    return mean, var


def instance_norm(x: jnp.ndarray, eps: float = 1e-5,
                  stats: str = "two_pass") -> jnp.ndarray:
    """InstanceNorm2d(affine=False), NHWC: per-(sample, channel) over H, W.

    PyTorch normalizes with the *biased* variance — so do we.
    Reference parity: nn.InstanceNorm2d as used in networks.py::Conv2dBlock.
    """
    mean, var = norm_mean_var(x, (-3, -2), stats)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def adain(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
          eps: float = 1e-5, stats: str = "two_pass") -> jnp.ndarray:
    """Adaptive instance norm: instance-normalize then scale/shift.

    ``gamma``/``beta`` are (B, C) slices of the style-MLP output. The
    reference (networks.py::AdaptiveInstanceNorm2d driven by
    AdaINGen.assign_adain_params) uses the raw MLP outputs: weight = std-half,
    bias = mean-half, no exp/softplus — identical here.
    """
    out = instance_norm(x, eps, stats)
    return out * gamma[:, None, None, :] + beta[:, None, None, :]


def apply_instance_norm(y: jnp.ndarray, precision: str,
                        eps: float = 1e-5,
                        stats: str = "two_pass") -> jnp.ndarray:
    """Instance norm at a chosen internal precision (BASELINE.md ResBlock
    composition cliff: the f32 round-trip inside an otherwise-bf16 resblock
    runs 25-53 TF/s vs ~99 with bf16 IN on v5e).

      "f32"   — cast to f32, stats + normalize in f32, cast back (the
                torch-parity formula; the parity-mode path)
      "mixed" — stats (mean/var) reduced in f32, normalize arithmetic in
                the compute dtype
      "bf16"  — everything in the compute dtype

    All three coincide exactly when y is float32. ``stats`` picks the
    mean/var reduction scheme (see norm_mean_var).
    """
    if precision == "f32":
        return instance_norm(y.astype(jnp.float32), eps,
                             stats).astype(y.dtype)
    if precision == "mixed":
        y32 = y.astype(jnp.float32)
        mean, var = norm_mean_var(y32, (-3, -2), stats)
        scale = jax.lax.rsqrt(var + eps).astype(y.dtype)
        return (y - mean.astype(y.dtype)) * scale
    if precision == "bf16":
        return instance_norm(y, eps, stats)
    raise ValueError(f"unknown in_precision: {precision}")


def apply_adain(y: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
                precision: str, eps: float = 1e-5,
                stats: str = "two_pass") -> jnp.ndarray:
    """AdaIN at a chosen internal precision (see apply_instance_norm)."""
    if precision == "f32":
        return adain(y.astype(jnp.float32), gamma.astype(jnp.float32),
                     beta.astype(jnp.float32), eps, stats).astype(y.dtype)
    out = apply_instance_norm(y, precision, eps, stats)
    return (out * gamma.astype(y.dtype)[:, None, None, :]
            + beta.astype(y.dtype)[:, None, None, :])


class MunitLayerNorm(nn.Module):
    """MUNIT's custom LayerNorm (networks.py::LayerNorm).

    Per-sample statistics over ALL of (H, W, C); normalization is
    ``(x - mean) / (std + eps)`` where ``std`` is the *unbiased* standard
    deviation (torch ``Tensor.std()`` default) — note: NOT ``sqrt(var+eps)``.
    Affine is per-channel; the reference initializes gamma ~ U[0,1) and
    beta = 0.
    """

    num_features: int
    eps: float = 1e-5
    affine: bool = True
    dtype: Dtype = jnp.float32
    # internal precision, mirroring apply_instance_norm ("f32" | "mixed" |
    # "bf16"): "f32" round-trips the full tensor through f32 (the
    # torch-parity formula; 2x the normalize-pass HBM bytes under a bf16
    # compute dtype); "mixed" reduces the per-sample stats in f32 but
    # normalizes + applies affine in the compute dtype; "bf16" does
    # everything in the compute dtype. All three coincide at f32 input.
    precision: str = "f32"
    # mean/var reduction scheme ("two_pass" | "one_pass", see norm_mean_var)
    stats: str = "two_pass"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        xs = (x if self.precision == "bf16" else x.astype(jnp.float32))
        axes = tuple(range(1, x.ndim))
        n = 1
        for a in axes:
            n *= x.shape[a]
        mean, var_b = norm_mean_var(xs, axes, self.stats)
        std = jnp.sqrt(var_b * (n / (n - 1)))  # unbiased, like torch .std()
        gamma = beta = None
        if self.affine:
            gamma = self.param("gamma", nn.initializers.uniform(scale=1.0),
                               (self.num_features,), jnp.float32)
            beta = self.param("beta", nn.initializers.zeros,
                              (self.num_features,), jnp.float32)
        if self.precision == "f32":
            out = (x.astype(jnp.float32) - mean) / (std + self.eps)
            if self.affine:
                out = out * gamma + beta
            return out.astype(orig_dtype)
        # mixed/bf16: per-sample scalar stats; normalize in compute dtype
        inv = (1.0 / (std + self.eps)).astype(orig_dtype)
        out = (x - mean.astype(orig_dtype)) * inv
        if self.affine:
            out = out * gamma.astype(orig_dtype) + beta.astype(orig_dtype)
        return out


# ---------------------------------------------------------------------------
# spectral norm — explicit power-iteration state
# ---------------------------------------------------------------------------


class SpectralConv(nn.Module):
    """Conv2d wrapped in spectral normalization (networks.py::SpectralNorm).

    The reference runs one power iteration per forward, mutating persistent
    ``u``/``v`` buffers. Here ``u`` lives in the 'spectral_stats' variable
    collection and is updated when the collection is mutable (training);
    at inference the stored ``u`` is used read-only.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.he_normal()
    dtype: Dtype = jnp.float32
    n_power_iterations: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        in_ch = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, in_ch, self.features), jnp.float32)
        # torch's SpectralNorm views weight as (out, -1); our kernel is
        # (kh, kw, in, out) -> transpose to (out, kh*kw*in)
        w_mat = kernel.transpose(3, 0, 1, 2).reshape(self.features, -1)
        u_var = self.variable(
            "spectral_stats", "u",
            lambda: jax.random.normal(
                self.make_rng("params") if self.has_rng("params")
                else jax.random.PRNGKey(0), (self.features,)))
        u = u_var.value
        for _ in range(self.n_power_iterations):
            v = w_mat.T @ u
            v = v / (jnp.linalg.norm(v) + 1e-12)
            u = w_mat @ v
            u = u / (jnp.linalg.norm(u) + 1e-12)
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
        sigma = u @ (w_mat @ v)
        if not self.is_initializing() and not self.is_mutable_collection(
                "spectral_stats"):
            pass  # inference: read-only u
        elif not self.is_initializing():
            u_var.value = u
        w_sn = (kernel / sigma).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w_sn, window_strides=self.strides,
            padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


# ---------------------------------------------------------------------------
# Conv2dBlock — the workhorse
# ---------------------------------------------------------------------------


class _ConvParams(nn.Module):
    """Declares conv kernel/bias with nn.Conv's exact param names & shapes.

    Used by Conv2dBlock's fused-upsample branch so that the fused and
    unfused code paths produce IDENTICAL parameter pytrees (checkpoints are
    interchangeable; name this module "Conv_0" to match nn.Conv auto-naming).
    """

    features: int
    kernel_size: Tuple[int, int]
    kernel_init: Callable = nn.initializers.he_normal()

    @nn.compact
    def __call__(self, in_ch: int):
        kernel = self.param("kernel", self.kernel_init,
                            self.kernel_size + (in_ch, self.features),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return kernel, bias


class _LNParams(nn.Module):
    """Declares MunitLayerNorm's affine params with identical names, shapes
    and initializers — name this module "MunitLayerNorm_0" so the fused
    upsample+LN path (ops/upsample_conv.py::upsample2x_conv5x5_ln_fused)
    produces the IDENTICAL parameter pytree to the separate-LN path
    (checkpoints interchangeable; same trick as _ConvParams)."""

    num_features: int

    @nn.compact
    def __call__(self):
        gamma = self.param("gamma", nn.initializers.uniform(scale=1.0),
                           (self.num_features,), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros,
                          (self.num_features,), jnp.float32)
        return gamma, beta


class Conv2dBlock(nn.Module):
    """pad -> conv -> norm -> activation (reference networks.py::Conv2dBlock).

    ``norm='adain'`` blocks take the (gamma, beta) pair as a call argument
    (functional AdaIN) instead of the reference's module-state assignment.

    ``upsample2x=True`` folds a preceding nearest-2x upsample (the
    reference decoder's nn.Upsample) into this block; with
    ``fuse_upsample=True`` (and a 5x5/s1/p2 conv) the phase-decomposed
    fast path from ops/upsample_conv.py runs — 9/25 the MACs and no
    upsampled intermediate in HBM — with an identical parameter tree.
    """

    out_dim: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    norm: str = "none"            # bn | in | ln | adain | sn | none
    activation: str = "relu"      # relu | lrelu | prelu | selu | tanh | none
    pad_type: str = "zero"        # reflect | replicate | zero
    kernel_init: Callable = nn.initializers.he_normal()
    dtype: Dtype = jnp.float32
    upsample2x: bool = False
    fuse_upsample: bool = True
    # per-object kernel choices (from Config via the model ctor) — module
    # attributes, not process globals, so two models with different
    # settings can't contaminate each other's traces.
    # use_pallas: the 3x3 resblock conv kernel (ops/pallas_conv.py);
    # use_pallas_norm: the fused instance-norm/AdaIN kernel — measured
    # SLOWER than XLA's fusion end-to-end (BASELINE.md), kept benchable.
    use_pallas: bool = False
    use_pallas_norm: bool = False
    # internal precision of the in/adain norms ("f32"|"mixed"|"bf16") —
    # see apply_instance_norm; ignored (== f32) when dtype is float32
    in_precision: str = "f32"
    # mean/var reduction scheme for the in/ln/adain stats ("two_pass" |
    # "one_pass") — see norm_mean_var; "one_pass" halves stats HBM traffic
    in_stats: str = "two_pass"
    # fold the reflect/replicate pad into the conv (ops/pad_conv.py):
    # zero-padded conv + exact border-strip splices, skipping the padded
    # HBM copy — measured 22% of the 7x7 final-stage time at 256px
    # (tools/bench_decoder_tail.py). Set on the generator's 7x7 stride-1
    # convs; identical parameter tree.
    fuse_pad: bool = False
    # boundary-conv engine override for the fuse_pad path (A/B surface;
    # "auto" = phase_fused when channel-starved + even H,W + fusable
    # norm/act, else strips; explicit: "phase_fused" | "phase" | "strips"
    # | "reference"). Composed end-to-end numbers are the only arbiter for
    # these (chained microbenches of the same engines disagree by 2x —
    # tools/bench_stage1.py vs the stage profile).
    boundary_engine: str = "auto"
    # interior engine of the fused upsample+conv (ops/upsample_conv.py):
    # "dilated" (default, one lhs_dilation=2 conv) | "phase" (3x3 conv with
    # 4x channels + d2s) | "ln_fused" (phase conv with the MUNIT LayerNorm
    # stats/affine/activation folded into the half-res phase layout, d2s
    # last — requires norm='ln', unquantized, non-pallas; falls back to
    # dilated otherwise). A/B surface; composed numbers only.
    upsample_engine: str = "dilated"
    # W8A8 int8 quantization of the conv (serving-only lever; ops/quant.py).
    # "none" | "w8a8" (dynamic per-image scales) | "w8a8_calib" (dynamic +
    # record running activation absmax into the "quant_stats" collection —
    # apply with mutable=["quant_stats"]) | "w8a8_static" (consume the
    # calibrated scales; no dynamic reduce — the fast mode, BASELINE.md).
    # Parameter tree is unchanged in every mode.
    quant: str = "none"

    def _quant_a_scale(self, x: jnp.ndarray) -> Optional[jnp.ndarray]:
        """Static-mode activation scale (None -> dynamic quantization).
        In calib mode, also fold this call's |x| max into the running stat."""
        if self.quant == "w8a8":
            return None
        stat = self.variable("quant_stats", "act_absmax",
                             lambda: jnp.zeros((), jnp.float32))
        if self.quant == "w8a8_calib":
            stat.value = jnp.maximum(
                stat.value, jnp.max(jnp.abs(x.astype(jnp.float32))))
            return None
        return stat.value / 127.0

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 adain_params: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None
                 ) -> jnp.ndarray:
        fused = (self.upsample2x and self.fuse_upsample
                 and self.norm != "sn" and self.kernel_size == 5
                 and self.stride == 1 and self.padding == 2)
        quanted = self.quant in ("w8a8", "w8a8_calib", "w8a8_static")
        if self.upsample2x and not fused:
            x = upsample_nearest_2x(x)

        # reference: use_bias = True except under 'bn' (MUNIT passes bias
        # always; nn.Conv2d default bias=True)
        if fused:
            from councilx.ops.upsample_conv import (
                upsample2x_conv5x5, upsample2x_conv5x5_ln_fused)

            kernel, bias = _ConvParams(
                features=self.out_dim, kernel_size=(5, 5),
                kernel_init=self.kernel_init, name="Conv_0")(x.shape[-1])
            ln_fusable = (self.upsample_engine == "ln_fused"
                          and self.norm == "ln" and not quanted
                          and not self.use_pallas
                          and not self.use_pallas_norm
                          and self.activation != "prelu")
            if ln_fusable:
                gamma, beta = _LNParams(num_features=self.out_dim,
                                        name="MunitLayerNorm_0")()
                return upsample2x_conv5x5_ln_fused(
                    x.astype(self.dtype), kernel.astype(self.dtype), bias,
                    self.pad_type, gamma, beta,
                    ln_precision=self.in_precision,
                    ln_stats=self.in_stats,
                    act=make_activation(self.activation))
            # pad2d only replicates/reflects values, so max|pad(x)| ==
            # max|x|: the block-input scale is exact for the padded conv
            a_scale = self._quant_a_scale(x) if quanted else None
            y = upsample2x_conv5x5(x.astype(self.dtype),
                                   kernel.astype(self.dtype),
                                   bias, self.pad_type,
                                   use_pallas=self.use_pallas,
                                   quant=quanted, a_scale=a_scale,
                                   engine=("dilated"
                                           if self.upsample_engine
                                           == "ln_fused"
                                           else self.upsample_engine))
        elif self.norm == "sn":
            x = pad2d(x, self.padding, self.pad_type)
            y = SpectralConv(
                features=self.out_dim,
                kernel_size=(self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride),
                kernel_init=self.kernel_init, dtype=self.dtype)(x)
        elif quanted:
            from councilx.ops.quant import conv_w8a8

            a_scale = self._quant_a_scale(x)
            x = pad2d(x, self.padding, self.pad_type)
            kernel, bias = _ConvParams(
                features=self.out_dim,
                kernel_size=(self.kernel_size, self.kernel_size),
                kernel_init=self.kernel_init, name="Conv_0")(x.shape[-1])
            y = conv_w8a8(x, kernel, bias, stride=self.stride,
                          out_dtype=self.dtype, a_scale=a_scale)
        elif (self.fuse_pad and self.stride == 1
              and self.kernel_size % 2 == 1
              and self.padding == self.kernel_size // 2):
            from councilx.ops.pad_conv import (conv2d_same,
                                               conv2d_same_phase_fused)

            kernel, bias = _ConvParams(
                features=self.out_dim,
                kernel_size=(self.kernel_size, self.kernel_size),
                kernel_init=self.kernel_init, name="Conv_0")(x.shape[-1])
            xd = x.astype(self.dtype)
            kd = kernel.astype(self.dtype)
            # channel-starved + even H,W -> phase engine; fold the IN and
            # activation into the half-res phase layout so depth-to-space
            # is the only full-res pass (round-4 stage profile: the generic
            # tail's two extra full-res round-trips were ~75% of the first
            # conv stage's 50 ms; ops/pad_conv.py)
            starved = x.shape[-1] <= 16 or self.out_dim <= 16
            # self.quant == "none" restates what the branch order already
            # guarantees (the `elif quanted` branch runs first): the fused
            # phase path has no int8 variant, so quantization must win if
            # both are ever requested — keep the invariant in the gate so
            # it survives branch reordering.
            fusable = (starved and self.kernel_size > 1
                       and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
                       and self.norm in ("in", "none")
                       and self.quant == "none"
                       and not self.use_pallas_norm
                       and self.activation != "prelu")
            eng = self.boundary_engine
            if fusable and eng in ("auto", "phase_fused"):
                return conv2d_same_phase_fused(
                    xd, kd, bias, self.pad_type, norm=self.norm,
                    in_precision=self.in_precision,
                    in_stats=self.in_stats,
                    act=make_activation(self.activation))
            y = conv2d_same(xd, kd, bias, self.pad_type,
                            engine="auto" if eng == "phase_fused" else eng)
        else:
            x = pad2d(x, self.padding, self.pad_type)
            y = None
            if (self.use_pallas and self.kernel_size == 3
                    and self.stride == 1 and self.padding == 1):
                from councilx.ops.pallas_conv import (conv3x3_eligible,
                                                      conv3x3_valid)
                kshape = (3, 3, x.shape[-1], self.out_dim)
                if conv3x3_eligible(x.shape, kshape,
                                    jnp.dtype(self.dtype).itemsize):
                    # identical parameter tree to the nn.Conv branch
                    kernel, bias = _ConvParams(
                        features=self.out_dim, kernel_size=(3, 3),
                        kernel_init=self.kernel_init,
                        name="Conv_0")(x.shape[-1])
                    y = (conv3x3_valid(x.astype(self.dtype),
                                       kernel.astype(self.dtype))
                         + bias.astype(self.dtype))
            if y is None:
                y = nn.Conv(
                    features=self.out_dim,
                    kernel_size=(self.kernel_size, self.kernel_size),
                    strides=(self.stride, self.stride),
                    padding="VALID", use_bias=True,
                    kernel_init=self.kernel_init,
                    bias_init=nn.initializers.zeros,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="Conv_0")(x)

        if self.norm == "in":
            if self.use_pallas_norm:
                from councilx.ops.pallas_norm import instance_norm_pallas
                y = instance_norm_pallas(y)
            else:
                y = apply_instance_norm(y.astype(self.dtype),
                                        self.in_precision,
                                        stats=self.in_stats)
        elif self.norm == "ln":
            y = MunitLayerNorm(num_features=self.out_dim, dtype=self.dtype,
                               precision=self.in_precision,
                               stats=self.in_stats)(y)
        elif self.norm == "bn":
            # batch norm (unused by the shipped configs; MUNIT option kept)
            y = nn.BatchNorm(use_running_average=False, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype)(y)
        elif self.norm == "adain":
            if adain_params is None:
                raise ValueError("adain norm requires adain_params")
            gamma, beta = adain_params
            if self.use_pallas_norm:
                from councilx.ops.pallas_norm import instance_norm_pallas
                y = instance_norm_pallas(y, gamma.astype(jnp.float32),
                                         beta.astype(jnp.float32))
            else:
                y = apply_adain(y.astype(self.dtype), gamma, beta,
                                self.in_precision, stats=self.in_stats)
        elif self.norm in ("none", "sn"):
            pass
        else:
            raise ValueError(f"unknown norm: {self.norm}")

        if self.activation == "prelu":
            alpha = self.param("prelu_alpha", nn.initializers.constant(0.25),
                               (1,), jnp.float32)
            y = jnp.where(y >= 0, y, alpha.astype(y.dtype) * y)
        else:
            act = make_activation(self.activation)
            if act is not None:
                y = act(y)
        return y


class LinearBlock(nn.Module):
    """fc -> norm -> activation (reference networks.py::LinearBlock)."""

    out_dim: int
    norm: str = "none"
    activation: str = "relu"
    kernel_init: Callable = nn.initializers.he_normal()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.Dense(self.out_dim, use_bias=True,
                     kernel_init=self.kernel_init,
                     bias_init=nn.initializers.zeros,
                     dtype=self.dtype, param_dtype=jnp.float32)(x)
        if self.norm == "in":
            # 1d instance norm over feature axis per sample (MUNIT option)
            mean = jnp.mean(y, axis=-1, keepdims=True)
            var = jnp.var(y, axis=-1, keepdims=True)
            y = (y - mean) * jax.lax.rsqrt(var + 1e-5)
        elif self.norm == "ln":
            y = MunitLayerNorm(num_features=self.out_dim, dtype=self.dtype)(y)
        elif self.norm != "none":
            raise ValueError(f"unknown norm for LinearBlock: {self.norm}")
        act = make_activation(self.activation)
        if act is not None:
            y = act(y)
        return y


# ---------------------------------------------------------------------------
# residual stacks
# ---------------------------------------------------------------------------


class ResBlock(nn.Module):
    """Two 3x3 Conv2dBlocks with additive skip (networks.py::ResBlock).

    With ``norm='adain'`` the call takes a list of two (gamma, beta) pairs —
    one per conv — consumed in definition order, matching the reference's
    ``assign_adain_params`` traversal order.
    """

    dim: int
    norm: str = "in"
    activation: str = "relu"
    pad_type: str = "zero"
    kernel_init: Callable = nn.initializers.he_normal()
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    use_pallas_norm: bool = False
    in_precision: str = "f32"
    in_stats: str = "two_pass"
    quant: str = "none"
    # fold the reflect pad into the 3x3 convs (ops/pad_conv.py strips
    # engine: zero-padded conv + exact border splices — no padded HBM
    # copy). A/B surface (Config.resblock_fuse_pad); exact up to
    # summation order, so off in parity mode.
    fuse_pad: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 adain_params: Optional[Sequence] = None) -> jnp.ndarray:
        p0 = adain_params[0] if adain_params is not None else None
        p1 = adain_params[1] if adain_params is not None else None
        y = Conv2dBlock(self.dim, 3, 1, 1, norm=self.norm,
                        activation=self.activation, pad_type=self.pad_type,
                        kernel_init=self.kernel_init, dtype=self.dtype,
                        use_pallas=self.use_pallas,
                        use_pallas_norm=self.use_pallas_norm,
                        in_precision=self.in_precision,
                        in_stats=self.in_stats,
                        fuse_pad=self.fuse_pad,
                        quant=self.quant)(x, p0)
        y = Conv2dBlock(self.dim, 3, 1, 1, norm=self.norm,
                        activation="none", pad_type=self.pad_type,
                        kernel_init=self.kernel_init, dtype=self.dtype,
                        use_pallas=self.use_pallas,
                        use_pallas_norm=self.use_pallas_norm,
                        in_precision=self.in_precision,
                        in_stats=self.in_stats,
                        fuse_pad=self.fuse_pad,
                        quant=self.quant)(y, p1)
        return x + y


class ResBlocks(nn.Module):
    """Stack of ResBlocks (networks.py::ResBlocks)."""

    num_blocks: int
    dim: int
    norm: str = "in"
    activation: str = "relu"
    pad_type: str = "zero"
    kernel_init: Callable = nn.initializers.he_normal()
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    use_pallas_norm: bool = False
    in_precision: str = "f32"
    in_stats: str = "two_pass"
    quant: str = "none"
    fuse_pad: bool = False   # see ResBlock.fuse_pad

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 adain_params: Optional[Sequence] = None) -> jnp.ndarray:
        for i in range(self.num_blocks):
            p = (adain_params[2 * i: 2 * i + 2]
                 if adain_params is not None else None)
            x = ResBlock(self.dim, norm=self.norm,
                         activation=self.activation, pad_type=self.pad_type,
                         kernel_init=self.kernel_init, dtype=self.dtype,
                         use_pallas=self.use_pallas,
                         use_pallas_norm=self.use_pallas_norm,
                         in_precision=self.in_precision,
                         in_stats=self.in_stats,
                         fuse_pad=self.fuse_pad,
                         quant=self.quant)(x, p)
        return x


class MLP(nn.Module):
    """Style-code -> AdaIN-parameter MLP (reference networks.py::MLP).

    n_blk layers total: in->dim (activ), (n_blk-2) x dim->dim (activ),
    dim->out (no activation). norm='none' in all shipped configs.
    """

    out_dim: int
    dim: int = 256
    n_blk: int = 3
    norm: str = "none"
    activation: str = "relu"
    kernel_init: Callable = nn.initializers.he_normal()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.reshape(x.shape[0], -1)
        x = LinearBlock(self.dim, norm=self.norm, activation=self.activation,
                        kernel_init=self.kernel_init, dtype=self.dtype)(x)
        for _ in range(self.n_blk - 2):
            x = LinearBlock(self.dim, norm=self.norm,
                            activation=self.activation,
                            kernel_init=self.kernel_init, dtype=self.dtype)(x)
        x = LinearBlock(self.out_dim, norm="none", activation="none",
                        kernel_init=self.kernel_init, dtype=self.dtype)(x)
        return x


# ---------------------------------------------------------------------------
# pooling — torch-compatible avg pool used by MsImageDis's pyramid
# ---------------------------------------------------------------------------


def avg_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """AvgPool2d(3, stride=2, padding=1, count_include_pad=False) on NHWC.

    Reference parity: networks.py::MsImageDis.downsample. The
    count_include_pad=False semantics mean border windows divide by the number
    of *valid* (non-pad) elements, which reduce_window + a ones-count gives.
    """
    dims = (1, 3, 3, 1)
    strides = (1, 2, 2, 1)
    pads = ((0, 0), (1, 1), (1, 1), (0, 0))
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims, strides, pads)
    ones = jnp.ones(x.shape[:3] + (1,), dtype=x.dtype)
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, dims, strides, pads)
    return summed / counts


def adaptive_avg_pool_1(x: jnp.ndarray) -> jnp.ndarray:
    """AdaptiveAvgPool2d(1) on NHWC -> (B, 1, 1, C)."""
    return jnp.mean(x, axis=(1, 2), keepdims=True)


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """nn.Upsample(scale_factor=2) (nearest) on NHWC."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)
