"""PyTorch oracle implementing the reference (MUNIT / Council-GAN) module
semantics, used ONLY as a golden-tensor source in tests.

This is written from the publicly documented MUNIT architecture (arXiv
1804.04732; networks.py of NVlabs/MUNIT, which Council-GAN forks) — the
reference mount was empty, so parity is certified against these semantics:
pad -> conv -> norm -> activation, InstanceNorm2d(affine=False, eps=1e-5),
the custom LayerNorm with (x-mean)/(std_unbiased+eps), AdaIN driven by
sequential assign_adain_params slicing (bias half first), nearest upsample,
AvgPool2d(3,2,1,count_include_pad=False) pyramids, LSGAN losses.

State-dict naming deliberately matches MUNIT (model.N.conv.weight, cnns.S.L.*)
so councilx.ckpt.torch_convert works unchanged on real reference checkpoints.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class LayerNormT(nn.Module):
    def __init__(self, num_features, eps=1e-5, affine=True):
        super().__init__()
        self.num_features = num_features
        self.eps = eps
        self.affine = affine
        if affine:
            self.gamma = nn.Parameter(torch.Tensor(num_features).uniform_())
            self.beta = nn.Parameter(torch.zeros(num_features))

    def forward(self, x):
        shape = [-1] + [1] * (x.dim() - 1)
        mean = x.reshape(x.size(0), -1).mean(1).view(*shape)
        std = x.reshape(x.size(0), -1).std(1).view(*shape)
        x = (x - mean) / (std + self.eps)
        if self.affine:
            shape = [1, -1] + [1] * (x.dim() - 2)
            x = x * self.gamma.view(*shape) + self.beta.view(*shape)
        return x


class AdaptiveInstanceNorm2dT(nn.Module):
    def __init__(self, num_features, eps=1e-5, momentum=0.1):
        super().__init__()
        self.num_features = num_features
        self.eps = eps
        self.momentum = momentum
        self.weight = None
        self.bias = None
        self.register_buffer("running_mean", torch.zeros(num_features))
        self.register_buffer("running_var", torch.ones(num_features))

    def forward(self, x):
        assert self.weight is not None, "assign adain params first"
        b, c = x.size(0), x.size(1)
        running_mean = self.running_mean.repeat(b)
        running_var = self.running_var.repeat(b)
        x_reshaped = x.contiguous().view(1, b * c, *x.size()[2:])
        out = F.batch_norm(x_reshaped, running_mean, running_var,
                           self.weight, self.bias, True, self.momentum,
                           self.eps)
        return out.view(b, c, *x.size()[2:])


class Conv2dBlockT(nn.Module):
    def __init__(self, input_dim, output_dim, kernel_size, stride, padding=0,
                 norm="none", activation="relu", pad_type="zero"):
        super().__init__()
        self.use_bias = True
        if pad_type == "reflect":
            self.pad = nn.ReflectionPad2d(padding)
        elif pad_type == "replicate":
            self.pad = nn.ReplicationPad2d(padding)
        elif pad_type == "zero":
            self.pad = nn.ZeroPad2d(padding)
        else:
            raise ValueError(pad_type)
        norm_dim = output_dim
        if norm == "bn":
            self.norm = nn.BatchNorm2d(norm_dim)
        elif norm == "in":
            self.norm = nn.InstanceNorm2d(norm_dim)
        elif norm == "ln":
            self.norm = LayerNormT(norm_dim)
        elif norm == "adain":
            self.norm = AdaptiveInstanceNorm2dT(norm_dim)
        elif norm == "none":
            self.norm = None
        else:
            raise ValueError(norm)
        if activation == "relu":
            self.activation = nn.ReLU(inplace=True)
        elif activation == "lrelu":
            self.activation = nn.LeakyReLU(0.2, inplace=True)
        elif activation == "prelu":
            self.activation = nn.PReLU()
        elif activation == "selu":
            self.activation = nn.SELU(inplace=True)
        elif activation == "tanh":
            self.activation = nn.Tanh()
        elif activation == "none":
            self.activation = None
        else:
            raise ValueError(activation)
        self.conv = nn.Conv2d(input_dim, output_dim, kernel_size, stride,
                              bias=self.use_bias)

    def forward(self, x):
        x = self.conv(self.pad(x))
        if self.norm:
            x = self.norm(x)
        if self.activation:
            x = self.activation(x)
        return x


class LinearBlockT(nn.Module):
    def __init__(self, input_dim, output_dim, norm="none", activation="relu"):
        super().__init__()
        self.fc = nn.Linear(input_dim, output_dim, bias=True)
        self.norm = None
        if norm == "ln":
            self.norm = LayerNormT(output_dim)
        elif norm != "none":
            raise ValueError(norm)
        if activation == "relu":
            self.activation = nn.ReLU(inplace=True)
        elif activation == "none":
            self.activation = None
        else:
            raise ValueError(activation)

    def forward(self, x):
        out = self.fc(x)
        if self.norm:
            out = self.norm(out)
        if self.activation:
            out = self.activation(out)
        return out


class ResBlockT(nn.Module):
    def __init__(self, dim, norm="in", activation="relu", pad_type="zero"):
        super().__init__()
        self.model = nn.Sequential(
            Conv2dBlockT(dim, dim, 3, 1, 1, norm=norm, activation=activation,
                         pad_type=pad_type),
            Conv2dBlockT(dim, dim, 3, 1, 1, norm=norm, activation="none",
                         pad_type=pad_type),
        )

    def forward(self, x):
        return x + self.model(x)


class ResBlocksT(nn.Module):
    def __init__(self, num_blocks, dim, norm="in", activation="relu",
                 pad_type="zero"):
        super().__init__()
        self.model = nn.Sequential(*[
            ResBlockT(dim, norm=norm, activation=activation,
                      pad_type=pad_type) for _ in range(num_blocks)])

    def forward(self, x):
        return self.model(x)


class MLPT(nn.Module):
    def __init__(self, input_dim, output_dim, dim, n_blk, norm="none",
                 activ="relu"):
        super().__init__()
        layers = [LinearBlockT(input_dim, dim, norm=norm, activation=activ)]
        for _ in range(n_blk - 2):
            layers += [LinearBlockT(dim, dim, norm=norm, activation=activ)]
        layers += [LinearBlockT(dim, output_dim, norm="none",
                                activation="none")]
        self.model = nn.Sequential(*layers)

    def forward(self, x):
        return self.model(x.view(x.size(0), -1))


class ContentEncoderT(nn.Module):
    def __init__(self, n_downsample, n_res, input_dim, dim, norm, activ,
                 pad_type):
        super().__init__()
        layers = [Conv2dBlockT(input_dim, dim, 7, 1, 3, norm=norm,
                               activation=activ, pad_type=pad_type)]
        for _ in range(n_downsample):
            layers += [Conv2dBlockT(dim, 2 * dim, 4, 2, 1, norm=norm,
                                    activation=activ, pad_type=pad_type)]
            dim *= 2
        layers += [ResBlocksT(n_res, dim, norm=norm, activation=activ,
                              pad_type=pad_type)]
        self.model = nn.Sequential(*layers)
        self.output_dim = dim

    def forward(self, x):
        return self.model(x)


class StyleEncoderT(nn.Module):
    def __init__(self, n_downsample, input_dim, dim, style_dim, norm, activ,
                 pad_type):
        super().__init__()
        layers = [Conv2dBlockT(input_dim, dim, 7, 1, 3, norm=norm,
                               activation=activ, pad_type=pad_type)]
        for _ in range(2):
            layers += [Conv2dBlockT(dim, 2 * dim, 4, 2, 1, norm=norm,
                                    activation=activ, pad_type=pad_type)]
            dim *= 2
        for _ in range(n_downsample - 2):
            layers += [Conv2dBlockT(dim, dim, 4, 2, 1, norm=norm,
                                    activation=activ, pad_type=pad_type)]
        layers += [nn.AdaptiveAvgPool2d(1)]
        layers += [nn.Conv2d(dim, style_dim, 1, 1, 0)]
        self.model = nn.Sequential(*layers)
        self.output_dim = dim

    def forward(self, x):
        return self.model(x)


class DecoderT(nn.Module):
    def __init__(self, n_upsample, n_res, dim, output_dim, res_norm="adain",
                 activ="relu", pad_type="zero"):
        super().__init__()
        layers = [ResBlocksT(n_res, dim, res_norm, activ, pad_type=pad_type)]
        for _ in range(n_upsample):
            layers += [nn.Upsample(scale_factor=2),
                       Conv2dBlockT(dim, dim // 2, 5, 1, 2, norm="ln",
                                    activation=activ, pad_type=pad_type)]
            dim //= 2
        layers += [Conv2dBlockT(dim, output_dim, 7, 1, 3, norm="none",
                                activation="tanh", pad_type=pad_type)]
        self.model = nn.Sequential(*layers)

    def forward(self, x):
        return self.model(x)


class AdaINGenT(nn.Module):
    def __init__(self, input_dim, dim=64, style_dim=8, n_downsample=2,
                 n_res=4, activ="relu", pad_type="reflect", mlp_dim=256,
                 output_dim=None):
        super().__init__()
        self.enc_content = ContentEncoderT(n_downsample, n_res, input_dim,
                                           dim, "in", activ, pad_type)
        self.enc_style = StyleEncoderT(n_downsample, input_dim, dim,
                                       style_dim, "none", activ, pad_type)
        out = output_dim if output_dim is not None else input_dim
        self.dec = DecoderT(n_downsample, n_res, self.enc_content.output_dim,
                            out, res_norm="adain", activ=activ,
                            pad_type=pad_type)
        self.mlp = MLPT(style_dim, self.get_num_adain_params(self.dec),
                        mlp_dim, 3, norm="none", activ=activ)

    def get_num_adain_params(self, model):
        num = 0
        for m in model.modules():
            if m.__class__.__name__ == "AdaptiveInstanceNorm2dT":
                num += 2 * m.num_features
        return num

    def assign_adain_params(self, adain_params, model):
        for m in model.modules():
            if m.__class__.__name__ == "AdaptiveInstanceNorm2dT":
                mean = adain_params[:, :m.num_features]
                std = adain_params[:, m.num_features:2 * m.num_features]
                m.bias = mean.contiguous().view(-1)
                m.weight = std.contiguous().view(-1)
                if adain_params.size(1) > 2 * m.num_features:
                    adain_params = adain_params[:, 2 * m.num_features:]

    def encode(self, x):
        return self.enc_content(x), self.enc_style(x)

    def decode(self, content, style):
        adain_params = self.mlp(style)
        self.assign_adain_params(adain_params, self.dec)
        return self.dec(content)

    def forward(self, x):
        content, style = self.encode(x)
        return self.decode(content, style)


class MsImageDisT(nn.Module):
    def __init__(self, input_dim, n_layer=4, dim=64, norm="none",
                 activ="lrelu", num_scales=3, pad_type="reflect"):
        super().__init__()
        self.n_layer = n_layer
        self.dim = dim
        self.norm = norm
        self.activ = activ
        self.num_scales = num_scales
        self.pad_type = pad_type
        self.input_dim = input_dim
        self.downsample = nn.AvgPool2d(3, stride=2, padding=[1, 1],
                                       count_include_pad=False)
        self.cnns = nn.ModuleList(
            [self._make_net() for _ in range(num_scales)])

    def _make_net(self):
        dim = self.dim
        cnn_x = [Conv2dBlockT(self.input_dim, dim, 4, 2, 1, norm="none",
                              activation=self.activ, pad_type=self.pad_type)]
        for _ in range(self.n_layer - 1):
            cnn_x += [Conv2dBlockT(dim, dim * 2, 4, 2, 1, norm=self.norm,
                                   activation=self.activ,
                                   pad_type=self.pad_type)]
            dim *= 2
        cnn_x += [nn.Conv2d(dim, 1, 1, 1, 0)]
        return nn.Sequential(*cnn_x)

    def forward(self, x):
        outputs = []
        for model in self.cnns:
            outputs.append(model(x))
            x = self.downsample(x)
        return outputs
