"""Independent torch implementation of MONAI's BasicUNet topology, used only
as a golden reference for testing the JAX model + weight converter.

Written from MONAI's documented architecture (monai.networks.nets.BasicUNet:
TwoConv / Down / UpCat blocks, Convolution with adn_ordering='NDA',
InstanceNorm affine, mish activation, deconv upsampling) so that its
state_dict key names match real reference checkpoints
(reference: inference/inference.py:190-222). NOT part of the framework.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class _ADN(nn.Module):
    def __init__(self, channels: int, dropout: float):
        super().__init__()
        self.N = nn.InstanceNorm3d(channels, affine=True)
        self.D = nn.Dropout(dropout)
        self.A = nn.Mish()

    def forward(self, x):
        return self.A(self.D(self.N(x)))


class _Convolution(nn.Module):
    """conv → ADN, like monai.networks.blocks.Convolution (adn 'NDA')."""

    def __init__(self, cin: int, cout: int, dropout: float):
        super().__init__()
        self.conv = nn.Conv3d(cin, cout, kernel_size=3, padding=1, bias=True)
        self.adn = _ADN(cout, dropout)

    def forward(self, x):
        return self.adn(self.conv(x))


class _TwoConv(nn.Module):
    def __init__(self, cin: int, cmid: int, cout: int, dropout: float):
        super().__init__()
        self.conv_0 = _Convolution(cin, cmid, dropout)
        self.conv_1 = _Convolution(cmid, cout, dropout)

    def forward(self, x):
        return self.conv_1(self.conv_0(x))


class _Down(nn.Module):
    def __init__(self, cin: int, cout: int, dropout: float):
        super().__init__()
        self.max_pooling = nn.MaxPool3d(2)
        self.convs = _TwoConv(cin, cout, cout, dropout)

    def forward(self, x):
        return self.convs(self.max_pooling(x))


class _Upsample(nn.Module):
    def __init__(self, cin: int, cout: int):
        super().__init__()
        self.deconv = nn.ConvTranspose3d(cin, cout, kernel_size=2, stride=2)

    def forward(self, x):
        return self.deconv(x)


class _UpCat(nn.Module):
    def __init__(self, cin: int, c_skip: int, cout: int, dropout: float, halves=True):
        super().__init__()
        c_up = cin // 2 if halves else cin
        self.upsample = _Upsample(cin, c_up)
        self.convs = _TwoConv(c_skip + c_up, cout, cout, dropout)

    def forward(self, x, x_e):
        x_0 = self.upsample(x)
        dims = len(x.shape) - 2
        sp = [0] * (dims * 2)
        for i in range(dims):
            if x_e.shape[-i - 1] != x_0.shape[-i - 1]:
                sp[i * 2 + 1] = 1
        if any(sp):
            x_0 = F.pad(x_0, sp, "replicate")
        return self.convs(torch.cat([x_e, x_0], dim=1))


class TorchBasicUNet(nn.Module):
    """state_dict-compatible with MONAI BasicUNet(3d, features=f, act=mish)."""

    def __init__(
        self,
        in_channels: int = 1,
        out_channels: int = 1,
        features=(32, 32, 64, 128, 256, 32),
        dropout: float = 0.1,
    ):
        super().__init__()
        f = features
        self.conv_0 = _TwoConv(in_channels, f[0], f[0], dropout)
        self.down_1 = _Down(f[0], f[1], dropout)
        self.down_2 = _Down(f[1], f[2], dropout)
        self.down_3 = _Down(f[2], f[3], dropout)
        self.down_4 = _Down(f[3], f[4], dropout)
        self.upcat_4 = _UpCat(f[4], f[3], f[3], dropout)
        self.upcat_3 = _UpCat(f[3], f[2], f[2], dropout)
        self.upcat_2 = _UpCat(f[2], f[1], f[1], dropout)
        self.upcat_1 = _UpCat(f[1], f[0], f[5], dropout, halves=False)
        self.final_conv = nn.Conv3d(f[5], out_channels, kernel_size=1)

    def forward(self, x):
        x0 = self.conv_0(x)
        x1 = self.down_1(x0)
        x2 = self.down_2(x1)
        x3 = self.down_3(x2)
        x4 = self.down_4(x3)
        u4 = self.upcat_4(x4, x3)
        u3 = self.upcat_3(u4, x2)
        u2 = self.upcat_2(u3, x1)
        u1 = self.upcat_1(u2, x0)
        return self.final_conv(u1)
