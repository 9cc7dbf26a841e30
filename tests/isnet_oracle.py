"""Torch mirror of the DIS ``ISNetDIS`` (isnet-general-use) layout.

Oracle for ``utils/torch_convert.convert_isnet`` — implements the public DIS
repo architecture (REBNCONV / RSU / RSU4F / myrebnconv stem / side heads)
with checkpoint-exact state-dict keys, channels parameterised so tiny
configurations run fast on CPU. Reference consumer:
/root/reference/utils/rmbg_for_black_bg.py:26 (rembg isnet-general-use).
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


def _up_like(src, tar):
    return F.interpolate(src, size=tar.shape[2:], mode="bilinear",
                         align_corners=False)


class REBNCONV(nn.Module):
    def __init__(self, in_ch, out_ch, dirate=1):
        super().__init__()
        self.conv_s1 = nn.Conv2d(in_ch, out_ch, 3, padding=dirate,
                                 dilation=dirate)
        self.bn_s1 = nn.BatchNorm2d(out_ch)

    def forward(self, x):
        return F.relu(self.bn_s1(self.conv_s1(x)))


class RSU(nn.Module):
    """RSU{height}: named rebnconvin / rebnconv1..H / rebnconv{1..H-1}d."""

    def __init__(self, height, in_ch, mid_ch, out_ch):
        super().__init__()
        self.height = height
        self.rebnconvin = REBNCONV(in_ch, out_ch)
        self.rebnconv1 = REBNCONV(out_ch, mid_ch)
        for i in range(2, height):
            setattr(self, f"rebnconv{i}", REBNCONV(mid_ch, mid_ch))
        setattr(self, f"rebnconv{height}", REBNCONV(mid_ch, mid_ch, dirate=2))
        for i in range(height - 1, 1, -1):
            setattr(self, f"rebnconv{i}d", REBNCONV(mid_ch * 2, mid_ch))
        self.rebnconv1d = REBNCONV(mid_ch * 2, out_ch)
        self.pool = nn.MaxPool2d(2, stride=2, ceil_mode=True)

    def forward(self, x):
        hxin = self.rebnconvin(x)
        encs = [self.rebnconv1(hxin)]
        h = encs[0]
        for i in range(2, self.height):
            h = getattr(self, f"rebnconv{i}")(self.pool(h))
            encs.append(h)
        h = getattr(self, f"rebnconv{self.height}")(h)
        for i in range(self.height - 1, 0, -1):
            enc = encs[i - 1]
            if h.shape[2:] != enc.shape[2:]:
                h = _up_like(h, enc)
            h = getattr(self, f"rebnconv{i}d")(torch.cat([h, enc], dim=1))
        return h + hxin


class RSU4F(nn.Module):
    def __init__(self, in_ch, mid_ch, out_ch):
        super().__init__()
        self.rebnconvin = REBNCONV(in_ch, out_ch)
        self.rebnconv1 = REBNCONV(out_ch, mid_ch, 1)
        self.rebnconv2 = REBNCONV(mid_ch, mid_ch, 2)
        self.rebnconv3 = REBNCONV(mid_ch, mid_ch, 4)
        self.rebnconv4 = REBNCONV(mid_ch, mid_ch, 8)
        self.rebnconv3d = REBNCONV(mid_ch * 2, mid_ch, 4)
        self.rebnconv2d = REBNCONV(mid_ch * 2, mid_ch, 2)
        self.rebnconv1d = REBNCONV(mid_ch * 2, out_ch, 1)

    def forward(self, x):
        hxin = self.rebnconvin(x)
        h1 = self.rebnconv1(hxin)
        h2 = self.rebnconv2(h1)
        h3 = self.rebnconv3(h2)
        h4 = self.rebnconv4(h3)
        d3 = self.rebnconv3d(torch.cat([h4, h3], 1))
        d2 = self.rebnconv2d(torch.cat([d3, h2], 1))
        d1 = self.rebnconv1d(torch.cat([d2, h1], 1))
        return d1 + hxin


class _MyRebnconv(nn.Module):
    """DIS 'myrebnconv' stem: keys conv/bn (not conv_s1/bn_s1)."""

    def __init__(self, in_ch, out_ch, stride=2):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch, 3, stride=stride, padding=1)
        self.bn = nn.BatchNorm2d(out_ch)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class ISNetDIS(nn.Module):
    def __init__(self, in_ch=3, stem=64,
                 mids=(32, 32, 64, 128, 256, 256),
                 outs=(64, 128, 256, 512, 512, 512),
                 dec_mids=(16, 32, 64, 128, 256),
                 dec_outs=(64, 64, 128, 256, 512)):
        super().__init__()
        m, o, dm, do = mids, outs, dec_mids, dec_outs
        self.conv_in = _MyRebnconv(in_ch, stem, stride=2)
        self.pool = nn.MaxPool2d(2, stride=2, ceil_mode=True)
        self.stage1 = RSU(7, stem, m[0], o[0])
        self.stage2 = RSU(6, o[0], m[1], o[1])
        self.stage3 = RSU(5, o[1], m[2], o[2])
        self.stage4 = RSU(4, o[2], m[3], o[3])
        self.stage5 = RSU4F(o[3], m[4], o[4])
        self.stage6 = RSU4F(o[4], m[5], o[5])
        self.stage5d = RSU4F(o[5] + o[4], dm[4], do[4])
        self.stage4d = RSU(4, do[4] + o[3], dm[3], do[3])
        self.stage3d = RSU(5, do[3] + o[2], dm[2], do[2])
        self.stage2d = RSU(6, do[2] + o[1], dm[1], do[1])
        self.stage1d = RSU(7, do[1] + o[0], dm[0], do[0])
        self.side1 = nn.Conv2d(do[0], 1, 3, padding=1)
        self.side2 = nn.Conv2d(do[1], 1, 3, padding=1)
        self.side3 = nn.Conv2d(do[2], 1, 3, padding=1)
        self.side4 = nn.Conv2d(do[3], 1, 3, padding=1)
        self.side5 = nn.Conv2d(do[4], 1, 3, padding=1)
        self.side6 = nn.Conv2d(o[5], 1, 3, padding=1)

    def forward(self, x):
        hxin = self.conv_in(x)
        s1 = self.stage1(hxin)
        s2 = self.stage2(self.pool(s1))
        s3 = self.stage3(self.pool(s2))
        s4 = self.stage4(self.pool(s3))
        s5 = self.stage5(self.pool(s4))
        s6 = self.stage6(self.pool(s5))
        d5 = self.stage5d(torch.cat([_up_like(s6, s5), s5], 1))
        d4 = self.stage4d(torch.cat([_up_like(d5, s4), s4], 1))
        d3 = self.stage3d(torch.cat([_up_like(d4, s3), s3], 1))
        d2 = self.stage2d(torch.cat([_up_like(d3, s2), s2], 1))
        d1 = self.stage1d(torch.cat([_up_like(d2, s1), s1], 1))
        out = _up_like(self.side1(d1), x)
        return torch.sigmoid(out)[:, 0]
