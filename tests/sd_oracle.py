"""Minimal torch mirrors of the diffusers SD stack, used as conversion oracles.

diffusers is not installed in this environment, so ``utils/sd_convert.py``
could previously only be checked by synthesized-layout round-trips — which
cannot catch semantic drift (wrong eps, wrong padding, wrong residual order).
These modules re-implement the PUBLIC diffusers forward semantics
(UNet2DConditionModel / AutoencoderKL / ControlNetModel at SD-2 class
configuration) in plain torch with state-dict keys named exactly as the
released checkpoints name them, so the converters can be validated
numerically end-to-end — the same technique as tests/ref_oracle.py.

Semantics mirrored (diffusers >= 0.20 layout):
- ResnetBlock2D: GN(32, eps 1e-5) -> SiLU -> conv1 -> + time_emb_proj(SiLU(t))
  -> GN -> SiLU -> conv2, conv_shortcut 1x1 when channels change;
- Transformer2DModel: GN(32, eps 1e-6) -> linear proj_in ->
  BasicTransformerBlocks (LN eps 1e-5; attn1 self, attn2 cross, GEGLU ff) ->
  linear proj_out -> + residual;
- Downsample2D: UNet variant conv s2 pad 1; VAE Encoder variant conv s2 pad 0
  with manual (0,1,0,1) right/bottom padding;
- Upsample2D: nearest x2 -> conv 3x3 pad 1;
- Timesteps: half-dim exp ramp, flip_sin_to_cos=True, freq_shift=0;
- ControlNetModel: UNet down+mid clone, ControlNetConditioningEmbedding
  (channel change on the stride-2 convs), zero convs per skip + mid.

Consumers: tests/test_sd_oracle_parity.py.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def timestep_embedding(t: torch.Tensor, dim: int) -> torch.Tensor:
    half = dim // 2
    freqs = torch.exp(-math.log(10000.0) * torch.arange(half,
                                                        dtype=torch.float32)
                      / half)
    ang = t.float()[:, None] * freqs[None]
    return torch.cat([torch.cos(ang), torch.sin(ang)], dim=-1)


class ResnetBlock2D(nn.Module):
    def __init__(self, in_ch, out_ch, temb_ch, groups=32, eps=1e-5,
                 time_emb=True):
        super().__init__()
        g1 = min(groups, in_ch)
        while in_ch % g1:
            g1 -= 1
        g2 = min(groups, out_ch)
        while out_ch % g2:
            g2 -= 1
        self.norm1 = nn.GroupNorm(g1, in_ch, eps=eps)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        if time_emb:
            self.time_emb_proj = nn.Linear(temb_ch, out_ch)
        self.norm2 = nn.GroupNorm(g2, out_ch, eps=eps)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        if in_ch != out_ch:
            self.conv_shortcut = nn.Conv2d(in_ch, out_ch, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class Attention(nn.Module):
    def __init__(self, dim, heads, context_dim=None):
        super().__init__()
        context_dim = context_dim or dim
        self.heads = heads
        self.to_q = nn.Linear(dim, dim, bias=False)
        self.to_k = nn.Linear(context_dim, dim, bias=False)
        self.to_v = nn.Linear(context_dim, dim, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])

    def forward(self, x, context=None):
        context = x if context is None else context
        b, l, d = x.shape
        hd = d // self.heads
        q = self.to_q(x).view(b, l, self.heads, hd).transpose(1, 2)
        k = self.to_k(context).view(b, -1, self.heads, hd).transpose(1, 2)
        v = self.to_v(context).view(b, -1, self.heads, hd).transpose(1, 2)
        a = (q @ k.transpose(-2, -1)) / math.sqrt(hd)
        o = (a.softmax(dim=-1) @ v).transpose(1, 2).reshape(b, l, d)
        return self.to_out[0](o)


class FeedForward(nn.Module):
    """GEGLU: net.0.proj -> chunk -> h * gelu(gate) -> net.2."""

    def __init__(self, dim, mult=4):
        super().__init__()
        inner = dim * mult
        proj = nn.Linear(dim, 2 * inner)
        self.net = nn.ModuleList([nn.Module(), nn.Identity(),
                                  nn.Linear(inner, dim)])
        self.net[0].proj = proj

    def forward(self, x):
        h, gate = self.net[0].proj(x).chunk(2, dim=-1)
        return self.net[2](h * F.gelu(gate))


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim, heads, context_dim):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = Attention(dim, heads)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = Attention(dim, heads, context_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = FeedForward(dim)

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        return x + self.ff(self.norm3(x))


class Transformer2DModel(nn.Module):
    def __init__(self, ch, heads, context_dim, depth=1, groups=32):
        super().__init__()
        g = min(groups, ch)
        while ch % g:
            g -= 1
        self.norm = nn.GroupNorm(g, ch, eps=1e-6)
        self.proj_in = nn.Linear(ch, ch)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(ch, heads, context_dim)
             for _ in range(depth)])
        self.proj_out = nn.Linear(ch, ch)

    def forward(self, x, context):
        b, c, h, w = x.shape
        res = x
        hid = self.norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        hid = self.proj_in(hid)
        for blk in self.transformer_blocks:
            hid = blk(hid, context)
        hid = self.proj_out(hid)
        return hid.reshape(b, h, w, c).permute(0, 3, 1, 2) + res


class Downsample2D(nn.Module):
    def __init__(self, ch, padding=1):
        super().__init__()
        self.padding = padding
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=padding)

    def forward(self, x):
        if self.padding == 0:
            x = F.pad(x, (0, 1, 0, 1))
        return self.conv(x)


class Upsample2D(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class _TimeEmbedding(nn.Module):
    def __init__(self, in_dim, dim):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, dim)
        self.linear_2 = nn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


def _unet_body(self, cfg):
    """Build down+mid modules (shared by UNet and ControlNet)."""
    chans = cfg["block_channels"]
    layers = cfg["layers_per_block"]
    ctx = cfg["context_dim"]
    hd = cfg["head_dim"]
    depth = cfg.get("tf_depth", 1)
    temb = chans[0] * 4
    self.conv_in = nn.Conv2d(cfg["in_channels"], chans[0], 3, padding=1)
    self.time_embedding = _TimeEmbedding(chans[0], temb)
    self.down_blocks = nn.ModuleList()
    in_ch = chans[0]
    for bi, ch in enumerate(chans):
        blk = nn.Module()
        blk.resnets = nn.ModuleList()
        attn = bi < len(chans) - 1
        if attn:
            blk.attentions = nn.ModuleList()
        for li in range(layers):
            blk.resnets.append(ResnetBlock2D(in_ch, ch, temb))
            in_ch = ch
            if attn:
                blk.attentions.append(
                    Transformer2DModel(ch, ch // hd, ctx, depth))
        if bi < len(chans) - 1:
            ds = nn.Module()
            ds.conv = Downsample2D(ch, padding=1).conv
            blk.downsamplers = nn.ModuleList([ds])
        self.down_blocks.append(blk)
    mid_ch = chans[-1]
    self.mid_block = nn.Module()
    self.mid_block.resnets = nn.ModuleList(
        [ResnetBlock2D(mid_ch, mid_ch, temb),
         ResnetBlock2D(mid_ch, mid_ch, temb)])
    self.mid_block.attentions = nn.ModuleList(
        [Transformer2DModel(mid_ch, mid_ch // hd, ctx, depth)])
    return temb


def _run_down_mid(self, x, t, context):
    chans = self.cfg["block_channels"]
    temb = self.time_embedding(timestep_embedding(t, chans[0]))
    h = self.conv_in(x)
    skips = [h]
    for bi, blk in enumerate(self.down_blocks):
        for li, res in enumerate(blk.resnets):
            h = res(h, temb)
            if hasattr(blk, "attentions"):
                h = blk.attentions[li](h, context)
            skips.append(h)
        if hasattr(blk, "downsamplers"):
            h = blk.downsamplers[0].conv(h)  # conv carries padding=1
            skips.append(h)
    return h, skips, temb


class UNet2DConditionModel(nn.Module):
    """SD-2-class UNet: 3 cross-attn down stages + plain last stage, mirror
    up path, linear transformer projections."""

    def __init__(self, in_channels=4, out_channels=4,
                 block_channels=(8, 8, 8, 8), layers_per_block=2,
                 context_dim=16, head_dim=4, tf_depth=1):
        super().__init__()
        self.cfg = dict(in_channels=in_channels, block_channels=block_channels,
                        layers_per_block=layers_per_block,
                        context_dim=context_dim, head_dim=head_dim,
                        tf_depth=tf_depth)
        temb = _unet_body(self, self.cfg)
        chans = block_channels
        ctx, hd, depth = context_dim, head_dim, tf_depth
        layers = layers_per_block
        # up path: diffusers iterates reversed channels; skip channels pop
        # from the down-path list
        skip_chs = [chans[0]]
        in_ch = chans[0]
        for bi, ch in enumerate(chans):
            for _ in range(layers):
                skip_chs.append(ch)
            if bi < len(chans) - 1:
                skip_chs.append(ch)
        self.up_blocks = nn.ModuleList()
        prev = chans[-1]
        for u, bi in enumerate(reversed(range(len(chans)))):
            ch = chans[bi]
            attn = bi < len(chans) - 1
            blk = nn.Module()
            blk.resnets = nn.ModuleList()
            if attn:
                blk.attentions = nn.ModuleList()
            for li in range(layers + 1):
                skip = skip_chs.pop()
                blk.resnets.append(ResnetBlock2D(prev + skip, ch, temb))
                prev = ch
                if attn:
                    blk.attentions.append(
                        Transformer2DModel(ch, ch // hd, ctx, depth))
            if bi > 0:
                up = nn.Module()
                up.conv = Upsample2D(ch).conv
                blk.upsamplers = nn.ModuleList([up])
            self.up_blocks.append(blk)
        g = min(32, chans[0])
        while chans[0] % g:
            g -= 1
        self.conv_norm_out = nn.GroupNorm(g, chans[0], eps=1e-5)
        self.conv_out = nn.Conv2d(chans[0], out_channels, 3, padding=1)

    def forward(self, x, t, context, control_residuals=None):
        h, skips, temb = _run_down_mid(self, x, t, context)
        if control_residuals is not None:
            down_res, mid_res = control_residuals
            skips = [s + r for s, r in zip(skips, down_res)]
        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h, context)
        h = self.mid_block.resnets[1](h, temb)
        if control_residuals is not None:
            h = h + mid_res
        for blk in self.up_blocks:
            for li, res in enumerate(blk.resnets):
                h = torch.cat([h, skips.pop()], dim=1)
                h = res(h, temb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[li](h, context)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0].conv(
                    F.interpolate(h, scale_factor=2.0, mode="nearest"))
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class ControlNetConditioningEmbedding(nn.Module):
    def __init__(self, out_ch, channels=(16, 32, 96, 256)):
        super().__init__()
        self.conv_in = nn.Conv2d(3, channels[0], 3, padding=1)
        blocks = []
        for i in range(len(channels) - 1):
            blocks.append(nn.Conv2d(channels[i], channels[i], 3, padding=1))
            blocks.append(nn.Conv2d(channels[i], channels[i + 1], 3,
                                    padding=1, stride=2))
        self.blocks = nn.ModuleList(blocks)
        self.conv_out = nn.Conv2d(channels[-1], out_ch, 3, padding=1)
        nn.init.zeros_(self.conv_out.weight)
        nn.init.zeros_(self.conv_out.bias)

    def forward(self, x):
        h = F.silu(self.conv_in(x))
        for blk in self.blocks:
            h = F.silu(blk(h))
        return self.conv_out(h)


class ControlNetModel(nn.Module):
    def __init__(self, in_channels=4, block_channels=(8, 8, 8, 8),
                 layers_per_block=2, context_dim=16, head_dim=4, tf_depth=1,
                 hint_channels=(16, 32, 96, 256)):
        super().__init__()
        self.cfg = dict(in_channels=in_channels, block_channels=block_channels,
                        layers_per_block=layers_per_block,
                        context_dim=context_dim, head_dim=head_dim,
                        tf_depth=tf_depth)
        _unet_body(self, self.cfg)
        self.controlnet_cond_embedding = ControlNetConditioningEmbedding(
            block_channels[0], hint_channels)
        n_skips = 1 + len(block_channels) * layers_per_block \
            + (len(block_channels) - 1)
        skip_chs = [block_channels[0]]
        for bi, ch in enumerate(block_channels):
            skip_chs += [ch] * layers_per_block
            if bi < len(block_channels) - 1:
                skip_chs.append(ch)
        assert len(skip_chs) == n_skips
        self.controlnet_down_blocks = nn.ModuleList()
        for ch in skip_chs:
            zc = nn.Conv2d(ch, ch, 1)
            nn.init.zeros_(zc.weight)
            nn.init.zeros_(zc.bias)
            self.controlnet_down_blocks.append(zc)
        mid = block_channels[-1]
        self.controlnet_mid_block = nn.Conv2d(mid, mid, 1)
        nn.init.zeros_(self.controlnet_mid_block.weight)
        nn.init.zeros_(self.controlnet_mid_block.bias)

    def forward(self, x, t, context, hint, conditioning_scale=1.0):
        chans = self.cfg["block_channels"]
        temb = self.time_embedding(timestep_embedding(t, chans[0]))
        h = self.conv_in(x) + self.controlnet_cond_embedding(hint)
        skips = [h]
        for blk in self.down_blocks:
            for li, res in enumerate(blk.resnets):
                h = res(h, temb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[li](h, context)
                skips.append(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0].conv(h)  # conv carries padding=1
                skips.append(h)
        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h, context)
        h = self.mid_block.resnets[1](h, temb)
        down = [conditioning_scale * zc(s)
                for zc, s in zip(self.controlnet_down_blocks, skips)]
        mid = conditioning_scale * self.controlnet_mid_block(h)
        return down, mid


# --------------------------------------------------------------------- VAE

class _VAEAttention(nn.Module):
    """diffusers Attention as used in the VAE mid block (heads=1, with
    group_norm), state-dict keys group_norm/to_q/to_k/to_v/to_out.0."""

    def __init__(self, ch, groups=32):
        super().__init__()
        g = min(groups, ch)
        while ch % g:
            g -= 1
        self.group_norm = nn.GroupNorm(g, ch, eps=1e-6)
        self.to_q = nn.Linear(ch, ch)
        self.to_k = nn.Linear(ch, ch)
        self.to_v = nn.Linear(ch, ch)
        self.to_out = nn.ModuleList([nn.Linear(ch, ch)])

    def forward(self, x):
        b, c, h, w = x.shape
        res = x
        hid = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        q, k, v = self.to_q(hid), self.to_k(hid), self.to_v(hid)
        a = (q @ k.transpose(-2, -1)) / math.sqrt(c)
        o = self.to_out[0](a.softmax(dim=-1) @ v)
        return res + o.reshape(b, h, w, c).permute(0, 3, 1, 2)


class AutoencoderKL(nn.Module):
    def __init__(self, block_channels=(4, 4, 4, 4), layers_per_block=2,
                 latent_channels=4):
        super().__init__()
        chans = block_channels
        self.encoder = nn.Module()
        self.encoder.conv_in = nn.Conv2d(3, chans[0], 3, padding=1)
        self.encoder.down_blocks = nn.ModuleList()
        in_ch = chans[0]
        for bi, ch in enumerate(chans):
            blk = nn.Module()
            blk.resnets = nn.ModuleList()
            for _ in range(layers_per_block):
                blk.resnets.append(ResnetBlock2D(in_ch, ch, None, eps=1e-6,
                                                 time_emb=False))
                in_ch = ch
            if bi < len(chans) - 1:
                ds = nn.Module()
                ds.conv = Downsample2D(ch, padding=0).conv
                blk.downsamplers = nn.ModuleList([ds])
            self.encoder.down_blocks.append(blk)
        mid = chans[-1]
        self.encoder.mid_block = nn.Module()
        self.encoder.mid_block.resnets = nn.ModuleList(
            [ResnetBlock2D(mid, mid, None, eps=1e-6, time_emb=False),
             ResnetBlock2D(mid, mid, None, eps=1e-6, time_emb=False)])
        self.encoder.mid_block.attentions = nn.ModuleList(
            [_VAEAttention(mid)])
        g = min(32, mid)
        while mid % g:
            g -= 1
        self.encoder.conv_norm_out = nn.GroupNorm(g, mid, eps=1e-6)
        self.encoder.conv_out = nn.Conv2d(mid, 2 * latent_channels, 3,
                                          padding=1)
        self.quant_conv = nn.Conv2d(2 * latent_channels, 2 * latent_channels,
                                    1)
        self.post_quant_conv = nn.Conv2d(latent_channels, latent_channels, 1)
        self.decoder = nn.Module()
        self.decoder.conv_in = nn.Conv2d(latent_channels, mid, 3, padding=1)
        self.decoder.mid_block = nn.Module()
        self.decoder.mid_block.resnets = nn.ModuleList(
            [ResnetBlock2D(mid, mid, None, eps=1e-6, time_emb=False),
             ResnetBlock2D(mid, mid, None, eps=1e-6, time_emb=False)])
        self.decoder.mid_block.attentions = nn.ModuleList(
            [_VAEAttention(mid)])
        self.decoder.up_blocks = nn.ModuleList()
        prev = mid
        for i, ch in enumerate(reversed(chans)):
            blk = nn.Module()
            blk.resnets = nn.ModuleList()
            for _ in range(layers_per_block + 1):
                blk.resnets.append(ResnetBlock2D(prev, ch, None, eps=1e-6,
                                                 time_emb=False))
                prev = ch
            if i < len(chans) - 1:
                up = nn.Module()
                up.conv = Upsample2D(ch).conv
                blk.upsamplers = nn.ModuleList([up])
            self.decoder.up_blocks.append(blk)
        g0 = min(32, chans[0])
        while chans[0] % g0:
            g0 -= 1
        self.decoder.conv_norm_out = nn.GroupNorm(g0, chans[0], eps=1e-6)
        self.decoder.conv_out = nn.Conv2d(chans[0], 3, 3, padding=1)

    def encode(self, x):
        h = self.encoder.conv_in(x)
        for blk in self.encoder.down_blocks:
            for res in blk.resnets:
                h = res(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0].conv(F.pad(h, (0, 1, 0, 1)))
        h = self.encoder.mid_block.resnets[0](h)
        h = self.encoder.mid_block.attentions[0](h)
        h = self.encoder.mid_block.resnets[1](h)
        h = self.encoder.conv_out(F.silu(self.encoder.conv_norm_out(h)))
        moments = self.quant_conv(h)
        mean, logvar = moments.chunk(2, dim=1)
        return mean, logvar

    def decode(self, z):
        h = self.decoder.conv_in(self.post_quant_conv(z))
        h = self.decoder.mid_block.resnets[0](h)
        h = self.decoder.mid_block.attentions[0](h)
        h = self.decoder.mid_block.resnets[1](h)
        for i, blk in enumerate(self.decoder.up_blocks):
            for res in blk.resnets:
                h = res(h)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0].conv(
                    F.interpolate(h, scale_factor=2.0, mode="nearest"))
        return self.decoder.conv_out(F.silu(self.decoder.conv_norm_out(h)))
