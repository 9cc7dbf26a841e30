"""Torch mirror of diffusers' ``HunyuanDiT2DModel`` — conversion oracle.

Written from the public diffusers source
(models/transformers/hunyuan_transformer_2d.py + models/embeddings.py) with
checkpoint-exact state-dict keys, channels parameterised for fast CPU tests.
Validates ``motion324_tpu/hy3dgen/hunyuan_dit_image.py`` numerically
(reference consumer: scripts/hy3dgen/text2image.py:30-45).
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def timesteps_proj(t, dim=256):
    half = dim // 2
    freqs = torch.exp(-math.log(10000.0)
                      * torch.arange(half, dtype=torch.float32) / half)
    ang = t.float()[:, None] * freqs[None]
    return torch.cat([torch.cos(ang), torch.sin(ang)], dim=-1)


def get_2d_rotary_pos_embed(head_dim, gh, gw):
    """(cos, sin) each (gh*gw, head_dim): height half then width half,
    repeat-interleaved real form (diffusers get_2d_rotary_pos_embed)."""
    def axis(pos, dim):
        freqs = 1.0 / (10000.0 ** (torch.arange(0, dim, 2,
                                                dtype=torch.float64) / dim))
        ang = torch.outer(pos.double(), freqs)
        return (torch.repeat_interleave(ang.cos(), 2, dim=1),
                torch.repeat_interleave(ang.sin(), 2, dim=1))

    rows = torch.arange(gh).repeat_interleave(gw)
    cols = torch.arange(gw).repeat(gh)
    ch, sh = axis(rows, head_dim // 2)
    cw, sw = axis(cols, head_dim // 2)
    return (torch.cat([ch, cw], dim=1).float(),
            torch.cat([sh, sw], dim=1).float())


def apply_rotary_emb(x, cos, sin):
    """x (B, H, S, D), real-pair form (diffusers apply_rotary_emb)."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    rot = torch.stack([-x2, x1], dim=-1).reshape(x.shape)
    return (x.float() * cos + rot.float() * sin).to(x.dtype)


class TextProj(nn.Module):
    """PixArtAlphaTextProjection(act='silu_fp32')."""

    def __init__(self, in_dim, hidden, out):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, hidden)
        self.linear_2 = nn.Linear(hidden, out)

    def forward(self, x):
        h = self.linear_1(x)
        return self.linear_2(F.silu(h.float()).to(h.dtype))


class AttentionPool(nn.Module):
    def __init__(self, seq_len, embed_dim, num_heads, output_dim):
        super().__init__()
        self.positional_embedding = nn.Parameter(
            torch.randn(seq_len + 1, embed_dim) / embed_dim ** 0.5)
        self.k_proj = nn.Linear(embed_dim, embed_dim)
        self.q_proj = nn.Linear(embed_dim, embed_dim)
        self.v_proj = nn.Linear(embed_dim, embed_dim)
        self.c_proj = nn.Linear(embed_dim, output_dim)
        self.num_heads = num_heads

    def forward(self, x):  # (B, L, D)
        b, l, d = x.shape
        x = torch.cat([x.mean(dim=1, keepdim=True), x], dim=1)
        x = x + self.positional_embedding[None]
        q = self.q_proj(x[:, :1])
        k = self.k_proj(x)
        v = self.v_proj(x)
        hd = d // self.num_heads
        q = q.view(b, 1, self.num_heads, hd).transpose(1, 2)
        k = k.view(b, l + 1, self.num_heads, hd).transpose(1, 2)
        v = v.view(b, l + 1, self.num_heads, hd).transpose(1, 2)
        a = (q @ k.transpose(-2, -1)) / math.sqrt(hd)
        o = (a.softmax(dim=-1) @ v).transpose(1, 2).reshape(b, 1, d)
        return self.c_proj(o)[:, 0]


class HunyuanAttention(nn.Module):
    def __init__(self, dim, heads, context_dim=None):
        super().__init__()
        self.heads = heads
        hd = dim // heads
        ctx = context_dim or dim
        self.to_q = nn.Linear(dim, dim)
        self.to_k = nn.Linear(ctx, dim)
        self.to_v = nn.Linear(ctx, dim)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])
        self.norm_q = nn.LayerNorm(hd, eps=1e-6)
        self.norm_k = nn.LayerNorm(hd, eps=1e-6)
        self.is_cross = context_dim is not None

    def forward(self, x, context=None, rope=None):
        context = x if context is None else context
        b, l, d = x.shape
        hd = d // self.heads
        q = self.to_q(x).view(b, l, self.heads, hd).transpose(1, 2)
        k = self.to_k(context).view(b, -1, self.heads, hd).transpose(1, 2)
        v = self.to_v(context).view(b, -1, self.heads, hd).transpose(1, 2)
        q = self.norm_q(q)
        k = self.norm_k(k)
        if rope is not None:
            cos, sin = rope
            q = apply_rotary_emb(q, cos, sin)
            if not self.is_cross:
                k = apply_rotary_emb(k, cos, sin)
        a = (q @ k.transpose(-2, -1)) / math.sqrt(hd)
        o = (a.softmax(dim=-1) @ v).transpose(1, 2).reshape(b, l, d)
        return self.to_out[0](o)


class AdaLayerNormShift(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.linear = nn.Linear(dim, dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x, emb):
        shift = self.linear(F.silu(emb.float()).to(emb.dtype))
        return self.norm(x) + shift.unsqueeze(1)


class FeedForward(nn.Module):
    """gelu-approximate ('tanh') MLP, diffusers FeedForward key layout."""

    def __init__(self, dim, mult=4):
        super().__init__()
        inner = dim * mult
        proj = nn.Linear(dim, inner)
        self.net = nn.ModuleList([nn.Module(), nn.Identity(),
                                  nn.Linear(inner, dim)])
        self.net[0].proj = proj

    def forward(self, x):
        return self.net[2](F.gelu(self.net[0].proj(x), approximate="tanh"))


class HunyuanDiTBlock(nn.Module):
    def __init__(self, dim, heads, ctx_dim, skip=False):
        super().__init__()
        self.norm1 = AdaLayerNormShift(dim)
        self.attn1 = HunyuanAttention(dim, heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.attn2 = HunyuanAttention(dim, heads, ctx_dim)
        self.norm3 = nn.LayerNorm(dim, eps=1e-6)
        self.ff = FeedForward(dim)
        if skip:
            self.skip_norm = nn.LayerNorm(2 * dim, eps=1e-6)
            self.skip_linear = nn.Linear(2 * dim, dim)

    def forward(self, x, ctx, temb, rope, skip=None):
        if skip is not None:
            x = self.skip_linear(self.skip_norm(torch.cat([x, skip], dim=-1)))
        x = x + self.attn1(self.norm1(x, temb), rope=rope)
        x = x + self.attn2(self.norm2(x.float()).to(x.dtype), ctx, rope=rope)
        return x + self.ff(self.norm3(x.float()).to(x.dtype))


class HunyuanDiT2DModel(nn.Module):
    def __init__(self, hidden=1408, heads=16, num_layers=40, patch=2,
                 in_channels=4, ctx_dim=1024, t5_dim=2048, text_len=77,
                 text_len_t5=256, use_style=True):
        super().__init__()
        self.cfg = dict(hidden=hidden, heads=heads, num_layers=num_layers,
                        patch=patch, in_channels=in_channels, ctx_dim=ctx_dim,
                        t5_dim=t5_dim, text_len=text_len,
                        text_len_t5=text_len_t5, use_style=use_style)
        self.pos_embed = nn.Module()
        self.pos_embed.proj = nn.Conv2d(in_channels, hidden, patch,
                                        stride=patch)
        te = nn.Module()
        te.timestep_embedder = TextProj(256, hidden, hidden)
        te.pooler = AttentionPool(text_len_t5, t5_dim, 8, ctx_dim)
        if use_style:
            te.style_embedder = nn.Embedding(1, hidden)
            extra_in = ctx_dim + 256 * 6 + hidden
        else:
            extra_in = ctx_dim
        te.extra_embedder = TextProj(extra_in, hidden * 4, hidden)
        self.time_extra_emb = te
        self.text_embedder = TextProj(t5_dim, t5_dim * 4, ctx_dim)
        self.text_embedding_padding = nn.Parameter(
            torch.randn(text_len + text_len_t5, ctx_dim))
        half = num_layers // 2
        self.blocks = nn.ModuleList(
            [HunyuanDiTBlock(hidden, heads, ctx_dim, skip=i > half)
             for i in range(num_layers)])
        nm = nn.Module()
        nm.linear = nn.Linear(hidden, 2 * hidden)
        self.norm_out = nm
        self.proj_out = nn.Linear(hidden, patch * patch * 2 * in_channels)

    def forward(self, x, t, clip_states, t5_states, clip_mask, t5_mask,
                image_meta_size, style):
        c = self.cfg
        b, _, hh, ww = x.shape
        gh, gw = hh // c["patch"], ww // c["patch"]
        h = self.pos_embed.proj(x).flatten(2).transpose(1, 2)

        temb = self.time_extra_emb.timestep_embedder(timesteps_proj(t))
        pooled = self.time_extra_emb.pooler(t5_states)
        if c["use_style"]:
            size_emb = timesteps_proj(image_meta_size.view(-1)).view(b, 1536)
            style_emb = self.time_extra_emb.style_embedder(style)
            extra = torch.cat([pooled, size_emb, style_emb], dim=1)
        else:
            extra = pooled
        temb = temb + self.time_extra_emb.extra_embedder(extra)

        t5_proj = self.text_embedder(t5_states)
        ctx = torch.cat([clip_states, t5_proj], dim=1)
        mask = torch.cat([clip_mask, t5_mask], dim=1).bool()
        ctx = torch.where(mask.unsqueeze(-1), ctx,
                          self.text_embedding_padding[None])

        rope = get_2d_rotary_pos_embed(c["hidden"] // c["heads"], gh, gw)

        half = c["num_layers"] // 2
        skips = []
        for layer, blk in enumerate(self.blocks):
            h = blk(h, ctx, temb, rope,
                    skip=skips.pop() if layer > half else None)
            if layer < half - 1:
                skips.append(h)

        emb = self.norm_out.linear(F.silu(temb.float()).to(temb.dtype))
        scale, shift = emb.chunk(2, dim=1)
        h = F.layer_norm(h.float(), (c["hidden"],), eps=1e-6).to(h.dtype)
        h = h * (1 + scale[:, None]) + shift[:, None]
        out = self.proj_out(h)
        p, oc = c["patch"], 2 * c["in_channels"]
        out = out.view(b, gh, gw, p, p, oc).permute(0, 5, 1, 3, 2, 4)
        return out.reshape(b, oc, hh, ww)
