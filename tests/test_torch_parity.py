"""Torch-golden parity tests for the SVD stack (VERDICT r1 item 2).

Strategy: build tiny torch models with diffusers' EXACT module structure and
state-dict key names (reference adapters load these via diffusers,
/root/reference/model/depthcrafter.py:18-29), push their state dicts through
utils/convert_svd + graft, and assert forward agreement with the flax stack
at f32.  The CLIP tower is checked against the REAL transformers
implementation (CLIPVisionModelWithProjection) — a true external oracle.

What this pins down:
  * every rename rule and layout transpose in convert_svd / checkpoint.py
    against real key names (not fabricated from our own tree);
  * structural agreement: TimestepEmbedding widths, AlphaBlender switch
    semantics, quant_conv, temporal-resnet decoder blocks, GEGLU gelu
    flavor, GroupNorm/LayerNorm eps, position-embedding layouts;
  * op-level numerics between torch and XLA CPU (conv/norm/attention).

Tolerances: f32 end-to-end; tiny nets agree to ~1e-5; bounds are set at
5-50x the observed noise so only real structural/layout divergences fail.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from unigeo_tpu.utils.checkpoint import graft_flat_params
from unigeo_tpu.utils.convert_svd import (
    convert_component,
    rename_clip_key,
    rename_unet_key,
    rename_vae_key,
)

torch.manual_seed(0)


def n_groups(c: int) -> int:
    """Match unigeo_tpu.models.layers.GroupNorm group selection."""
    g = min(32, c)
    while c % g:
        g -= 1
    return g


def t_sinusoidal(timesteps, dim, max_period=10000.0):
    """diffusers get_timestep_embedding(flip_sin_to_cos=True, shift=0)."""
    half = dim // 2
    exponent = -math.log(max_period) * torch.arange(half, dtype=torch.float32)
    freqs = torch.exp(exponent / half)
    args = timesteps.float()[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


# ---------------------------------------------------------------------------
# torch building blocks (diffusers structure + names)
# ---------------------------------------------------------------------------


class TTimestepEmbedding(tnn.Module):
    def __init__(self, in_dim, hidden, out_dim):
        super().__init__()
        self.linear_1 = tnn.Linear(in_dim, hidden)
        self.linear_2 = tnn.Linear(hidden, out_dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class TAlphaBlender(tnn.Module):
    def __init__(self, merge_factor=0.5, switch=False):
        super().__init__()
        self.mix_factor = tnn.Parameter(torch.tensor([merge_factor]))
        self.switch = switch

    def forward(self, x_spatial, x_temporal):
        alpha = torch.sigmoid(self.mix_factor)[0]
        if self.switch:
            alpha = 1.0 - alpha
        return alpha * x_spatial + (1.0 - alpha) * x_temporal


class TAttention(tnn.Module):
    def __init__(self, query_dim, heads, dim_head, context_dim=None,
                 qkv_bias=False):
        super().__init__()
        inner = heads * dim_head
        ctx = context_dim or query_dim
        self.heads, self.dim_head = heads, dim_head
        self.to_q = tnn.Linear(query_dim, inner, bias=qkv_bias)
        self.to_k = tnn.Linear(ctx, inner, bias=qkv_bias)
        self.to_v = tnn.Linear(ctx, inner, bias=qkv_bias)
        self.to_out = tnn.ModuleList([tnn.Linear(inner, query_dim)])

    def forward(self, x, context=None):
        ctx = x if context is None else context
        q, k, v = self.to_q(x), self.to_k(ctx), self.to_v(ctx)
        b, s, _ = q.shape
        sk = k.shape[1]
        q = q.view(b, s, self.heads, self.dim_head).transpose(1, 2)
        k = k.view(b, sk, self.heads, self.dim_head).transpose(1, 2)
        v = v.view(b, sk, self.heads, self.dim_head).transpose(1, 2)
        o = F.scaled_dot_product_attention(q, k, v)
        return self.to_out[0](o.transpose(1, 2).reshape(b, s, -1))


class TGEGLU(tnn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = tnn.Linear(dim, inner * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class TFeedForward(tnn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        inner = dim * mult
        self.net = tnn.ModuleList([TGEGLU(dim, inner), tnn.Identity(),
                                   tnn.Linear(inner, dim)])

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class TResnetBlock2D(tnn.Module):
    def __init__(self, in_ch, out_ch, temb_ch=None, eps=1e-5):
        super().__init__()
        self.norm1 = tnn.GroupNorm(n_groups(in_ch), in_ch, eps=eps)
        self.conv1 = tnn.Conv2d(in_ch, out_ch, 3, padding=1)
        if temb_ch:
            self.time_emb_proj = tnn.Linear(temb_ch, out_ch)
        self.norm2 = tnn.GroupNorm(n_groups(out_ch), out_ch, eps=eps)
        self.conv2 = tnn.Conv2d(out_ch, out_ch, 3, padding=1)
        if in_ch != out_ch:
            self.conv_shortcut = tnn.Conv2d(in_ch, out_ch, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        sc = self.conv_shortcut(x) if hasattr(self, "conv_shortcut") else x
        return sc + h


class TTemporalResnetBlock(tnn.Module):
    """diffusers TemporalResnetBlock: [B, C, T, H, W], (3,1,1) convs."""

    def __init__(self, in_ch, out_ch, temb_ch=None, eps=1e-5):
        super().__init__()
        self.norm1 = tnn.GroupNorm(n_groups(in_ch), in_ch, eps=eps)
        self.conv1 = tnn.Conv3d(in_ch, out_ch, (3, 1, 1), padding=(1, 0, 0))
        if temb_ch:
            self.time_emb_proj = tnn.Linear(temb_ch, out_ch)
        self.norm2 = tnn.GroupNorm(n_groups(out_ch), out_ch, eps=eps)
        self.conv2 = tnn.Conv3d(out_ch, out_ch, (3, 1, 1), padding=(1, 0, 0))
        if in_ch != out_ch:
            self.conv_shortcut = tnn.Conv3d(in_ch, out_ch, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None:  # temb [B, T, temb_ch]
            t = self.time_emb_proj(F.silu(temb))  # [B, T, C]
            h = h + t.permute(0, 2, 1)[:, :, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        sc = self.conv_shortcut(x) if hasattr(self, "conv_shortcut") else x
        return sc + h


class TSpatioTemporalResBlock(tnn.Module):
    def __init__(self, in_ch, out_ch, temb_ch=None, eps=1e-5,
                 temporal_eps=1e-5, merge_factor=0.5, switch=False):
        super().__init__()
        self.spatial_res_block = TResnetBlock2D(in_ch, out_ch, temb_ch, eps)
        self.temporal_res_block = TTemporalResnetBlock(
            out_ch, out_ch, temb_ch, temporal_eps
        )
        self.time_mixer = TAlphaBlender(merge_factor, switch)

    def forward(self, x, temb, num_frames):
        s = self.spatial_res_block(x, temb)
        bt, c, hh, ww = s.shape
        b = bt // num_frames
        s5 = s.view(b, num_frames, c, hh, ww).permute(0, 2, 1, 3, 4)
        t_in = temb.view(b, num_frames, -1) if temb is not None else None
        t5 = self.temporal_res_block(s5, t_in)
        out = self.time_mixer(s5, t5)
        return out.permute(0, 2, 1, 3, 4).reshape(bt, c, hh, ww)


class TBasicTransformerBlock(tnn.Module):
    def __init__(self, dim, heads, dim_head, ctx_dim):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn1 = TAttention(dim, heads, dim_head)
        self.norm2 = tnn.LayerNorm(dim)
        self.attn2 = TAttention(dim, heads, dim_head, context_dim=ctx_dim)
        self.norm3 = tnn.LayerNorm(dim)
        self.ff = TFeedForward(dim)

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        return x + self.ff(self.norm3(x))


class TTemporalBasicTransformerBlock(tnn.Module):
    def __init__(self, dim, heads, dim_head, ctx_dim):
        super().__init__()
        self.norm_in = tnn.LayerNorm(dim)
        self.ff_in = TFeedForward(dim)
        self.norm1 = tnn.LayerNorm(dim)
        self.attn1 = TAttention(dim, heads, dim_head)
        self.norm2 = tnn.LayerNorm(dim)
        self.attn2 = TAttention(dim, heads, dim_head, context_dim=ctx_dim)
        self.norm3 = tnn.LayerNorm(dim)
        self.ff = TFeedForward(dim)

    def forward(self, x, num_frames, encoder_hidden_states):
        bt, s, c = x.shape
        b = bt // num_frames
        x = x.view(b, num_frames, s, c).permute(0, 2, 1, 3).reshape(
            b * s, num_frames, c
        )
        x = self.ff_in(self.norm_in(x)) + x
        x = self.attn1(self.norm1(x)) + x
        x = self.attn2(self.norm2(x), encoder_hidden_states) + x
        x = self.ff(self.norm3(x)) + x
        return x.view(b, s, num_frames, c).permute(0, 2, 1, 3).reshape(bt, s, c)


class TTransformerSpatioTemporal(tnn.Module):
    def __init__(self, c, heads, dim_head, ctx_dim):
        super().__init__()
        inner = heads * dim_head
        assert inner == c, "test configs keep inner_dim == channels (as SVD)"
        self.norm = tnn.GroupNorm(n_groups(c), c, eps=1e-6)
        self.proj_in = tnn.Linear(c, inner)
        self.transformer_blocks = tnn.ModuleList(
            [TBasicTransformerBlock(inner, heads, dim_head, ctx_dim)]
        )
        self.temporal_transformer_blocks = tnn.ModuleList(
            [TTemporalBasicTransformerBlock(inner, heads, dim_head, ctx_dim)]
        )
        self.time_pos_embed = TTimestepEmbedding(inner, inner * 4, inner)
        self.time_mixer = TAlphaBlender(0.5, False)
        self.proj_out = tnn.Linear(inner, c)

    def forward(self, x, context, num_frames):
        bt, c, hh, ww = x.shape
        b = bt // num_frames
        residual = x
        ctx_first = context.view(b, num_frames, *context.shape[1:])[:, 0]
        time_ctx = ctx_first.repeat_interleave(hh * ww, dim=0)

        h = self.norm(x).permute(0, 2, 3, 1).reshape(bt, hh * ww, c)
        h = self.proj_in(h)

        frames = torch.arange(num_frames).repeat(b, 1).reshape(-1)
        emb = self.time_pos_embed(t_sinusoidal(frames, c))[:, None]

        h_sp = self.transformer_blocks[0](h, context)
        h_tm = self.temporal_transformer_blocks[0](h_sp + emb, num_frames, time_ctx)
        h = self.time_mixer(h_sp, h_tm)
        h = self.proj_out(h)
        return h.reshape(bt, hh, ww, c).permute(0, 3, 1, 2) + residual


class TDownsample(tnn.Module):
    def __init__(self, ch, asymmetric_pad=False):
        super().__init__()
        self.asym = asymmetric_pad
        self.conv = tnn.Conv2d(ch, ch, 3, stride=2,
                               padding=0 if asymmetric_pad else 1)

    def forward(self, x):
        if self.asym:
            x = F.pad(x, (0, 1, 0, 1))
        return self.conv(x)


class TUpsample(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = tnn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class _Blk(tnn.Module):
    """Bare container so child names render as resnets.N / attentions.N ..."""


# ---------------------------------------------------------------------------
# tiny torch UNet (UNetSpatioTemporalConditionModel structure)
# ---------------------------------------------------------------------------

UNET_CFG = dict(
    block_out_channels=(32, 48, 64, 64),
    num_attention_heads=(2, 3, 4, 4),
    cross_attention_dim=32,
    addition_time_embed_dim=16,
    head_dim=16,
    layers_per_block=1,
)


class TUNet(tnn.Module):
    def __init__(self, cfg=UNET_CFG, in_ch=8, out_ch=4):
        super().__init__()
        bocs = cfg["block_out_channels"]
        heads = cfg["num_attention_heads"]
        dh = cfg["head_dim"]
        ctx = cfg["cross_attention_dim"]
        layers = cfg["layers_per_block"]
        ch0 = bocs[0]
        tdim = 4 * ch0
        self.add_dim = cfg["addition_time_embed_dim"]
        self.ch0 = ch0

        self.conv_in = tnn.Conv2d(in_ch, ch0, 3, padding=1)
        self.time_embedding = TTimestepEmbedding(ch0, tdim, tdim)
        self.add_embedding = TTimestepEmbedding(3 * self.add_dim, tdim, tdim)

        n = len(bocs)
        skip_chs = [ch0]
        self.down_blocks = tnn.ModuleList()
        ch = ch0
        for i, out in enumerate(bocs):
            blk = _Blk()
            has_attn = i < n - 1
            resnets, attns = [], []
            for _ in range(layers):
                resnets.append(TSpatioTemporalResBlock(ch, out, tdim))
                ch = out
                if has_attn:
                    attns.append(TTransformerSpatioTemporal(out, heads[i], dh, ctx))
                skip_chs.append(out)
            blk.resnets = tnn.ModuleList(resnets)
            if has_attn:
                blk.attentions = tnn.ModuleList(attns)
            if i < n - 1:
                blk.downsamplers = tnn.ModuleList([TDownsample(out)])
                skip_chs.append(out)
            self.down_blocks.append(blk)

        mid = _Blk()
        mid.resnets = tnn.ModuleList(
            [TSpatioTemporalResBlock(ch, ch, tdim),
             TSpatioTemporalResBlock(ch, ch, tdim)]
        )
        mid.attentions = tnn.ModuleList(
            [TTransformerSpatioTemporal(ch, heads[-1], dh, ctx)]
        )
        self.mid_block = mid

        self.up_blocks = tnn.ModuleList()
        prev = bocs[-1]
        for i, out in enumerate(reversed(bocs)):
            stage = n - 1 - i
            has_attn = stage < n - 1
            blk = _Blk()
            resnets, attns = [], []
            for _ in range(layers + 1):
                skip = skip_chs.pop()
                resnets.append(TSpatioTemporalResBlock(prev + skip, out, tdim))
                prev = out
                if has_attn:
                    attns.append(
                        TTransformerSpatioTemporal(out, heads[stage], dh, ctx)
                    )
            blk.resnets = tnn.ModuleList(resnets)
            if has_attn:
                blk.attentions = tnn.ModuleList(attns)
            if stage > 0:
                blk.upsamplers = tnn.ModuleList([TUpsample(out)])
            self.up_blocks.append(blk)

        self.conv_norm_out = tnn.GroupNorm(n_groups(ch0), ch0, eps=1e-5)
        self.conv_out = tnn.Conv2d(ch0, out_ch, 3, padding=1)

    def forward(self, sample, timesteps, context, added_time_ids, num_frames):
        b = timesteps.shape[0]
        emb = self.time_embedding(t_sinusoidal(timesteps, self.ch0))
        add = t_sinusoidal(added_time_ids.reshape(-1), self.add_dim).reshape(b, -1)
        emb = emb + self.add_embedding(add)
        emb_bt = emb.repeat_interleave(num_frames, dim=0)

        h = self.conv_in(sample)
        skips = [h]
        for blk in self.down_blocks:
            for idx, resnet in enumerate(blk.resnets):
                h = resnet(h, emb_bt, num_frames)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[idx](h, context, num_frames)
                skips.append(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h)
                skips.append(h)

        h = self.mid_block.resnets[0](h, emb_bt, num_frames)
        h = self.mid_block.attentions[0](h, context, num_frames)
        h = self.mid_block.resnets[1](h, emb_bt, num_frames)

        for blk in self.up_blocks:
            for idx, resnet in enumerate(blk.resnets):
                h = torch.cat([h, skips.pop()], dim=1)
                h = resnet(h, emb_bt, num_frames)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[idx](h, context, num_frames)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0](h)

        return self.conv_out(F.silu(self.conv_norm_out(h)))


# ---------------------------------------------------------------------------
# tiny torch VAE (AutoencoderKLTemporalDecoder structure)
# ---------------------------------------------------------------------------

VAE_CFG = dict(block_out_channels=(16, 24, 32, 32), layers_per_block=1)


class TVaeAttn(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.group_norm = tnn.GroupNorm(n_groups(c), c, eps=1e-6)
        self.to_q = tnn.Linear(c, c)
        self.to_k = tnn.Linear(c, c)
        self.to_v = tnn.Linear(c, c)
        self.to_out = tnn.ModuleList([tnn.Linear(c, c)])

    def forward(self, x):
        r = x
        b, c, hh, ww = x.shape
        h = self.group_norm(x).view(b, c, hh * ww).transpose(1, 2)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        o = F.scaled_dot_product_attention(q[:, None], k[:, None], v[:, None])[:, 0]
        o = self.to_out[0](o)
        return r + o.transpose(1, 2).view(b, c, hh, ww)


class TEncoder(tnn.Module):
    def __init__(self, cfg=VAE_CFG, latent=4):
        super().__init__()
        bocs = cfg["block_out_channels"]
        layers = cfg["layers_per_block"]
        self.conv_in = tnn.Conv2d(3, bocs[0], 3, padding=1)
        self.down_blocks = tnn.ModuleList()
        ch = bocs[0]
        for i, out in enumerate(bocs):
            blk = _Blk()
            resnets = []
            for _ in range(layers):
                resnets.append(TResnetBlock2D(ch, out, None, eps=1e-6))
                ch = out
            blk.resnets = tnn.ModuleList(resnets)
            if i < len(bocs) - 1:
                blk.downsamplers = tnn.ModuleList(
                    [TDownsample(out, asymmetric_pad=True)]
                )
            self.down_blocks.append(blk)
        mid = _Blk()
        mid.resnets = tnn.ModuleList(
            [TResnetBlock2D(ch, ch, None, 1e-6), TResnetBlock2D(ch, ch, None, 1e-6)]
        )
        mid.attentions = tnn.ModuleList([TVaeAttn(ch)])
        self.mid_block = mid
        self.conv_norm_out = tnn.GroupNorm(n_groups(ch), ch, eps=1e-6)
        self.conv_out = tnn.Conv2d(ch, 2 * latent, 3, padding=1)

    def forward(self, x):
        h = self.conv_in(x)
        for blk in self.down_blocks:
            for resnet in blk.resnets:
                h = resnet(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h)
        h = self.mid_block.resnets[0](h)
        h = self.mid_block.attentions[0](h)
        h = self.mid_block.resnets[1](h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class TTemporalDecoder(tnn.Module):
    def __init__(self, cfg=VAE_CFG, latent=4, out_ch=3):
        super().__init__()
        bocs = cfg["block_out_channels"]
        layers = cfg["layers_per_block"]
        top = bocs[-1]
        self.conv_in = tnn.Conv2d(latent, top, 3, padding=1)
        mid = _Blk()
        mid.resnets = tnn.ModuleList(
            [TSpatioTemporalResBlock(top, top, None, 1e-6, 1e-5, 0.0, True),
             TSpatioTemporalResBlock(top, top, None, 1e-6, 1e-5, 0.0, True)]
        )
        mid.attentions = tnn.ModuleList([TVaeAttn(top)])
        self.mid_block = mid
        self.up_blocks = tnn.ModuleList()
        prev = top
        for i, out in enumerate(reversed(bocs)):
            blk = _Blk()
            resnets = []
            for _ in range(layers + 1):
                resnets.append(
                    TSpatioTemporalResBlock(prev, out, None, 1e-6, 1e-5, 0.0, True)
                )
                prev = out
            blk.resnets = tnn.ModuleList(resnets)
            if i < len(bocs) - 1:
                blk.upsamplers = tnn.ModuleList([TUpsample(out)])
            self.up_blocks.append(blk)
        self.conv_norm_out = tnn.GroupNorm(n_groups(bocs[0]), bocs[0], eps=1e-6)
        self.conv_out = tnn.Conv2d(bocs[0], out_ch, 3, padding=1)
        self.time_conv_out = tnn.Conv3d(out_ch, out_ch, (3, 1, 1), padding=(1, 0, 0))

    def forward(self, z, num_frames):
        h = self.conv_in(z)
        h = self.mid_block.resnets[0](h, None, num_frames)
        h = self.mid_block.attentions[0](h)
        h = self.mid_block.resnets[1](h, None, num_frames)
        for blk in self.up_blocks:
            for resnet in blk.resnets:
                h = resnet(h, None, num_frames)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0](h)
        h = self.conv_out(F.silu(self.conv_norm_out(h)))
        bt, c, hh, ww = h.shape
        b = bt // num_frames
        h5 = h.view(b, num_frames, c, hh, ww).permute(0, 2, 1, 3, 4)
        h5 = self.time_conv_out(h5)
        return h5.permute(0, 2, 1, 3, 4).reshape(bt, c, hh, ww)


class TVae(tnn.Module):
    def __init__(self, cfg=VAE_CFG, latent=4):
        super().__init__()
        self.latent = latent
        self.encoder = TEncoder(cfg, latent)
        self.quant_conv = tnn.Conv2d(2 * latent, 2 * latent, 1)
        self.decoder = TTemporalDecoder(cfg, latent)

    def encode_mode(self, x):
        return self.quant_conv(self.encoder(x))[:, : self.latent]


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def nchw_to_nhwc(x):
    return np.moveaxis(x.detach().numpy(), 1, -1)


def nhwc(x):
    return jnp.asarray(np.moveaxis(x.detach().numpy(), 1, -1))


def graft_strict(flax_params, tsd, rename):
    flat = convert_component({k: v for k, v in tsd.items()}, rename)
    grafted, matched, missed = graft_flat_params(flax_params, flat)
    n = len(jax.tree_util.tree_leaves(flax_params))
    assert matched == n, f"grafted {matched}/{n}; missed {missed[:8]}"
    return grafted


def assert_close(jax_out, torch_out, tol, what):
    a = np.asarray(jax_out)
    b = torch_out.detach().numpy()
    assert a.shape == b.shape, (what, a.shape, b.shape)
    scale = max(np.abs(b).max(), 1e-6)
    rel = np.abs(a - b).max() / scale
    assert rel < tol, f"{what}: rel dev {rel:.2e} (tol {tol:.0e})"


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_unet_forward_matches_torch_golden():
    """Full tiny spatio-temporal UNet: diffusers-named torch state dict →
    convert → graft → forward parity."""
    from unigeo_tpu.models.depthcrafter.unet import UNetSpatioTemporal

    t, h, w = 4, 16, 16
    ctx_dim = UNET_CFG["cross_attention_dim"]
    tmodel = TUNet().eval()

    junet = UNetSpatioTemporal(**UNET_CFG)
    params = junet.init(
        jax.random.PRNGKey(0),
        jnp.zeros((t, h, w, 8)), jnp.zeros((1,)),
        jnp.zeros((t, 1, ctx_dim)), jnp.zeros((1, 3)), t,
    )
    params = graft_strict(params, tmodel.state_dict(), rename_unet_key)

    rng = np.random.default_rng(0)
    sample = rng.normal(size=(t, 8, h, w)).astype(np.float32)
    context = rng.normal(size=(t, 1, ctx_dim)).astype(np.float32)
    timesteps = np.array([1.64], np.float32)  # 0.25·ln(700)
    added = np.array([[6.0, 127.0, 0.02]], np.float32)

    with torch.no_grad():
        t_out = tmodel(
            torch.from_numpy(sample), torch.from_numpy(timesteps),
            torch.from_numpy(context), torch.from_numpy(added), t,
        )
    j_out = junet.apply(
        params,
        jnp.asarray(np.moveaxis(sample, 1, -1)),
        jnp.asarray(timesteps),
        jnp.asarray(context),
        jnp.asarray(added),
        t,
    )
    assert_close(np.moveaxis(np.asarray(j_out), -1, 1), t_out, 2e-4, "unet")


def test_vae_encoder_matches_torch_golden():
    from unigeo_tpu.models.depthcrafter.vae import AutoencoderKLTemporal

    tvae = TVae().eval()
    jvae = AutoencoderKLTemporal(**VAE_CFG)
    t, h, w = 2, 32, 32
    frames = np.random.default_rng(1).normal(size=(t, 3, h, w)).astype(np.float32)

    params = jvae.init(
        jax.random.PRNGKey(0), jnp.zeros((t, h, w, 3)), method=jvae.encode
    )
    params = graft_strict(params, tvae.state_dict(), rename_vae_key)

    with torch.no_grad():
        t_lat = tvae.encode_mode(torch.from_numpy(frames))
    j_lat = jvae.apply(params, jnp.asarray(np.moveaxis(frames, 1, -1)),
                       method=jvae.encode)
    assert_close(np.moveaxis(np.asarray(j_lat), -1, 1), t_lat, 2e-4, "vae.encode")


def test_vae_decoder_matches_torch_golden():
    from unigeo_tpu.models.depthcrafter.vae import AutoencoderKLTemporal

    tvae = TVae().eval()
    jvae = AutoencoderKLTemporal(**VAE_CFG)
    t, hl, wl = 3, 4, 4
    lat = np.random.default_rng(2).normal(size=(t, 4, hl, wl)).astype(np.float32)

    params = jvae.init(
        jax.random.PRNGKey(0), jnp.zeros((t, hl, wl, 4)), t, method=jvae.decode
    )
    params = graft_strict(params, tvae.state_dict(), rename_vae_key)

    with torch.no_grad():
        t_dec = tvae.decoder(torch.from_numpy(lat), t)
    # decode() divides by the scaling factor; pre-multiply so the decoder
    # sees `lat` exactly
    j_dec = jvae.apply(
        params, jnp.asarray(np.moveaxis(lat, 1, -1)) * jvae.scaling_factor, t,
        method=jvae.decode,
    )
    assert_close(np.moveaxis(np.asarray(j_dec), -1, 1), t_dec, 5e-4, "vae.decode")


def test_clip_matches_real_transformers():
    """ClipImageEmbedder vs the REAL transformers CLIPVisionModelWithProjection
    (an independent oracle, not our own torch code)."""
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    from unigeo_tpu.models.vit import (
        CLIP_IMAGE_MEAN, CLIP_IMAGE_STD, ClipImageEmbedder,
    )

    cfg = CLIPVisionConfig(
        hidden_size=32, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=2, image_size=64, patch_size=16,
        projection_dim=32, hidden_act="quick_gelu",
    )
    tclip = CLIPVisionModelWithProjection(cfg).eval()

    jclip = ClipImageEmbedder(
        width=32, depth=2, num_heads=2, patch_size=16, projection_dim=32,
        image_size=64,
    )
    b = 2
    frames01 = np.random.default_rng(3).uniform(size=(b, 64, 64, 3)).astype(np.float32)

    params = jclip.init(jax.random.PRNGKey(0), jnp.zeros((b, 64, 64, 3)))
    flat = convert_component(
        tclip.state_dict(), rename_clip_key,
        stack_layers_prefix="vision_model.encoder.layers",
    )
    grafted, matched, missed = graft_flat_params(params, flat)
    n = len(jax.tree_util.tree_leaves(params))
    assert matched == n, f"grafted {matched}/{n}; missed {missed[:8]}"

    mean = np.asarray(CLIP_IMAGE_MEAN, np.float32)
    std = np.asarray(CLIP_IMAGE_STD, np.float32)
    pixel_values = np.moveaxis((frames01 - mean) / std, -1, 1)
    with torch.no_grad():
        t_emb = tclip(torch.from_numpy(pixel_values)).image_embeds  # [B, 32]

    j_emb = jclip.apply(grafted, jnp.asarray(frames01))[:, 0]
    assert_close(j_emb, t_emb, 2e-4, "clip")


def test_convert_rejects_nothing_silently():
    """Every torch key of the golden models lands somewhere: the converted
    flat dict covers the full state dict (no dropped/unknown keys)."""
    tmodel = TUNet()
    flat = convert_component(tmodel.state_dict(), rename_unet_key)
    assert len(flat) == len(tmodel.state_dict())
    tvae = TVae()
    flat_v = convert_component(tvae.state_dict(), rename_vae_key)
    assert len(flat_v) == len(tvae.state_dict())


# ---------------------------------------------------------------------------
# composed-pipeline oracle (VERDICT r1 item 1)
#
# The component tests above pin each module; these pin the GLUE: the
# diffusers EulerDiscrete schedule (Karras, leading spacing, continuous
# c_noise), the sqrt(sigma_max^2+1) init scaling, the UNSCALED conditioning
# latents, the noise augmentation, the 0.18215 decode scaling, and the
# reference depth postproc (/root/reference/model/depthcrafter.py:79-97).
# A drift in ANY of those passes every component test and fails here.
# ---------------------------------------------------------------------------


def _diffusers_euler_sigmas(num_inference_steps: int, use_karras=True):
    """Independent reimplementation of diffusers EulerDiscreteScheduler
    set_timesteps for the SVD config (scaled_linear betas in [0.00085,
    0.012], 1000 train steps, timestep_spacing='leading', steps_offset=1,
    karras sigmas with config sigma_min=0.002 / sigma_max=700, rho=7).
    Written from the diffusers algorithm, NOT from our scheduler.py."""
    n_train = 1000
    betas = np.linspace(0.00085**0.5, 0.012**0.5, n_train, dtype=np.float64) ** 2
    alphas_cumprod = np.cumprod(1.0 - betas)
    sigmas_all = ((1.0 - alphas_cumprod) / alphas_cumprod) ** 0.5
    step_ratio = n_train // num_inference_steps
    timesteps = (
        (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].copy()
    ).astype(np.float64) + 1  # steps_offset
    sigmas = np.interp(timesteps, np.arange(0, n_train), sigmas_all)
    if use_karras:
        sigma_min, sigma_max, rho = 0.002, 700.0, 7.0
        ramp = np.linspace(0, 1, num_inference_steps)
        min_inv_rho = sigma_min ** (1 / rho)
        max_inv_rho = sigma_max ** (1 / rho)
        sigmas = (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho
    return np.concatenate([sigmas, [0.0]]).astype(np.float32)


def test_scheduler_sigmas_match_diffusers_algorithm():
    from unigeo_tpu.models.depthcrafter.scheduler import (
        EulerDiscreteConfig,
        EulerDiscreteScheduler,
    )

    for karras in (True, False):
        sched = EulerDiscreteScheduler(
            EulerDiscreteConfig(use_karras_sigmas=karras)
        )
        ours = sched.inference_sigmas(5)
        ref = _diffusers_euler_sigmas(5, use_karras=karras)
        np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=0.0)
    # continuous c_noise = 0.25 ln(sigma)
    sched = EulerDiscreteScheduler(EulerDiscreteConfig())
    sig = sched.inference_sigmas(5)[:-1]
    np.testing.assert_allclose(
        sched.timesteps_for_sigmas(sig), 0.25 * np.log(sig), rtol=1e-6
    )


def _build_matched_pipelines(seed=0):
    """(torch models, grafted flax DepthCrafterPipeline) with identical tiny
    weights: TUNet / TVae (diffusers structure) + REAL transformers CLIP."""
    import jax.numpy as jnp
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    from unigeo_tpu.models.depthcrafter.pipeline import DepthCrafterPipeline

    torch.manual_seed(seed)
    tunet = TUNet().eval()
    tvae = TVae().eval()
    tclip = CLIPVisionModelWithProjection(
        CLIPVisionConfig(
            hidden_size=32, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=2, image_size=64, patch_size=16,
            projection_dim=UNET_CFG["cross_attention_dim"],
            hidden_act="quick_gelu",
        )
    ).eval()

    pipe = DepthCrafterPipeline(
        unet_config=UNET_CFG,
        vae_config=VAE_CFG,
        clip_config=dict(
            width=32, depth=2, num_heads=2, patch_size=16,
            projection_dim=UNET_CFG["cross_attention_dim"], image_size=64,
        ),
        dtype=jnp.float32,
    )
    t, h, w = 4, 64, 64
    pipe.init_params(jax.random.PRNGKey(seed), h, w, t)

    vae_p = graft_strict(
        {"params": pipe.params["vae"]}, tvae.state_dict(), rename_vae_key
    )["params"]
    unet_p = graft_strict(
        {"params": pipe.params["unet"]}, tunet.state_dict(), rename_unet_key
    )["params"]
    flat = convert_component(
        tclip.state_dict(), rename_clip_key,
        stack_layers_prefix="vision_model.encoder.layers",
    )
    clip_tree = {"params": pipe.params["clip"]}
    grafted, matched, missed = graft_flat_params(clip_tree, flat)
    n = len(jax.tree_util.tree_leaves(clip_tree))
    assert matched == n, f"clip grafted {matched}/{n}; missed {missed[:8]}"
    pipe.params = {"vae": vae_p, "clip": grafted["params"], "unet": unet_p}
    return (tunet, tvae, tclip), pipe, (t, h, w)


def _torch_oracle(tunet, tvae, tclip, frames01, noise, aug_noise, steps,
                  noise_aug_strength=0.02, scaling_factor=0.18215):
    """The composed torch pipeline, mirroring the external torch
    DepthCrafterPipeline the reference calls (model/depthcrafter.py:79-90):
    CLIP embed + VAE-encode the noise-augmented frames, run the 5-step
    EDM/Euler loop (v-prediction), decode, and apply the reference depth
    postproc (:92-97).  All arrays NHWC float32 numpy in; torch NCHW inside.
    Returns (decoded01 [T,H,W,3], depth [T,H,W])."""
    t_frames = torch.from_numpy(np.moveaxis(frames01, -1, 1))  # [T,3,H,W]
    T = t_frames.shape[0]

    with torch.no_grad():
        mean = torch.tensor(
            [0.48145466, 0.4578275, 0.40821073]
        ).view(1, 3, 1, 1)
        std = torch.tensor(
            [0.26862954, 0.26130258, 0.27577711]
        ).view(1, 3, 1, 1)
        context = tclip((t_frames - mean) / std).image_embeds[:, None, :]

        pm1 = t_frames * 2.0 - 1.0
        if aug_noise is not None:
            pm1 = pm1 + noise_aug_strength * torch.from_numpy(
                np.moveaxis(aug_noise, -1, 1)
            )
        cond = tvae.encode_mode(pm1)  # [T,4,h,w], UNSCALED (SVD semantics)

        sigmas = _diffusers_euler_sigmas(steps)
        x = torch.from_numpy(np.moveaxis(noise, -1, 1)) * math.sqrt(
            float(sigmas[0]) ** 2 + 1.0
        )
        added = torch.tensor([[6.0, 127.0, noise_aug_strength]])
        for i in range(steps):
            s, s_next = float(sigmas[i]), float(sigmas[i + 1])
            x_in = x / math.sqrt(s**2 + 1.0)
            unet_in = torch.cat([x_in, cond], dim=1)
            ts = torch.tensor([0.25 * math.log(s)], dtype=torch.float32)
            v = tunet(unet_in, ts, context, added, T)
            c_out = -s / math.sqrt(s**2 + 1.0)
            c_skip = 1.0 / (s**2 + 1.0)
            denoised = v * c_out + x * c_skip
            x = x + (x - denoised) / s * (s_next - s)

        dec = tvae.decoder(x / scaling_factor, T)  # [-1,1]

    dec01 = (dec.numpy() + 1.0) / 2.0
    res = dec01.mean(axis=1)  # channel mean  (reference :93)
    res = (res - res.min()) / (res.max() - res.min())  # clip min-max (:95)
    depth = 1.0 / (res + 0.1)  # (:96-97)
    return np.moveaxis(dec01, 1, -1), depth


def test_composed_pipeline_matches_torch_oracle():
    """Full VAE-encode → 5-step denoise → decode parity with shared noise."""
    (tunet, tvae, tclip), pipe, (t, h, w) = _build_matched_pipelines()
    assert abs(pipe.vae.scaling_factor - 0.18215) < 1e-9

    rng = np.random.default_rng(7)
    frames01 = (
        rng.integers(0, 256, size=(t, h, w, 3)).astype(np.float32) / 255.0
    )
    noise = rng.normal(size=(t, h // 8, w // 8, 4)).astype(np.float32)
    aug = rng.normal(size=(t, h, w, 3)).astype(np.float32)

    dec_ref, _ = _torch_oracle(tunet, tvae, tclip, frames01, noise, aug, 5)

    import jax.numpy as jnp

    out = pipe.run_window_staged(
        pipe.params, jnp.asarray(frames01), jnp.asarray(noise), 5,
        aug_noise=jnp.asarray(aug),
    )
    dec_jax = (np.asarray(out) + 1.0) / 2.0
    scale = max(np.abs(dec_ref).max(), 1e-6)
    rel = np.abs(dec_jax - dec_ref).max() / scale
    assert rel < 1e-3, f"composed decode rel dev {rel:.2e}"


def test_depthcrafter_adapter_matches_torch_oracle():
    """The FULL adapter path (prepare_input → windowed __call__ with its own
    PRNG noise draws → reference postproc) vs the torch oracle fed the SAME
    noise, re-derived from the adapter's documented PRNG streams."""
    import jax.numpy as jnp

    from unigeo_tpu.models.depthcrafter.model import DepthCrafter
    from unigeo_tpu.models.depthcrafter.pipeline import aug_noise_rng

    (tunet, tvae, tclip), pipe, (t, h, w) = _build_matched_pipelines()
    model = DepthCrafter(pipeline=pipe, num_inference_steps=5, seed=42)

    rng = np.random.default_rng(11)
    images = rng.integers(0, 256, size=(t, 3, h, w)).astype(np.float32)
    fx = fy = 60.0
    intr = np.array(
        [[fx, 0, w / 2], [0, fy, h / 2], [0, 0, 1]], np.float32
    )
    data = {"images": images, "intrinsics": np.stack([intr] * t)}

    out = model.forward(data)

    key = jax.random.PRNGKey(42)  # the adapter's seed
    noise = np.asarray(
        jax.random.normal(key, (t, h // 8, w // 8, 4), jnp.float32)
    )
    aug = np.asarray(
        jax.random.normal(aug_noise_rng(key), (t, h, w, 3), jnp.float32)
    )
    frames01 = np.moveaxis(images, 1, -1) / 255.0
    _, depth_ref = _torch_oracle(tunet, tvae, tclip, frames01, noise, aug, 5)

    # depth = 1/(res+0.1) has slope up to 100 at res→0, so the ~1e-4 f32
    # decode noise (pinned at 1e-3 by the composed test above) can amplify
    # to ~1e-2 here; only real glue divergence (wrong noise stream, wrong
    # postproc) exceeds this.
    rel = np.abs(out["pred_depths"] - depth_ref).max() / np.abs(depth_ref).max()
    assert rel < 1e-2, f"adapter depth rel dev {rel:.2e}"
    # normals exist and are unit length (their math is golden-tested
    # elsewhere; here we pin that the adapter emits the contract)
    n = out["pred_normals"]
    assert n.shape == (t, h, w, 3)
    np.testing.assert_allclose(
        np.linalg.norm(n, axis=-1), 1.0, atol=1e-3
    )
