"""Spatio-temporal UNet: the denoiser of the DepthCrafter/SVD stack.

Native JAX implementation of the architecture the reference loads from
external torch checkpoints (reference: model/depthcrafter.py:18-29 —
``DiffusersUNetSpatioTemporalConditionModelDepthCrafter``, an SVD-XT UNet:
in 8ch = noisy latent ⊕ per-frame conditioning latent, out 4ch, four stages
at (320, 640, 1280, 1280), attention heads (5, 10, 20, 20) with head_dim 64,
cross-attention to 1024-d per-frame image embeddings).

Every stage interleaves:
  * spatial resnets + spatial/cross attention over the H×W token grid
    (frames folded into batch), and
  * temporal resnets (frame-axis convs) + temporal attention over the frame
    axis (spatial grid folded into batch),
blended by learned AlphaBlenders — so one jitted forward treats the whole
[B, T, H, W, C] clip as a single dense program; attention runs on the fused
Pallas flash kernel for long token sequences.

TPU notes: channels-last layout throughout, bf16-friendly (params f32,
activations cast by the caller), no data-dependent shapes.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from unigeo_tpu.models.layers import (
    AlphaBlender,
    Attention,
    Conv2d,
    FeedForward,
    GroupNorm,
    TemporalConv,
    TimestepEmbedding,
    sinusoidal_embedding,
)


class SpatialResBlock(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x, emb):
        h = GroupNorm(name="norm1")(x)
        h = nn.silu(h)
        h = Conv2d(self.out_ch, name="conv1")(h)
        h = h + nn.Dense(self.out_ch, name="time_emb_proj")(nn.silu(emb))[:, None, None, :]
        h = GroupNorm(name="norm2")(h)
        h = nn.silu(h)
        h = Conv2d(self.out_ch, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = Conv2d(self.out_ch, kernel=1, name="conv_shortcut")(x)
        return x + h


class TemporalResBlock(nn.Module):
    """Resnet over the frame axis ([B, T, H, W, C])."""

    out_ch: int

    @nn.compact
    def __call__(self, x, emb_bt):
        b, t = x.shape[:2]
        h = GroupNorm(name="norm1")(x)
        h = nn.silu(h)
        h = TemporalConv(self.out_ch, name="conv1")(h)
        proj = nn.Dense(self.out_ch, name="time_emb_proj")(nn.silu(emb_bt))
        h = h + proj.reshape(b, t, 1, 1, self.out_ch)
        h = GroupNorm(name="norm2")(h)
        h = nn.silu(h)
        h = TemporalConv(self.out_ch, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Dense(self.out_ch, name="conv_shortcut")(x)
        return x + h


class SpatioTemporalResBlock(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x, emb, num_frames: int):
        s = SpatialResBlock(self.out_ch, name="spatial_res_block")(x, emb)
        bt, hh, ww, c = s.shape
        b = bt // num_frames
        s5 = s.reshape(b, num_frames, hh, ww, c)
        t5 = TemporalResBlock(self.out_ch, name="temporal_res_block")(
            s5, emb.reshape(b, num_frames, -1)
        )
        out = AlphaBlender(name="time_mixer")(s5, t5)
        return out.reshape(bt, hh, ww, c)


class BasicTransformerBlock(nn.Module):
    num_heads: int
    head_dim: int
    context_dim: int

    @nn.compact
    def __call__(self, x, context):
        x = x + Attention(self.num_heads, self.head_dim, name="attn1")(
            nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        )
        x = x + Attention(
            self.num_heads, self.head_dim, context_dim=self.context_dim, name="attn2"
        )(nn.LayerNorm(epsilon=1e-5, name="norm2")(x), context)
        x = x + FeedForward(name="ff")(nn.LayerNorm(epsilon=1e-5, name="norm3")(x))
        return x


class TemporalTransformerBlock(nn.Module):
    num_heads: int
    head_dim: int
    context_dim: int

    @nn.compact
    def __call__(self, x, context):
        # feed-forward-in with residual, then temporal self-attn, cross, ff
        h = nn.LayerNorm(epsilon=1e-5, name="norm_in")(x)
        x = x + FeedForward(name="ff_in")(h)
        x = x + Attention(self.num_heads, self.head_dim, name="attn1")(
            nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        )
        x = x + Attention(
            self.num_heads, self.head_dim, context_dim=self.context_dim, name="attn2"
        )(nn.LayerNorm(epsilon=1e-5, name="norm2")(x), context)
        x = x + FeedForward(name="ff")(nn.LayerNorm(epsilon=1e-5, name="norm3")(x))
        return x


class TransformerSpatioTemporal(nn.Module):
    num_heads: int
    head_dim: int
    context_dim: int

    @nn.compact
    def __call__(self, x, context, num_frames: int):
        bt, hh, ww, c = x.shape
        b = bt // num_frames
        residual = x

        h = GroupNorm(epsilon=1e-6, name="norm")(x)
        h = h.reshape(bt, hh * ww, c)
        h = nn.Dense(c, name="proj_in")(h)

        h = BasicTransformerBlock(
            self.num_heads, self.head_dim, self.context_dim, name="transformer_blocks_0"
        )(h, context)

        # temporal pass: tokens regrouped to [B*HW, T, C]
        ht = h.reshape(b, num_frames, hh * ww, c).transpose(0, 2, 1, 3)
        ht = ht.reshape(b * hh * ww, num_frames, c)
        frame_emb = sinusoidal_embedding(jnp.arange(num_frames), c)
        # diffusers TimestepEmbedding(C, 4C, out_dim=C)
        frame_emb = TimestepEmbedding(c, hidden_dim=4 * c, name="time_pos_embed")(
            frame_emb
        )
        ht = ht + frame_emb[None]
        # temporal cross-attention context: the keyview-frame embedding,
        # shared across spatial positions
        ctx_first = context.reshape(b, num_frames, *context.shape[1:])[:, 0]
        ctx_t = jnp.broadcast_to(
            ctx_first[:, None], (b, hh * ww, *ctx_first.shape[1:])
        ).reshape(b * hh * ww, *ctx_first.shape[1:])
        ht = TemporalTransformerBlock(
            self.num_heads, self.head_dim, self.context_dim,
            name="temporal_transformer_blocks_0",
        )(ht, ctx_t)
        ht = ht.reshape(b, hh * ww, num_frames, c).transpose(0, 2, 1, 3)
        ht = ht.reshape(bt, hh * ww, c)

        h = AlphaBlender(name="time_mixer")(h, ht)
        h = nn.Dense(c, name="proj_out")(h)
        return h.reshape(bt, hh, ww, c) + residual


class Downsample(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x):
        return Conv2d(self.out_ch, stride=2, padding=1, name="conv")(x)


class Upsample(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x):
        # nearest-2x upsample + conv fused into one lhs-dilated conv
        return Conv2d(self.out_ch, fuse_upsample2x=True, name="conv")(x)


class UNetSpatioTemporal(nn.Module):
    """The full denoiser.

    __call__(sample [B*T, H, W, in_ch], timestep [B], context [B*T, S, ctx],
             added_time_ids [B, 3], num_frames) → [B*T, H, W, out_ch]
    """

    in_channels: int = 8
    out_channels: int = 4
    block_out_channels: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    num_attention_heads: Sequence[int] = (5, 10, 20, 20)
    cross_attention_dim: int = 1024
    addition_time_embed_dim: int = 256
    head_dim: int = 64

    @nn.compact
    def __call__(self, sample, timesteps, context, added_time_ids, num_frames: int):
        ch0 = self.block_out_channels[0]
        time_dim = ch0 * 4
        b = timesteps.shape[0]

        # --- embeddings ---
        t_emb = sinusoidal_embedding(timesteps, ch0)
        emb = TimestepEmbedding(time_dim, name="time_embedding")(t_emb)
        add_emb = sinusoidal_embedding(
            added_time_ids.reshape(-1), self.addition_time_embed_dim
        ).reshape(b, -1)
        emb = emb + TimestepEmbedding(time_dim, name="add_embedding")(add_emb)
        emb_bt = jnp.repeat(emb, num_frames, axis=0)  # [B*T, time_dim]

        h = Conv2d(ch0, name="conv_in")(sample)

        skips = [h]
        n_stages = len(self.block_out_channels)
        # --- down path ---
        for i, ch in enumerate(self.block_out_channels):
            has_attn = i < n_stages - 1
            for j in range(self.layers_per_block):
                h = SpatioTemporalResBlock(ch, name=f"down_{i}_res_{j}")(
                    h, emb_bt, num_frames
                )
                if has_attn:
                    h = TransformerSpatioTemporal(
                        self.num_attention_heads[i],
                        self.head_dim,
                        self.cross_attention_dim,
                        name=f"down_{i}_attn_{j}",
                    )(h, context, num_frames)
                skips.append(h)
            if i < n_stages - 1:
                h = Downsample(ch, name=f"down_{i}_downsample")(h)
                skips.append(h)

        # --- mid ---
        ch = self.block_out_channels[-1]
        h = SpatioTemporalResBlock(ch, name="mid_res_0")(h, emb_bt, num_frames)
        h = TransformerSpatioTemporal(
            self.num_attention_heads[-1], self.head_dim, self.cross_attention_dim,
            name="mid_attn",
        )(h, context, num_frames)
        h = SpatioTemporalResBlock(ch, name="mid_res_1")(h, emb_bt, num_frames)

        # --- up path ---
        for i, ch in enumerate(reversed(self.block_out_channels)):
            stage = n_stages - 1 - i
            has_attn = stage < n_stages - 1
            for j in range(self.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = SpatioTemporalResBlock(ch, name=f"up_{i}_res_{j}")(
                    h, emb_bt, num_frames
                )
                if has_attn:
                    h = TransformerSpatioTemporal(
                        self.num_attention_heads[stage],
                        self.head_dim,
                        self.cross_attention_dim,
                        name=f"up_{i}_attn_{j}",
                    )(h, context, num_frames)
            if stage > 0:
                h = Upsample(ch, name=f"up_{i}_upsample")(h)

        h = GroupNorm(name="conv_norm_out")(h)
        h = nn.silu(h)
        return Conv2d(self.out_channels, name="conv_out")(h)


def tiny_unet_config():
    """Small config for tests and CPU dry-runs."""
    return dict(
        block_out_channels=(32, 48, 64, 64),
        num_attention_heads=(1, 2, 2, 2),
        cross_attention_dim=32,
        addition_time_embed_dim=16,
        head_dim=16,
        layers_per_block=1,
    )
