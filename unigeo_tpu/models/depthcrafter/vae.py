"""VAE with temporal decoder (the SVD ``AutoencoderKLTemporalDecoder``).

The reference gets this from the pretrained SVD pipeline
(model/depthcrafter.py:24-29).  Native JAX here:

  * Encoder — standard SD VAE encoder, per-frame 2D: 4 stages
    (128, 256, 512, 512) × 2 resnets, stride-2 downsamples, mid block with
    single-head attention; outputs 2×4ch moments, latents scaled by 0.18215.
  * TemporalDecoder — SVD's video decoder: spatio-temporal resnets
    (frame-axis convs blended with a learned alpha), mid attention, and a
    final frame-axis conv_out so decoded frames are temporally consistent.

Channels-last, jit-friendly, frames folded into batch for all 2D ops.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from unigeo_tpu.models.layers import (
    Attention,
    Conv2d,
    GroupNorm,
    TemporalConv,
    AlphaBlender,
)

SVD_VAE_SCALING = 0.18215


class VaeResBlock(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x):
        h = GroupNorm(epsilon=1e-6, name="norm1")(x)
        h = nn.silu(h)
        h = Conv2d(self.out_ch, name="conv1")(h)
        h = GroupNorm(epsilon=1e-6, name="norm2")(h)
        h = nn.silu(h)
        h = Conv2d(self.out_ch, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = Conv2d(self.out_ch, kernel=1, name="conv_shortcut")(x)
        return x + h


class VaeAttnBlock(nn.Module):
    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = GroupNorm(epsilon=1e-6, name="group_norm")(x)
        y = y.reshape(b, h * w, c)
        y = Attention(num_heads=1, head_dim=c, name="attn")(y)
        return x + y.reshape(b, h, w, c)


class TemporalVaeResBlock(nn.Module):
    """Spatial resnet + frame-axis conv mix (decoder only)."""

    out_ch: int

    @nn.compact
    def __call__(self, x, num_frames: int):
        s = VaeResBlock(self.out_ch, name="spatial_res_block")(x)
        bt, hh, ww, c = s.shape
        b = bt // num_frames
        s5 = s.reshape(b, num_frames, hh, ww, c)
        t5 = TemporalConv(self.out_ch, name="time_conv_1")(s5)
        t5 = nn.silu(t5)
        t5 = TemporalConv(self.out_ch, name="time_conv_2")(t5)
        out = AlphaBlender(name="time_mixer")(s5, t5)
        return out.reshape(bt, hh, ww, c)


class Encoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4

    @nn.compact
    def __call__(self, x):
        h = Conv2d(self.block_out_channels[0], name="conv_in")(x)
        for i, ch in enumerate(self.block_out_channels):
            for j in range(self.layers_per_block):
                h = VaeResBlock(ch, name=f"down_{i}_res_{j}")(h)
            if i < len(self.block_out_channels) - 1:
                h = Conv2d(ch, stride=2, padding=0, name=f"down_{i}_downsample")(
                    jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                )
        ch = self.block_out_channels[-1]
        h = VaeResBlock(ch, name="mid_res_0")(h)
        h = VaeAttnBlock(name="mid_attn")(h)
        h = VaeResBlock(ch, name="mid_res_1")(h)
        h = GroupNorm(epsilon=1e-6, name="conv_norm_out")(h)
        h = nn.silu(h)
        moments = Conv2d(2 * self.latent_channels, name="conv_out")(h)
        return moments  # mean ⊕ logvar


class TemporalDecoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    out_channels: int = 3

    @nn.compact
    def __call__(self, z, num_frames: int):
        ch_top = self.block_out_channels[-1]
        h = Conv2d(ch_top, name="conv_in")(z)
        h = TemporalVaeResBlock(ch_top, name="mid_res_0")(h, num_frames)
        h = VaeAttnBlock(name="mid_attn")(h)
        h = TemporalVaeResBlock(ch_top, name="mid_res_1")(h, num_frames)

        for i, ch in enumerate(reversed(self.block_out_channels)):
            for j in range(self.layers_per_block + 1):
                h = TemporalVaeResBlock(ch, name=f"up_{i}_res_{j}")(h, num_frames)
            if i < len(self.block_out_channels) - 1:
                bt, hh, ww, c = h.shape
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                h = Conv2d(c, name=f"up_{i}_upsample")(h)

        h = GroupNorm(epsilon=1e-6, name="conv_norm_out")(h)
        h = nn.silu(h)
        h = Conv2d(self.out_channels, name="conv_out")(h)
        # final frame-axis conv for temporal consistency
        bt, hh, ww, c = h.shape
        b = bt // num_frames
        h5 = h.reshape(b, num_frames, hh, ww, c)
        h5 = TemporalConv(self.out_channels, name="time_conv_out")(h5)
        return h5.reshape(bt, hh, ww, c)


class AutoencoderKLTemporal(nn.Module):
    """encode(frames) → scaled latents; decode(latents) → frames."""

    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    scaling_factor: float = SVD_VAE_SCALING

    def setup(self):
        self.encoder = Encoder(
            self.block_out_channels, self.layers_per_block, self.latent_channels
        )
        self.decoder = TemporalDecoder(
            self.block_out_channels, self.layers_per_block, self.latent_channels
        )

    def encode(self, frames):
        """[B*T, H, W, 3] in [-1,1] → latent mean [B*T, H/8, W/8, 4], scaled."""
        moments = self.encoder(frames)
        mean = moments[..., : self.latent_channels]
        return mean * self.scaling_factor

    def decode(self, latents, num_frames: int):
        """Scaled latents → frames [B*T, H, W, 3] (≈[-1,1])."""
        return self.decoder(latents / self.scaling_factor, num_frames)

    def __call__(self, frames, num_frames: int):
        return self.decode(self.encode(frames), num_frames)


def tiny_vae_config():
    return dict(block_out_channels=(16, 24, 32, 32), layers_per_block=1)
