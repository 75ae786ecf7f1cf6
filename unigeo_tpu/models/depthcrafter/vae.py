"""VAE with temporal decoder (the SVD ``AutoencoderKLTemporalDecoder``).

The reference gets this from the pretrained SVD pipeline
(model/depthcrafter.py:24-29).  Native JAX here, structured exactly like the
diffusers module so real checkpoints convert leaf-for-leaf:

  * Encoder — standard SD VAE encoder, per-frame 2D: 4 stages
    (128, 256, 512, 512) × 2 resnets, stride-2 downsamples, mid block with
    single-head attention; conv_out emits 2×4ch moments, then a 1×1
    ``quant_conv``.  ``encode`` returns the distribution mode (mean),
    UNSCALED — SVD concatenates raw conditioning latents; the 0.18215
    scaling applies only to the denoised-latent space (see pipeline.py).
  * TemporalDecoder — SVD's video decoder: mid + up blocks of
    SpatioTemporalResBlocks (a spatial resnet and a frame-axis temporal
    resnet blended by an AlphaBlender with merge_factor init 0.0 and
    switch_spatial_to_temporal_mix=True), mid attention, and a final
    frame-axis ``time_conv_out`` so decoded frames are temporally
    consistent.

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
    """diffusers ResnetBlock2D with temb_channels=None (VAE flavor)."""

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
    """Single-head attention block (diffusers Attention with
    residual_connection=True, bias=True on q/k/v/out)."""

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = GroupNorm(epsilon=1e-6, name="group_norm")(x)
        y = y.reshape(b, h * w, c)
        y = Attention(num_heads=1, head_dim=c, qkv_bias=True, name="attn")(y)
        return x + y.reshape(b, h, w, c)


class TemporalResnetBlock(nn.Module):
    """diffusers TemporalResnetBlock (temb_channels=None): resnet over the
    frame axis with (3,1,1) convs; 1×1×1-conv shortcut expressed as Dense.
    eps = the decoder's temporal_eps (1e-5)."""

    out_ch: int

    @nn.compact
    def __call__(self, x):  # [B, T, H, W, C]
        h = GroupNorm(epsilon=1e-5, name="norm1")(x)
        h = nn.silu(h)
        h = TemporalConv(self.out_ch, name="conv1")(h)
        h = GroupNorm(epsilon=1e-5, name="norm2")(h)
        h = nn.silu(h)
        h = TemporalConv(self.out_ch, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Dense(self.out_ch, name="conv_shortcut")(x)
        return x + h


class VaeSpatioTemporalResBlock(nn.Module):
    """diffusers SpatioTemporalResBlock as instantiated by
    MidBlockTemporalDecoder / UpBlockTemporalDecoder: no time embedding,
    merge_strategy="learned", merge_factor=0.0,
    switch_spatial_to_temporal_mix=True."""

    out_ch: int

    @nn.compact
    def __call__(self, x, num_frames: int):
        s = VaeResBlock(self.out_ch, name="spatial_res_block")(x)
        bt, hh, ww, c = s.shape
        b = bt // num_frames
        s5 = s.reshape(b, num_frames, hh, ww, c)
        t5 = TemporalResnetBlock(self.out_ch, name="temporal_res_block")(s5)
        out = AlphaBlender(merge_factor=0.0, switch=True, name="time_mixer")(s5, t5)
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
        h = VaeSpatioTemporalResBlock(ch_top, name="mid_res_0")(h, num_frames)
        h = VaeAttnBlock(name="mid_attn")(h)
        h = VaeSpatioTemporalResBlock(ch_top, name="mid_res_1")(h, num_frames)

        for i, ch in enumerate(reversed(self.block_out_channels)):
            for j in range(self.layers_per_block + 1):
                h = VaeSpatioTemporalResBlock(ch, name=f"up_{i}_res_{j}")(h, num_frames)
            if i < len(self.block_out_channels) - 1:
                c = h.shape[-1]
                # nearest-2x upsample + conv fused into one lhs-dilated conv
                h = Conv2d(c, fuse_upsample2x=True, name=f"up_{i}_upsample")(h)

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
    """encode(frames) → UNSCALED latent mode; decode(scaled latents) → frames."""

    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    scaling_factor: float = SVD_VAE_SCALING

    def setup(self):
        self.encoder = Encoder(
            self.block_out_channels, self.layers_per_block, self.latent_channels
        )
        self.quant_conv = Conv2d(2 * self.latent_channels, kernel=1, name="quant_conv")
        self.decoder = TemporalDecoder(
            self.block_out_channels, self.layers_per_block, self.latent_channels
        )

    def encode(self, frames):
        """[B*T, H, W, 3] in [-1,1] → latent mode [B*T, H/8, W/8, 4], UNSCALED
        (SVD semantics: conditioning latents enter the UNet raw; only the
        denoised-latent space carries the 0.18215 scaling)."""
        moments = self.quant_conv(self.encoder(frames))
        return moments[..., : self.latent_channels]

    def encode_scaled(self, frames):
        """Mode × scaling_factor — the denoised/training latent space."""
        return self.encode(frames) * self.scaling_factor

    def decode(self, latents, num_frames: int):
        """Scaled latents → frames [B*T, H, W, 3] (≈[-1,1])."""
        return self.decoder(latents / self.scaling_factor, num_frames)

    def __call__(self, frames, num_frames: int):
        return self.decode(self.encode_scaled(frames), num_frames)


def tiny_vae_config():
    return dict(block_out_channels=(16, 24, 32, 32), layers_per_block=1)
