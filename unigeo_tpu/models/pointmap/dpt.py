"""DPT regression head for the pointmap family (DUSt3R/Spann3R/CUT3R
lineage).

The external networks the reference wraps (model/spann3r.py:16-21,
model/cut3r.py:18-26) regress pointmaps through DPT-style heads (Ranftl et
al. 2021, as instantiated by dust3r's ``dpt_block.py``), not linear patch
heads.  This is the native flax implementation with the SAME structure and
parameter naming as the torch original so real checkpoints convert
leaf-for-leaf (utils/convert_dust3r.py):

  act_postprocess.{0..3}   1×1 conv to layer_dims[k] + resample
                           (×4 deconv, ×2 deconv, identity, ×1/2 conv)
  scratch.layer{1..4}_rn   3×3 conv → feature dim (no bias)
  scratch.refinenet{1..4}  FeatureFusionBlock: 2 residual conv units,
                           ×2 upsample, 1×1 out conv
  head.{0,2,4}             3×3 conv → ×2 upsample → 3×3 conv → ReLU → 1×1

Channels-last throughout; every op is a conv/resize XLA maps straight onto
the MXU — no token gathers or dynamic shapes.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _tokens_to_map(tokens, grid):
    """[B, N, C] → [B, gh, gw, C]."""
    b, n, c = tokens.shape
    gh, gw = grid
    return tokens.reshape(b, gh, gw, c)


def _resize_to(x, oh: int, ow: int):
    """Bilinear resize to an arbitrary size with align_corners=True (the
    torch DPT convention: F.interpolate(..., align_corners=True))."""
    b, h, w, c = x.shape
    if (h, w) == (oh, ow):
        return x
    if h <= 1 or w <= 1:
        return jax.image.resize(x, (b, oh, ow, c), method="nearest")
    # align_corners mapping in = out·(h-1)/(oh-1); scale_and_translate uses
    # half-pixel centers (in = (out + 0.5 - translation)/scale - 0.5·0), so
    # scale = (oh-1)/(h-1) with translation 0.5 reproduces it exactly
    # align_corners mapping: in = out·(h-1)/(oh-1).  scale_and_translate
    # samples in = (out + 0.5 - translation)/scale - 0.5, so scale =
    # (oh-1)/(h-1) and translation = 0.5 - 0.5·scale reproduce it exactly
    # (verified against torch F.interpolate align_corners=True).
    scale = jnp.asarray([(oh - 1) / (h - 1), (ow - 1) / (w - 1)], jnp.float32)
    return jax.image.scale_and_translate(
        x, (b, oh, ow, c), (1, 2), scale, 0.5 - 0.5 * scale,
        method="linear", antialias=False,
    )


def _resize2x(x):
    """Bilinear ×2, align_corners=True."""
    return _resize_to(x, 2 * x.shape[1], 2 * x.shape[2])


class ResidualConvUnit(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding=1, name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, name="conv2")(h)
        return x + h


class FeatureFusionBlock(nn.Module):
    """dust3r FeatureFusionBlock_custom (deconv=False, bn=False,
    expand=False): fuse the skip via resConfUnit1, refine via resConfUnit2,
    upsample ×2, 1×1 project."""

    features: int

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            # odd token grids (e.g. DINOv2 patch 14 on 384×512 → 27×36):
            # the deeper path's stride-2 down + ×2 up lands one row/col off
            # the skip — resize to the skip's grid before fusing, the
            # DepthAnything DPTHead convention.  Even grids: no-op, so the
            # torch-parity path is untouched.
            x = _resize_to(x, skip.shape[1], skip.shape[2])
            x = x + ResidualConvUnit(self.features, name="resConfUnit1")(skip)
        x = ResidualConvUnit(self.features, name="resConfUnit2")(x)
        x = _resize2x(x)
        return nn.Conv(self.features, (1, 1), name="out_conv")(x)


class DPTHead(nn.Module):
    """4 hooked token sets → dense [H, W, out_channels] map.

    __call__(hooked: 4×[B, N, C_i], grid) → [B, gh*patch, gw*patch, out].
    Resolutions per hook follow dust3r: ×4, ×2, ×1, ×1/2 of the token grid,
    fused top-down; the head upsamples twice more (×2 fusion + ×2 head), so
    with patch 16 the output lands exactly at the input pixel grid.
    """

    out_channels: int = 4
    feature_dim: int = 256
    layer_dims: Sequence[int] = (96, 192, 384, 768)
    head_dim: int = 128

    @nn.compact
    def __call__(self, hooked, grid: Tuple[int, int]):
        assert len(hooked) == 4, "DPT expects 4 hooked layers"
        maps = [_tokens_to_map(t, grid) for t in hooked]

        d0, d1, d2, d3 = self.layer_dims
        # act_postprocess: project + resample each hook to its pyramid level
        l0 = nn.Conv(d0, (1, 1), name="act_postprocess_0_proj")(maps[0])
        l0 = nn.ConvTranspose(
            d0, (4, 4), strides=(4, 4), name="act_postprocess_0_resample"
        )(l0)
        l1 = nn.Conv(d1, (1, 1), name="act_postprocess_1_proj")(maps[1])
        l1 = nn.ConvTranspose(
            d1, (2, 2), strides=(2, 2), name="act_postprocess_1_resample"
        )(l1)
        l2 = nn.Conv(d2, (1, 1), name="act_postprocess_2_proj")(maps[2])
        l3 = nn.Conv(d3, (1, 1), name="act_postprocess_3_proj")(maps[3])
        l3 = nn.Conv(
            d3, (3, 3), strides=(2, 2), padding=1, name="act_postprocess_3_resample"
        )(l3)

        f = self.feature_dim
        r0 = nn.Conv(f, (3, 3), padding=1, use_bias=False, name="layer1_rn")(l0)
        r1 = nn.Conv(f, (3, 3), padding=1, use_bias=False, name="layer2_rn")(l1)
        r2 = nn.Conv(f, (3, 3), padding=1, use_bias=False, name="layer3_rn")(l2)
        r3 = nn.Conv(f, (3, 3), padding=1, use_bias=False, name="layer4_rn")(l3)

        # top-down fusion (refinenet4 deepest → refinenet1 finest)
        p = FeatureFusionBlock(f, name="refinenet4")(r3)
        p = FeatureFusionBlock(f, name="refinenet3")(p, r2)
        p = FeatureFusionBlock(f, name="refinenet2")(p, r1)
        p = FeatureFusionBlock(f, name="refinenet1")(p, r0)
        # p is now at ×8 the token grid (×1/2 → fused up to ×4 → ×8)

        h = nn.Conv(self.head_dim, (3, 3), padding=1, name="head_0")(p)
        h = _resize2x(h)
        h = nn.Conv(self.head_dim, (3, 3), padding=1, name="head_2")(h)
        h = nn.relu(h)
        return nn.Conv(self.out_channels, (1, 1), name="head_4")(h)


class DPTPointmapHead(nn.Module):
    """DPT trunk + DUSt3R postprocess (exp-z points, 1+exp confidence).

    Drop-in replacement for the linear PointmapHead: same output contract
    ([B, gh*p, gw*p, 3] points, [B, gh*p, gw*p] confidence), driven by 4
    hooked decoder layers instead of the final tokens alone.
    """

    patch_size: int = 16
    feature_dim: int = 256
    layer_dims: Sequence[int] = (96, 192, 384, 768)

    @nn.compact
    def __call__(self, hooked, grid: Tuple[int, int]):
        gh, gw = grid
        out = DPTHead(
            out_channels=4, feature_dim=self.feature_dim,
            layer_dims=self.layer_dims, name="dpt",
        )(hooked, grid)
        # DPT's intrinsic ×16 total upsampling matches patch 16; resize for
        # other patch sizes so the contract holds
        target = (out.shape[0], gh * self.patch_size, gw * self.patch_size, 4)
        if out.shape != target:
            out = jax.image.resize(out, target, method="bilinear")
        xyz = out[..., :3]
        z = jnp.exp(jnp.clip(xyz[..., 2:3], -10.0, 8.0))
        pts = jnp.concatenate([xyz[..., :2], z], axis=-1)
        conf = 1.0 + jnp.exp(jnp.clip(out[..., 3], -10.0, 8.0))
        return pts, conf
