"""Shared backbone for feed-forward pointmap regressors (CroCo/DUSt3R
lineage): ViT patch encoder, cross-attending decoder, pointmap head.

The reference wraps external torch checkpoints of this family
(model/spann3r.py:16-21 — Spann3R on a DUSt3R ViT; model/cut3r.py:18-26 —
ARCroco3DStereo).  This is the native TPU implementation those stacks share:
per-frame ViT encoding (frames folded into batch, fused Pallas attention),
a decoder whose blocks self-attend within a frame and cross-attend to
context tokens (memory / other view / state), and a linear patch head
emitting per-pixel 3D points + confidence.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from unigeo_tpu.models.vit import (
    PatchEmbed,
    ScannedViTBlocks,
    ViTBlock,
    sincos_2d_pos_embed,
)


def _rope_freq(pos_embed: str) -> Optional[float]:
    """'RoPE100' / 'rope100' → 100.0; 'sincos' → None (additive sin-cos)."""
    if pos_embed.lower().startswith("rope"):
        return float(pos_embed[4:] or 100.0)
    return None


class PointmapEncoder(nn.Module):
    width: int = 768
    depth: int = 8
    num_heads: int = 12
    patch_size: int = 16
    pos_embed: str = "sincos"  # "sincos" | "RoPE100" (the DUSt3R/CroCo mode)
    qkv_bias: bool = False  # CroCo ViTs: True

    @nn.compact
    def __call__(self, images):
        """[B, H, W, 3] (≈[-1,1]) → tokens [B, N, width], grid (gh, gw).

        Any aspect ratio is supported — portrait included.  The reference's
        DUSt3R lineage handles portrait via a landscape-transpose head
        wrapper (/root/reference/metrics/misc.py:56-106) because its torch
        nets bake a landscape token grid; here the patch grid, sin-cos
        tables, and RoPE positions all derive from the INPUT shape, so a
        portrait clip is simply another jitted specialization of the same
        program (XLA recompiles per (H, W) — the TPU-native equivalent of
        that wrapper).  tests/test_portrait.py pins this end to end.
        """
        from unigeo_tpu.ops.rope import grid_positions

        h, w = images.shape[1:3]
        if h % self.patch_size or w % self.patch_size:
            raise ValueError(
                f"input {h}x{w} is not divisible by patch_size="
                f"{self.patch_size}; resize/crop the clip (the reference "
                "crops to multiples of 16 in its dataset transforms)"
            )
        tokens, (gh, gw) = PatchEmbed(self.width, self.patch_size, name="patch_embed")(
            images
        )
        freq = _rope_freq(self.pos_embed)
        pos = None
        if freq is None:
            # astype keeps a bf16 compute path bf16 (the f32 table would
            # silently promote every downstream matmul)
            tokens = tokens + sincos_2d_pos_embed(self.width, gh, gw).astype(
                tokens.dtype
            )[None]
        else:
            pos = grid_positions(gh, gw)[None]
        tokens = ScannedViTBlocks(
            self.depth, self.num_heads, qkv_bias=self.qkv_bias,
            rope_freq=freq, name="blocks",
        )(tokens, pos=pos)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(tokens), (gh, gw)


class PointmapDecoder(nn.Module):
    width: int = 512
    depth: int = 6
    num_heads: int = 8
    return_hooks: bool = False  # also return 4 evenly-spaced layer outputs
    pos_embed: str = "sincos"
    qkv_bias: bool = False
    norm_context: bool = False  # CroCo norm_y (per-block memory LayerNorm)

    @nn.compact
    def __call__(self, tokens, context, pos=None, ctx_pos=None, ctx_mask=None):
        """tokens [B, N, C_enc] cross-attend to context [B, M, width].

        pos / ctx_pos: (y, x) patch positions for RoPE mode (entries with
        y < 0 — e.g. state/memory tokens without a grid slot — unrotated).
        ctx_mask: optional [M] / [B, M] key-validity mask (empty ring-memory
        slots must get zero softmax weight, not just zero values).
        """
        h = nn.Dense(self.width, name="proj_in")(tokens)
        out = ScannedViTBlocks(
            self.depth, self.num_heads, with_cross=True,
            return_layers=self.return_hooks, qkv_bias=self.qkv_bias,
            rope_freq=_rope_freq(self.pos_embed),
            norm_context=self.norm_context, name="blocks",
        )(h, context, pos=pos, ctx_pos=ctx_pos, ctx_mask=ctx_mask)
        if not self.return_hooks:
            return nn.LayerNorm(epsilon=1e-5, name="norm")(out)
        h, layers = out
        final = nn.LayerNorm(epsilon=1e-5, name="norm")(h)
        # DPT hook points, dust3r convention (dpt_head hooks_idx
        # [0, 2L/4, 3L/4, L] over the list [encoder_out, block_1..block_L]):
        # hook 0 is the PRE-decoder ENCODER tokens (enc width — torch
        # act_postprocess.0.0 has in_channels=enc_embed_dim), hooks 1-2 are
        # decoder blocks 2L/4 and 3L/4, hook 3 the normed final output.
        hooks = [
            tokens,
            layers[self.depth * 2 // 4 - 1],
            layers[self.depth * 3 // 4 - 1],
            final,
        ]
        return final, hooks


class PointmapHead(nn.Module):
    """Linear patch head: tokens → [H, W, 3] points + [H, W] confidence.

    Depth-range handling: z comes out through an exp, matching the
    DUSt3R-family convention of positive-depth parameterization.
    """

    patch_size: int = 16

    @nn.compact
    def __call__(self, tokens, grid: Tuple[int, int]):
        gh, gw = grid
        p = self.patch_size
        out = nn.Dense(p * p * 4, name="proj")(tokens)  # xyz + conf
        b = tokens.shape[0]
        out = out.reshape(b, gh, gw, p, p, 4)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * p, gw * p, 4)
        xyz = out[..., :3]
        # positive-z parameterization: keep xy linear, softplus-ish z
        z = jnp.exp(jnp.clip(xyz[..., 2:3], -10.0, 8.0))
        pts = jnp.concatenate([xyz[..., :2], z], axis=-1)
        conf = 1.0 + jnp.exp(jnp.clip(out[..., 3], -10.0, 8.0))
        return pts, conf


class PoseHead(nn.Module):
    """Pool tokens → 7-DoF absT_quaR pose encoding."""

    @nn.compact
    def __call__(self, tokens):
        pooled = jnp.mean(tokens, axis=1)
        h = nn.Dense(256, name="fc1")(pooled)
        h = nn.gelu(h)
        enc = nn.Dense(7, name="fc2")(h)
        # bias the quaternion toward identity: add (1,0,0,0)
        quat = enc[..., 3:] + jnp.asarray([1.0, 0.0, 0.0, 0.0])
        quat = quat / jnp.maximum(
            jnp.linalg.norm(quat, axis=-1, keepdims=True), 1e-8
        )
        return jnp.concatenate([enc[..., :3], quat], axis=-1)


def normalize_images(images01):
    """0..1 images → ±0.5-normalized (DUSt3R's ImgNorm, model/utils.py:19)."""
    return (images01 - 0.5) / 0.5
