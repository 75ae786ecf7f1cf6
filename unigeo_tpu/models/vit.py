"""Vision transformer backbone, shared across model stacks.

Used as (a) the CLIP-style image embedder that conditions the SVD UNet
(the reference's pipeline ships a CLIPVisionModelWithProjection inside the
pretrained SVD bundle, model/depthcrafter.py:24-29) and (b) the patch
encoder/decoder for the Spann3R/CUT3R-class pointmap models (CroCo/DUSt3R
lineage ViTs).

Channels-last, fused Pallas attention for long token sequences, bf16-ready.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from unigeo_tpu.models.layers import Attention

CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


class MLP(nn.Module):
    mult: int = 4
    act: str = "gelu"  # CLIP towers use quick_gelu: x * sigmoid(1.702 x)

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = nn.Dense(c * self.mult, name="fc1")(x)
        if self.act == "quick_gelu":
            h = h * jax.nn.sigmoid(1.702 * h)
        else:
            # exact (erf) gelu — torch nn.GELU default, used by CroCo/DUSt3R
            h = nn.gelu(h, approximate=False)
        return nn.Dense(c, name="fc2")(h)


class ViTBlock(nn.Module):
    num_heads: int
    qkv_bias: bool = False
    act: str = "gelu"
    rope_freq: Optional[float] = None  # CroCo/DUSt3R 2D RoPE base
    norm_context: bool = False  # CroCo decoder's per-block norm_y on memory

    @nn.compact
    def __call__(
        self,
        x,
        context: Optional[jnp.ndarray] = None,
        pos: Optional[jnp.ndarray] = None,
        ctx_pos: Optional[jnp.ndarray] = None,
        ctx_mask: Optional[jnp.ndarray] = None,
    ):
        x = x + Attention(
            self.num_heads, qkv_bias=self.qkv_bias, rope_freq=self.rope_freq,
            name="attn",
        )(nn.LayerNorm(epsilon=1e-5, name="norm1")(x), pos=pos)
        if context is not None:
            ctx = (
                nn.LayerNorm(epsilon=1e-5, name="norm_context")(context)
                if self.norm_context
                else context
            )
            x = x + Attention(
                self.num_heads, qkv_bias=self.qkv_bias,
                rope_freq=self.rope_freq, name="cross_attn",
            )(
                nn.LayerNorm(epsilon=1e-5, name="norm_cross")(x), ctx,
                pos=pos, ctx_pos=ctx_pos, ctx_mask=ctx_mask,
            )
        x = x + MLP(act=self.act, name="mlp")(nn.LayerNorm(epsilon=1e-5, name="norm2")(x))
        return x


class _BlockStep(nn.Module):
    """Carry-style ViT block for nn.scan (layer params stacked on axis 0)."""

    num_heads: int
    with_cross: bool = False
    qkv_bias: bool = False
    act: str = "gelu"
    collect: bool = False  # emit the layer output as a scan y (DPT hooks)
    rope_freq: Optional[float] = None
    norm_context: bool = False

    @nn.compact
    def __call__(self, x, context, pos, ctx_pos, ctx_mask):
        x = ViTBlock(
            self.num_heads, self.qkv_bias, self.act, self.rope_freq,
            self.norm_context, name="block",
        )(x, context if self.with_cross else None, pos, ctx_pos, ctx_mask)
        return x, (x if self.collect else None)


class ScannedViTBlocks(nn.Module):
    """A stack of identical ViT blocks compiled as ONE scanned program.

    XLA compile time scales with program size; unrolling 32 CLIP-H blocks
    costs 32× the compile of one.  nn.scan stacks the per-layer params on a
    leading axis and rolls the loop — same math, 1/depth the HLO.
    """

    depth: int
    num_heads: int
    with_cross: bool = False
    qkv_bias: bool = False
    act: str = "gelu"
    return_layers: bool = False  # also return [depth, B, N, C] layer outputs
    rope_freq: Optional[float] = None
    norm_context: bool = False

    @nn.compact
    def __call__(
        self,
        x,
        context: Optional[jnp.ndarray] = None,
        pos: Optional[jnp.ndarray] = None,
        ctx_pos: Optional[jnp.ndarray] = None,
        ctx_mask: Optional[jnp.ndarray] = None,
    ):
        Scan = nn.scan(
            _BlockStep,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.depth,
            in_axes=nn.broadcast,
        )
        x, layers = Scan(
            self.num_heads, self.with_cross, self.qkv_bias, self.act,
            self.return_layers, self.rope_freq, self.norm_context,
            name="layers",
        )(x, context, pos, ctx_pos, ctx_mask)
        if self.return_layers:
            return x, layers
        return x


class PatchEmbed(nn.Module):
    width: int
    patch_size: int
    use_bias: bool = True  # transformers CLIP patch_embedding: bias=False

    @nn.compact
    def __call__(self, images):
        """[B, H, W, 3] → [B, H/p * W/p, width]"""
        p = self.patch_size
        h = nn.Conv(
            self.width, (p, p), strides=(p, p), padding="VALID",
            use_bias=self.use_bias, name="proj",
        )(images)
        b, gh, gw, c = h.shape
        return h.reshape(b, gh * gw, c), (gh, gw)


def sincos_2d_pos_embed(width: int, gh: int, gw: int) -> jnp.ndarray:
    """Fixed 2D sin-cos positional embedding [gh*gw, width]."""
    import numpy as np

    def emb_1d(pos, dim):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", pos, omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    ys, xs = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
    emb = np.concatenate(
        [emb_1d(ys.reshape(-1), width // 2), emb_1d(xs.reshape(-1), width // 2)],
        axis=1,
    )
    return jnp.asarray(emb, jnp.float32)


class VisionTransformer(nn.Module):
    """Plain pre-LN ViT over patch tokens (optionally with a class token)."""

    width: int = 768
    depth: int = 12
    num_heads: int = 12
    patch_size: int = 16
    use_class_token: bool = False
    learned_pos_embed: bool = False
    max_grid: int = 64
    qkv_bias: bool = False
    act: str = "gelu"
    patch_bias: bool = True

    @nn.compact
    def __call__(self, images):
        tokens, (gh, gw) = PatchEmbed(
            self.width, self.patch_size, use_bias=self.patch_bias,
            name="patch_embed",
        )(images)

        if self.use_class_token:
            cls = self.param(
                "class_embedding", nn.initializers.normal(0.02), (self.width,)
            )
            cls_tok = jnp.broadcast_to(cls, (tokens.shape[0], 1, self.width))
            tokens = jnp.concatenate([cls_tok, tokens], axis=1)

        if self.learned_pos_embed:
            # transformers CLIP layout: row 0 is the class-token position,
            # rows 1.. are the patch grid — one table, added after the
            # class token is prepended.
            n_cls = 1 if self.use_class_token else 0
            pos = self.param(
                "pos_embed",
                nn.initializers.normal(0.02),
                (self.max_grid * self.max_grid + n_cls, self.width),
            )
            pos_grid = pos[n_cls:].reshape(self.max_grid, self.max_grid, self.width)[
                :gh, :gw
            ].reshape(gh * gw, self.width)
            pos_full = (
                jnp.concatenate([pos[:n_cls], pos_grid], axis=0)
                if n_cls
                else pos_grid
            )
        else:
            pos_grid = sincos_2d_pos_embed(self.width, gh, gw)
            pos_full = (
                jnp.concatenate(
                    [jnp.zeros((1, self.width), pos_grid.dtype), pos_grid], axis=0
                )
                if self.use_class_token
                else pos_grid
            )
        tokens = tokens + pos_full[None]

        tokens = nn.LayerNorm(epsilon=1e-5, name="pre_norm")(tokens)
        tokens = ScannedViTBlocks(
            self.depth, self.num_heads, qkv_bias=self.qkv_bias, act=self.act,
            name="blocks",
        )(tokens)
        tokens = nn.LayerNorm(epsilon=1e-5, name="post_norm")(tokens)
        return tokens, (gh, gw)


class ClipImageEmbedder(nn.Module):
    """CLIP-style image embedder: frames → one projected token per frame.

    Default dims follow CLIP ViT-H/14 (width 1280, 32 layers, 16 heads,
    projection 1024) — the embedder bundled with SVD checkpoints.
    """

    width: int = 1280
    depth: int = 32
    num_heads: int = 16
    patch_size: int = 14
    projection_dim: int = 1024
    image_size: int = 224

    @nn.compact
    def __call__(self, frames01):
        """[B, H, W, 3] float in [0,1] → [B, 1, projection_dim]"""
        import jax

        # bicubic + antialias ≈ the SVD pipeline's _resize_with_antialiasing
        x = jax.image.resize(
            frames01,
            (frames01.shape[0], self.image_size, self.image_size, 3),
            method="bicubic",
        )
        mean = jnp.asarray(CLIP_IMAGE_MEAN)
        std = jnp.asarray(CLIP_IMAGE_STD)
        x = (x - mean) / std
        tokens, _ = VisionTransformer(
            self.width,
            self.depth,
            self.num_heads,
            self.patch_size,
            use_class_token=True,
            learned_pos_embed=True,
            max_grid=self.image_size // self.patch_size,
            qkv_bias=True,
            act="quick_gelu",
            patch_bias=False,  # transformers CLIPVisionEmbeddings: bias=False
            name="vision_model",
        )(x)
        pooled = tokens[:, 0]
        proj = nn.Dense(self.projection_dim, use_bias=False, name="visual_projection")(
            pooled
        )
        return proj[:, None, :]


def tiny_clip_config():
    return dict(width=32, depth=2, num_heads=2, patch_size=16, projection_dim=32,
                image_size=64)
