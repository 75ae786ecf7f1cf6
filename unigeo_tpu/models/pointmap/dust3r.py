"""DUSt3R-class two-view pointmap regression (the lineage parent of the
Spann3R/Cut3R stacks).

The reference lists Dust3R as a supported method (model/Readme.md:4) and
builds its other pointmap adapters on DUSt3R checkpoints
(model/spann3r.py:16-21 "dust3r_path") and DUSt3R input conventions
(model/utils.py:6-71 prepare_input_Dust3R), but the snapshot ships no
Dust3R adapter of its own.  This is the native implementation of the
method itself: a siamese ViT encoder over both views and DUSt3R's two
ENTANGLED decoders — at every layer, decoder 1 cross-attends to decoder
2's previous-layer tokens and vice versa — with two heads emitting
view-1-frame pointmaps for both views plus confidences.

TPU-first design:
- the entangled layer pair is ONE nn.scan over depth (carry = both token
  streams, per-layer params stacked on axis 0): compile cost of a single
  layer regardless of depth;
- clip inference runs all (frame0, frame_i) pairs as ONE vmapped jitted
  program instead of the per-pair python loop DUSt3R's own inference
  utilities use — frame 0 is the keyview/world frame in the unified
  sample contract (dataset/Readme.md:22-33), so one-ref pairing directly
  yields world pointmaps and no global-alignment stage is needed;
- depth + cameras are recovered from the pointmaps exactly like the
  reference's other pointmap adapters (model/spann3r.py:41-56 →
  metrics/utils.py:120-160): Weiszfeld focal + batched DLT-PnP.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from unigeo_tpu.models.pointmap import adapter
from unigeo_tpu.models.pointmap.network import (
    PointmapEncoder,
    PointmapHead,
    _rope_freq,
    normalize_images,
)
from unigeo_tpu.models.vit import ViTBlock
from unigeo_tpu.registry import MODELS


class _EntangledStep(nn.Module):
    """One layer of both entangled decoders (scanned over depth).

    DUSt3R semantics: x1_new = blk1(x1, context=x2_prev),
    x2_new = blk2(x2, context=x1_prev) — each stream cross-attends to the
    OTHER stream's previous-layer output, with separate weights per stream
    (torch dec_blocks / dec_blocks2).
    """

    num_heads: int
    qkv_bias: bool = False
    rope_freq: Optional[float] = None
    norm_context: bool = False
    collect: bool = False  # emit layer outputs as scan ys (DPT hooks)

    @nn.compact
    def __call__(self, carry, pos):
        x1, x2 = carry
        y1 = ViTBlock(
            self.num_heads, self.qkv_bias, rope_freq=self.rope_freq,
            norm_context=self.norm_context, name="block1",
        )(x1, x2, pos, pos)
        y2 = ViTBlock(
            self.num_heads, self.qkv_bias, rope_freq=self.rope_freq,
            norm_context=self.norm_context, name="block2",
        )(x2, x1, pos, pos)
        return (y1, y2), ((y1, y2) if self.collect else None)


class EntangledDecoder(nn.Module):
    """DUSt3R's decoder pair: shared decoder_embed projection, dec_depth
    entangled layers (one nn.scan), shared-in-torch final norm (kept as two
    flax scopes norm1/norm2 — the converter duplicates torch dec_norm into
    both, numerics-equivalent).

    Returns (f1, f2) and, when collect=True, the per-layer stacks
    (l1, l2) each [depth, B, N, C] for DPT hooks.
    """

    dec_width: int
    dec_depth: int
    dec_heads: int
    qkv_bias: bool = False
    rope_freq: Optional[float] = None
    norm_context: bool = False
    collect: bool = False

    @nn.compact
    def __call__(self, e1, e2, pos=None):
        proj = nn.Dense(self.dec_width, name="decoder_embed")
        x1, x2 = proj(e1), proj(e2)
        Scan = nn.scan(
            _EntangledStep,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.dec_depth,
            in_axes=nn.broadcast,
        )
        (x1, x2), layers = Scan(
            self.dec_heads, self.qkv_bias, self.rope_freq, self.norm_context,
            self.collect, name="layers",
        )((x1, x2), pos)
        f1 = nn.LayerNorm(epsilon=1e-5, name="norm1")(x1)
        f2 = nn.LayerNorm(epsilon=1e-5, name="norm2")(x2)
        if self.collect:
            return f1, f2, layers
        return f1, f2


class Dust3RNetwork(nn.Module):
    """Two views → (pts3d of view1 in view1 frame, pts3d of view2 in view1
    frame, confidences).  View 1 is the reference/world view."""

    enc_width: int = 1024
    enc_depth: int = 24
    enc_heads: int = 16
    dec_width: int = 768
    dec_depth: int = 12
    dec_heads: int = 12
    patch_size: int = 16
    head_type: str = "linear"  # "linear" | "dpt"
    pos_embed: str = "sincos"  # "RoPE100" = the released-checkpoint mode
    qkv_bias: bool = False  # CroCo ViTs: True
    norm_context: bool = False  # CroCo norm_y in decoder blocks

    @nn.compact
    def __call__(self, img1, img2):
        """img1/img2 [B, H, W, 3] in 0..1 → (pts1, pts2, conf1, conf2).

        img1 may carry batch 1 against a larger img2 batch (one-ref
        pairing): the reference view is encoded ONCE and its tokens are
        broadcast across the pairs — the per-pair work is decoder-only.
        """
        from unigeo_tpu.ops.rope import grid_positions

        imgs = jnp.concatenate([img1, img2], axis=0)  # siamese encoder
        tokens, grid = PointmapEncoder(
            self.enc_width, self.enc_depth, self.enc_heads, self.patch_size,
            pos_embed=self.pos_embed, qkv_bias=self.qkv_bias, name="encoder",
        )(normalize_images(imgs))
        b = img1.shape[0]
        e1, e2 = tokens[:b], tokens[b:]
        if b == 1 and img2.shape[0] > 1:
            e1 = jnp.broadcast_to(e1, (img2.shape[0],) + e1.shape[1:])

        freq = _rope_freq(self.pos_embed)
        pos = grid_positions(*grid)[None] if freq is not None else None

        use_dpt = self.head_type == "dpt"
        out = EntangledDecoder(
            self.dec_width, self.dec_depth, self.dec_heads,
            qkv_bias=self.qkv_bias, rope_freq=freq,
            norm_context=self.norm_context, collect=use_dpt, name="decoder",
        )(e1, e2, pos)

        if use_dpt:
            from unigeo_tpu.models.pointmap.dpt import DPTPointmapHead

            f1, f2, (l1, l2) = out  # l1/l2 [depth, B, N, C]
            # dust3r dpt hook convention (see PointmapDecoder docstring):
            # [encoder tokens, block 2L/4, block 3L/4, normed final]
            h1 = [e1, l1[self.dec_depth * 2 // 4 - 1],
                  l1[self.dec_depth * 3 // 4 - 1], f1]
            h2 = [e2, l2[self.dec_depth * 2 // 4 - 1],
                  l2[self.dec_depth * 3 // 4 - 1], f2]
            pts1, conf1 = DPTPointmapHead(self.patch_size, name="head1")(h1, grid)
            pts2, conf2 = DPTPointmapHead(self.patch_size, name="head2")(h2, grid)
        else:
            f1, f2 = out
            pts1, conf1 = PointmapHead(self.patch_size, name="head1")(f1, grid)
            pts2, conf2 = PointmapHead(self.patch_size, name="head2")(f2, grid)
        return pts1, pts2, conf1, conf2


@MODELS.register("Dust3R")
class Dust3R(adapter.BatchedPointmapForward):
    """Adapter: clip → one-ref pairs (0, i) → world pointmaps → depth /
    cameras / normals, the reference's pointmap-adapter output contract
    (model/Readme.md:16-20)."""

    def __init__(
        self,
        network_config: Optional[Dict[str, Any]] = None,
        checkpoint_path: Optional[str] = None,
        seed: int = 0,
        init_height: int = 384,
        init_width: int = 512,
        compute_dtype: Optional[str] = None,  # "bfloat16" = fp16-reference mode
        transfer_dtype: Optional[str] = None,  # "float16" halves output IO
        # reference-config compat (accepted, unused)
        model_dir: Optional[str] = None,
        ckpt_path: Optional[str] = None,
        **_: Dict,
    ):
        self.network = Dust3RNetwork(**(network_config or {}))
        if checkpoint_path:
            from unigeo_tpu.utils.checkpoint import load_params

            self.params = load_params(checkpoint_path)
        else:
            zero = jnp.zeros((1, init_height, init_width, 3))
            self.params = self.network.init(jax.random.PRNGKey(seed), zero, zero)

        def _pairs(p, ref, others):
            # all (frame0, frame_i) pairs in one program; the reference
            # frame encodes once (batch 1) and fans out inside the network
            return self.network.apply(p, ref, others)

        self._forward = jax.jit(_pairs)

        tdt = adapter.resolve_transfer_dtype(transfer_dtype)
        cdt = adapter.resolve_compute_dtype(compute_dtype)
        self.params = adapter.cast_params(self.params, cdt)

        def _full(p, raw):
            frames = adapter.frames_from_raw(raw)
            if cdt is not None:
                frames = frames.astype(cdt)
            pts1, pts2, conf1, conf2 = self.network.apply(
                p, frames[:1], frames[1:]
            )
            pts1, pts2 = pts1.astype(jnp.float32), pts2.astype(jnp.float32)
            conf1, conf2 = conf1.astype(jnp.float32), conf2.astype(jnp.float32)
            # frame 0's map: average the per-pair view-1 predictions (all
            # estimates of the same keyview map); frames 1..T-1 from head2.
            pts = jnp.concatenate([jnp.mean(pts1, axis=0, keepdims=True), pts2])
            conf = jnp.concatenate(
                [jnp.mean(conf1, axis=0, keepdims=True), conf2]
            )
            return adapter.downcast_for_transfer(
                adapter.outputs_from_world_pts(pts, conf), tdt
            )

        # one device-resident program per clip (see pointmap/adapter.py)
        self._full_fn = _full
        self._forward_full = jax.jit(_full)

    def forward(self, data: Dict[str, Any]) -> Dict[str, Any]:
        raw = adapter.raw_clip(data)
        if raw.shape[0] < 2:  # degenerate 1-frame clip: pair with itself
            raw = np.concatenate([raw, raw], axis=0)
        return adapter.fetch_outputs(self._forward_full(self.params, raw))


def tiny_dust3r_config():
    return dict(
        enc_width=64, enc_depth=2, enc_heads=2,
        dec_width=48, dec_depth=2, dec_heads=2,
        patch_size=16,
    )
