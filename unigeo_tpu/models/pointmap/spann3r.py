"""Spann3R-class sequential pointmap regression with spatial memory.

Behavioral contract from the reference adapter (model/spann3r.py): frames
stream through a memory-augmented network that predicts each frame's
pointmap directly in the frame-0 (world) coordinate system; depth and
cameras are then *recovered from the pointmaps* via focal estimation + PnP
(reference: model/spann3r.py:41-56 → metrics/utils.py:120-160), poses are
inverted extrinsics, and normals come from the recovered camera points with
the OpenGL flip.

TPU-first design: the frame loop is a lax.scan whose carry is a fixed-size
ring memory of encoder/decoder tokens (the reference's unbounded spatial
memory becomes a static-shape ring buffer so the whole sequence compiles to
one program).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from unigeo_tpu.models.pointmap import adapter
from unigeo_tpu.models.pointmap.network import (
    PointmapDecoder,
    PointmapEncoder,
    PointmapHead,
    normalize_images,
)
from unigeo_tpu.registry import MODELS


class _MemoryStep(nn.Module):
    """One frame through the memory decoder (scanned over frames)."""

    dec_width: int
    dec_depth: int
    dec_heads: int
    memory_frames: int
    return_hooks: bool = False  # per-layer outputs for a DPT head
    pos_embed: str = "sincos"
    qkv_bias: bool = False
    norm_context: bool = False

    @nn.compact
    def __call__(self, carry, tok, pos, ctx_pos):
        mem, mem_mask, slot = carry
        n_tok = tok.shape[0]
        # decode current frame against [its own projection ⊕ ring memory];
        # empty ring slots are ATTENTION-masked — zero values alone would
        # still soak up softmax mass and dilute early frames' cross-attention
        self_ctx = nn.Dense(self.dec_width, name="memory_proj")(tok)
        ctx = jnp.concatenate(
            [self_ctx, mem * mem_mask.astype(mem.dtype)[:, None]], axis=0
        )
        ctx_mask = jnp.concatenate([jnp.ones((n_tok,)), mem_mask], axis=0)
        out = PointmapDecoder(
            self.dec_width, self.dec_depth, self.dec_heads,
            return_hooks=self.return_hooks, pos_embed=self.pos_embed,
            qkv_bias=self.qkv_bias, norm_context=self.norm_context,
            name="decoder",
        )(tok[None], ctx[None], pos=pos, ctx_pos=ctx_pos, ctx_mask=ctx_mask)
        if self.return_hooks:
            dec, hooks = out[0][0], [h[0] for h in out[1]]
        else:
            dec, hooks = out[0], None
        # write this frame's decoder tokens into the ring buffer
        start = (slot % self.memory_frames) * n_tok
        mem = jax.lax.dynamic_update_slice(mem, dec, (start, 0))
        mem_mask = jax.lax.dynamic_update_slice(
            mem_mask, jnp.ones((n_tok,)), (start,)
        )
        ys = (dec, hooks) if self.return_hooks else dec
        return (mem, mem_mask, slot + 1), ys


class Spann3RNetwork(nn.Module):
    """Sequential pointmap network with a token ring-memory."""

    enc_width: int = 768
    enc_depth: int = 8
    enc_heads: int = 12
    dec_width: int = 512
    dec_depth: int = 6
    dec_heads: int = 8
    patch_size: int = 16
    memory_frames: int = 4  # ring buffer capacity (static)
    head_type: str = "linear"  # "linear" | "dpt" (the external nets use DPT)
    pos_embed: str = "sincos"  # "RoPE100" = the DUSt3R/CroCo backbone mode
    qkv_bias: bool = False  # CroCo ViTs: True
    norm_context: bool = False  # CroCo norm_y in decoder blocks

    @nn.compact
    def __call__(self, frames):
        """frames [T, H, W, 3] in 0..1 → (world pts [T, H, W, 3], conf)."""
        from unigeo_tpu.models.pointmap.network import _rope_freq
        from unigeo_tpu.ops.rope import grid_positions

        t, h, w, _ = frames.shape
        imgs = normalize_images(frames)
        enc_tokens, grid = PointmapEncoder(
            self.enc_width, self.enc_depth, self.enc_heads, self.patch_size,
            pos_embed=self.pos_embed, qkv_bias=self.qkv_bias, name="encoder",
        )(imgs)  # [T, N, C]
        n_tok = enc_tokens.shape[1]

        if _rope_freq(self.pos_embed) is not None:
            pos = grid_positions(*grid)
            # context = [self projection ⊕ ring memory]: all on the same grid
            ctx_pos = jnp.concatenate(
                [pos, jnp.tile(pos, (self.memory_frames, 1))], axis=0
            )
        else:
            pos = ctx_pos = None

        mem_size = self.memory_frames * n_tok
        init_mem = jnp.zeros((mem_size, self.dec_width), enc_tokens.dtype)
        init_mask = jnp.zeros((mem_size,), jnp.float32)

        ScannedStep = nn.scan(
            _MemoryStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=(0, nn.broadcast, nn.broadcast),
            out_axes=0,
        )
        use_dpt = self.head_type == "dpt"
        (_, _, _), ys = ScannedStep(
            self.dec_width, self.dec_depth, self.dec_heads, self.memory_frames,
            use_dpt, self.pos_embed, self.qkv_bias, self.norm_context,
            name="memory_step",
        )((init_mem, init_mask, jnp.int32(0)), enc_tokens, pos, ctx_pos)

        if use_dpt:
            from unigeo_tpu.models.pointmap.dpt import DPTPointmapHead

            _, hooks = ys  # each hook [T, N, C]
            pts, conf = DPTPointmapHead(self.patch_size, name="head")(hooks, grid)
        else:
            pts, conf = PointmapHead(self.patch_size, name="head")(ys, grid)
        return pts, conf


@MODELS.register("Spann3R")
class Spann3R(adapter.BatchedPointmapForward):
    def __init__(
        self,
        network_config: Optional[Dict[str, Any]] = None,
        checkpoint_path: Optional[str] = None,
        seed: int = 0,
        init_height: int = 384,
        init_width: int = 512,
        init_frames: int = 2,
        compute_dtype: Optional[str] = None,  # "bfloat16" = fp16-reference mode
        transfer_dtype: Optional[str] = None,  # "float16" halves output IO
        # reference-config compat (accepted, unused)
        model_dir: Optional[str] = None,
        ckpt_path: Optional[str] = None,
        dust3r_path: Optional[str] = None,
        **_: Dict,
    ):
        self.network = Spann3RNetwork(**(network_config or {}))
        if checkpoint_path:
            from unigeo_tpu.utils.checkpoint import load_params

            self.params = load_params(checkpoint_path)
        else:
            self.params = self.network.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((init_frames, init_height, init_width, 3)),
            )
        self._forward = jax.jit(
            lambda p, f: self.network.apply(p, f)
        )

        tdt = adapter.resolve_transfer_dtype(transfer_dtype)
        cdt = adapter.resolve_compute_dtype(compute_dtype)
        self.params = adapter.cast_params(self.params, cdt)

        def _full(p, raw):
            frames = adapter.frames_from_raw(raw)
            if cdt is not None:
                frames = frames.astype(cdt)
            pts, conf = self.network.apply(p, frames)
            pts = pts.astype(jnp.float32)  # geometry always runs f32
            conf = conf.astype(jnp.float32)
            return adapter.downcast_for_transfer(
                adapter.outputs_from_world_pts(pts, conf), tdt
            )

        # ONE compiled program per clip: normalize → network → camera
        # recovery → normals → poses, all device-resident
        # (tools/ablate_spann3r.py: the split pipeline cost 6.1 s/clip,
        # ~0.4 s of it network).
        self._full_fn = _full
        self._forward_full = jax.jit(_full)

    def forward(self, data: Dict[str, Any]) -> Dict[str, Any]:
        raw = adapter.raw_clip(data)
        return adapter.fetch_outputs(self._forward_full(self.params, raw))


def tiny_spann3r_config():
    return dict(
        enc_width=64, enc_depth=2, enc_heads=2,
        dec_width=48, dec_depth=2, dec_heads=2,
        patch_size=16, memory_frames=2,
    )
