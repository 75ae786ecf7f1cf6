"""CUT3R-class recurrent pointmap model with a persistent state.

Behavioral contract from the reference adapter (model/cut3r.py): frames
stream through a continuously-updated state; per frame the model emits a
self-view pointmap (depth = its z, :95), a world-view pointmap, and a 7-DoF
pose encoding decoded to camera-to-world (:64-68); focal is recovered from
the self-view pointmap by Weiszfeld (:70-79); normals from self-view points
with the OpenGL flip (:87-91).

TPU-first: the state is a fixed bank of learnable tokens; each frame does a
bidirectional update (frame tokens cross-attend to state, state tokens
cross-attend to the frame) inside an nn.scan — the whole video is one
compiled program.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from unigeo_tpu.models.camera_solver import estimate_focal_weiszfeld
from unigeo_tpu.models.pointmap import adapter
from unigeo_tpu.models.pointmap.network import (
    PointmapDecoder,
    PointmapEncoder,
    PointmapHead,
    PoseHead,
    normalize_images,
)
from unigeo_tpu.models.posecodec import pose_encoding_to_camera
from unigeo_tpu.ops.normals import surface_normals_from_points
from unigeo_tpu.registry import MODELS
from unigeo_tpu.models.vit import ViTBlock


class _RecurrentStep(nn.Module):
    dec_width: int
    dec_depth: int
    dec_heads: int
    state_update_depth: int = 2
    return_hooks: bool = False  # per-layer outputs for a DPT head
    pos_embed: str = "sincos"
    qkv_bias: bool = False
    norm_context: bool = False

    @nn.compact
    def __call__(self, state, tok, pos):
        # frame tokens read the state (state tokens carry no grid position:
        # ctx_pos=None leaves keys unrotated in RoPE mode)
        out = PointmapDecoder(
            self.dec_width, self.dec_depth, self.dec_heads,
            return_hooks=self.return_hooks, pos_embed=self.pos_embed,
            qkv_bias=self.qkv_bias, norm_context=self.norm_context,
            name="decoder",
        )(tok[None], state[None], pos=pos)
        if self.return_hooks:
            dec, hooks = out[0][0], [h[0] for h in out[1]]
        else:
            dec, hooks = out[0], None
        # state tokens read the frame (recurrent update)
        new_state = state
        for i in range(self.state_update_depth):
            new_state = ViTBlock(self.dec_heads, name=f"state_block_{i}")(
                new_state[None], dec[None]
            )[0]
        ys = (dec, hooks) if self.return_hooks else dec
        return new_state, ys


class Cut3RNetwork(nn.Module):
    enc_width: int = 768
    enc_depth: int = 8
    enc_heads: int = 12
    dec_width: int = 512
    dec_depth: int = 6
    dec_heads: int = 8
    patch_size: int = 16
    num_state_tokens: int = 64
    head_type: str = "linear"  # "linear" | "dpt" (the external nets use DPT)
    pos_embed: str = "sincos"  # "RoPE100" = the DUSt3R/CroCo backbone mode
    qkv_bias: bool = False
    norm_context: bool = False

    @nn.compact
    def __call__(self, frames):
        """[T, H, W, 3] 0..1 → dict(self_pts, world_pts, conf, pose_enc)."""
        from unigeo_tpu.models.pointmap.network import _rope_freq
        from unigeo_tpu.ops.rope import grid_positions

        imgs = normalize_images(frames)
        enc_tokens, grid = PointmapEncoder(
            self.enc_width, self.enc_depth, self.enc_heads, self.patch_size,
            pos_embed=self.pos_embed, qkv_bias=self.qkv_bias, name="encoder",
        )(imgs)
        pos = (
            grid_positions(*grid)
            if _rope_freq(self.pos_embed) is not None
            else None
        )

        state0 = self.param(
            "state_tokens",
            nn.initializers.normal(0.02),
            (self.num_state_tokens, self.dec_width),
        )
        ScannedStep = nn.scan(
            _RecurrentStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=(0, nn.broadcast),
            out_axes=0,
        )
        use_dpt = self.head_type == "dpt"
        _, ys = ScannedStep(
            self.dec_width, self.dec_depth, self.dec_heads,
            return_hooks=use_dpt, pos_embed=self.pos_embed,
            qkv_bias=self.qkv_bias, norm_context=self.norm_context,
            name="recurrent_step",
        )(state0, enc_tokens, pos)

        if use_dpt:
            from unigeo_tpu.models.pointmap.dpt import DPTPointmapHead

            dec_tokens, hooks = ys
            self_pts, self_conf = DPTPointmapHead(
                self.patch_size, name="head_self"
            )(hooks, grid)
            world_pts, world_conf = DPTPointmapHead(
                self.patch_size, name="head_world"
            )(hooks, grid)
        else:
            dec_tokens = ys
            self_pts, self_conf = PointmapHead(self.patch_size, name="head_self")(
                dec_tokens, grid
            )
            world_pts, world_conf = PointmapHead(self.patch_size, name="head_world")(
                dec_tokens, grid
            )
        pose_enc = PoseHead(name="head_pose")(dec_tokens)
        return {
            "self_pts": self_pts,
            "world_pts": world_pts,
            "conf": self_conf,
            "world_conf": world_conf,
            "pose_enc": pose_enc,
        }


@MODELS.register("Cut3R")
class Cut3R(adapter.BatchedPointmapForward):
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
        **_: Dict,
    ):
        self.network = Cut3RNetwork(**(network_config or {}))
        if checkpoint_path:
            from unigeo_tpu.utils.checkpoint import load_params

            self.params = load_params(checkpoint_path)
        else:
            self.params = self.network.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((init_frames, init_height, init_width, 3)),
            )
        self._forward = jax.jit(lambda p, f: self.network.apply(p, f))

        tdt = adapter.resolve_transfer_dtype(transfer_dtype)
        cdt = adapter.resolve_compute_dtype(compute_dtype)
        self.params = adapter.cast_params(self.params, cdt)

        def _full(p, raw):
            frames = adapter.frames_from_raw(raw)
            if cdt is not None:
                frames = frames.astype(cdt)
            out = self.network.apply(p, frames)
            out = {k: v.astype(jnp.float32) for k, v in out.items()}  # f32 geometry
            normals_gl = surface_normals_from_points(
                out["self_pts"]
            ) * jnp.asarray(adapter.OPENGL_FLIP, out["self_pts"].dtype)
            return adapter.downcast_for_transfer({
                "pred_world_pts": out["world_pts"],
                "pred_depths": out["self_pts"][..., 2],
                "pred_normals": normals_gl,
                "pred_poses": pose_encoding_to_camera(out["pose_enc"]),  # c2w CV
                "pred_conf": out["conf"],
                "pred_focal": estimate_focal_weiszfeld(out["self_pts"][0]),
            }, tdt)

        # one device-resident program per clip (see pointmap/adapter.py)
        self._full_fn = _full
        self._forward_full = jax.jit(_full)

    def forward(self, data: Dict[str, Any]) -> Dict[str, Any]:
        raw = adapter.raw_clip(data)
        host = adapter.fetch_outputs(self._forward_full(self.params, raw))
        host["pred_focal"] = float(host["pred_focal"])
        return host


def tiny_cut3r_config():
    return dict(
        enc_width=64, enc_depth=2, enc_heads=2,
        dec_width=48, dec_depth=2, dec_heads=2,
        patch_size=16, num_state_tokens=8,
    )
