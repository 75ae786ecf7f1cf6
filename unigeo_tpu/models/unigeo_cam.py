"""UniGeoCam: the paper's unified video-geometry model (extension slot).

The reference imports ``UniGeoCam`` as its own model (model/__init__.py:5)
but the file was never committed to the snapshot (SURVEY.md §0) — the slot
exists without an implementation.  Here the slot is filled with a working
unified-geometry stack built from the framework's own parts: one SVD
diffusion pass over the clip decodes a geometry triplet, from which all four
prediction families are derived:

  depth    channel-mean → clip min-max → 1/(x+0.1)   (DepthCrafter recipe)
  normals  decoded triplet renormalized to unit vectors (StableNormal
           recipe, x-flip)

Like the reference's DepthCrafter adapter (model/depthcrafter.py — depth +
normals only), this model emits NO pred_world_pts / pred_poses: the
diffusion decodes per-frame depth, and points backprojected per-frame with
the GT intrinsics live in each frame's OWN camera frame — PnP on such
self-consistent pointmaps recovers the identity pose by construction, so
emitting them would silently poison pcd/camera metrics.  Evaluate with
eval_depth / eval_normal.

When the paper's exact head layout becomes known, only the decode mapping
changes; the conditioning, scheduler, and UNet are shared with DepthCrafter.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from unigeo_tpu.models.depthcrafter.pipeline import DepthCrafterPipeline
from unigeo_tpu.registry import MODELS


@MODELS.register("UniGeoCam")
@MODELS.register("UniGeo")
class UniGeoCam:
    def __init__(
        self,
        unet_config: Optional[Dict[str, Any]] = None,
        vae_config: Optional[Dict[str, Any]] = None,
        clip_config: Optional[Dict[str, Any]] = None,
        checkpoint_path: Optional[str] = None,
        num_inference_steps: int = 5,
        seed: int = 42,
        init_height: int = 384,
        init_width: int = 512,
        init_frames: int = 25,
        pipeline=None,
        **_: Dict,
    ):
        self.pipeline = pipeline or DepthCrafterPipeline(
            unet_config=unet_config, vae_config=vae_config, clip_config=clip_config
        )
        self.num_inference_steps = num_inference_steps
        self.seed = seed
        if checkpoint_path:
            from unigeo_tpu.utils.checkpoint import load_params

            self.pipeline.params = load_params(checkpoint_path)
        elif self.pipeline.params is None:
            self.pipeline.init_params(
                jax.random.PRNGKey(seed), init_height, init_width, init_frames
            )

    def forward(self, data: Dict[str, Any]) -> Dict[str, Any]:
        frames = (
            np.moveaxis(np.asarray(data["images"]), 1, -1).astype(np.float32) / 255.0
        )
        decoded = self.pipeline(
            frames, num_inference_steps=self.num_inference_steps, seed=self.seed
        )  # [Nf,H,W,3] in 0..1

        # depth branch (DepthCrafter postproc)
        res = decoded.mean(-1)
        res = (res - res.min()) / max(res.max() - res.min(), 1e-8)
        depths = (1.0 / (res + 0.1)).astype(np.float32)

        # normal branch (StableNormal decode)
        normals = decoded * 2.0 - 1.0
        normals[..., 0] *= -1.0
        normals /= np.maximum(np.linalg.norm(normals, axis=-1, keepdims=True), 1e-6)

        # No geometry branch: per-frame backprojections with the same K are
        # self-consistent, so PnP would recover identity poses and the
        # "world" points would mix per-frame camera frames (see module
        # docstring) — depth + normals only, like the reference DepthCrafter
        # adapter.
        return {
            "pred_depths": depths,
            "pred_normals": normals.astype(np.float32),
        }
