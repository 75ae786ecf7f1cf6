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
  points   depth backprojected with Weiszfeld-estimated focal
  poses    batched DLT-PnP on the pointmaps (camera_solver)

When the paper's exact head layout becomes known, only the decode mapping
changes; the conditioning, scheduler, and UNet are shared with DepthCrafter.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from unigeo_tpu import coords
from unigeo_tpu.models.camera_solver import solve_depth_and_camera_from_pointmaps
from unigeo_tpu.models.depthcrafter.pipeline import DepthCrafterPipeline
from unigeo_tpu.ops.backproject import backproject_batch_cv
from unigeo_tpu.ops.normals import surface_normals_from_points
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

        # geometry branch: backproject with the GT intrinsics; refuse to
        # fabricate pointmaps without them (a repeat-z tensor is not
        # geometry and would silently poison pcd/camera metrics)
        if "intrinsics" not in data:
            raise ValueError(
                "UniGeoCam needs per-frame intrinsics in the sample to emit "
                "world points / poses; got none. Run with eval_depth/"
                "eval_normal only, or provide intrinsics."
            )
        K = np.asarray(data["intrinsics"], np.float32)
        world_src = np.asarray(
            backproject_batch_cv(jnp.asarray(depths), jnp.asarray(K))
        )
        _, extrinsics, _ = solve_depth_and_camera_from_pointmaps(jnp.asarray(world_src))
        poses = coords.se3_inverse(np.asarray(extrinsics)).astype(np.float32)

        return {
            "pred_world_pts": world_src.astype(np.float32),
            "pred_depths": depths,
            "pred_normals": normals.astype(np.float32),
            "pred_poses": poses,
        }
