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

By default (``geometry_branch=False``) the model emits depth + normals
only, like the reference's DepthCrafter adapter (model/depthcrafter.py):
points backprojected per-frame with the GT intrinsics live in each frame's
OWN camera frame — PnP on such self-consistent pointmaps recovers the
identity pose by construction, so emitting them naively would silently
poison pcd/camera metrics.

With ``geometry_branch=True`` the model becomes the full unified stack and
emits all four prediction families: the framework's own Spann3R-class
pointmap network runs on the same frames to provide the cross-frame
geometry (real poses via the batched PnP solver, a metric-consistent world
frame), the diffusion depth is scale/shift-aligned to the pointmap depth
per clip (lstsq, the framework's own solver), and the aligned diffusion
depth is backprojected and carried into the world frame by the pointmap
poses — sharp per-pixel depth from the diffusion branch, global
consistency from the pointmap branch.  Evaluate with eval_depth /
eval_normal / eval_pcd / eval_camera.

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
        geometry_branch: bool = False,
        pointmap_config: Optional[Dict[str, Any]] = None,
        pointmap_checkpoint: Optional[str] = None,
        pointmap_model=None,
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
            self.pipeline.cast_params_to_dtype()
        elif self.pipeline.params is None:
            self.pipeline.init_params(
                jax.random.PRNGKey(seed), init_height, init_width, init_frames
            )
        self.pointmap = None
        if geometry_branch:
            from unigeo_tpu.models.pointmap.spann3r import Spann3R

            self.pointmap = pointmap_model or Spann3R(
                network_config=pointmap_config,
                checkpoint_path=pointmap_checkpoint,
                init_height=init_height, init_width=init_width,
                init_frames=min(init_frames, 2),
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

        out = {
            "pred_depths": depths,
            "pred_normals": normals.astype(np.float32),
        }
        if self.pointmap is None:
            # No geometry branch: per-frame backprojections with the same K
            # are self-consistent, so PnP would recover identity poses and
            # the "world" points would mix per-frame camera frames (module
            # docstring) — depth + normals only, like the reference
            # DepthCrafter adapter.
            return out
        out.update(self._geometry_branch(data, depths))
        return out

    def _geometry_branch(self, data, depths: np.ndarray) -> Dict[str, Any]:
        """Fuse the diffusion depth with the pointmap branch's cross-frame
        geometry: align depth to the pointmap scale, backproject with the GT
        intrinsics, and carry each frame into the shared world frame by the
        pointmap poses (module docstring)."""
        from unigeo_tpu.metrics.alignment import lstsq_scale_shift
        from unigeo_tpu.ops.backproject import backproject_batch_cv

        pm = self.pointmap.forward(data)
        pm_depth = np.asarray(pm["pred_depths"], np.float32)  # [Nf,H,W] +z
        valid = jnp.asarray(pm_depth > 1e-6)
        s, t = lstsq_scale_shift(
            jnp.asarray(depths), jnp.asarray(pm_depth), valid
        )
        s, t = float(s), float(t)
        # degenerate-fit guard (the sibling median_scale falls back to 1.0
        # on degenerate input, metrics/alignment.py): no valid pointmap
        # depth, a non-finite fit, or a collapsed s≈0 (every pixel would
        # land on the clamp floor) fall back to the raw diffusion depth
        # rather than silently emitting garbage geometry.  A NEGATIVE s is
        # left alone: it is the least-squares optimum for anti-correlated
        # fields, matching the reference's unclamped lstsq alignment
        # semantics (metrics/alignment.py:150-167).
        if (
            int(np.asarray(valid).sum()) == 0
            or not np.isfinite([s, t]).all()
            or abs(s) < 1e-8
        ):
            s, t = 1.0, 0.0
        aligned = np.asarray(s * depths + t, np.float32)
        # keep depth physically positive after the affine map
        aligned = np.maximum(aligned, 1e-3)

        intrinsics = jnp.asarray(np.asarray(data["intrinsics"], np.float32))
        cam_pts = np.asarray(
            backproject_batch_cv(jnp.asarray(aligned), intrinsics)
        )  # [Nf,H,W,3] OpenCV, +z = aligned depth
        poses = np.asarray(pm["pred_poses"], np.float32)  # c2w OpenCV
        world = (
            np.einsum("nij,nhwj->nhwi", poses[:, :3, :3], cam_pts)
            + poses[:, None, None, :3, 3]
        )
        return {
            "pred_depths": aligned,
            "pred_world_pts": world.astype(np.float32),
            "pred_poses": poses,
        }
