"""ChronoDepth-class SVD video depth with sequential in-context windows.

Third of the methods the reference lists as supported without shipping an
adapter (model/Readme.md:7).  ChronoDepth (public recipe: "Learning
Temporally Consistent Video Depth from Video Diffusion Priors") fine-tunes
the same SVD backbone the DepthCrafter stack implements, with two
behavioral differences this module owns:

  1. **Direct affine-invariant depth**: the decoded [-1,1] output maps to
     depth as (x+1)/2 — NOT DepthCrafter's clip-minmax + 1/(x+0.1)
     inverse-depth recipe (model/depthcrafter.py:92-97).
  2. **Sequential windows with known-frame conditioning**: consecutive
     windows overlap, and the overlapping frames' latents are CLAMPED at
     every denoise step to the previous window's prediction re-noised to
     the current sigma (EDM state x(σ) = x0 + σ·n), instead of
     DepthCrafter's decode-then-crossfade stitching.  Temporal consistency
     comes from conditioning inside the diffusion, not from blending.

The clamp is exact at σ=0, so conditioned frames reproduce the previous
window's latents bit-for-bit and the fresh frames are denoised in their
context.  With an all-zero mask the loop reduces to the parent's euler
denoise (asserted in tests/test_chronodepth.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from unigeo_tpu.models.depthcrafter.pipeline import DepthCrafterPipeline
from unigeo_tpu.ops.backproject import backproject_to_cv_position
from unigeo_tpu.ops.normals import surface_normals_from_points
from unigeo_tpu.registry import MODELS


class ChronoDepthPipeline(DepthCrafterPipeline):
    """Alias kept for the original home of the conditioned denoise
    stage; the method now lives on DepthCrafterPipeline itself (it is
    shared by ChronoDepth and DepthAnyVideo)."""


@jax.jit
def _postprocess(decoded, intrinsics):
    """decoded [Nf,H,W,3] in 0..1 (pipeline returns (x+1)/2) → direct
    affine-invariant depth = channel mean, + backprojected normals."""
    depths = jnp.clip(jnp.mean(decoded, axis=-1), 1e-3, None)
    pts = jax.vmap(backproject_to_cv_position)(depths, intrinsics)
    normals_cv = surface_normals_from_points(pts)
    normals_gl = normals_cv * jnp.asarray([1.0, -1.0, -1.0])
    return depths, normals_gl


@MODELS.register("ChronoDepth")
class ChronoDepth:
    """Adapter: clip → sequential conditioned windows → depth + normals
    (depth-model family: no poses/world points, like model/depthcrafter.py)."""

    def __init__(
        self,
        unet_config: Optional[Dict[str, Any]] = None,
        vae_config: Optional[Dict[str, Any]] = None,
        clip_config: Optional[Dict[str, Any]] = None,
        checkpoint_path: Optional[str] = None,
        num_inference_steps: int = 5,
        window_size: Optional[int] = None,
        overlap: int = 5,
        seed: int = 42,
        dtype: str = "bfloat16",
        _pipeline: Optional[ChronoDepthPipeline] = None,  # tests inject tiny
        # reference-config compat (accepted, unused)
        unet_path: Optional[str] = None,
        pre_train_path: Optional[str] = None,
        **_: Dict,
    ):
        self.pipe = _pipeline or ChronoDepthPipeline(
            unet_config=unet_config, vae_config=vae_config,
            clip_config=clip_config, dtype=jnp.dtype(dtype),
        )
        self.num_inference_steps = num_inference_steps
        self.window_size = window_size
        self.overlap = overlap
        self.seed = seed
        if checkpoint_path:
            from unigeo_tpu.utils.checkpoint import load_params

            self.pipe.params = load_params(checkpoint_path)
            self.pipe.cast_params_to_dtype()

    def forward(self, data: Dict[str, Any]) -> Dict[str, Any]:
        pipe = self.pipe
        images = np.asarray(data["images"])
        t, h, w = images.shape[0], images.shape[2], images.shape[3]
        if pipe.params is None:
            pipe.init_params(jax.random.PRNGKey(0), h, w, t)
        win = min(self.window_size or t, t)
        ov = min(self.overlap, win - 1) if win < t else 0
        rng = jax.random.PRNGKey(self.seed)

        # device-resident window loop: the clip uploads ONCE and the
        # accumulated latents never leave the device (the per-window numpy
        # round trips cost several seconds/clip over the tunneled backend;
        # window slicing is static so every dispatch below is a cached jit)
        frames = pipe.prepare_clip(images)
        lat_acc = jnp.zeros((t, h // 8, w // 8, 4), jnp.float32)
        prev_end = 0
        stride = win - ov
        starts = list(range(0, max(t - ov, 1), stride))
        for wi, start in enumerate(starts):
            end = min(start + win, t)
            start = end - win  # full windows only (last one re-covers)
            chunk = frames[start:end]
            cond, ctx = pipe._encode_stage(pipe.params, chunk, None)
            noise = jax.random.normal(
                jax.random.fold_in(rng, wi), (win, h // 8, w // 8, 4),
                jnp.float32,
            )
            n_known = max(prev_end - start, 0) if wi > 0 else 0
            mask_t = jnp.asarray(
                (np.arange(win) < n_known).astype(np.float32)
            )
            known = lat_acc[start:start + win]
            x = pipe._denoise_stage_known(
                pipe.params, cond, ctx, noise, known, mask_t,
                self.num_inference_steps,
            )
            lat_acc = lat_acc.at[start:end].set(x)
            prev_end = end

        decoded = pipe._decode_stage(pipe.params, lat_acc)
        decoded01 = (jnp.asarray(decoded) + 1.0) / 2.0
        intr = jnp.asarray(np.stack(np.asarray(data["intrinsics"])))
        depths, normals_gl = _postprocess(decoded01, intr)
        return {
            "pred_depths": np.asarray(depths),
            "pred_normals": np.asarray(normals_gl),
        }


def tiny_chronodepth(height=64, width=64, num_frames=4, seed=0):
    """ChronoDepth over the tiny test pipeline config."""
    from unigeo_tpu.models.depthcrafter.pipeline import tiny_pipeline

    # the conditioned denoise stage lives on DepthCrafterPipeline itself,
    # so the tiny pipeline serves as-is
    return tiny_pipeline(height=height, width=width, num_frames=num_frames,
                         seed=seed)
