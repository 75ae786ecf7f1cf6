"""DepthAnyVideo-class hierarchical video-diffusion depth.

Fourth of the methods the reference lists as supported without shipping an
adapter (model/Readme.md:9).  DepthAnyVideo's distinguishing inference
design (public recipe: "Depth Any Video with Scalable Synthetic Data") is
**hierarchical frame generation** for long clips: denoise a sparse set of
KEY frames first, then denoise the full clip with the key frames held
fixed so the intermediate frames are interpolated consistently within the
diffusion — both phases run here on the shared SVD stack through the same
conditioned denoise stage ChronoDepth uses
(DepthCrafterPipeline._denoise_stage_known: EDM clamp x(σ) = x0 + σ·n at
every step, exact at σ = 0).

Depth decodes directly as (x+1)/2 channel-mean (affine-invariant, the
shared-stack convention for directly-supervised depth diffusions); normals
backproject with the GT intrinsics + plane fit + OpenGL flip, and the
adapter emits depth + normals only, like the reference's DepthCrafter
adapter family (model/depthcrafter.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from unigeo_tpu.models.chronodepth import _postprocess
from unigeo_tpu.models.depthcrafter.pipeline import DepthCrafterPipeline
from unigeo_tpu.registry import MODELS


@MODELS.register("DepthAnyVideo")
class DepthAnyVideo:
    """Adapter: clip → keyframe denoise → full-clip interpolation denoise
    with keyframes clamped → depth + normals."""

    def __init__(
        self,
        unet_config: Optional[Dict[str, Any]] = None,
        vae_config: Optional[Dict[str, Any]] = None,
        clip_config: Optional[Dict[str, Any]] = None,
        checkpoint_path: Optional[str] = None,
        num_inference_steps: int = 5,
        keyframe_gap: int = 4,  # every k-th frame is a key frame
        seed: int = 42,
        dtype: str = "bfloat16",
        _pipeline: Optional[DepthCrafterPipeline] = None,  # tests inject tiny
        # reference-config compat (accepted, unused)
        unet_path: Optional[str] = None,
        pre_train_path: Optional[str] = None,
        **_: Dict,
    ):
        self.pipe = _pipeline or DepthCrafterPipeline(
            unet_config=unet_config, vae_config=vae_config,
            clip_config=clip_config, dtype=jnp.dtype(dtype),
        )
        self.num_inference_steps = num_inference_steps
        self.keyframe_gap = max(1, keyframe_gap)
        self.seed = seed
        if checkpoint_path:
            from unigeo_tpu.utils.checkpoint import load_params

            self.pipe.params = load_params(checkpoint_path)
            self.pipe.cast_params_to_dtype()

    def keyframe_indices(self, t: int) -> np.ndarray:
        """Every k-th frame, always including the last frame."""
        idx = list(range(0, t, self.keyframe_gap))
        if idx[-1] != t - 1:
            idx.append(t - 1)
        return np.asarray(idx)

    def forward(self, data: Dict[str, Any]) -> Dict[str, Any]:
        pipe = self.pipe
        images = np.asarray(data["images"])
        t, h, w = images.shape[0], images.shape[2], images.shape[3]
        if pipe.params is None:
            pipe.init_params(jax.random.PRNGKey(0), h, w, t)
        rng = jax.random.PRNGKey(self.seed)
        key_idx = self.keyframe_indices(t)

        # device-resident: the clip uploads ONCE; the keyframe subset is a
        # device gather, and phase-1 latents feed phase 2 without a host hop
        frames = pipe.prepare_clip(images)

        # phase 1: plain denoise of the sparse key frames (their own
        # temporal context — the coarse level of the hierarchy)
        kf = frames[jnp.asarray(key_idx)]
        cond_k, ctx_k = pipe._encode_stage(pipe.params, kf, None)
        noise_k = jax.random.normal(
            jax.random.fold_in(rng, 0),
            (len(key_idx), h // 8, w // 8, 4), jnp.float32,
        )
        lat_k = pipe._denoise_stage(
            pipe.params, cond_k, ctx_k, noise_k, self.num_inference_steps
        )

        if len(key_idx) == t:
            lat = lat_k  # every frame is a key frame: single-level
        else:
            # phase 2: full clip, key frames clamped to their phase-1
            # latents — intermediates interpolate inside the diffusion
            cond, ctx = pipe._encode_stage(pipe.params, frames, None)
            noise = jax.random.normal(
                jax.random.fold_in(rng, 1), (t, h // 8, w // 8, 4), jnp.float32,
            )
            known = jnp.zeros((t, h // 8, w // 8, 4), jnp.float32)
            known = known.at[jnp.asarray(key_idx)].set(lat_k)
            mask_np = np.zeros((t,), np.float32)
            mask_np[key_idx] = 1.0
            lat = pipe._denoise_stage_known(
                pipe.params, cond, ctx, noise, known, jnp.asarray(mask_np),
                self.num_inference_steps,
            )

        decoded = pipe._decode_stage(pipe.params, lat)
        decoded01 = (jnp.asarray(decoded) + 1.0) / 2.0
        intr = jnp.asarray(np.stack(np.asarray(data["intrinsics"])))
        depths, normals_gl = _postprocess(decoded01, intr)
        return {
            "pred_depths": np.asarray(depths),
            "pred_normals": np.asarray(normals_gl),
        }
