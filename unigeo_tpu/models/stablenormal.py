"""StableNormal-class diffusion normal estimator.

Behavioral contract from the reference adapter (model/stablenormal.py):
per-frame diffusion inference produces a normal map decoded from [0,255] to
[-1,1] (:45), the x channel is flipped (:41-43), and ``pred_depths`` is a
zeros placeholder (:49) — the model contributes normals only.

Native implementation: the same latent-diffusion machinery as the
DepthCrafter stack, but every frame is an INDEPENDENT T=1 sample (no
temporal coupling).  Where the reference loops python/PIL per image
(:37-39) — N pipeline invocations per clip — all N frames run as one batch
through THREE jitted dispatches (encode → batched denoise → frame-wise
decode), and under a multi-device mesh the frames shard over the dp axis
via the ShardedClipExecutor as N clips of length 1.  Per-frame numerics
are preserved exactly: the per-image reference loop reuses one seed per
invocation, so every frame sees the SAME noise draw — the batch broadcasts
that single draw (parity-tested batched-vs-per-frame in
tests/test_pointmap_models.py::test_stablenormal_batched_matches_per_frame).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from unigeo_tpu.models.depthcrafter.pipeline import (
    DepthCrafterPipeline,
    aug_noise_rng,
)
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
            self.pipeline.cast_params_to_dtype()
        else:
            # frames are processed independently (T=1 per image, batched)
            self.pipeline.init_params(
                jax.random.PRNGKey(seed), init_height, init_width, 1
            )

    # ------------------------------------------------------------------

    def _prepare_frames(self, data: Dict[str, Any]) -> np.ndarray:
        images = np.asarray(data["images"])  # [Nf,3,H,W] 0..255
        return np.moveaxis(images, 1, -1).astype(np.float32) / 255.0

    def _frame_noise(self, h: int, w: int):
        """The noise streams ONE serial T=1 pipeline invocation draws.

        The reference adapter calls the hub model once per image with no
        reseeding between process() calls of different content — our serial
        analog invokes ``pipeline(frame, seed=self.seed)`` per frame, which
        re-derives PRNGKey(seed) each time: every frame sees identical
        noise.  Batched parity therefore needs exactly one [1,...] draw,
        broadcast over the frame axis.
        """
        rng = jax.random.PRNGKey(self.seed)
        noise1 = jax.random.normal(rng, (1, h // 8, w // 8, 4), jnp.float32)
        aug1 = None
        if self.pipeline.noise_aug_strength > 0:
            aug1 = jax.random.normal(
                aug_noise_rng(rng), (1, h, w, 3), jnp.float32
            )
        return noise1, aug1

    def _run_frames_batched(self, frames: np.ndarray) -> np.ndarray:
        """[N,H,W,3] 0..1 → decoded [N,H,W,3] 0..1, N independent frames.

        Single device: three jitted dispatches total (encode all frames
        spatially, denoise as a B=N batch of T=1 clips, decode with
        num_frames=1) — vs 3·N host round-trips for a per-frame loop.
        Multi-device: frames become N clips of length 1 sharded over the
        mesh's dp axis through the ShardedClipExecutor.
        """
        if len(jax.devices()) > 1:
            return self._run_frames_dp(frames)
        return self._run_frames_single(frames)

    def _run_frames_dp(self, frames: np.ndarray) -> np.ndarray:
        n, h, w, _ = frames.shape
        noise1, aug1 = self._frame_noise(h, w)
        noise = np.broadcast_to(
            np.asarray(noise1)[None], (n, 1, h // 8, w // 8, 4)
        )
        aug = (
            None
            if aug1 is None
            else np.broadcast_to(np.asarray(aug1)[None], (n, 1, h, w, 3))
        )
        decoded = self._get_executor()(
            frames[:, None], seed=self.seed, noise=noise, aug_noise=aug
        )  # [N,1,H,W,3] 0..1
        return decoded[:, 0]

    def _run_frames_single(self, frames: np.ndarray) -> np.ndarray:
        pipe = self.pipeline
        n, h, w, _ = frames.shape
        noise1, aug1 = self._frame_noise(h, w)
        aug = None if aug1 is None else jnp.broadcast_to(aug1, (n, h, w, 3))
        cond, ctx = pipe._encode_stage(pipe.params, jnp.asarray(frames), aug)
        noise = jnp.broadcast_to(noise1[None], (n, 1, h // 8, w // 8, 4))
        x = pipe._denoise_stage_batched(
            pipe.params, cond[:, None], ctx[:, None], noise,
            self.num_inference_steps,
        )  # [N,1,h,w,4]
        decoded = pipe._decode_frames(pipe.params, x[:, 0])
        return (np.asarray(decoded) + 1.0) / 2.0

    def _get_executor(self):
        if getattr(self, "_executor", None) is None:
            from unigeo_tpu.parallel.executor import ShardedClipExecutor
            from unigeo_tpu.parallel.mesh import make_mesh

            n = len(jax.devices())
            mesh = make_mesh(n, shape=(n, 1, 1))
            self._executor = ShardedClipExecutor(
                self.pipeline, mesh,
                num_inference_steps=self.num_inference_steps,
            )
        return self._executor

    def _finalize(self, decoded: np.ndarray) -> Dict[str, Any]:
        nf, h, w, _ = decoded.shape
        normals = decoded * 2.0 - 1.0
        normals[..., 0] *= -1.0  # x-flip (reference: stablenormal.py:41-43)
        norm = np.maximum(np.linalg.norm(normals, axis=-1, keepdims=True), 1e-6)
        normals = (normals / norm).astype(np.float32)
        return {
            "pred_normals": normals,
            "pred_depths": np.zeros((nf, h, w), np.float32),
        }

    # ------------------------------------------------------------------

    def forward(self, data: Dict[str, Any]) -> Dict[str, Any]:
        frames = self._prepare_frames(data)
        return self._finalize(self._run_frames_batched(frames))

    @property
    def eval_batch_size(self) -> int:
        """Clips the evaluator may hand to forward_batch at once.  Frames
        already batch inside one clip; across clips, batch up to the mesh
        width so the dp axis stays full on short clips."""
        n = len(jax.devices())
        return n if n > 1 else 1

    def forward_batch(self, datas) -> list:
        """Score several clips in one batched pass.

        Frames of ALL clips are independent T=1 samples, so clips simply
        concatenate on the frame axis (only H,W must agree; frame counts
        may differ) and the outputs split back per clip.
        """
        prepped = [self._prepare_frames(d) for d in datas]
        if len({f.shape[1:] for f in prepped}) > 1:
            # heterogeneous spatial shapes cannot form one batch
            return [self._finalize(self._run_frames_batched(f)) for f in prepped]
        decoded = self._run_frames_batched(np.concatenate(prepped))
        outs, off = [], 0
        for f in prepped:
            outs.append(self._finalize(decoded[off : off + len(f)]))
            off += len(f)
        return outs
