"""Pipeline parallelism: encode / denoise / decode on disjoint device subsets.

SURVEY.md §2.7 (PP row): the three jitted stages of the DepthCrafter pipeline
(pipeline.py) are the natural cut points.  This executor places

  * VAE-encode + CLIP on one device,
  * the UNet denoise loop on a middle group, frame-axis (sp) sharded
    (context.py semantics: XLA inserts the temporal-attention all-gathers),
  * VAE-decode on one device,

and relies on JAX's async dispatch for the overlap: submitting clip i+1
enqueues its encode on the encode device while clip i's denoise is still
running on the middle group — a software pipeline with no explicit
scheduling.  Inter-stage transfers ride ICI via jax.device_put of
not-yet-ready arrays.

When to use which executor:
  * ShardedClipExecutor (executor.py) — throughput: B clips per step, dp over
    the whole mesh.  Best frames/sec when clips are abundant.
  * PipelinedStageExecutor (this file) — per-clip latency + stage overlap:
    one clip in flight per stage, the denoise group sp-shards the frame axis.
    Best when clips arrive one at a time (streaming) or activations of a
    whole batch would not fit.

The reference has no distributed execution at all (SURVEY.md §2.7); both
executors are TPU-native obligations, not ports.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _largest_divisor_leq(n: int, k: int) -> int:
    for d in range(min(n, k), 0, -1):
        if n % d == 0:
            return d
    return 1


class PipelinedStageExecutor:
    def __init__(
        self,
        pipeline,
        num_frames: int,
        num_inference_steps: int = 5,
        devices=None,
    ):
        """num_frames: clip length (static per executor) — the denoise group
        size is chosen as the largest divisor of it that fits the middle
        devices, so the sp sharding is even."""
        devices = list(devices if devices is not None else jax.devices())
        if len(devices) < 3:
            raise ValueError("pipeline parallelism needs >= 3 devices")
        self.pipe = pipeline
        self.steps = num_inference_steps
        self.enc_dev = devices[0]
        self.dec_dev = devices[1]
        middle = devices[2:]
        sp = _largest_divisor_leq(num_frames, len(middle))
        self.mesh = Mesh(np.array(middle[:sp]), ("sp",))
        self._sp_sharding = NamedSharding(self.mesh, P("sp"))

        p = pipeline.params
        self.p_enc = jax.device_put(
            {"vae": p["vae"], "clip": p["clip"]}, self.enc_dev
        )
        self.p_dec = jax.device_put({"vae": p["vae"]}, self.dec_dev)
        self.p_den = jax.device_put(
            {"unet": p["unet"]}, NamedSharding(self.mesh, P())
        )

    # ------------------------------------------------------------------

    def submit(self, frames, noise, aug_noise=None):
        """Enqueue one clip through all three stages; returns the decode
        output as a device array future ([T, H, W, 3] in ≈[-1, 1]).

        Returns immediately (async dispatch): call np.asarray(...) on the
        result to block.  Submitting the next clip before that overlaps its
        encode/denoise with this clip's later stages.
        """
        f = jax.device_put(jnp.asarray(frames), self.enc_dev)
        a = (
            jax.device_put(jnp.asarray(aug_noise), self.enc_dev)
            if aug_noise is not None
            else None
        )
        cond, ctx = self.pipe._encode_stage(self.p_enc, f, a)

        cond = jax.device_put(cond, self._sp_sharding)
        ctx = jax.device_put(ctx, self._sp_sharding)
        n = jax.device_put(jnp.asarray(noise), self._sp_sharding)
        x = self.pipe._denoise_stage(self.p_den, cond, ctx, n, self.steps)

        x = jax.device_put(x, self.dec_dev)
        return self.pipe._decode_stage(self.p_dec, x)

    def __call__(
        self,
        clips: np.ndarray,
        seed: int = 42,
        noise: Optional[np.ndarray] = None,
        aug_noise: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """[B, T, H, W, 3] 0..1 → [B, T, H, W, 3] decoded 0..1, all clips in
        flight at once (stage overlap).  Noise defaults reproduce the serial
        pipeline's per-clip draws, so outputs match run_window_staged."""
        b, t, h, w, _ = clips.shape
        rng = jax.random.PRNGKey(seed)
        if noise is None:
            # serial pipeline re-seeds PRNGKey(seed) per clip → same (t,...)
            # noise for every clip; broadcast rather than drawing (b,t,...)
            noise = np.broadcast_to(
                np.asarray(
                    jax.random.normal(rng, (t, h // 8, w // 8, 4), jnp.float32)
                ),
                (b, t, h // 8, w // 8, 4),
            )
        if aug_noise is None and self.pipe.noise_aug_strength > 0:
            from unigeo_tpu.models.depthcrafter.pipeline import aug_noise_rng

            aug_noise = np.broadcast_to(
                np.asarray(
                    jax.random.normal(
                        aug_noise_rng(rng), (t, h, w, 3), jnp.float32
                    )
                ),
                (b, t, h, w, 3),
            )
        futures = [
            self.submit(
                clips[i], noise[i],
                aug_noise[i] if aug_noise is not None else None,
            )
            for i in range(b)
        ]
        return (np.stack([np.asarray(f) for f in futures]) + 1.0) / 2.0
