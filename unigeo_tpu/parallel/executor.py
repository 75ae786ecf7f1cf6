"""Sharded inference executor: clips fan out across the data axis.

The reference evaluates clips serially on one GPU (eval.py:33-99).  Here a
batch of clips becomes one SPMD program: frames [B, T, H, W, 3] sharded on
``dp``, parameters replicated (or tp-sharded), the per-clip pipeline vmapped
over B — so a v5e-8 scores 8 clips per step at single-chip latency.

Two execution modes:
  * staged (default): encode/denoise/decode as three vmapped jitted programs
    (same staging rationale as pipeline.py — compile time is superlinear in
    program size, cross-stage fusion buys nothing);
  * fused: one program per batch (slowest compile; kept for the driver's
    compile checks and small tests).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from unigeo_tpu.parallel.sharding import shard_params


class ShardedClipExecutor:
    def __init__(
        self,
        pipeline,
        mesh: Mesh,
        num_inference_steps: int = 5,
        staged: bool = True,
    ):
        self.pipeline = pipeline
        self.mesh = mesh
        self.num_inference_steps = num_inference_steps
        self.staged = staged
        self.params = shard_params(pipeline.params, mesh)
        self._fn = None

    @property
    def batch_size(self) -> int:
        """Clips per step = size of the dp axis."""
        return self.mesh.shape["dp"]

    def _build(self):
        steps = self.num_inference_steps
        pipe = self.pipeline
        mesh = self.mesh
        dp = NamedSharding(mesh, P("dp"))

        if self.staged:

            @jax.jit
            def run(params, frames, noise, aug_noise):
                frames = jax.lax.with_sharding_constraint(frames, dp)
                noise = jax.lax.with_sharding_constraint(noise, dp)
                cond, ctx = jax.vmap(
                    lambda f, a: pipe._encode_stage.__wrapped__(pipe, params, f, a)
                )(frames, aug_noise)
                x = jax.vmap(
                    lambda c, t, n: pipe._denoise_stage.__wrapped__(
                        pipe, params, c, t, n, steps
                    )
                )(cond, ctx, noise)
                return jax.vmap(
                    lambda l: pipe._decode_stage.__wrapped__(pipe, params, l)
                )(x)

        else:

            @jax.jit
            def run(params, frames, noise, aug_noise):
                frames = jax.lax.with_sharding_constraint(frames, dp)
                noise = jax.lax.with_sharding_constraint(noise, dp)
                return jax.vmap(
                    lambda f, n, a: pipe._run_window.__wrapped__(
                        pipe, params, f, n, steps, a
                    )
                )(frames, noise, aug_noise)

        self._fn = run

    def __call__(
        self,
        frames_batch: np.ndarray,
        seed: int = 42,
        noise: Optional[np.ndarray] = None,
        aug_noise: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """[B, T, H, W, 3] 0..1 → [B, T, H, W, 3] decoded 0..1.

        B may be any size: batches are padded up to a multiple of the dp axis
        (by repeating the last clip) and the padding is sliced off after.
        noise / aug_noise: optional explicit latents noise [B,T,H/8,W/8,4] and
        conditioning-aug noise [B,T,H,W,3] — defaults reproduce exactly what
        the serial pipeline draws per clip, so batched == serial.
        """
        if self._fn is None:
            self._build()
        b, t, h, w, _ = frames_batch.shape
        rng = jax.random.PRNGKey(seed)
        if noise is None:
            # the serial pipeline re-seeds PRNGKey(seed) per clip, so every
            # clip draws the SAME (t,...) noise — broadcast, don't draw a
            # fresh (b,t,...) tensor (only clip 0 of that would match)
            noise = np.broadcast_to(
                np.asarray(
                    jax.random.normal(rng, (t, h // 8, w // 8, 4), jnp.float32)
                ),
                (b, t, h // 8, w // 8, 4),
            )
        noise = np.asarray(noise, np.float32)
        if aug_noise is None:
            if self.pipeline.noise_aug_strength > 0:
                # same per-clip aug the serial pipeline draws
                from unigeo_tpu.models.depthcrafter.pipeline import aug_noise_rng

                aug_noise = np.broadcast_to(
                    np.asarray(
                        jax.random.normal(
                            aug_noise_rng(rng), (t, h, w, 3), jnp.float32
                        )
                    ),
                    (b, t, h, w, 3),
                )
            else:
                aug_noise = np.zeros((b, t, h, w, 3), np.float32)
        aug_noise = np.asarray(aug_noise, np.float32)

        step = self.batch_size
        outs = []
        for start in range(0, b, step):
            fb = frames_batch[start : start + step]
            nb = noise[start : start + step]
            ab = aug_noise[start : start + step]
            pad = step - fb.shape[0]
            if pad > 0:
                fb = np.concatenate([fb, np.repeat(fb[-1:], pad, axis=0)])
                nb = np.concatenate([nb, np.repeat(nb[-1:], pad, axis=0)])
                ab = np.concatenate([ab, np.repeat(ab[-1:], pad, axis=0)])
            out = self._fn(
                self.params, jnp.asarray(fb), jnp.asarray(nb), jnp.asarray(ab)
            )
            outs.append(np.asarray(out[: step - pad if pad else step]))
        return (np.concatenate(outs) + 1.0) / 2.0
