"""DepthCrafter inference pipeline: VAE encode → denoise loop → decode.

The compute hot path of the whole framework (SURVEY.md §3.3).  The external
torch pipeline the reference calls (model/depthcrafter.py:79-90) becomes one
jitted JAX program per window:

    frames [T,H,W,3] 0..1
      → ×2-1 → + noise_aug_strength·N(0,1) → VAE.encode per frame →
        conditioning latents [T,h,w,4] (UNSCALED — SVD concatenates raw
        modes; only the denoised-latent space carries the 0.18215 scaling)
      → CLIP-embed per frame → context [T,1,1024]
      → x = noise · sqrt(σ_max²+1)
      → lax.fori_loop over 5 Karras sigmas (σ ∈ [0.002, 700], rho 7):
            x_in = concat([x/√(σ²+1), cond_latents], ch)
            v = UNet(x_in, 0.25·ln σ, context, added_time_ids)
            x = euler_step(x, denoised(x, v, σ), σ, σ_next)
      → VAE.decode(x / 0.18215) → [T,H,W,3] in [-1,1]

Long clips run as overlapping windows whose decoded frames are crossfaded
on the overlap (the reference pipeline's window/overlap stitching,
depthcrafter.py:87-88 — a no-op at window == clip length).

bf16 activations AND parameters at the production dtype (init_params /
cast_params_to_dtype keep the tree at self.dtype — f32 params promote
every kernel and exhaust a 16 GB v5e); one compilation per (T,H,W).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from unigeo_tpu.models.depthcrafter.scheduler import (
    EulerDiscreteConfig,
    EulerDiscreteScheduler,
)
from unigeo_tpu.models.depthcrafter.unet import UNetSpatioTemporal
from unigeo_tpu.models.depthcrafter.vae import AutoencoderKLTemporal
from unigeo_tpu.models.vit import ClipImageEmbedder


AUG_NOISE_FOLD = 0xA06  # fold_in tag for the conditioning-aug noise stream


def aug_noise_rng(rng):
    """The conditioning-noise-augmentation PRNG stream for a clip seed.

    Single source of truth for the serial pipeline AND every batched /
    sharded executor that promises serial-matching numerics — re-derive it
    from here, never hardcode the fold constant.
    """
    import jax

    return jax.random.fold_in(rng, AUG_NOISE_FOLD)


@jax.jit
def _transpose_clip(raw01):
    """[Nf,3,H,W] -> [Nf,H,W,3] on device (the strided host copy costs
    ~0.4 s/clip on a 1-core host)."""
    return jnp.moveaxis(raw01, 1, -1)


class DepthCrafterPipeline:
    """Holds module defs + params and exposes a jitted per-window forward."""

    def __init__(
        self,
        unet_config: Optional[Dict[str, Any]] = None,
        vae_config: Optional[Dict[str, Any]] = None,
        clip_config: Optional[Dict[str, Any]] = None,
        params: Optional[Dict[str, Any]] = None,
        dtype=jnp.bfloat16,
        fps: float = 7.0,
        motion_bucket_id: float = 127.0,
        noise_aug_strength: float = 0.02,
        scheduler_config: Optional[Any] = None,
        solver: str = "euler",  # "euler" (SVD default) | "heun" (2nd order)
    ):
        self.unet = UNetSpatioTemporal(**(unet_config or {}))
        self.vae = AutoencoderKLTemporal(**(vae_config or {}))
        self.clip = ClipImageEmbedder(**(clip_config or {}))
        # scheduler_config: None (SVD defaults), a dict, a path to a
        # diffusers scheduler_config.json, or a ready EulerDiscreteConfig
        if scheduler_config is None:
            sched_cfg = EulerDiscreteConfig()
        elif isinstance(scheduler_config, EulerDiscreteConfig):
            sched_cfg = scheduler_config
        else:
            sched_cfg = EulerDiscreteConfig.from_json(scheduler_config)
        self.scheduler = EulerDiscreteScheduler(sched_cfg)
        if solver not in ("euler", "heun"):
            raise ValueError(f"unknown solver {solver!r}")
        self.solver = solver
        self.dtype = dtype
        self.noise_aug_strength = noise_aug_strength
        self.added_time_ids = np.array(
            [[fps - 1.0, motion_bucket_id, noise_aug_strength]], np.float32
        )
        self.params = params

    # ------------------------------------------------------------------

    def init_params(self, rng: jax.Array, height: int, width: int, num_frames: int):
        """Random-init parameters (for benches/tests; real weights come from
        utils/checkpoint.py torch conversion)."""
        frames = jnp.zeros((num_frames, height, width, 3), jnp.float32)
        r1, r2, r3 = jax.random.split(rng, 3)
        ctx_dim = self.unet.cross_attention_dim
        # jit each init: one compiled program instead of thousands of eager
        # dispatches (critical on remote/tunneled backends)
        vae_params = jax.jit(
            lambda r: self.vae.init(r, frames, num_frames)
        )(r1)
        clip_params = jax.jit(lambda r: self.clip.init(r, frames))(r2)
        unet_params = jax.jit(
            lambda r: self.unet.init(
                r,
                jnp.zeros((num_frames, height // 8, width // 8, 8), jnp.float32),
                jnp.zeros((1,), jnp.float32),
                jnp.zeros((num_frames, 1, ctx_dim), jnp.float32),
                jnp.zeros((1, 3), jnp.float32),
                num_frames,
            )
        )(r3)
        self.params = {
            "vae": vae_params["params"],
            "clip": clip_params["params"],
            "unet": unet_params["params"],
        }
        # keep params at the pipeline compute dtype: f32 SVD-XT params are
        # 6 GB and promote every kernel's compute to f32 (the activations'
        # .astype(dtype) is not enough under flax promotion) — on a 16 GB
        # v5e that RESOURCE_EXHAUSTs the production 25×384×512 forward
        # (caught live by tools/bench_zoo.py round 5; bench.py always ran
        # bf16 params, which is why the flagship bench never hit it)
        self.cast_params_to_dtype()
        return self.params

    def cast_params_to_dtype(self):
        """Cast float param leaves to the pipeline compute dtype (call
        after loading a checkpoint saved at a different precision).

        The dtype probe reads ``a.dtype`` directly — jnp.asarray(a) would
        device_put every numpy leaf (minutes for a 6 GB tree over the
        tunneled backend) just to answer issubdtype."""
        import numpy as _np

        if self.params is not None and self.dtype != jnp.float32:
            self.params = jax.tree.map(
                lambda a: a.astype(self.dtype)
                if _np.issubdtype(
                    getattr(a, "dtype", _np.asarray(a).dtype), _np.floating)
                else a,
                self.params,
            )
        return self.params

    def prepare_clip(self, images) -> jnp.ndarray:
        """data["images"] [Nf,3,H,W] 0..255 → device frames [Nf,H,W,3] 0..1.

        THE single clip-prologue policy for every SVD-family adapter: the
        /255 stays on HOST (one contiguous pass) so frame values are
        bit-identical across adapters and to prepare_input-style host
        paths — a device-side division fuses into the encode's ``*2-1``
        with different rounding — while the expensive strided transpose
        happens on device."""
        raw01 = np.asarray(images, np.float32) / np.float32(255.0)
        return _transpose_clip(jnp.asarray(raw01))

    # ------------------------------------------------------------------

    def clip_noise(self, seed: int, t: int, h: int, w: int):
        """(denoise_noise [t,h/8,w/8,4], aug_noise [t,h,w,3] | None) for a
        whole-clip window at the given seed.

        THE single source of the per-clip draw contract — __call__'s
        single-window branch, the adapters' device-resident paths
        (model.py forward / forward_batch), and any executor promising
        serial-matching numerics must all draw through here; duplicating
        the PRNG discipline inline is how the paths silently diverge."""
        rng = jax.random.PRNGKey(seed)
        noise = jax.random.normal(rng, (t, h // 8, w // 8, 4), jnp.float32)
        aug = (
            jax.random.normal(aug_noise_rng(rng), (t, h, w, 3), jnp.float32)
            if self.noise_aug_strength > 0
            else None
        )
        return noise, aug

    # Three separately-jitted stages: XLA compile time is superlinear in
    # program size and cross-stage fusion buys nothing here, so staging
    # compiles ~4x faster than one monolithic program at identical runtime.

    @functools.partial(jax.jit, static_argnames=("self",))
    def _encode_stage(self, params, frames, aug_noise=None):
        """frames [T,H,W,3] 0..1 → (cond_latents [T,h,w,4], context [T,1,C]).

        aug_noise: optional N(0,1) tensor shaped like frames — SVD's
        conditioning noise augmentation (image += noise_aug_strength·noise,
        the same strength that enters added_time_ids).  None = no aug.
        """
        dtype = self.dtype
        frames_pm1 = frames * 2.0 - 1.0
        if aug_noise is not None and self.noise_aug_strength > 0:
            frames_pm1 = frames_pm1 + self.noise_aug_strength * aug_noise
        cond_latents = self.vae.apply(
            {"params": params["vae"]}, frames_pm1.astype(dtype),
            method=self.vae.encode,
        ).astype(dtype)
        context = self.clip.apply(
            {"params": params["clip"]}, frames.astype(dtype)
        ).astype(dtype)
        return cond_latents, context

    def _denoise_loop(self, params, cond_latents, context, noise,
                      num_inference_steps: int):
        """Shared denoise loop over [B, T, h, w, 4] batches of clips.

        The UNet natively takes B clips (sample [B*T,...], timesteps [B],
        added_time_ids [B,3]); all norm/attention groupings are per clip, so
        each batch entry computes exactly what the B=1 program computes.
        """
        b, t = cond_latents.shape[:2]
        dtype = self.dtype
        sigmas_np = self.scheduler.inference_sigmas(num_inference_steps)
        sigmas = jnp.asarray(sigmas_np)
        timesteps = jnp.asarray(self.scheduler.timesteps_for_sigmas(sigmas_np[:-1]))
        x = noise.astype(jnp.float32) * jnp.sqrt(sigmas[0] ** 2 + 1.0)
        added = jnp.broadcast_to(jnp.asarray(self.added_time_ids), (b, 3))
        cond_flat = cond_latents.reshape(b * t, *cond_latents.shape[2:])
        ctx_flat = context.reshape(b * t, *context.shape[2:])

        def denoised_at(x, i):
            """One UNet evaluation → EDM-denoised estimate at sigmas[i]."""
            sigma = sigmas[i]
            x_in = self.scheduler.scale_model_input(x, sigma).astype(dtype)
            unet_in = jnp.concatenate(
                [x_in.reshape(b * t, *x_in.shape[2:]), cond_flat], axis=-1
            )
            v = self.unet.apply(
                {"params": params["unet"]},
                unet_in,
                jnp.full((b,), timesteps[i]),
                ctx_flat,
                added,
                t,
            ).astype(jnp.float32).reshape(x.shape)
            return self.scheduler.denoised_from_v(x, v, sigma)

        def euler_body(i, x):
            return self.scheduler.euler_step(
                x, denoised_at(x, i), sigmas[i], sigmas[i + 1]
            )

        if self.solver == "euler":
            return jax.lax.fori_loop(0, num_inference_steps, euler_body, x)

        # Heun: trapezoidal corrector with a second UNet eval at sigma_next;
        # the final step (sigma_next = 0) is plain Euler, so the loop covers
        # steps 0..n-2 and the last step runs outside it.
        def heun_body(i, x):
            sigma, sigma_next = sigmas[i], sigmas[i + 1]
            dt = sigma_next - sigma
            d1 = (x - denoised_at(x, i)) / sigma
            x_pred = x + d1 * dt
            d2 = (x_pred - denoised_at(x_pred, i + 1)) / sigma_next
            return x + 0.5 * (d1 + d2) * dt

        x = jax.lax.fori_loop(0, num_inference_steps - 1, heun_body, x)
        return euler_body(num_inference_steps - 1, x)

    @functools.partial(jax.jit, static_argnames=("self", "num_inference_steps"))
    def _denoise_stage(self, params, cond_latents, context, noise,
                       num_inference_steps: int):
        return self._denoise_loop(
            params, cond_latents[None], context[None], noise[None],
            num_inference_steps,
        )[0]

    @functools.partial(jax.jit, static_argnames=("self", "num_inference_steps"))
    def _denoise_stage_batched(self, params, cond_latents, context, noise,
                               num_inference_steps: int):
        """Throughput mode: B clips through ONE denoise program.

        Denoise is the under-utilized stage (small per-frame matmuls leave
        MXU headroom); batching multiplies every matmul's M by B.  Encode /
        decode stay per-clip — the VAE decoder is already compute-bound and
        OOMs at B≥2 at the headline shapes (measured, ROADMAP round 3).
        """
        return self._denoise_loop(
            params, cond_latents, context, noise, num_inference_steps
        )


    @functools.partial(jax.jit, static_argnames=("self", "num_inference_steps"))
    def _denoise_stage_known(self, params, cond_latents, context, noise,
                             known, mask_t, num_inference_steps: int):
        """Single-clip euler denoise where frames with mask_t[f] = 1 are
        re-anchored every step to ``known`` re-noised to the current sigma.

        cond_latents/noise/known [T, h, w, C]; mask_t [T].  Mirrors the
        _denoise_loop B=1 euler path above with
        the clamp inserted before each UNet evaluation and after the final
        step (σ=0 ⇒ conditioned frames equal ``known`` exactly).
        """
        t = cond_latents.shape[0]
        dtype = self.dtype
        sigmas_np = self.scheduler.inference_sigmas(num_inference_steps)
        sigmas = jnp.asarray(sigmas_np)
        timesteps = jnp.asarray(
            self.scheduler.timesteps_for_sigmas(sigmas_np[:-1])
        )
        added = jnp.broadcast_to(jnp.asarray(self.added_time_ids), (1, 3))
        m = mask_t[:, None, None, None]

        def clamp(x, sigma):
            return jnp.where(m > 0, known + sigma * noise, x)

        def denoised_at(x, i):
            sigma = sigmas[i]
            x_in = self.scheduler.scale_model_input(x, sigma).astype(dtype)
            unet_in = jnp.concatenate([x_in, cond_latents], axis=-1)
            v = self.unet.apply(
                {"params": params["unet"]},
                unet_in,
                jnp.full((1,), timesteps[i]),
                context,
                added,
                t,
            ).astype(jnp.float32)
            return self.scheduler.denoised_from_v(x, v, sigma)

        def euler_body(i, x):
            x = clamp(x, sigmas[i])
            return self.scheduler.euler_step(
                x, denoised_at(x, i), sigmas[i], sigmas[i + 1]
            )

        x = noise.astype(jnp.float32) * jnp.sqrt(sigmas[0] ** 2 + 1.0)
        x = jax.lax.fori_loop(0, num_inference_steps, euler_body, x)
        return clamp(x, 0.0)

    @functools.partial(jax.jit, static_argnames=("self",))
    def _decode_stage(self, params, latents):
        t = latents.shape[0]
        decoded = self.vae.apply(
            {"params": params["vae"]}, latents.astype(self.dtype), t,
            method=self.vae.decode,
        )
        return decoded.astype(jnp.float32)

    @functools.partial(jax.jit, static_argnames=("self",))
    def _decode_frames(self, params, latents):
        """Decode [N,h,w,4] latents as N INDEPENDENT frames (num_frames=1).

        The temporal decoder groups its frame-axis mixing by ``num_frames``
        (vae.py VaeSpatioTemporalResBlock), so num_frames=1 over a batch of N
        is exactly N single-frame decodes in one program — the batched path
        for per-image models (StableNormal) whose frames must not couple.
        """
        decoded = self.vae.apply(
            {"params": params["vae"]}, latents.astype(self.dtype), 1,
            method=self.vae.decode,
        )
        return decoded.astype(jnp.float32)

    def run_window_staged(self, params, frames, noise, num_inference_steps: int,
                          aug_noise=None):
        """The production path: three jitted stages, device-resident between."""
        cond_latents, context = self._encode_stage(params, frames, aug_noise)
        x = self._denoise_stage(params, cond_latents, context, noise,
                                num_inference_steps)
        return self._decode_stage(params, x)

    def run_clips_staged(self, params, frames, noise,
                         num_inference_steps: int, aug_noise=None):
        """Single-chip throughput path: B clips per denoise program.

        frames [B,T,H,W,3], noise [B,T,h,w,4] → decoded [B,T,H,W,3].
        Encode and decode run per clip (serial enqueues, async dispatch);
        the denoise loop — the stage with MXU headroom — runs batched.
        Per-clip numerics match run_window_staged (see _denoise_loop).
        """
        b = frames.shape[0]
        encoded = [
            self._encode_stage(
                params, frames[i], None if aug_noise is None else aug_noise[i]
            )
            for i in range(b)
        ]
        cond = jnp.stack([c for c, _ in encoded])
        ctx = jnp.stack([c for _, c in encoded])
        x = self._denoise_stage_batched(
            params, cond, ctx, noise, num_inference_steps
        )
        return jnp.stack(
            [self._decode_stage(params, x[i]) for i in range(b)]
        )

    @functools.partial(jax.jit, static_argnames=("self", "num_inference_steps"))
    def _run_window(self, params, frames, noise, num_inference_steps: int,
                    aug_noise=None):
        """Fully-fused single-program variant (slowest compile, used by the
        driver's single-chip compile check)."""
        cond_latents, context = self._encode_stage.__wrapped__(
            self, params, frames, aug_noise
        )
        x = self._denoise_stage.__wrapped__(
            self, params, cond_latents, context, noise, num_inference_steps
        )
        return self._decode_stage.__wrapped__(self, params, x)

    # ------------------------------------------------------------------

    def __call__(
        self,
        frames: np.ndarray,
        num_inference_steps: int = 5,
        window_size: Optional[int] = None,
        overlap: int = 0,
        seed: int = 42,
    ) -> np.ndarray:
        """frames [T,H,W,3] float 0..1 → [T,H,W,3] decoded output in 0..1.

        Windows longer clips with linear blending on the overlap.
        """
        if self.params is None:
            raise RuntimeError("pipeline has no params; call init_params or load")
        t, h, w, _ = frames.shape
        window_size = window_size or t
        rng = jax.random.PRNGKey(seed)

        aug_rng = aug_noise_rng(rng)

        if window_size >= t:
            noise, aug = self.clip_noise(seed, t, h, w)
            out = self.run_window_staged(
                self.params, jnp.asarray(frames), noise, num_inference_steps,
                aug_noise=aug,
            )
            return np.asarray((out + 1.0) / 2.0)

        stride = window_size - overlap
        if stride <= 0:
            raise ValueError(
                f"overlap ({overlap}) must be smaller than window_size "
                f"({window_size}) when the clip is longer than one window"
            )
        # True crossfade on each seam (the reference pipeline's stitching):
        # over the overlap the OLD window ramps 1→ down while the NEW ramps
        # 0→ up, and the new window is at full weight immediately after the
        # overlap — an accumulate-and-normalize ramp would leave a weight
        # discontinuity at every seam.
        acc = np.zeros((t, h, w, 3), np.float32)
        prev_end = 0
        starts = list(range(0, t - overlap, stride))
        for wi, start in enumerate(starts):
            end = min(start + window_size, t)
            start = end - window_size  # full windows only (last one re-covers)
            chunk = jnp.asarray(frames[start:end])
            noise = jax.random.normal(
                jax.random.fold_in(rng, wi),
                (window_size, h // 8, w // 8, 4),
                jnp.float32,
            )
            aug = (
                jax.random.normal(
                    jax.random.fold_in(aug_rng, wi), (window_size, h, w, 3),
                    jnp.float32,
                )
                if self.noise_aug_strength > 0
                else None
            )
            out = np.asarray(
                self.run_window_staged(
                    self.params, chunk, noise, num_inference_steps, aug_noise=aug
                )
            )
            ov = min(prev_end, end) - start  # frames already written
            if wi > 0 and ov > 0:
                r = np.linspace(0.0, 1.0, ov, endpoint=False).reshape(-1, 1, 1, 1)
                acc[start : start + ov] = (
                    (1.0 - r) * acc[start : start + ov] + r * out[:ov]
                )
                acc[start + ov : end] = out[ov:]
            else:
                acc[start:end] = out
            prev_end = end
        return (acc + 1.0) / 2.0


def tiny_pipeline(height=64, width=64, num_frames=4, seed=0) -> DepthCrafterPipeline:
    """A miniature pipeline for tests and CPU dry-runs."""
    from unigeo_tpu.models.depthcrafter.unet import tiny_unet_config
    from unigeo_tpu.models.depthcrafter.vae import tiny_vae_config
    from unigeo_tpu.models.vit import tiny_clip_config

    unet_cfg = tiny_unet_config()
    pipe = DepthCrafterPipeline(
        unet_config=unet_cfg,
        vae_config=tiny_vae_config(),
        clip_config=dict(tiny_clip_config(), projection_dim=unet_cfg["cross_attention_dim"]),
        dtype=jnp.float32,
    )
    pipe.init_params(jax.random.PRNGKey(seed), height, width, num_frames)
    return pipe
