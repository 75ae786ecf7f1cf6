#!/usr/bin/env python
"""In-context UNet step attribution by omission.

Times the FULL production UNet forward (25x48x64 latents, bf16) K-chained,
then re-times it with individual block families monkeypatched to identity.
The deltas attribute step time in context (standalone block timings lose
cross-block fusion and over/under-count).

Usage: python tools/ablate_unet_step.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools._benchlib import measure_rtt, setup_cache

setup_cache()

DTYPE = jnp.bfloat16
T, LH, LW = 25, 48, 64


def main():
    import unigeo_tpu.models.depthcrafter.unet as unet_mod

    rtt = measure_rtt()
    print(f"device={jax.devices()[0].device_kind}  rtt={rtt*1e3:.1f} ms",
          flush=True)
    rng = jax.random.PRNGKey(0)

    def time_unet(label):
        # measure through the PRODUCTION 5-step denoise program (fori_loop)
        # and divide by the step count: the standalone single-step program
        # deterministically SIGILLs the terminal's TPU fusion pass, while
        # the fori_loop variant is exactly what bench.py runs
        from unigeo_tpu.models.depthcrafter.pipeline import DepthCrafterPipeline

        pipe = DepthCrafterPipeline()
        unet = pipe.unet = unet_mod.UNetSpatioTemporal()
        ctx = jax.random.normal(rng, (T, 1, 1024), DTYPE)
        shapes = jax.eval_shape(
            lambda r: unet.init(
                r, jnp.zeros((T, LH, LW, 8)), jnp.zeros((1,)), ctx,
                jnp.zeros((1, 3)), T,
            ),
            rng,
        )["params"]
        params = {"unet": jax.tree.map(lambda s: jnp.zeros(s.shape, DTYPE), shapes)}
        cond = jnp.zeros((T, LH, LW, 4), DTYPE)
        noise = jax.random.normal(jax.random.PRNGKey(1), (T, LH, LW, 4))
        steps = 5
        fsum = jax.jit(lambda x: x.sum())

        def run():
            return float(fsum(pipe._denoise_stage(params, cond, ctx, noise, steps)))

        run()
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        ms = max(min(ts) - rtt, 0.0) * 1e3 / steps
        print(f"{label:44s} {ms:8.1f} ms/step", flush=True)
        return ms

    full = time_unet("FULL step")

    # --- omission variants ---
    # real nn.Module subclasses patched in by NAME (unet.py resolves the
    # class globals at call time); plain-function __call__ replacements
    # lack flax's compact wrapping and mis-scope their submodules
    import flax.linen as nn

    saved = {}

    def patch(cls_name, cls):
        saved[cls_name] = getattr(unet_mod, cls_name)
        setattr(unet_mod, cls_name, cls)

    def restore():
        for name, cls in saved.items():
            setattr(unet_mod, name, cls)
        saved.clear()

    class TSTIdentity(unet_mod.TransformerSpatioTemporal):
        @nn.compact
        def __call__(self, x, context, num_frames):
            return x

    patch("TransformerSpatioTemporal", TSTIdentity)
    no_tr = time_unet("transformers -> identity")
    restore()

    class BTBNoAttn(unet_mod.BasicTransformerBlock):
        @nn.compact
        def __call__(self, x, context):
            x = x + unet_mod.Attention(
                self.num_heads, self.head_dim, context_dim=self.context_dim,
                name="attn2",
            )(nn.LayerNorm(epsilon=1e-5, name="norm2")(x), context)
            x = x + unet_mod.FeedForward(name="ff")(
                nn.LayerNorm(epsilon=1e-5, name="norm3")(x)
            )
            return x

    patch("BasicTransformerBlock", BTBNoAttn)
    no_sattn = time_unet("spatial self-attn -> identity")
    restore()

    class BTBNoFF(unet_mod.BasicTransformerBlock):
        @nn.compact
        def __call__(self, x, context):
            x = x + unet_mod.Attention(
                self.num_heads, self.head_dim, name="attn1"
            )(nn.LayerNorm(epsilon=1e-5, name="norm1")(x))
            x = x + unet_mod.Attention(
                self.num_heads, self.head_dim, context_dim=self.context_dim,
                name="attn2",
            )(nn.LayerNorm(epsilon=1e-5, name="norm2")(x), context)
            return x

    class TTBNoFF(unet_mod.TemporalTransformerBlock):
        @nn.compact
        def __call__(self, x, context):
            x = x + unet_mod.Attention(
                self.num_heads, self.head_dim, name="attn1"
            )(nn.LayerNorm(epsilon=1e-5, name="norm1")(x))
            x = x + unet_mod.Attention(
                self.num_heads, self.head_dim, context_dim=self.context_dim,
                name="attn2",
            )(nn.LayerNorm(epsilon=1e-5, name="norm2")(x), context)
            return x

    patch("BasicTransformerBlock", BTBNoFF)
    patch("TemporalTransformerBlock", TTBNoFF)
    no_ff = time_unet("all transformer FFs -> identity")
    restore()

    class STRBSpatialOnly(unet_mod.SpatioTemporalResBlock):
        @nn.compact
        def __call__(self, x, emb, num_frames):
            return unet_mod.SpatialResBlock(
                self.out_ch, name="spatial_res_block"
            )(x, emb)

    patch("SpatioTemporalResBlock", STRBSpatialOnly)
    no_tres = time_unet("temporal res blocks -> identity")
    restore()

    class TSTNoTemporal(unet_mod.TransformerSpatioTemporal):
        @nn.compact
        def __call__(self, x, context, num_frames):
            bt, hh, ww, c = x.shape
            residual = x
            h = unet_mod.GroupNorm(epsilon=1e-6, name="norm")(x)
            h = h.reshape(bt, hh * ww, c)
            h = nn.Dense(c, name="proj_in")(h)
            h = unet_mod.BasicTransformerBlock(
                self.num_heads, self.head_dim, self.context_dim,
                name="transformer_blocks_0",
            )(h, context)
            h = nn.Dense(c, name="proj_out")(h)
            return h.reshape(bt, hh, ww, c) + residual

    patch("TransformerSpatioTemporal", TSTNoTemporal)
    no_ttr = time_unet("temporal transformer pass -> identity")
    restore()

    print("\nattribution (delta vs full):", flush=True)
    print(f"  all transformers:        {full - no_tr:7.1f} ms", flush=True)
    print(f"  spatial self-attn:       {full - no_sattn:7.1f} ms", flush=True)
    print(f"  transformer FFs:         {full - no_ff:7.1f} ms", flush=True)
    print(f"  temporal res blocks:     {full - no_tres:7.1f} ms", flush=True)
    print(f"  temporal transformer:    {full - no_ttr:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
