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
K = 4


def main():
    import unigeo_tpu.models.depthcrafter.unet as unet_mod

    rtt = measure_rtt()
    print(f"device={jax.devices()[0].device_kind}  rtt={rtt*1e3:.1f} ms  K={K}",
          flush=True)
    rng = jax.random.PRNGKey(0)

    def time_unet(label):
        unet = unet_mod.UNetSpatioTemporal()
        sample = jax.random.normal(rng, (T, LH, LW, 8), DTYPE)
        ctx = jax.random.normal(rng, (T, 1, 1024), DTYPE)
        added = jnp.zeros((1, 3), jnp.float32)
        shapes = jax.eval_shape(
            lambda r: unet.init(r, sample, jnp.zeros((1,)), ctx, added, T), rng
        )["params"]
        params = jax.tree.map(
            lambda s: jnp.zeros(s.shape, DTYPE), shapes
        )

        # single dispatch: a full step (~300 ms) dwarfs the ~30 ms RTT, and
        # scanning K steps in one program SIGILLs the TPU fusion pass
        @jax.jit
        def prog(params, x):
            y = unet.apply(
                {"params": params}, x, jnp.full((1,), 500.0), ctx, added, T
            )
            return jnp.sum(y.astype(jnp.float32))

        float(prog(params, sample))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(prog(params, sample))
            ts.append(time.perf_counter() - t0)
        ms = max(min(ts) - rtt, 0.0) * 1e3
        print(f"{label:44s} {ms:8.1f} ms/step", flush=True)
        return ms

    full = time_unet("FULL step")

    # --- omission variants ---
    import flax.linen as nn

    saved = {}

    def patch(cls_name, fn):
        saved[cls_name] = getattr(unet_mod, cls_name).__call__
        getattr(unet_mod, cls_name).__call__ = fn

    def restore():
        for name, fn in saved.items():
            getattr(unet_mod, name).__call__ = fn
        saved.clear()

    # 1. no transformers at all
    patch("TransformerSpatioTemporal", lambda self, x, context, num_frames: x)
    no_tr = time_unet("transformers -> identity")
    restore()

    # 2. spatial self-attn -> identity (keep FF/norm/cross)
    orig_attn = None

    def btb_no_attn(self, x, context):
        x = x + unet_mod.Attention(
            self.num_heads, self.head_dim, context_dim=self.context_dim,
            name="attn2",
        )(nn.LayerNorm(epsilon=1e-5, name="norm2")(x), context)
        x = x + unet_mod.FeedForward(name="ff")(
            nn.LayerNorm(epsilon=1e-5, name="norm3")(x)
        )
        return x

    patch("BasicTransformerBlock", btb_no_attn)
    no_sattn = time_unet("spatial self-attn -> identity")
    restore()

    # 3. all FFs -> identity (spatial ff + temporal ff_in/ff)
    def btb_no_ff(self, x, context):
        x = x + unet_mod.Attention(self.num_heads, self.head_dim, name="attn1")(
            nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        )
        x = x + unet_mod.Attention(
            self.num_heads, self.head_dim, context_dim=self.context_dim,
            name="attn2",
        )(nn.LayerNorm(epsilon=1e-5, name="norm2")(x), context)
        return x

    def ttb_no_ff(self, x, context):
        x = x + unet_mod.Attention(self.num_heads, self.head_dim, name="attn1")(
            nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        )
        x = x + unet_mod.Attention(
            self.num_heads, self.head_dim, context_dim=self.context_dim,
            name="attn2",
        )(nn.LayerNorm(epsilon=1e-5, name="norm2")(x), context)
        return x

    patch("BasicTransformerBlock", btb_no_ff)
    patch("TemporalTransformerBlock", ttb_no_ff)
    no_ff = time_unet("all transformer FFs -> identity")
    restore()

    # 4. temporal res blocks -> spatial only
    def strb_spatial_only(self, x, emb, num_frames):
        return unet_mod.SpatialResBlock(self.out_ch, name="spatial_res_block")(x, emb)

    patch("SpatioTemporalResBlock", strb_spatial_only)
    no_tres = time_unet("temporal res blocks -> identity")
    restore()

    # 5. temporal transformer pass -> identity (keep spatial transformer)
    def tst_no_temporal(self, x, context, num_frames):
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

    patch("TransformerSpatioTemporal", tst_no_temporal)
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
