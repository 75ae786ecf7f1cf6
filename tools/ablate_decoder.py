#!/usr/bin/env python
"""Per-stage ablation of the temporal VAE decoder at production shapes.

decode(25 frames, 384x512) measured 508 ms on v5e vs ~350 ms of conv FLOPs
at the conv microbench rate — this finds where the rest goes.  Scan-chained
timing (K) so the tunnel RTT amortizes.

Usage: python tools/ablate_decoder.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools._benchlib import measure_rtt, setup_cache, time_chained

setup_cache()

DTYPE = jnp.bfloat16
T = 25


def _time_chained(fn, x, K, reps=3, rtt=0.0):
    return time_chained(fn, x, K, reps=reps, rtt=rtt)


def main():
    from unigeo_tpu.models.layers import Conv2d, GroupNorm, TemporalConv
    from unigeo_tpu.models.depthcrafter.vae import (
        TemporalResnetBlock,
        VaeAttnBlock,
        VaeResBlock,
        VaeSpatioTemporalResBlock,
    )

    rtt = measure_rtt()
    print(f"device={jax.devices()[0].device_kind}  rtt={rtt*1e3:.1f} ms", flush=True)
    rng = jax.random.PRNGKey(0)

    def bf16(p):
        return jax.tree.map(lambda a: a.astype(DTYPE), p)

    def bench(name, module, x, K, *extra):
        # init at a small spatial shape (params are shape-independent) —
        # f32 init activations at 25x384x512x128 would OOM the chip
        small = jnp.zeros(x.shape[:-3] + (8, 8, x.shape[-1]), x.dtype)
        p = bf16(module.init(rng, small, *extra)["params"])
        ms = _time_chained(
            lambda c: module.apply({"params": p}, c, *extra), x, K, rtt=rtt
        ) * 1e3
        print(f"{name:52s} {ms:8.3f} ms", flush=True)
        return ms

    # decoder stages: (spatial res, C, n resblocks) — latent 48x64 input
    # up0..up2 at 512ch; up3 at 128 after channel-drop convs; upsamples at
    # 48x64->96x128 (512), 96x128->192x256 (512), 192x256->384x512 (256)
    stages = [
        ("mid+up0 48x64x512", 48, 64, 512, 16),
        ("up1 96x128x512", 96, 128, 512, 8),
        ("up2 192x256x256", 192, 256, 256, 8),
        ("up3 384x512x128", 384, 512, 128, 4),
    ]
    total = 0.0
    for label, hh, ww, ch, K in stages:
        x = jax.random.normal(rng, (T, hh, ww, ch), DTYPE)
        ms = bench(f"VaeSpatioTemporalResBlock {label}", VaeSpatioTemporalResBlock(ch), x, K, T)
        n = 5 if "mid" in label else 3
        total += ms * n
        # constituents at the same shape
        bench(f"  VaeResBlock (spatial only) {label}", VaeResBlock(ch), x, K)
        x5 = x.reshape(1, T, hh, ww, ch)
        bench(f"  TemporalResnetBlock {label}", TemporalResnetBlock(ch), x5, K)
        bench(f"  GroupNorm {label}", GroupNorm(epsilon=1e-6), x, K)
        bench(f"  Conv2d 3x3 {label}", Conv2d(ch), x, K)
        bench(f"  TemporalConv {label}", TemporalConv(ch), x5, K)

    # mid attention at 48x64, single head d=512
    x = jax.random.normal(rng, (T, 48, 64, 512), DTYPE)
    bench("VaeAttnBlock 48x64x512 (1 head d=512)", VaeAttnBlock(), x, 8)

    # upsample repeat+conv vs conv-transpose equivalent
    for hh, ww, ch, K in ((48, 64, 512, 8), (96, 128, 512, 4), (192, 256, 256, 4)):
        x = jax.random.normal(rng, (T, hh, ww, ch), DTYPE)

        class UpRepeatConv(__import__("flax").linen.Module):
            @__import__("flax").linen.compact
            def __call__(self, h):
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                return Conv2d(ch)(h)

        small = jax.random.normal(rng, (1, 8, 8, ch), DTYPE)
        p = bf16(UpRepeatConv().init(rng, small)["params"])
        up = UpRepeatConv()
        ms = _time_chained(
            lambda c: up.apply({"params": p}, c)[:, ::2, ::2, :], x, K, rtt=rtt
        ) * 1e3
        print(f"{'upsample repeat+conv %dx%dx%d' % (hh, ww, ch):52s} {ms:8.3f} ms",
              flush=True)

    print(f"resblock-estimated decode total ≈ {total:.1f} ms (ex attn/ups/io)",
          flush=True)


if __name__ == "__main__":
    main()
