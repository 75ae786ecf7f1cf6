#!/usr/bin/env python
"""Per-component ablation of the encode stage at production shapes.

encode+clip measured 242 ms on v5e (BENCH_r02); this attributes it:
  * whole _encode_stage (in-context, the program bench.py times)
  * VAE encode alone / CLIP embed alone (as separately jitted programs)
  * per-encoder-stage structural bench (scan-chained modules at their
    shapes, like tools/ablate_decoder.py)
  * CLIP constituents: the bicubic 384x512→224x224 resize vs the ViT
  * conv-FLOP floor per stage at the measured conv rate

Usage: python tools/ablate_encoder.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools._benchlib import measure_rtt, setup_cache, time_chained, time_single

setup_cache()

DTYPE = jnp.bfloat16
T, H, W = 25, 384, 512


def main():
    from unigeo_tpu.models.depthcrafter.pipeline import DepthCrafterPipeline
    from unigeo_tpu.models.depthcrafter.vae import Encoder, VaeResBlock, VaeAttnBlock
    from unigeo_tpu.models.layers import Conv2d, GroupNorm
    from unigeo_tpu.models.vit import ClipImageEmbedder

    rtt = measure_rtt()
    print(f"device={jax.devices()[0].device_kind}  rtt={rtt*1e3:.1f} ms", flush=True)
    rng = jax.random.PRNGKey(0)

    def bf16(p):
        return jax.tree.map(lambda a: a.astype(DTYPE), p)

    frames = jax.random.uniform(rng, (T, H, W, 3), jnp.float32)

    # ---- the full production _encode_stage --------------------------------
    pipe = DepthCrafterPipeline()
    enc_shapes = jax.eval_shape(
        lambda r: pipe.vae.init(r, jnp.zeros((1, H, W, 3)), 1), rng
    )["params"]
    clip_shapes = jax.eval_shape(
        lambda r: pipe.clip.init(r, jnp.zeros((1, H, W, 3))), rng
    )["params"]

    def rand_like(shapes, seed):
        """One jitted program for the whole tree — params stay ARGUMENTS
        everywhere below (closing over them would bake them into the
        lowered programs as constants and multiply compile time)."""
        leaves, treedef = jax.tree_util.tree_flatten(shapes)
        sizes = [int(jnp.prod(jnp.asarray(l.shape))) for l in leaves]
        total = sum(sizes)

        @jax.jit
        def gen(key):
            flat = jax.random.normal(key, (total,), DTYPE) * 0.02
            out, off = [], 0
            for n, l in zip(sizes, leaves):
                out.append(jax.lax.dynamic_slice(flat, (off,), (n,)).reshape(l.shape))
                off += n
            return out

        return jax.tree_util.tree_unflatten(treedef, gen(jax.random.PRNGKey(seed)))

    params = {"vae": rand_like(enc_shapes, 1), "clip": rand_like(clip_shapes, 2)}
    aug = jax.random.normal(jax.random.PRNGKey(3), (T, H, W, 3), jnp.float32)

    def _both(p, f, a):
        # consume BOTH outputs — returning only cond_latents lets XLA
        # dead-code-eliminate the whole CLIP branch
        c, x = pipe._encode_stage.__wrapped__(pipe, p, f, a)
        return jnp.sum(c.astype(jnp.float32)) + jnp.sum(x.astype(jnp.float32))

    ms = time_single(_both, params, frames, aug, rtt=rtt) * 1e3
    print(f"{'_encode_stage (vae+clip+aug, in context)':56s} {ms:8.1f} ms", flush=True)

    # ---- VAE encode alone / CLIP alone ------------------------------------
    vae_in = (frames * 2.0 - 1.0 + 0.02 * aug).astype(DTYPE)
    ms_vae = time_single(
        lambda p, f: pipe.vae.apply({"params": p}, f, method=pipe.vae.encode),
        params["vae"], vae_in, rtt=rtt,
    ) * 1e3
    print(f"{'VAE encode alone (25x384x512)':56s} {ms_vae:8.1f} ms", flush=True)

    ms_clip = time_single(
        lambda p, f: pipe.clip.apply({"params": p}, f),
        params["clip"], frames.astype(DTYPE), rtt=rtt,
    ) * 1e3
    print(f"{'CLIP ViT-H/14 embed alone (25 frames)':56s} {ms_clip:8.1f} ms", flush=True)

    # CLIP constituents: resize vs ViT
    ms_resize = time_single(
        lambda f: jax.image.resize(f, (T, 224, 224, 3), method="bicubic"),
        frames.astype(DTYPE), rtt=rtt,
    ) * 1e3
    print(f"{'  bicubic resize 384x512->224x224 x25':56s} {ms_resize:8.1f} ms",
          flush=True)

    # ---- per-stage structural bench (scan-chained) -------------------------
    # encoder stages: (spatial res, C, downsample after?)
    stages = [
        ("stage0 384x512x128", 384, 512, 128, 4),
        ("stage1 192x256x256", 192, 256, 256, 8),
        ("stage2 96x128x512", 96, 128, 512, 8),
        ("stage3+mid 48x64x512", 48, 64, 512, 16),
    ]
    total = 0.0
    for label, hh, ww, ch, K in stages:
        x = jax.random.normal(rng, (T, hh, ww, ch), DTYPE)
        block = VaeResBlock(ch)
        p = bf16(block.init(rng, x)["params"])
        ms_b = time_chained(
            lambda c: block.apply({"params": p}, c), x, K, rtt=rtt
        ) * 1e3
        n = 4 if "mid" in label else 2  # stage3 has 2 res + 2 mid res
        total += ms_b * n
        print(f"{'VaeResBlock ' + label:56s} {ms_b:8.1f} ms  x{n}", flush=True)
        gn = GroupNorm(epsilon=1e-6)
        pgn = bf16(gn.init(rng, x)["params"])
        ms_gn = time_chained(
            lambda c: gn.apply({"params": pgn}, c), x, K, rtt=rtt
        ) * 1e3
        conv = Conv2d(ch)
        pc = bf16(conv.init(rng, x)["params"])
        ms_cv = time_chained(
            lambda c: conv.apply({"params": pc}, c), x, K, rtt=rtt
        ) * 1e3
        # conv-FLOP floor: 2 * px * ch^2 * 9 at the measured conv rate
        flops = 2 * hh * ww * ch * ch * 9 * T
        rate = flops / (ms_cv / 1e3)
        print(
            f"{'  GroupNorm / Conv3x3 ' + label:56s} {ms_gn:8.1f} / {ms_cv:.1f} ms"
            f"  (conv rate {rate/1e12:.0f} TF/s)",
            flush=True,
        )

    x = jax.random.normal(rng, (T, 48, 64, 512), DTYPE)
    attn = VaeAttnBlock()
    pa = bf16(attn.init(rng, x)["params"])
    ms_at = time_chained(
        lambda c: attn.apply({"params": pa}, c), x, 8, rtt=rtt
    ) * 1e3
    print(f"{'VaeAttnBlock 48x64x512':56s} {ms_at:8.1f} ms", flush=True)
    print(
        f"resblock-estimated encode total ≈ {total:.1f} ms "
        f"(ex conv_in/downsamples/attn/quant)",
        flush=True,
    )


if __name__ == "__main__":
    main()
