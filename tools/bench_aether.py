#!/usr/bin/env python
"""Production-scale TPU bench of the Aether stack (models/aether.py).

Measures, at the aether_scannetpp.yaml scale (width 768 / depth 16 DiT,
16×384×512 clip → 4×48×64 latents → S=3072 space-time tokens):

  * one DiT velocity evaluation (the flow sampler's unit of work), with an
    analytic FLOP count → TF/s;
  * causal-3D-VAE encode and decode;
  * the end-to-end adapter clip (num_steps velocity evals + encode/decode)
    → frames/sec.

Usage: python tools/bench_aether.py       (TPU; first compile is slow)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools._benchlib import measure_rtt, setup_cache, time_single

setup_cache()

DTYPE = jnp.bfloat16
T, H, W = 16, 384, 512
NUM_STEPS = 4


def dit_flops(s, c, depth, mlp_ratio):
    """MACs×2 per velocity eval: qkv+out projections, attention matmuls,
    MLP — patchify/head are negligible."""
    proj = 8 * s * c * c
    attn = 4 * s * s * c
    mlp = 4 * mlp_ratio * s * c * c
    return depth * (proj + attn + mlp)


def main():
    from unigeo_tpu.models.aether import Aether

    rtt = measure_rtt()
    print(f"device={jax.devices()[0].device_kind}  rtt={rtt*1e3:.1f} ms",
          flush=True)

    model = Aether(
        network_config=dict(width=768, depth=16, num_heads=12, patch=2),
        vae_config=dict(base_width=64, mults=(1, 2, 4),
                        temporal_down=(False, True, True), z_channels=8),
        num_steps=NUM_STEPS,
        init_height=H, init_width=W, init_frames=T,
    )
    bf16 = lambda p: jax.tree.map(lambda a: a.astype(DTYPE), p)
    vae_p = bf16(model.vae_params)
    dit_p = bf16(model.dit_params)

    ct, cs, zc = model.vae.ct, model.vae.cs, model.vae.z_channels
    tl, hl, wl = T // ct, H // cs, W // cs
    s_tokens = tl * (hl // 2) * (wl // 2)
    print(f"latents {tl}x{hl}x{wl}  tokens S={s_tokens}")

    rng = jax.random.PRNGKey(0)
    frames = jax.random.uniform(rng, (T, H, W, 3), DTYPE) * 2 - 1
    lat_in = jax.random.normal(rng, (tl, hl, wl, zc + model.target_channels),
                               DTYPE)
    dep_lat = jax.random.normal(rng, (tl, hl, wl, zc), DTYPE)

    # ---- DiT velocity eval -------------------------------------------------
    t_dit = time_single(
        lambda p, x: model.dit.apply(p, x, jnp.float32(0.5)),
        dit_p, lat_in, rtt=rtt)
    fl = dit_flops(s_tokens, 768, 16, 4)
    print(f"DiT velocity eval: {t_dit*1e3:7.1f} ms   "
          f"{fl/1e9:.0f} GF → {fl/t_dit/1e12:.1f} TF/s")

    # ---- VAE ---------------------------------------------------------------
    t_enc = time_single(
        lambda p, f: model.vae.apply(p, f, method=type(model.vae).encode),
        vae_p, frames, rtt=rtt)
    print(f"VAE3D encode ({T}x{H}x{W}): {t_enc*1e3:7.1f} ms")
    t_dec = time_single(
        lambda p, z: model.vae.apply(p, z, method=type(model.vae).decode),
        vae_p, dep_lat, rtt=rtt)
    print(f"VAE3D decode → {T}x{H}x{W}: {t_dec*1e3:7.1f} ms")

    # ---- flow sampler (num_steps velocity evals in one program) -----------
    cond = jax.random.normal(rng, (tl, hl, wl, zc), DTYPE)
    noise = jax.random.normal(rng, (tl, hl, wl, model.target_channels), DTYPE)
    t_flow = time_single(
        lambda p, c, n: model._flow_sample(p, c, n, NUM_STEPS),
        dit_p, cond, noise, rtt=rtt)
    print(f"flow sample ({NUM_STEPS} steps): {t_flow*1e3:7.1f} ms  "
          f"(per step {t_flow/NUM_STEPS*1e3:.1f})")

    clip_s = t_enc + t_flow + t_dec
    print(f"\nclip estimate: {clip_s*1e3:.0f} ms → "
          f"{T/clip_s:.1f} frames/s/chip "
          f"(encode {t_enc*1e3:.0f} + flow {t_flow*1e3:.0f} + "
          f"decode {t_dec*1e3:.0f})")


if __name__ == "__main__":
    main()
