#!/usr/bin/env python
"""Micro-benchmarks: practical bf16 matmul/conv throughput on this chip at
the UNet's actual shapes, plus per-stage FLOP counts and achieved TFLOP/s
for the three pipeline stages.  Calibrates how much perf headroom remains
(bench.py reports whole-pipeline MFU; this separates shape ceiling from
program overhead)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools._benchlib import measure_rtt as _rtt, setup_cache, time_single

setup_cache()


def timed(fn, *args, reps=5, rtt=0.0):
    return time_single(fn, *args, reps=reps, rtt=rtt)




def main():
    rtt = _rtt()
    print(f"device={jax.devices()[0].device_kind} rtt={rtt*1e3:.1f}ms", flush=True)
    rng = jax.random.PRNGKey(0)

    shapes = [
        # (M, K, N, label)
        (76800, 320, 320, "stage0 qkv/out [25*3072, 320]x[320,320]"),
        (76800, 320, 2560, "stage0 GEGLU up"),
        (76800, 1280, 320, "stage0 GEGLU down"),
        (19200, 640, 640, "stage1 proj"),
        (4800, 1280, 1280, "stage2 proj"),
        (4800, 1280, 10240, "stage2 GEGLU up"),
        (8192, 1280, 1280, "square-ish 1280"),
        (16384, 4096, 4096, "big reference"),
    ]
    for m, k, n, label in shapes:
        a = jax.random.normal(rng, (m, k), jnp.bfloat16)
        b = jax.random.normal(rng, (k, n), jnp.bfloat16)
        t = timed(lambda x, y: x @ y, a, b, rtt=rtt)
        tf = 2 * m * k * n / t / 1e12
        print(f"{label:48s} {t*1e3:7.2f} ms  {tf:6.1f} TF/s", flush=True)

    # conv at VAE-decode final level
    x = jax.random.normal(rng, (25, 384, 512, 128), jnp.bfloat16)
    w = jax.random.normal(rng, (3, 3, 128, 128), jnp.bfloat16)
    t = timed(
        lambda xx, ww: jax.lax.conv_general_dilated(
            xx, ww, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ),
        x, w, rtt=rtt,
    )
    tf = 2 * 9 * 128 * 128 * 25 * 384 * 512 / t / 1e12
    print(f"{'conv3x3 25x384x512x128':48s} {t*1e3:7.2f} ms  {tf:6.1f} TF/s",
          flush=True)

    x = jax.random.normal(rng, (25, 48, 64, 320), jnp.bfloat16)
    w = jax.random.normal(rng, (3, 3, 320, 320), jnp.bfloat16)
    t = timed(
        lambda xx, ww: jax.lax.conv_general_dilated(
            xx, ww, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ),
        x, w, rtt=rtt,
    )
    tf = 2 * 9 * 320 * 320 * 25 * 48 * 64 / t / 1e12
    print(f"{'conv3x3 25x48x64x320':48s} {t*1e3:7.2f} ms  {tf:6.1f} TF/s",
          flush=True)

    # flash attention at stage0 shape
    from unigeo_tpu.ops.attention import flash_attention_tpu_packed

    q = jax.random.normal(rng, (25, 3072, 320), jnp.bfloat16)
    t = timed(
        lambda a_: flash_attention_tpu_packed(a_, a_, a_, num_heads=5),
        q, rtt=rtt,
    )
    tf = 2 * 2 * 25 * 5 * 3072 * 3072 * 64 / t / 1e12
    print(f"{'flash packed 25x3072x(5x64)':48s} {t*1e3:7.2f} ms  {tf:6.1f} TF/s",
          flush=True)

    # per-stage cost analysis vs measured time
    from unigeo_tpu.models.depthcrafter.pipeline import DepthCrafterPipeline

    pipe = DepthCrafterPipeline()
    t_, h_, w_ = 25, 384, 512
    ctx_dim = pipe.unet.cross_attention_dim
    lat = jax.ShapeDtypeStruct((t_, h_ // 8, w_ // 8, 4), jnp.bfloat16)
    ctx = jax.ShapeDtypeStruct((t_, 1, ctx_dim), jnp.bfloat16)
    nz = jax.ShapeDtypeStruct((t_, h_ // 8, w_ // 8, 4), jnp.float32)
    try:
        comp = type(pipe)._denoise_stage.lower(
            pipe,
            jax.eval_shape(
                lambda: {
                    "unet": jax.tree.map(
                        lambda s: jax.ShapeDtypeStruct(s.shape, jnp.bfloat16),
                        jax.eval_shape(
                            lambda r: pipe.unet.init(
                                r,
                                jnp.zeros((t_, h_ // 8, w_ // 8, 8)),
                                jnp.zeros((1,)),
                                jnp.zeros((t_, 1, ctx_dim)),
                                jnp.zeros((1, 3)),
                                t_,
                            ),
                            jax.random.PRNGKey(0),
                        )["params"],
                    )
                }
            ),
            lat, ctx, nz, 5,
        ).compile()
        cost = comp.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        fl = float(cost.get("flops", 0.0))
        print(f"denoise-stage cost-analysis flops: {fl/1e12:.1f} TFLOP "
              f"({fl/5e12:.2f}/step)", flush=True)
    except Exception as e:
        print("cost analysis failed:", e, flush=True)


if __name__ == "__main__":
    main()
