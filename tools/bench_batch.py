#!/usr/bin/env python
"""Throughput experiment: B clips batched per chip vs serial.

The evaluator has abundant clips (SURVEY §6: 100+ scenes × windows), so
frames/sec/chip in production is a THROUGHPUT number: vmapping B clips
through one jitted step multiplies every matmul's M by B, lifting MXU
utilization of the small-tensor UNet stages.  This measures fps(B)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools._benchlib import setup_cache

setup_cache()


def main():
    t = int(os.environ.get("BENCH_FRAMES", "25"))
    h = int(os.environ.get("BENCH_H", "384"))
    w = int(os.environ.get("BENCH_W", "512"))
    steps = 5
    batches = [int(b) for b in os.environ.get("BENCH_BATCHES", "1,2,3").split(",")]

    from unigeo_tpu.utils.randparams import random_params_like as _random_params_like
    from unigeo_tpu.models.depthcrafter.pipeline import DepthCrafterPipeline

    pipe = DepthCrafterPipeline()
    ctx_dim = pipe.unet.cross_attention_dim
    rng = jax.random.PRNGKey(0)
    shapes = {
        "vae": jax.eval_shape(
            lambda r: pipe.vae.init(r, jnp.zeros((1, h, w, 3)), 1), rng
        )["params"],
        "clip": jax.eval_shape(
            lambda r: pipe.clip.init(r, jnp.zeros((1, h, w, 3))), rng
        )["params"],
        "unet": jax.eval_shape(
            lambda r: pipe.unet.init(
                r,
                jnp.zeros((t, h // 8, w // 8, 8)),
                jnp.zeros((1,)),
                jnp.zeros((t, 1, ctx_dim)),
                jnp.zeros((1, 3)),
                t,
            ),
            rng,
        )["params"],
    }
    pipe.params = params = _random_params_like(shapes, dtype=jnp.bfloat16)

    trivial = jax.jit(lambda x: x + 1.0)
    float(trivial(jnp.float32(0.0)))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(trivial(jnp.float32(0.0)))
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)
    final_sum = jax.jit(lambda x: x.sum())
    print(f"device={jax.devices()[0].device_kind} rtt={rtt*1e3:.1f}ms",
          flush=True)

    for b in batches:
        frames = jnp.asarray(
            np.random.default_rng(0)
            .uniform(size=(b, t, h, w, 3))
            .astype(np.float32)
        )
        noise = jax.random.normal(
            jax.random.PRNGKey(1), (b, t, h // 8, w // 8, 4)
        )

        @jax.jit
        def run_b(params, frames, noise):
            cond, ctx = jax.vmap(
                lambda f: pipe._encode_stage.__wrapped__(pipe, params, f, None)
            )(frames)
            x = jax.vmap(
                lambda c, cc, n: pipe._denoise_stage.__wrapped__(
                    pipe, params, c, cc, n, steps
                )
            )(cond, ctx, noise)
            return jax.vmap(
                lambda l: pipe._decode_stage.__wrapped__(pipe, params, l)
            )(x)

        def run():
            return float(final_sum(run_b(params, frames, noise)))

        run()  # compile
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        best = max(min(times) - rtt, 1e-9)
        print(
            f"B={b}: {best*1e3:8.1f} ms  {b*t/best:7.2f} frames/s/chip",
            flush=True,
        )


if __name__ == "__main__":
    main()
