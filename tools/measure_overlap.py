#!/usr/bin/env python
"""Measure single-chip cross-program overlap on the current TPU.

VERDICT r3 #2 proposed software-pipelining clips on ONE chip — overlapping
clip i's denoise with clip i±1's encode/decode via async dispatch — and
projected ~18 fps from clip_time = max(denoise, encode+decode).  That bound
assumes the chip can execute two XLA programs CONCURRENTLY.  This tool
measures whether it can:

  * serial:    denoise → host sync → encode            (two round trips)
  * pipelined: denoise, encode enqueued back-to-back, one sync at the end
  * two_denoise / one_denoise ratio: if programs overlapped at all, two
    independent denoises would take < 2x one

Result on TPU v5 lite (v5e), 2026-08-20, jax 0.9.0 (see ROADMAP r4):

    rtt_ms 25.9
    serial_ms 1656.6  pipelined_ms 1654.2  overlap_ms 2.4
    one_denoise_ms 1381.2  two_denoise_ms 2787.3  ratio 2.018

i.e. a v5e chip has ONE TensorCore and the runtime executes enqueued
programs strictly in order — zero overlap (the 2.4 ms delta is one saved
host round trip).  Async dispatch hides only host/tunnel latency, which the
production evaluator already exploits.  Single-chip clip time is therefore
the SUM of the stage times, and the fps ceiling at current kernel ceilings
is 25 / 1.773 s = 14.1 fps (bench.py CEILING_MS) — cross-clip stage overlap
is a MULTI-chip lever (parallel/staged.py PipelinedStageExecutor), not a
single-chip one.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

from unigeo_tpu.utils.hostcache import host_cache_dir
from unigeo_tpu.utils import warmcache

_CACHE = os.environ.get("UNIGEO_CACHE_DIR") or host_cache_dir(REPO)
warmcache.seed(REPO, _CACHE)
warmcache.configure(_CACHE)

from unigeo_tpu.models.depthcrafter.pipeline import DepthCrafterPipeline  # noqa: E402
from unigeo_tpu.utils.randparams import random_pipeline_params  # noqa: E402


def main():
    t, h, w, steps = 25, 384, 512, 5
    pipe = DepthCrafterPipeline()
    pipe.params = random_pipeline_params(pipe, t, h, w)

    frames = jnp.asarray(
        np.random.default_rng(0).uniform(size=(t, h, w, 3)).astype(np.float32)
    )
    noise = jax.random.normal(jax.random.PRNGKey(1), (t, h // 8, w // 8, 4))
    final_sum = jax.jit(lambda x: x.sum())
    trivial = jax.jit(lambda x: x + 1.0)

    cond, ctx = pipe._encode_stage(pipe.params, frames, None)
    lat = pipe._denoise_stage(pipe.params, cond, ctx, noise, steps)
    float(final_sum(pipe._decode_stage(pipe.params, lat).sum()))

    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(trivial(jnp.float32(0.0)))
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)
    print(f"rtt_ms {rtt*1e3:.1f}")

    def timeit(fn, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best - rtt

    def serial():
        x = pipe._denoise_stage(pipe.params, cond, ctx, noise, steps)
        float(final_sum(x))
        _, x2 = pipe._encode_stage(pipe.params, frames, None)
        float(final_sum(x2))

    def pipelined():
        x = pipe._denoise_stage(pipe.params, cond, ctx, noise, steps)
        _, x2 = pipe._encode_stage(pipe.params, frames, None)
        float(final_sum(x))
        float(final_sum(x2))

    s, p = timeit(serial), timeit(pipelined)
    print(f"serial_ms {s*1e3:.1f} pipelined_ms {p*1e3:.1f} "
          f"overlap_ms {(s-p)*1e3:.1f}")

    def one():
        float(final_sum(pipe._denoise_stage(pipe.params, cond, ctx, noise, steps)))

    def two():
        x = pipe._denoise_stage(pipe.params, cond, ctx, noise, steps)
        y = pipe._denoise_stage(pipe.params, cond, ctx, noise + 1.0, steps)
        float(final_sum(x))
        float(final_sum(y))

    o, tw = timeit(one), timeit(two)
    print(f"one_denoise_ms {o*1e3:.1f} two_denoise_ms {tw*1e3:.1f} "
          f"ratio {tw/o:.3f}")


if __name__ == "__main__":
    main()
