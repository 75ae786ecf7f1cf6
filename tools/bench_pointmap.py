#!/usr/bin/env python
"""TPU bench of the pointmap / feed-forward model families.

The headline bench (bench.py) covers the diffusion flagship; this tool
measures the OTHER inference families end-to-end through their adapters
(network forward + camera recovery + normals + host conversions — the
honest per-clip number the evaluator sees):

  * Spann3R  (ring-memory sequential pointmaps)
  * Cut3R    (recurrent state tokens + pose head)
  * Dust3R   (two-view pairs, batched one-ref)
  * VideoDepthAnything (ViT + temporal DPT, feed-forward depth)

All random-init at DUSt3R-lineage production sizes (ViT-L 1024x24 encoder,
768x12 decoder, patch 16) / VDA vit-l — random weights, real shapes: the
timings are architecture-bound, weights don't change them.

Usage: python tools/bench_pointmap.py [--frames 20] [--hw 384 512] [--models ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from tools._benchlib import measure_rtt, setup_cache

setup_cache()

VIT_L = dict(
    enc_width=1024, enc_depth=24, enc_heads=16,
    dec_width=768, dec_depth=12, dec_heads=12,
)


def _clip(frames, h, w, seed=0):
    rng = np.random.default_rng(seed)
    K = np.array(
        [[0.9 * w, 0, w / 2], [0, 0.9 * w, h / 2], [0, 0, 1]], np.float32
    )
    return {
        "images": rng.uniform(0, 255, (frames, 3, h, w)).astype(np.float32),
        "intrinsics": np.repeat(K[None], frames, 0),
        "scene_name": "bench",
        "keyview_idx": 0,
    }


def bench_model(name, make, data, reps):
    t0 = time.perf_counter()
    model = make()
    t_init = time.perf_counter() - t0

    t0 = time.perf_counter()
    model.forward(data)  # compile + first run
    t_first = time.perf_counter() - t0

    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = model.forward(data)
        best = min(best, time.perf_counter() - t0)
    nf = data["images"].shape[0]
    print(
        f"{name:20s} init {t_init:5.1f}s  first {t_first:6.1f}s  "
        f"clip {best * 1e3:8.1f} ms  -> {nf / best:7.2f} frames/s/chip",
        flush=True,
    )
    del model, out
    return nf / best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--hw", type=int, nargs=2, default=(384, 512))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--models", nargs="*",
        default=["spann3r", "cut3r", "dust3r", "vda"],
    )
    args = ap.parse_args()
    h, w = args.hw

    rtt = measure_rtt()
    print(
        f"device={jax.devices()[0].device_kind}  rtt={rtt * 1e3:.1f} ms  "
        f"clip {args.frames}x{h}x{w}",
        flush=True,
    )
    data = _clip(args.frames, h, w)
    results = {}

    if "spann3r" in args.models:
        from unigeo_tpu.models.pointmap.spann3r import Spann3R

        results["spann3r"] = bench_model(
            "Spann3R (ViT-L)",
            lambda: Spann3R(
                network_config=VIT_L, init_height=h, init_width=w,
                init_frames=args.frames,
            ),
            data, args.reps,
        )
    if "cut3r" in args.models:
        from unigeo_tpu.models.pointmap.cut3r import Cut3R

        results["cut3r"] = bench_model(
            "Cut3R (ViT-L)",
            lambda: Cut3R(
                network_config=VIT_L, init_height=h, init_width=w,
                init_frames=args.frames,
            ),
            data, args.reps,
        )
    if "dust3r" in args.models:
        from unigeo_tpu.models.pointmap.dust3r import Dust3R

        results["dust3r"] = bench_model(
            "Dust3R (ViT-L)",
            lambda: Dust3R(
                network_config=VIT_L, init_height=h, init_width=w,
                init_frames=args.frames,
            ),
            data, args.reps,
        )
    if "vda" in args.models:
        from unigeo_tpu.models.vda import VideoDepthAnything

        results["vda"] = bench_model(
            "VideoDepthAnything",
            lambda: VideoDepthAnything(
                init_height=h, init_width=w, init_frames=args.frames,
            ),
            data, args.reps,
        )
    print({k: round(v, 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
