#!/usr/bin/env python
"""Measure evaluator throughput: async metrics vs the serial loop.

Runs run_evaluation over N synthetic clips at the headline shape with the
flagship DepthCrafter stack (random-init bf16 weights, warm compile cache)
twice — async_metrics on and off — and reports clips/min and the per-clip
split.  The async path overlaps clip i's host-side scoring (GT prep,
masked gathers, f64 camera solves, CSV/PLY IO) with clip i+1's device
forward; the reference loop (eval.py:33-99) is strictly serial.

The delta depends on host core count (this dev box has ONE core, so the
overlap window is host-contended; production hosts have dozens).

Usage:  python tools/bench_eval_async.py [--clips 4] [--small]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from unigeo_tpu.utils.hostcache import host_cache_dir  # noqa: E402
from unigeo_tpu.utils import warmcache  # noqa: E402

_CACHE = os.environ.get("UNIGEO_CACHE_DIR") or host_cache_dir(REPO)
warmcache.seed(REPO, _CACHE)
warmcache.configure(_CACHE)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=4)
    ap.add_argument("--small", action="store_true",
                    help="tiny pipeline + 64x64 (CPU-friendly smoke)")
    args = ap.parse_args()

    import tempfile

    from unigeo_tpu.config import EvalConfig
    from unigeo_tpu.data.synthetic import SyntheticBoxDataset
    from unigeo_tpu.evaluator import run_evaluation
    from unigeo_tpu.models.depthcrafter.model import DepthCrafter as DepthCrafterModel
    from unigeo_tpu.models.depthcrafter.pipeline import tiny_pipeline

    if args.small:
        h, w, t = 64, 64, 4
        model = DepthCrafterModel(
            pipeline=tiny_pipeline(height=h, width=w, num_frames=t),
            init_height=h, init_width=w, init_frames=t,
        )
    else:
        from unigeo_tpu.models.depthcrafter.pipeline import DepthCrafterPipeline
        from unigeo_tpu.utils.randparams import random_pipeline_params

        h, w, t = 384, 512, 25
        # bf16 random params via eval_shape: a full-size f32 init_params is
        # ~6 GB and OOMs the chip next to the eval activations (measured)
        pipe = DepthCrafterPipeline()
        pipe.params = random_pipeline_params(pipe, t, h, w)
        model = DepthCrafterModel(
            pipeline=pipe, init_height=h, init_width=w, init_frames=t
        )

    ds = SyntheticBoxDataset(
        clip_length=t, clip_overlap=0, num_scenes=args.clips,
        frames_per_scene=t, render_size=(h, w),
    )
    cfg = EvalConfig.from_dict(
        {
            "dataset": "SyntheticBoxDataset",
            "model_name": "DepthCrafter",
            "h": h, "w": w,
            "eval_depth": {"metric_names": ["Abs Rel", "delta < 1.25"],
                           "depth_alignment": "lstsq"},
            "eval_normal": {"metric_names": ["normal mean"]},
            # no eval_pcd/eval_camera: the DepthCrafter adapter is
            # depth+normal-only (reference model/depthcrafter.py:65-68)
        }
    )

    results = {}
    for mode in ("async", "sync"):
        out = tempfile.mkdtemp(prefix=f"eval_{mode}_")
        # warm pass over clip 0 so compile time stays out of both timings
        run_evaluation(cfg, save_dir=out, dataset=ds, model=model,
                       max_clips=1, verbose=False, resume=False,
                       async_metrics=(mode == "async"),
                       data_parallel=False)
        out2 = tempfile.mkdtemp(prefix=f"eval_{mode}_timed_")
        t0 = time.perf_counter()
        run_evaluation(cfg, save_dir=out2, dataset=ds, model=model,
                       verbose=False, resume=False,
                       async_metrics=(mode == "async"),
                       data_parallel=False)
        dt = time.perf_counter() - t0
        results[mode] = dt
        print(f"{mode:6s}: {dt:7.2f} s for {args.clips} clips "
              f"({60 * args.clips / dt:.2f} clips/min)", flush=True)

    speedup = results["sync"] / results["async"]
    print(f"async speedup: {speedup:.3f}x", flush=True)


if __name__ == "__main__":
    main()
