#!/usr/bin/env python
"""Dataset QA driver (reference: test_vis_dataset.py:17-73).

Loads an experiment config, iterates every Nth sample, recomputes normals
from the sample's world coordinates with the plane-fit op (so what's checked
is the full geometry pipeline, not the stored normal maps), and writes
RGB | stored-normal | recomputed-normal strips plus a data.csv index.

Usage: python tools/vis_dataset.py --config configs/<x>.yaml [--out DIR]
       [--every 5] [--max-samples N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import csv
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True)
    parser.add_argument("--out", default="./debug_vis_dataset")
    parser.add_argument("--every", type=int, default=5)
    parser.add_argument("--max-samples", type=int, default=None)
    args = parser.parse_args()

    from PIL import Image

    from unigeo_tpu.config import EvalConfig
    from unigeo_tpu.ops.normals import surface_normals_from_points
    from unigeo_tpu.registry import get_dataset_cls
    from unigeo_tpu.utils.vis import normal_to_rgb

    cfg = EvalConfig.from_yaml(args.config)
    dataset = get_dataset_cls(cfg.dataset)(**cfg.dataset_kwargs)
    os.makedirs(args.out, exist_ok=True)

    rows = []
    indices = range(0, len(dataset), args.every)
    if args.max_samples is not None:
        indices = list(indices)[: args.max_samples]
    for idx in indices:
        data = dataset[idx]
        nf = len(data["images"])
        mid = nf // 2
        rgb = np.moveaxis(data["images"][mid], 0, -1).astype(np.uint8)
        stored = normal_to_rgb(np.moveaxis(data["world_normal"][mid], 0, -1))

        world_pts = np.moveaxis(data["world_coord"], 1, -1)  # [Nf,H,W,3]
        recomputed = np.asarray(surface_normals_from_points(world_pts[mid][None]))[0]
        recomputed_rgb = normal_to_rgb(recomputed)

        strip = np.concatenate([rgb, stored, recomputed_rgb], axis=1)
        name = f"{idx:05d}_{data['scene_name']}.png"
        Image.fromarray(strip).save(os.path.join(args.out, name))
        rows.append(
            {
                "index": idx,
                "scene": data["scene_name"],
                "frames": nf,
                "valid_frac": float(np.mean(data["mask"])),
                "file": name,
            }
        )
        print(f"{name}  valid={rows[-1]['valid_frac']:.3f}")

    if not rows:
        print("no samples visited (empty dataset or max-samples 0); no CSV")
        return
    with open(os.path.join(args.out, "data.csv"), "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        writer.writeheader()
        writer.writerows(rows)
    print(f"wrote {len(rows)} strips + data.csv to {args.out}")


if __name__ == "__main__":
    main()
