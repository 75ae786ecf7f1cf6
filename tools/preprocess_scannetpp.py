#!/usr/bin/env python
"""ScanNet++ GT preprocessor CLI (reference: preprocess_scannetpp_imu.py).

Usage: python tools/preprocess_scannetpp.py --data-root RAW --out-root OUT
       [--scenes a b c] [--stride 3] [--height 768 --width 1024]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import os


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data-root", required=True, help="raw ScanNet++ root")
    parser.add_argument("--out-root", required=True)
    parser.add_argument("--scenes", nargs="*", default=None)
    parser.add_argument("--stride", type=int, default=1)
    parser.add_argument("--height", type=int, default=768)
    parser.add_argument("--width", type=int, default=1024)
    parser.add_argument("--max-frames", type=int, default=None)
    parser.add_argument(
        "--camera", choices=("iphone", "dslr"), default="iphone",
        help="iphone = IMU-pose path; dslr = COLMAP poses + fisheye "
             "undistortion (reference preprocess_scannetpp_imu.py:194-322)",
    )
    parser.add_argument("--balance", type=float, default=0.0,
                        help="fisheye new-camera balance (dslr only)")
    args = parser.parse_args()

    from unigeo_tpu.preprocess.scannetpp import process_scene, process_scene_dslr

    scenes = args.scenes or sorted(os.listdir(args.data_root))
    for scene in scenes:
        scene_dir = os.path.join(args.data_root, scene)
        if not os.path.isdir(scene_dir):
            continue
        out_dir = os.path.join(args.out_root, scene)
        print(f"processing {scene} ...")
        if args.camera == "dslr":
            n = process_scene_dslr(
                scene_dir,
                out_dir,
                target_hw=(args.height, args.width),
                frame_stride=args.stride,
                max_frames=args.max_frames,
                balance=args.balance,
            )
        else:
            n = process_scene(
                scene_dir,
                out_dir,
                target_hw=(args.height, args.width),
                frame_stride=args.stride,
                max_frames=args.max_frames,
            )
        print(f"  {n} frames rendered → {out_dir}")


if __name__ == "__main__":
    main()
