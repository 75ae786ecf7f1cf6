#!/usr/bin/env python
"""7-Scenes depth-registration CLI (reference: dataset/sevenScenes/preprocess.py).

Registers Kinect depth onto the RGB sensor for every sequence directory,
writing *.depth.proj.png next to the originals.

Usage: python tools/preprocess_7scenes.py --root /data/7scenes [--scenes chess ...]

Note: the reference also ships a downloader (download.py); this environment
has no egress — fetch the archives from the Microsoft 7-Scenes page and
extract them under --root first.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import os


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--root", required=True)
    parser.add_argument("--scenes", nargs="*", default=None)
    args = parser.parse_args()

    from unigeo_tpu.preprocess.sevenscenes import process_scene

    scenes = args.scenes or sorted(
        d for d in os.listdir(args.root) if os.path.isdir(os.path.join(args.root, d))
    )
    total = 0
    for scene in scenes:
        scene_dir = os.path.join(args.root, scene)
        for seq in sorted(os.listdir(scene_dir)):
            seq_dir = os.path.join(scene_dir, seq)
            if not os.path.isdir(seq_dir):
                continue
            print(f"registering {scene}/{seq} ...")
            total += process_scene(seq_dir)
    print(f"done: {total} frames registered")


if __name__ == "__main__":
    main()
