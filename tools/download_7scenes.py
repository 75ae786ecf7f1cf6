#!/usr/bin/env python
"""Download and unpack the Microsoft 7-Scenes RGB-D dataset.

Native counterpart of the reference's shell-out script
(/root/reference/dataset/sevenScenes/download.py:1-20 — wget + unzip via
os.system, hardcoded to three scenes): stdlib urllib + zipfile, all seven
scenes by default, resumable (existing scene dirs / zips are skipped),
checks the nested per-sequence zips the Microsoft archives contain, and a
--dry-run mode that prints the URL/extract plan without network access
(this environment has no egress — the URL construction and unpack plan
are unit-tested, the transfer itself is exercised only where egress
exists).

Usage:
  python tools/download_7scenes.py --out /data/7scenes [--scenes chess fire]
  python tools/download_7scenes.py --dry-run

Afterwards run tools/preprocess_7scenes.py for depth registration
(the reference's dataset/sevenScenes/preprocess.py step).
"""

from __future__ import annotations

import argparse
import os
import sys
import zipfile

BASE_URL = (
    "http://download.microsoft.com/download/2/8/5/"
    "28564B23-0828-408F-8631-23B1EFF1DAC8"
)
ALL_SCENES = (
    "chess", "fire", "heads", "office", "pumpkin", "redkitchen", "stairs"
)


def scene_url(scene: str) -> str:
    if scene not in ALL_SCENES:
        raise ValueError(f"unknown 7-Scenes scene {scene!r}; one of {ALL_SCENES}")
    return f"{BASE_URL}/{scene}.zip"


def plan(scenes, out_dir: str):
    """[(scene, url, target_dir)] for the requested scenes."""
    return [(s, scene_url(s), os.path.join(out_dir, s)) for s in scenes]


def _unpack_nested(scene_dir: str) -> int:
    """Extract the per-sequence zips inside a scene dir (seq-XX.zip),
    deleting each after successful extraction.  Returns the count."""
    n = 0
    for name in sorted(os.listdir(scene_dir)):
        if not name.endswith(".zip"):
            continue
        inner = os.path.join(scene_dir, name)
        with zipfile.ZipFile(inner) as zf:
            zf.extractall(scene_dir)
        os.unlink(inner)
        n += 1
    return n


def download_scene(scene: str, out_dir: str, keep_zip: bool = False) -> str:
    """Fetch + unpack one scene; skips work already done."""
    import urllib.request

    target = os.path.join(out_dir, scene)
    if os.path.isdir(target) and not any(
        f.endswith(".zip") for f in os.listdir(target)
    ):
        print(f"{scene}: already extracted, skipping", file=sys.stderr)
        return target
    os.makedirs(out_dir, exist_ok=True)
    zip_path = os.path.join(out_dir, f"{scene}.zip")
    if not os.path.exists(zip_path) and not os.path.isdir(target):
        url = scene_url(scene)
        print(f"{scene}: downloading {url}", file=sys.stderr)
        tmp = zip_path + ".part"
        urllib.request.urlretrieve(url, tmp)
        os.replace(tmp, zip_path)
    if os.path.exists(zip_path):
        print(f"{scene}: extracting {zip_path}", file=sys.stderr)
        with zipfile.ZipFile(zip_path) as zf:
            zf.extractall(out_dir)
        if not keep_zip:
            os.unlink(zip_path)
    n = _unpack_nested(target)
    print(f"{scene}: unpacked {n} sequence archives", file=sys.stderr)
    return target


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="./7scenes", help="output root")
    ap.add_argument("--scenes", nargs="*", default=list(ALL_SCENES),
                    help=f"subset of {ALL_SCENES}")
    ap.add_argument("--keep-zip", action="store_true")
    ap.add_argument("--dry-run", action="store_true",
                    help="print the URL/extract plan and exit")
    args = ap.parse_args(argv)

    steps = plan(args.scenes, args.out)
    if args.dry_run:
        for scene, url, target in steps:
            print(f"{scene}: GET {url} -> unzip to {target} "
                  f"-> unzip nested seq-*.zip")
        return 0
    for scene, _, _ in steps:
        download_scene(scene, args.out, keep_zip=args.keep_zip)
    print("done; next: python tools/preprocess_7scenes.py --root "
          f"{args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
