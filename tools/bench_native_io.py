"""Host clip-decode microbench: per-frame PIL loop vs native C++ clip call.

The reference's host hot loop decodes each frame with PIL inside
``__getitem__`` (SURVEY.md §3.2); the native layer decodes the whole clip in
one C call.  This bench writes one production-shaped clip (25 frames at
384x512) per format and times both paths.

Pure host code — no JAX, safe to run alongside anything.

Usage: python tools/bench_native_io.py [--frames 25] [--hw 384 512]
"""

import argparse
import os
import os.path as osp
import sys
import tempfile
import time

import numpy as np
from PIL import Image

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def pil_rgb(paths):
    return np.stack([
        np.asarray(Image.open(p).convert("RGB"), np.float32).transpose(2, 0, 1)
        for p in paths
    ])


def pil_depth(paths, scale):
    return np.stack([
        np.asarray(Image.open(p), np.float32) / scale for p in paths
    ])


def timeit(fn, repeats=5):
    fn()  # warm page cache / lazy init
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=25)
    ap.add_argument("--hw", type=int, nargs=2, default=(384, 512))
    args = ap.parse_args()
    h, w = args.hw

    from unigeo_tpu import native

    if not native.available():
        print("native io NOT available — nothing to bench")
        return

    rng = np.random.default_rng(0)
    # realistic content: smooth gradients + noise (compresses like a photo)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (127 + 80 * np.sin(xx / 37.0) * np.cos(yy / 53.0)).astype(np.float32)
    d = tempfile.mkdtemp()
    clips = {}
    for ext in ("png", "jpg", "webp"):
        paths = []
        for i in range(args.frames):
            img = np.clip(
                base[..., None]
                + rng.normal(0, 12, (h, w, 3)).astype(np.float32)
                + i,
                0, 255,
            ).astype(np.uint8)
            p = osp.join(d, f"f{i:03d}.{ext}")
            Image.fromarray(img).save(p)
            paths.append(p)
        clips[ext] = paths
    dpaths = []
    for i in range(args.frames):
        dep = (2000 + 1500 * np.sin(xx / 29.0 + i) * np.cos(yy / 41.0)).astype(
            np.uint16
        )
        p = osp.join(d, f"d{i:03d}.png")
        Image.fromarray(dep).save(p)
        dpaths.append(p)

    print(f"clip: {args.frames} frames @ {h}x{w}")
    for ext, paths in clips.items():
        t_pil = timeit(lambda: pil_rgb(paths))
        t_nat = timeit(lambda: native.decode_clip_rgb(paths))
        assert np.allclose(pil_rgb(paths), native.decode_clip_rgb(paths), atol=1.0)
        print(
            f"rgb/{ext:4s}: PIL {t_pil * 1e3:7.1f} ms  native {t_nat * 1e3:7.1f} ms"
            f"  ({t_pil / t_nat:4.2f}x)"
        )
    t_pil = timeit(lambda: pil_depth(dpaths, 1000.0))
    t_nat = timeit(lambda: native.decode_clip_depth(dpaths, 1000.0))
    assert np.allclose(
        pil_depth(dpaths, 1000.0), native.decode_clip_depth(dpaths, 1000.0)
    )
    print(
        f"depth16  : PIL {t_pil * 1e3:7.1f} ms  native {t_nat * 1e3:7.1f} ms"
        f"  ({t_pil / t_nat:4.2f}x)"
    )
    for f in os.listdir(d):
        os.unlink(osp.join(d, f))
    os.rmdir(d)


if __name__ == "__main__":
    main()
