"""7-Scenes preprocessing: register Kinect depth onto the RGB sensor.

(reference: dataset/sevenScenes/preprocess.py:62-150 — backproject with the
depth-camera intrinsics (f=585), transform by the fixed depth→RGB extrinsic,
z-buffer scatter into the RGB frame, save ``*.depth.proj.png``.)

Vectorized numpy: the scatter uses np.minimum.at as the z-buffer, no per-
pixel python loops.
"""

from __future__ import annotations

import os
import os.path as osp
from glob import glob

import numpy as np

# Kinect depth intrinsics and the fixed depth→RGB rig transform used by the
# standard 7-Scenes calibration.
DEPTH_K = np.array([[585.0, 0, 320.0], [0, 585.0, 240.0], [0, 0, 1]], np.float32)
RGB_K = np.array([[525.0, 0, 320.0], [0, 525.0, 240.0], [0, 0, 1]], np.float32)
DEPTH_TO_RGB = np.array(
    [
        [1.0, 0.0, 0.0, 0.0240],
        [0.0, 1.0, 0.0, -0.0006],
        [0.0, 0.0, 1.0, -0.0010],
        [0.0, 0.0, 0.0, 1.0],
    ],
    np.float32,
)

INVALID_DEPTH = 65535


def register_depth_to_rgb(
    depth_mm: np.ndarray,
    depth_K: np.ndarray = DEPTH_K,
    rgb_K: np.ndarray = RGB_K,
    depth_to_rgb: np.ndarray = DEPTH_TO_RGB,
) -> np.ndarray:
    """[H,W] uint16 depth (mm, 65535=invalid) → registered uint16 depth."""
    h, w = depth_mm.shape
    z = depth_mm.astype(np.float32) / 1000.0
    valid = (depth_mm > 0) & (depth_mm != INVALID_DEPTH)

    u, v = np.meshgrid(np.arange(w), np.arange(h), indexing="xy")
    x = (u - depth_K[0, 2]) * z / depth_K[0, 0]
    y = (v - depth_K[1, 2]) * z / depth_K[1, 1]
    pts = np.stack([x, y, z], axis=-1).reshape(-1, 3)[valid.reshape(-1)]

    pts_rgb = pts @ depth_to_rgb[:3, :3].T + depth_to_rgb[:3, 3]
    z_rgb = pts_rgb[:, 2]
    front = z_rgb > 1e-6
    pts_rgb, z_rgb = pts_rgb[front], z_rgb[front]
    u_rgb = np.round(pts_rgb[:, 0] / z_rgb * rgb_K[0, 0] + rgb_K[0, 2]).astype(np.int64)
    v_rgb = np.round(pts_rgb[:, 1] / z_rgb * rgb_K[1, 1] + rgb_K[1, 2]).astype(np.int64)
    inside = (u_rgb >= 0) & (u_rgb < w) & (v_rgb >= 0) & (v_rgb < h)

    zbuf = np.full(h * w, np.inf, np.float32)
    flat = v_rgb[inside] * w + u_rgb[inside]
    np.minimum.at(zbuf, flat, z_rgb[inside])

    out = np.where(np.isfinite(zbuf), np.round(zbuf * 1000.0), 0.0)
    return out.reshape(h, w).astype(np.uint16)


def process_scene(scene_dir: str, verbose: bool = True) -> int:
    """Register every ``*.depth.png`` in a sequence directory."""
    from PIL import Image

    count = 0
    for depth_path in sorted(glob(osp.join(scene_dir, "*.depth.png"))):
        out_path = depth_path.replace(".depth.png", ".depth.proj.png")
        if osp.exists(out_path):
            continue
        depth = np.asarray(Image.open(depth_path), np.uint16)
        registered = register_depth_to_rgb(depth)
        Image.fromarray(registered).save(out_path)
        count += 1
        if verbose and count % 100 == 0:
            print(f"  {count} frames registered")
    return count
