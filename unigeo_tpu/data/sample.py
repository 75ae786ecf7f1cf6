"""The unified clip-sample contract and GT-label preparation.

The reference's unified sample is a dict of *lists* of per-frame arrays
(reference: dataset/Readme.md:22-33).  TPU-first, the loader boundary stacks
everything into dense [Nf, ...] arrays so a whole clip is one batched tensor
ready for device transfer; the dict keys and semantics are otherwise
identical:

  scene_name    str
  images        [Nf, 3, H, W] float32, 0..255
  image_names   list[str]
  intrinsics    [Nf, 3, 3] float32
  extrinsics    [Nf, 4, 4] float32 world-to-camera, OpenGL, rebased so the
                keyview (frame 0) is the world origin
  cam_coord     [Nf, 3, H, W] camera-space points (OpenGL)
  cam_normal    [Nf, 3, H, W] camera-space normals (OpenGL)
  world_coord   [Nf, 3, H, W] keyview-space points
  world_normal  [Nf, 3, H, W] keyview-space normals
  mask          [Nf, H, W] float32 validity
  keyview_idx   int (always 0, reference: scannetpp.py:241)

``prepare_gt_label`` mirrors utils/io_utils.py:4-46: converts the OpenGL clip
sample into OpenCV ground-truth tensors for the metrics suite.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from unigeo_tpu import coords

SAMPLE_KEYS = (
    "scene_name",
    "images",
    "intrinsics",
    "extrinsics",
    "cam_coord",
    "cam_normal",
    "world_coord",
    "world_normal",
    "mask",
    "keyview_idx",
)


def validate_sample(data: Dict[str, Any]) -> None:
    """Shape/dtype contract check on the executor boundary (SURVEY.md §5)."""
    missing = [k for k in SAMPLE_KEYS if k not in data]
    if missing:
        raise KeyError(f"clip sample missing keys: {missing}")
    nf = data["images"].shape[0]
    h, w = data["images"].shape[-2:]
    expect = {
        "images": (nf, 3, h, w),
        "intrinsics": (nf, 3, 3),
        "extrinsics": (nf, 4, 4),
        "cam_coord": (nf, 3, h, w),
        "cam_normal": (nf, 3, h, w),
        "world_coord": (nf, 3, h, w),
        "world_normal": (nf, 3, h, w),
        "mask": (nf, h, w),
    }
    for key, shape in expect.items():
        got = tuple(data[key].shape)
        if got != shape:
            raise ValueError(f"{key}: expected shape {shape}, got {got}")


def prepare_gt_label(data: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """OpenGL clip sample → ground-truth tensors for the metrics suite.

    Points/poses/depths convert to OpenCV; gt_normals stay OpenGL (see the
    in-body comment).  (reference: utils/io_utils.py:4-46; pose conjugation
    at :20, point sign flips at :23/:26, gt depth = camera-z at :32)
    Returns channels-last arrays:
      gt_world_pts [Nf,H,W,3], gt_masks [Nf,H,W] bool, gt_poses [Nf,4,4] c2w,
      gt_depths [Nf,H,W], gt_rgbs [Nf,H,W,3] in 0..1, gt_normals [Nf,H,W,3].
    """
    extr = np.asarray(data["extrinsics"], np.float32)  # [Nf,4,4] w2c GL
    c2w = coords.se3_inverse(extr)
    c2w_cv = coords.convert_pose_gl_cv(c2w)

    world_pts = np.asarray(data["world_coord"], np.float32)  # [Nf,3,H,W] GL
    world_pts = coords.flip_yz_channels_first(world_pts)
    cam_pts = np.asarray(data["cam_coord"], np.float32)
    cam_pts = coords.flip_yz_channels_first(cam_pts)

    gt_world_pts = np.moveaxis(world_pts, 1, -1)  # [Nf,H,W,3] CV
    gt_depths = np.moveaxis(cam_pts, 1, -1)[..., 2]  # camera z in CV = depth
    gt_rgbs = np.moveaxis(np.asarray(data["images"], np.float32), 1, -1) / 255.0
    # normals stay in the OpenGL camera frame on BOTH sides: the reference
    # does not flip them in prepare_gt_label (io_utils.py:40) and its model
    # adapters flip predicted normals TO OpenGL (depthcrafter.py:48-68), so
    # normal_evaluation compares OpenGL vs OpenGL
    gt_normals = np.moveaxis(np.asarray(data["cam_normal"], np.float32), 1, -1)
    gt_masks = np.asarray(data["mask"]) > 0

    return {
        "gt_world_pts": gt_world_pts,
        "gt_masks": gt_masks,
        "gt_poses": c2w_cv,
        "gt_depths": gt_depths,
        "gt_rgbs": gt_rgbs,
        "gt_normals": gt_normals,
    }
