"""Coordinate conventions and SE(3) helpers — the single source of truth.

The reference scatters OpenGL↔OpenCV flips across ≥10 call sites
(reference: utils/io_utils.py:6-26, model/utils.py:19-29,
dataset/scannetpp/scannetpp.py:54-59, model/depthcrafter.py:57-59, ...).
Here every convention lives in one module.

Conventions used throughout this framework (same as the reference):

  * OpenCV camera frame: +x right, +y down, +z forward (into the scene).
    Depth is +z.
  * OpenGL camera frame: +x right, +y up, -z forward. Depth is -z.
  * The unified clip sample stores geometry in **OpenGL** convention with
    extrinsics rebased so frame 0 (the keyview) is the world origin
    (reference: dataset/Readme.md:22-33, scannetpp.py:137-187).
  * Model predictions and ground-truth labels handed to the metrics suite are
    in **OpenCV** convention — EXCEPT normals, which stay in the OpenGL
    camera frame on both pred and GT sides (the reference leaves cam_normal
    unflipped in prepare_gt_label and its adapters flip predictions TO
    OpenGL; reference: model/Readme.md:16-20, utils/io_utils.py:4-46,
    model/depthcrafter.py:48-68).

All functions are pure and work on numpy or jax.numpy arrays (they only use
operations both support); batched inputs use leading dimensions.
"""

from __future__ import annotations

import numpy as np

# Conjugation matrix: flips y and z. Its own inverse.
# (reference: utils/io_utils.py:7-10)
OPENGL_TO_OPENCV = np.array(
    [[1.0, 0.0, 0.0, 0.0],
     [0.0, -1.0, 0.0, 0.0],
     [0.0, 0.0, -1.0, 0.0],
     [0.0, 0.0, 0.0, 1.0]],
    dtype=np.float32,
)

GL_CV_DIAG3 = np.array([1.0, -1.0, -1.0], dtype=np.float32)


def flip_yz_channels_first(pts):
    """Flip y,z of points stored channels-first [..., 3, H, W].

    Equivalent to the reference's in-place ``pts3d[1:] *= -1``
    (utils/io_utils.py:23,26) but functional.
    """
    shape = [1] * pts.ndim
    shape[-3] = 3
    sign = np.reshape(np.asarray([1.0, -1.0, -1.0], dtype=np.float32), shape)
    return pts * sign


def flip_yz_channels_last(pts):
    """Flip y,z of points stored channels-last [..., 3]."""
    shape = [1] * pts.ndim
    shape[-1] = 3
    sign = np.reshape(np.asarray([1.0, -1.0, -1.0], dtype=np.float32), shape)
    return pts * sign


def convert_pose_gl_cv(pose):
    """Conjugate a 4x4 (or [N,4,4]) pose by the GL↔CV flip: F @ P @ F.

    Works in both directions (the flip is involutive).
    (reference: utils/io_utils.py:20, scannetpp.py:59)
    """
    F = OPENGL_TO_OPENCV.astype(pose.dtype) if hasattr(pose, "dtype") else OPENGL_TO_OPENCV
    return F @ pose @ F


def se3_inverse(pose):
    """Inverse of a rigid 4x4 transform (or batch [..., 4, 4]).

    Uses the closed form [R t; 0 1]^-1 = [R^T -R^T t; 0 1] rather than a
    general matrix inverse — cheaper and exactly rigid.
    """
    if isinstance(pose, np.ndarray):
        xp = np
    else:
        import jax.numpy as xp
    R = pose[..., :3, :3]
    t = pose[..., :3, 3:]
    Rt = xp.swapaxes(R, -1, -2)
    new_t = -Rt @ t
    top = xp.concatenate([Rt, new_t], axis=-1)
    bottom = xp.broadcast_to(
        xp.asarray([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), pose.shape[:-2] + (1, 4)
    )
    return xp.concatenate([top, bottom], axis=-2)


def rebase_to_keyview(extrinsics, keyview_idx=0):
    """Re-express world-to-camera extrinsics relative to the keyview.

    After rebasing, ``extrinsics[keyview_idx]`` is the identity: the keyview
    camera *is* the world frame.  (reference: scannetpp.py:186:
    ``x @ inv(ref_pose)``)

    Args:
        extrinsics: [N, 4, 4] world-to-camera transforms.
    Returns:
        [N, 4, 4] rebased extrinsics.
    """
    ref_inv = se3_inverse(extrinsics[keyview_idx])
    return extrinsics @ ref_inv


def relative_transform(ref_w2c, src_w2c):
    """Transform taking src-camera coordinates to ref-camera coordinates.

    (reference: scannetpp.py:147: ``trans_mat = ref_pose @ inv(src_pose)``)
    """
    return ref_w2c @ se3_inverse(src_w2c)


def apply_se3_points(T, pts):
    """Apply a 4x4 transform to channels-last points [..., 3].

    T: [4,4] or batched [B,4,4] against pts [B, ..., 3].
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    # pts [..., 3] -> rotate then translate; add broadcast dims to R/t
    extra = pts.ndim - T.ndim + 1  # number of spatial dims in pts beyond batch
    for _ in range(max(extra, 0)):
        R = R[..., None, :, :]
        t = t[..., None, :]
    return (pts[..., None, :] * R).sum(-1) + t


def apply_rotation_points(T, pts):
    """Apply only the rotation part of a 4x4 transform to points [..., 3]."""
    R = T[..., :3, :3]
    extra = pts.ndim - T.ndim + 1
    for _ in range(max(extra, 0)):
        R = R[..., None, :, :]
    return (pts[..., None, :] * R).sum(-1)


def intrinsics_resize_scale(orig_hw, new_hw, dtype=np.float32):
    """Elementwise scale matrix applied to K when resizing an image.

    (reference: dataset_core/transforms.py:69-75)
    """
    oh, ow = orig_hw
    nh, nw = new_hw
    return np.array(
        [[nw / ow] * 3, [nh / oh] * 3, [1.0] * 3], dtype=dtype
    )
