"""Geometry utility ops (DUSt3R-lineage parity; reference: metrics/geometry.py).

xy_grid (:15-46), polymorphic SE(3)/homography transform geotrf (:49-115),
depth→3D (:127-232), principal-point offset helpers (:235-258), reciprocal
nearest-neighbor matches (:491-507), weighted Procrustes/Kabsch (:516-555) —
all as jnp-friendly functions with static shapes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from unigeo_tpu.ops.knn import nearest_neighbor


def xy_grid(w: int, h: int, homogeneous: bool = False, dtype=jnp.float32):
    """Pixel-center grid [H, W, 2] (u right, v down); optionally [H, W, 3]."""
    u, v = jnp.meshgrid(
        jnp.arange(w, dtype=dtype), jnp.arange(h, dtype=dtype), indexing="xy"
    )
    if homogeneous:
        return jnp.stack([u, v, jnp.ones_like(u)], axis=-1)
    return jnp.stack([u, v], axis=-1)


def geotrf(T, pts, ncol=None, norm=False):
    """Apply a [..., 4, 4] (or [...,3,3]/[...,3,4]) transform to points
    [..., N, 3] (or pixel coords [..., N, 2] under a homography)."""
    T = jnp.asarray(T)
    pts = jnp.asarray(pts)
    d = pts.shape[-1]
    R = T[..., :d, :d]
    out = jnp.einsum("...ij,...nj->...ni", R, pts)
    if T.shape[-1] > d:
        out = out + T[..., :d, d][..., None, :]
    if norm:  # homogeneous normalization (homography)
        w_ = jnp.einsum("...j,...nj->...n", T[..., -1, :d], pts) + T[..., -1, -1]
        out = out / w_[..., None]
    if ncol is not None:
        out = out[..., :ncol]
    return out


def depthmap_to_pts3d(depth, intrinsics):
    """[..., H, W] depth + [..., 3, 3] K → [..., H, W, 3] camera points."""
    h, w = depth.shape[-2:]
    grid = xy_grid(w, h)
    fx = intrinsics[..., 0, 0][..., None, None]
    fy = intrinsics[..., 1, 1][..., None, None]
    cx = intrinsics[..., 0, 2][..., None, None]
    cy = intrinsics[..., 1, 2][..., None, None]
    x = (grid[..., 0] - cx) * depth / fx
    y = (grid[..., 1] - cy) * depth / fy
    return jnp.stack([x, y, depth], axis=-1)


def colmap_to_opencv_intrinsics(K):
    """COLMAP pixel-corner origin → OpenCV pixel-center origin."""
    K = jnp.asarray(K)
    return K.at[..., :2, 2].add(-0.5)


def opencv_to_colmap_intrinsics(K):
    K = jnp.asarray(K)
    return K.at[..., :2, 2].add(0.5)


def reciprocal_nn_matches(pts_a, pts_b):
    """Indices (ia, ib) of mutually-nearest pairs between two clouds."""
    _, a_to_b = nearest_neighbor(pts_a, pts_b)
    _, b_to_a = nearest_neighbor(pts_b, pts_a)
    back = b_to_a[a_to_b]
    mutual = back == jnp.arange(pts_a.shape[0])
    return mutual, a_to_b


def weighted_procrustes(src, dst, weights=None, with_scale: bool = False):
    """Weighted rigid (or similarity) alignment src→dst via SVD.

    Returns [4,4] transform.  (reference: metrics/geometry.py:516-555)
    """
    src = jnp.asarray(src, jnp.float32)
    dst = jnp.asarray(dst, jnp.float32)
    n = src.shape[0]
    w = jnp.ones((n,)) if weights is None else jnp.asarray(weights, jnp.float32)
    w = w / jnp.maximum(jnp.sum(w), 1e-12)
    mu_s = jnp.sum(src * w[:, None], axis=0)
    mu_d = jnp.sum(dst * w[:, None], axis=0)
    sc = src - mu_s
    dc = dst - mu_d
    cov = (dc * w[:, None]).T @ sc
    U, D, Vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
    S = jnp.diag(jnp.stack([jnp.ones_like(d), jnp.ones_like(d), d]))
    R = U @ S @ Vt
    if with_scale:
        var = jnp.sum(w * jnp.sum(sc * sc, axis=-1))
        c = jnp.trace(jnp.diag(D) @ S) / jnp.maximum(var, 1e-12)
    else:
        c = jnp.float32(1.0)
    t = mu_d - c * (R @ mu_s)
    return jnp.eye(4).at[:3, :3].set(c * R).at[:3, 3].set(t)


def crop_intrinsics(K, crop_xy):
    """Shift the principal point after a crop at (x1, y1)
    (reference: utils/geometry_utils.py:257-290)."""
    K = np.array(K, copy=True)
    K[0, 2] -= crop_xy[0]
    K[1, 2] -= crop_xy[1]
    return K


def pose_distance(reference_pose, measurement_pose):
    """Combined rotation+translation distance between two c2w poses
    (reference: utils/geometry_utils.py:200-216)."""
    rel = np.linalg.inv(np.asarray(reference_pose)) @ np.asarray(measurement_pose)
    R = rel[:3, :3]
    t = rel[:3, 3]
    r_measure = np.sqrt(2 * (1 - min(3.0, np.trace(R)) / 3))
    t_measure = float(np.linalg.norm(t))
    return float(np.sqrt(t_measure**2 + r_measure**2)), float(r_measure), t_measure
