"""Camera-trajectory evaluation: ATE + RPE without the evo dependency.

Re-implements exactly the variant the reference invokes
(metrics/evo_utils.py:163-249 via metrics/eval_camera.py:9-26):

  * ATE: Sim(3) Umeyama alignment of est → ref positions (align=True,
    correct_scale=True), then RMSE of translation errors
    (APE with PoseRelation.translation_part).
  * RPE translation & rotation at delta = 1 frame, all_pairs=True, i.e. all
    consecutive pairs, RMSE stats.  A global Sim(3) alignment changes
    relative translations only by the scale factor and relative rotations
    not at all, so RPE uses the ATE scale directly (the algebra is spelled
    out in the docstrings below).

Quaternion/TUM conversion utilities are provided for API parity with
metrics/utils.py:169-192 (c2w_to_tumpose / get_tum_poses), though the core
evaluation works directly on [N,4,4] pose matrices.

Measured behavioral bounds (tests/test_icp_evo_properties.py, the
evo-absent substitute for an executable oracle): a Sim(3) applied to the
estimate yields ATE/RPE-trans < 1e-9 and RPE-rot < 1e-5 deg; all three
numbers are invariant (rtol 1e-6) under Sim(3) of the estimate and under a
common rigid transform of both trajectories; iid position noise sigma gives
ATE = sigma*sqrt(3) within 10% at N=500; an exact per-step rotation offset
theta gives RPE-rot = theta to 1e-6 deg; a per-step translation offset d
gives RPE-trans = d within 2%; cumulative scale DRIFT (not a Sim(3))
produces a strictly positive, monotonically growing ATE.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def umeyama_alignment(src, dst, with_scale: bool = True):
    """Least-squares similarity transform mapping src points onto dst.

    Finds (c, R, t) minimizing sum ||dst_i - (c R src_i + t)||^2
    (Umeyama 1991, the same algorithm evo uses for align + correct_scale).

    Args:
        src, dst: [N, 3] point sets.
    Returns:
        (R [3,3], t [3], c scalar)
    """
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)
    n = src.shape[0]
    mu_s = jnp.mean(src, axis=0)
    mu_d = jnp.mean(dst, axis=0)
    sc = src - mu_s
    dc = dst - mu_d
    cov = dc.T @ sc / n  # [3,3]
    var_s = jnp.mean(jnp.sum(sc * sc, axis=-1))

    U, D, Vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
    S = jnp.diag(jnp.stack([jnp.ones_like(d), jnp.ones_like(d), d]))
    R = U @ S @ Vt
    if with_scale:
        c = jnp.trace(jnp.diag(D) @ S) / jnp.maximum(var_s, 1e-12)
    else:
        c = jnp.float32(1.0)
    t = mu_d - c * (R @ mu_s)
    return R, t, c


def rotation_angle_deg(R):
    """Angle of a rotation matrix (or batch [..., 3, 3]) in degrees.

    (evo PoseRelation.rotation_angle_deg semantics.)
    """
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    cos = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    return jnp.arccos(cos) * (180.0 / np.pi)


def _umeyama_np(src, dst):
    """float64 Umeyama on host — evo computes trajectory alignment in double
    precision, and at ≤25 poses the solve is far below kernel-launch cost."""
    n = src.shape[0]
    mu_s, mu_d = src.mean(0), dst.mean(0)
    sc, dc = src - mu_s, dst - mu_d
    cov = dc.T @ sc / n
    var_s = np.mean(np.sum(sc * sc, axis=-1))
    U, D, Vt = np.linalg.svd(cov)
    d = np.sign(np.linalg.det(U) * np.linalg.det(Vt))
    S = np.diag([1.0, 1.0, d])
    R = U @ S @ Vt
    c = np.trace(np.diag(D) @ S) / max(var_s, 1e-18)
    t = mu_d - c * (R @ mu_s)
    return R, t, c


def camera_pose_evaluation(pred_pose, gt_pose):
    """Score a predicted camera trajectory against ground truth.

    Args:
        pred_pose, gt_pose: [N, 4, 4] camera-to-world matrices
        (reference: metrics/eval_camera.py:9-26).
    Returns:
        (ate, rpe_trans, rpe_rot) python floats.
    """
    pred = np.asarray(pred_pose, dtype=np.float64)
    gt = np.asarray(gt_pose, dtype=np.float64)
    t_est, t_ref = pred[:, :3, 3], gt[:, :3, 3]
    R_est, R_ref = pred[:, :3, :3], gt[:, :3, :3]

    R, t, c = _umeyama_np(t_est, t_ref)
    t_aligned = c * t_est @ R.T + t
    err = np.linalg.norm(t_ref - t_aligned, axis=-1)
    ate = float(np.sqrt(np.mean(err * err)))

    # RPE over consecutive pairs (delta=1, all_pairs).  Aligned est pose has
    # rotation R@R_est_i and translation c*R@t_est_i + t, so the relative
    # pose i→i+1 of the aligned est is:
    #   rot   = R_est_i^T R_est_{i+1}                      (alignment cancels)
    #   trans = c * R_est_i^T (t_est_{i+1} - t_est_i)      (scaled only)
    # and for the error pose E = rel_ref^{-1} rel_est the leading rel_R_ref^T
    # drops out of ||trans(E)|| (rotation-invariant norm) — hence only the
    # ATE scale c appears below.
    RtT_est = np.swapaxes(R_est[:-1], -1, -2)
    RtT_ref = np.swapaxes(R_ref[:-1], -1, -2)
    rel_R_est = RtT_est @ R_est[1:]
    rel_R_ref = RtT_ref @ R_ref[1:]
    rel_t_est = np.einsum("nij,nj->ni", RtT_est, t_est[1:] - t_est[:-1])
    rel_t_ref = np.einsum("nij,nj->ni", RtT_ref, t_ref[1:] - t_ref[:-1])

    trans_err = np.linalg.norm(c * rel_t_est - rel_t_ref, axis=-1)
    rpe_trans = float(np.sqrt(np.mean(trans_err * trans_err)))

    E = np.swapaxes(rel_R_ref, -1, -2) @ rel_R_est
    tr = np.trace(E, axis1=-2, axis2=-1)
    rot_err = np.degrees(np.arccos(np.clip((tr - 1.0) / 2.0, -1.0, 1.0)))
    rpe_rot = float(np.sqrt(np.mean(rot_err * rot_err)))
    return ate, rpe_trans, rpe_rot


# ---------------------------------------------------------------------------
# TUM-format helpers (API parity with metrics/utils.py:169-192)
# ---------------------------------------------------------------------------

def matrix_to_quaternion(R):
    """Rotation matrix [..., 3, 3] → quaternion [..., 4] (w, x, y, z).

    Branch-free Shepperd-style construction, safe for all traces.
    """
    R = jnp.asarray(R)
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    qw = jnp.sqrt(jnp.maximum(0.0, 1.0 + m00 + m11 + m22)) / 2.0
    qx = jnp.sqrt(jnp.maximum(0.0, 1.0 + m00 - m11 - m22)) / 2.0
    qy = jnp.sqrt(jnp.maximum(0.0, 1.0 - m00 + m11 - m22)) / 2.0
    qz = jnp.sqrt(jnp.maximum(0.0, 1.0 - m00 - m11 + m22)) / 2.0
    qx = jnp.copysign(qx, m21 - m12)
    qy = jnp.copysign(qy, m02 - m20)
    qz = jnp.copysign(qz, m10 - m01)
    q = jnp.stack([qw, qx, qy, qz], axis=-1)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quaternion_to_matrix(q):
    """Quaternion [..., 4] (w, x, y, z) → rotation matrix [..., 3, 3]."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1)
    row1 = jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1)
    row2 = jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def c2w_to_tumpose(c2w):
    """4x4 camera-to-world → (x y z qw qx qy qz) array.

    (reference: metrics/utils.py:169-182)
    """
    c2w = np.asarray(c2w)
    xyz = c2w[:3, 3]
    q = np.asarray(matrix_to_quaternion(jnp.asarray(c2w[:3, :3])))
    return np.concatenate([xyz, q])


def get_tum_poses(poses):
    """[N,4,4] (or list) c2w → ([N,7] tum poses, [N] frame-index timestamps).

    (reference: metrics/utils.py:185-192)
    """
    poses = np.asarray(poses)
    tt = np.arange(len(poses)).astype(float)
    tum = np.stack([c2w_to_tumpose(p) for p in poses], 0)
    return [tum, tt]
