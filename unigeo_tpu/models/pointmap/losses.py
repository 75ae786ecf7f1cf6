"""Training objectives for the pointmap family.

DUSt3R/Spann3R-lineage confidence-weighted 3D regression: both clouds are
normalized by their mean distance-to-origin over valid pixels, the per-pixel
Euclidean error is weighted by the predicted confidence, and a -α·log(conf)
term keeps confidences honest.  (The reference repo only *evaluates* these
models; the criterion family it imports for metrics — pcd_alignment.py — is
the evaluation twin of this training loss.)
"""

from __future__ import annotations

import jax.numpy as jnp

from unigeo_tpu.metrics._masked import masked_mean


def normalize_by_avg_dis(pts, valid, eps: float = 1e-8):
    """Scale cloud(s) by the mean distance to origin over valid pixels.

    pts: [..., H, W, 3]; valid: [..., H, W].
    """
    dis = jnp.linalg.norm(pts, axis=-1)
    factor = masked_mean(dis, valid.astype(pts.dtype))
    return pts / jnp.maximum(factor, eps), factor


def pointmap_regression_loss(
    pred_pts, gt_pts, valid, pred_conf=None, alpha: float = 0.2,
    normalize: bool = True,
):
    """Confidence-weighted regression loss.

    Args:
        pred_pts / gt_pts: [T, H, W, 3] (or batched).
        valid: [T, H, W] bool/float.
        pred_conf: [T, H, W] confidences (>= 1 by construction of
            PointmapHead); None → unweighted.
    Returns: scalar loss.
    """
    v = valid.astype(jnp.float32)
    if normalize:
        pred_n, _ = normalize_by_avg_dis(pred_pts, v)
        gt_n, _ = normalize_by_avg_dis(gt_pts, v)
    else:
        pred_n, gt_n = pred_pts, gt_pts
    err = jnp.linalg.norm(pred_n - gt_n, axis=-1)  # [T,H,W]
    if pred_conf is None:
        return masked_mean(err, v)
    conf = jnp.maximum(pred_conf, 1.0 + 1e-6)
    per_pixel = conf * err - alpha * jnp.log(conf)
    return masked_mean(per_pixel, v)


def pose_loss(pred_enc, gt_c2w, trans_weight: float = 1.0, rot_weight: float = 1.0):
    """L1 on the 7-DoF pose encoding vs ground truth (quaternion sign-aligned)."""
    from unigeo_tpu.models.posecodec import camera_to_pose_encoding

    gt_enc = camera_to_pose_encoding(gt_c2w)
    # quaternions are double covers: align signs before comparing
    sign = jnp.sign(
        jnp.sum(pred_enc[..., 3:] * gt_enc[..., 3:], axis=-1, keepdims=True)
    )
    sign = jnp.where(sign == 0, 1.0, sign)
    t_l1 = jnp.mean(jnp.abs(pred_enc[..., :3] - gt_enc[..., :3]))
    q_l1 = jnp.mean(jnp.abs(pred_enc[..., 3:] - sign * gt_enc[..., 3:]))
    return trans_weight * t_l1 + rot_weight * q_l1
