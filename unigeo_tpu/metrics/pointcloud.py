"""Point-cloud evaluation: scale/shift-invariant alignment, ICP,
accuracy/completion/normal-consistency — all native (no open3d/scipy).

Mirrors the reference chain (metrics/eval_pcd.py:10-168 with the
Regr3D_t_ScaleShiftInv criterion from metrics/pcd_alignment.py, configured
``norm_mode=False, gt_scale=True``):

  1. shift:  per-cloud median z over valid pixels (torch.nanmedian
     semantics), subtracted from pred and gt (pcd_alignment.py:166-198);
  2. scale:  median distance to the per-coordinate median center
     (pcd_alignment.py:108-128, 201-245); pred is rescaled by
     gt_scale/pred_scale with pred_scale clipped to [1e-3, 1e3];
  3. the gt z-shift is added back to both clouds (eval_pcd.py:67-69), which
     restores gt exactly and leaves
     pred' = (gt_scale/pred_scale) * (pred - [0,0,pred_shift_z]) + [0,0,gt_shift_z];
  4. masked pixels are gathered, optionally randomly downsampled to
     ``downsample_num`` points (eval_pcd.py:95-100);
  5. point-to-point ICP pred→gt with threshold 0.1 (open3d semantics:
     identity init, max 30 iterations, correspondences gated by the
     threshold, SVD/Kabsch update, rel fitness/rmse 1e-6 early stop —
     replicated as a fixed-iteration masked-Procrustes loop);
  6. normals for both clouds by 30-NN PCA (open3d estimate_normals default);
  7. accuracy = mean/median NN distance pred→gt (+|normal dot|), completion
     = gt→pred (metrics/utils.py:14-42; numpy median semantics).

Steps 1-3 and 5-7 are jitted JAX; step 4 (masked gather + random subsample)
runs on host because the output size is data-dependent.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from unigeo_tpu.ops.knn import knn, nearest_neighbor
from ._masked import masked_median

PCD_METRIC_KEYS = (
    "acc", "comp", "nc1", "nc2", "acc_med", "comp_med", "nc1_med", "nc2_med",
)


# ---------------------------------------------------------------------------
# Scale/shift-invariant normalization (Regr3D_t_ScaleShiftInv)
# ---------------------------------------------------------------------------

@jax.jit
def scale_shift_align(pred_pts, gt_pts, masks):
    """Compute the aligned prediction cloud and alignment monitoring values.

    Args:
        pred_pts, gt_pts: [Nf, H, W, 3] world-space pointmaps.
        masks: [Nf, H, W] validity.
    Returns:
        (pred_aligned [Nf,H,W,3], gt [Nf,H,W,3],
         dict(gt_shift_z, pred_shift_z, gt_scale, pred_scale))
    """
    pred_pts = pred_pts.astype(jnp.float32)
    gt_pts = gt_pts.astype(jnp.float32)
    valid = masks > 0

    gt_shift_z = masked_median(gt_pts[..., 2], valid, semantics="torch")
    pred_shift_z = masked_median(pred_pts[..., 2], valid, semantics="torch")

    shift_gt = jnp.stack([jnp.zeros_like(gt_shift_z)] * 2 + [gt_shift_z])
    shift_pred = jnp.stack([jnp.zeros_like(pred_shift_z)] * 2 + [pred_shift_z])
    gt_shifted = gt_pts - shift_gt
    pred_shifted = pred_pts - shift_pred

    def median_center_scale(pts):
        # per-coordinate median center over valid pixels, then median norm
        # (pcd_alignment.py:108-128)
        center = jnp.stack(
            [masked_median(pts[..., i], valid, semantics="torch") for i in range(3)]
        )
        norms = jnp.linalg.norm(pts - center, axis=-1)
        return masked_median(norms, valid, semantics="torch")

    gt_scale = median_center_scale(gt_shifted)
    pred_scale = jnp.clip(median_center_scale(pred_shifted), 1e-3, 1e3)

    # gt_scale=True branch: pred takes gt's scale (pcd_alignment.py:229-231),
    # then both get the gt z-shift back (eval_pcd.py:67-69).
    pred_aligned = pred_shifted * (gt_scale / pred_scale) + shift_gt
    monitoring = {
        "gt_shift_z": gt_shift_z,
        "pred_shift_z": pred_shift_z,
        "gt_scale": gt_scale,
        "pred_scale": pred_scale,
    }
    return pred_aligned, gt_pts, monitoring


# ---------------------------------------------------------------------------
# ICP (open3d registration_icp point-to-point semantics)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("max_iterations",))
def icp_point_to_point(src, dst, threshold: float = 0.1, max_iterations: int = 30):
    """Rigid ICP aligning src onto dst.

    Correspondences = nearest dst point per src point, kept when closer than
    ``threshold``; update = rigid Kabsch on the inlier set; identity init;
    fixed ``max_iterations`` sweeps (open3d's default cap; its 1e-6 relative
    early-stop is dropped — extra sweeps are idempotent at convergence).

    Measured behavioral bounds (tests/test_icp_evo_properties.py, the
    open3d-absent substitute for an executable oracle): known SE(3)
    perturbations up to ~6 deg / 0.05 units are recovered to point-rmse
    < 1e-3 (measured ~2e-6) under full overlap, ~65% partial overlap, and
    10-30% gross-outlier injection; the dropped early-stop is free — 31-
    and 60-sweep runs differ from 30 sweeps by < 1e-5 in the transform
    entries and < 1e-4 in the moved cloud; zero inliers freezes the
    transform at identity (no NaNs).

    Returns:
        (T [4,4] rigid transform, src_transformed [N,3])
    """
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)

    def step(carry, _):
        R, t = carry
        cur = src @ R.T + t
        dist, idx = nearest_neighbor(cur, dst)
        corr = dst[idx]  # [N, 3]
        w = (dist < threshold).astype(jnp.float32)
        wsum = jnp.maximum(jnp.sum(w), 1.0)
        mu_s = jnp.sum(cur * w[:, None], axis=0) / wsum
        mu_d = jnp.sum(corr * w[:, None], axis=0) / wsum
        sc = (cur - mu_s) * w[:, None]
        dc = corr - mu_d
        H = sc.T @ dc  # [3,3]
        U, _, Vt = jnp.linalg.svd(H)
        d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
        S = jnp.diag(jnp.stack([jnp.ones_like(d), jnp.ones_like(d), d]))
        R_step = Vt.T @ S @ U.T
        t_step = mu_d - R_step @ mu_s
        # compose: x -> R_step (R x + t) + t_step
        R_new = R_step @ R
        t_new = R_step @ t + t_step
        # freeze when no inliers at all
        has = jnp.sum(w) > 0
        R_new = jnp.where(has, R_new, R)
        t_new = jnp.where(has, t_new, t)
        return (R_new, t_new), None

    (R, t), _ = jax.lax.scan(
        step, (jnp.eye(3), jnp.zeros(3)), None, length=max_iterations
    )
    T = jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(t)
    return T, src @ R.T + t


# ---------------------------------------------------------------------------
# Normal estimation (open3d estimate_normals default: 30-NN PCA)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("k",))
def estimate_normals(points, k: int = 30):
    """Per-point normals from the smallest principal axis of the k-NN patch.

    Orientation is arbitrary (as in open3d without orient_*), which is fine:
    downstream normal-consistency takes |dot| (metrics/utils.py:22-24).
    """
    pts = points.astype(jnp.float32)
    _, idx = knn(pts, pts, k=k)
    nbrs = pts[idx]  # [N, k, 3]
    mu = jnp.mean(nbrs, axis=1, keepdims=True)
    centered = nbrs - mu
    cov = jnp.einsum("nki,nkj->nij", centered, centered) / k
    # eigh returns ascending eigenvalues: smallest eigenvector = normal
    _, vecs = jnp.linalg.eigh(cov)
    return vecs[..., 0]


# ---------------------------------------------------------------------------
# Accuracy / completion (metrics/utils.py:14-42)
# ---------------------------------------------------------------------------

@jax.jit
def accuracy_completion(pred_pts, gt_pts, pred_normals, gt_normals):
    """NN-distance and normal-consistency stats in both directions.

    accuracy: pred→gt; completion: gt→pred.  Medians use numpy (averaging)
    semantics like the reference's np.median.
    """
    ones_p = jnp.ones(pred_pts.shape[0], dtype=bool)
    ones_g = jnp.ones(gt_pts.shape[0], dtype=bool)

    dist_a, idx_a = nearest_neighbor(pred_pts, gt_pts)
    acc = jnp.mean(dist_a)
    acc_med = masked_median(dist_a, ones_p, semantics="numpy")
    nc1_vals = jnp.abs(jnp.sum(gt_normals[idx_a] * pred_normals, axis=-1))
    nc1 = jnp.mean(nc1_vals)
    nc1_med = masked_median(nc1_vals, ones_p, semantics="numpy")

    dist_c, idx_c = nearest_neighbor(gt_pts, pred_pts)
    comp = jnp.mean(dist_c)
    comp_med = masked_median(dist_c, ones_g, semantics="numpy")
    nc2_vals = jnp.abs(jnp.sum(gt_normals * pred_normals[idx_c], axis=-1))
    nc2 = jnp.mean(nc2_vals)
    nc2_med = masked_median(nc2_vals, ones_g, semantics="numpy")

    return {
        "acc": acc, "acc_med": acc_med, "nc1": nc1, "nc1_med": nc1_med,
        "comp": comp, "comp_med": comp_med, "nc2": nc2, "nc2_med": nc2_med,
    }


# ---------------------------------------------------------------------------
# Full pipeline
# ---------------------------------------------------------------------------

def pcd_evaluation(
    predicted_pcd,
    ground_truth_pcd,
    masks,
    rgbs=None,
    threshold: float = 0.1,
    downsample_num: int = -1,
    seed: int = 0,
    icp_iterations: int = 30,
):
    """Evaluate predicted world-space pointmaps against GT.

    Args:
        predicted_pcd / ground_truth_pcd: [Nf, H, W, 3].
        masks: [Nf, H, W] validity.
        rgbs: optional [Nf, H, W, 3] colors carried through for visualization.
        downsample_num: if > 0, random subsample (without replacement) of the
            masked points — same indices for pred and gt (eval_pcd.py:95-100).
    Returns:
        dict with acc/comp/nc1/nc2 (+ _med variants) floats and
        pred_pcd/gt_pcd point+color arrays for visualization.
    """
    pred = jnp.asarray(np.asarray(predicted_pcd))
    gt = jnp.asarray(np.asarray(ground_truth_pcd))
    m = jnp.asarray(np.asarray(masks))

    pred_aligned, gt_out, monitoring = scale_shift_align(pred, gt, m)

    # host-side masked gather + downsample (data-dependent size)
    mask_np = np.asarray(m) > 0
    pred_np = np.asarray(pred_aligned)[mask_np]
    gt_np = np.asarray(gt_out)[mask_np]
    if rgbs is not None:
        colors_np = np.asarray(rgbs)[mask_np]
    else:
        colors_np = np.zeros_like(pred_np)

    if downsample_num > 0 and pred_np.shape[0] > downsample_num:
        rng = np.random.default_rng(seed)
        sel = rng.choice(pred_np.shape[0], downsample_num, replace=False)
        pred_np = pred_np[sel]
        gt_np = gt_np[sel]
        colors_np = colors_np[sel]

    if pred_np.shape[0] == 0:
        zeros = {k: 0.0 for k in PCD_METRIC_KEYS}
        zeros.update({"pred_pcd": (pred_np, colors_np), "gt_pcd": (gt_np, colors_np)})
        return zeros

    result = {
        "pred_pcd": (pred_np.copy(), colors_np.copy()),
        "gt_pcd": (gt_np.copy(), colors_np.copy()),
    }

    pred_j = jnp.asarray(pred_np)
    gt_j = jnp.asarray(gt_np)
    _, pred_icp = icp_point_to_point(
        pred_j, gt_j, threshold=threshold, max_iterations=icp_iterations
    )
    pred_normals = estimate_normals(pred_icp)
    gt_normals = estimate_normals(gt_j)
    stats = accuracy_completion(pred_icp, gt_j, pred_normals, gt_normals)
    result.update({k: float(v) for k, v in stats.items()})
    result["alignment"] = {k: float(v) for k, v in monitoring.items()}
    return result
