"""Secondary metrics (reference parity beyond the four headline families).

  * depth_evaluation_in_global_coord — radial-distance scoring in the world
    frame (reference: metrics/eval_depth.py:250-441, including its broken
    local import fixed here).
  * completion_ratio — fraction of GT points within a distance threshold
    (reference: metrics/utils.py:7-11).
  * voxel_iou — occupancy IoU on a voxel grid (reference: metrics/utils.py:
    45-60, open3d voxel grids → a pure-array voxel hash here).
  * align_pcd — standalone ICP alignment helper (reference: metrics/icp.py).
  * plot_trajectory — top-down trajectory comparison plot
    (reference: metrics/evo_utils.py:334-362).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from unigeo_tpu.metrics.alignment import lstsq_scale_shift
from unigeo_tpu.metrics.depth import depth_evaluation
from unigeo_tpu.metrics.pointcloud import icp_point_to_point
from unigeo_tpu.ops.backproject import backproject_batch_cv
from unigeo_tpu.ops.knn import nearest_neighbor


def depth_evaluation_in_global_coord(
    predicted_depth,
    ground_truth_depth,
    ground_truth_radius,
    cam2world,
    intrinsics,
    max_depth: float = 80.0,
    custom_mask=None,
):
    """Score radial distances in the world frame.

    Pipeline (reference: eval_depth.py:334-375): lstsq-align pred depth to
    gt depth over the validity mask → backproject with K → transform to
    world with c2w → radial norm → second lstsq against the GT radius →
    standard depth metrics on the aligned radii.
    """
    pred = jnp.asarray(predicted_depth, jnp.float32)
    gt = jnp.asarray(ground_truth_depth, jnp.float32)
    radius_gt = jnp.asarray(ground_truth_radius, jnp.float32)
    c2w = jnp.asarray(cam2world, jnp.float32)
    K = jnp.asarray(intrinsics, jnp.float32)

    mask = (gt > 0) & (gt < max_depth)
    s, t = lstsq_scale_shift(pred, gt, mask)
    pred_aligned = s * pred + t

    cam_pts = backproject_batch_cv(pred_aligned, K)  # [Nf,H,W,3]
    world_pts = jnp.einsum("nij,nhwj->nhwi", c2w[:, :3, :3], cam_pts) + c2w[
        :, None, None, :3, 3
    ]
    radius_pred = jnp.linalg.norm(world_pts, axis=-1)

    # the reference masks by the DEPTH validity mask, not radius positivity:
    # zeroing the gt radius outside it reproduces that behavior exactly
    results, _, aligned, _ = depth_evaluation(
        radius_pred,
        jnp.where(mask, radius_gt, 0.0),
        max_depth=None,
        custom_mask=custom_mask,
        alignment="lstsq",
    )
    return results, np.asarray(aligned)


def completion_ratio(gt_points, rec_points, dist_th: float = 0.05) -> float:
    dist, _ = nearest_neighbor(jnp.asarray(gt_points), jnp.asarray(rec_points))
    return float(jnp.mean((dist < dist_th).astype(jnp.float32)))


def voxel_iou(pred_points, gt_points, voxel_size: float = 0.1) -> float:
    """Occupancy IoU between the voxelizations of two clouds."""
    def voxels(pts):
        idx = np.floor(np.asarray(pts) / voxel_size).astype(np.int64)
        return set(map(tuple, idx))

    vp = voxels(pred_points)
    vg = voxels(gt_points)
    if not vp and not vg:
        return 1.0
    return len(vp & vg) / max(len(vp | vg), 1)


def align_pcd(source_points, target_points, threshold: float = 0.1):
    """Standalone point-to-point ICP (reference: metrics/icp.py:5-27).

    Returns (T [4,4], transformed source points).
    """
    T, moved = icp_point_to_point(
        jnp.asarray(source_points, jnp.float32),
        jnp.asarray(target_points, jnp.float32),
        threshold=threshold,
    )
    return np.asarray(T), np.asarray(moved)


def plot_trajectory(
    pred_poses, gt_poses=None, title: str = "", filename: Optional[str] = None
):
    """Top-down (x, z) trajectory plot (reference: evo_utils.py:334-362)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 6))
    pred = np.asarray(pred_poses)
    ax.plot(pred[:, 0, 3], pred[:, 2, 3], "b-", label="estimate")
    if gt_poses is not None:
        gt = np.asarray(gt_poses)
        ax.plot(gt[:, 0, 3], gt[:, 2, 3], "k--", label="ground truth")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.set_title(title)
    ax.legend()
    ax.set_aspect("equal")
    if filename:
        fig.savefig(filename, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return filename
    return fig


# ---------------------------------------------------------------------------
# evo results-txt scraping + directory averaging
# (reference: metrics/evo_utils.py:376-428)
# ---------------------------------------------------------------------------

def extract_metrics(file_path: str):
    """Scrape ATE / RPE-trans / RPE-rot rmse values from an evo-style
    results txt (reference: evo_utils.py:376-397; missing metrics → 0.0)."""
    import re

    with open(file_path, "r") as f:
        content = f.read()

    def rmse_after(header: str) -> float:
        m = re.search(re.escape(header) + r".*?rmse\s+([0-9.]+)", content, re.DOTALL)
        return float(m.group(1)) if m else 0.0

    return (
        rmse_after("APE w.r.t. translation part (m)"),
        rmse_after("RPE w.r.t. translation part (m)"),
        rmse_after("RPE w.r.t. rotation angle in degrees (deg)"),
    )


def process_directory(directory: str):
    """Collect (seq_name, ate, rpe_trans, rpe_rot) from every *_metric.txt
    under ``directory`` (reference: evo_utils.py:400-412)."""
    import os

    results = []
    for root, _, files in os.walk(directory):
        for name in sorted(files):
            if name.endswith("_metric.txt"):
                # strip the full eval suffix when present, else the short one
                # ("seq1_metric.txt" → "seq1", not "seq1_metric.txt")
                if name.endswith("_eval_metric.txt"):
                    seq = name[: -len("_eval_metric.txt")]
                else:
                    seq = name[: -len("_metric.txt")]
                results.append(
                    (seq,) + extract_metrics(os.path.join(root, name))
                )
    return results


def calculate_trajectory_averages(results):
    """Mean ATE / RPE-trans / RPE-rot over scraped per-sequence results
    (reference: evo_utils.py:415-428; empty → zeros)."""
    if not results:
        return 0.0, 0.0, 0.0
    n = len(results)
    return (
        sum(r[1] for r in results) / n,
        sum(r[2] for r in results) / n,
        sum(r[3] for r in results) / n,
    )
