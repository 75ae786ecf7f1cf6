"""Tests for point-cloud evaluation: alignment, ICP, NN metrics, normals.

Golden values via scipy cKDTree (the reference's own NN backend,
metrics/utils.py:7-42) and analytic constructions for ICP/alignment.
"""

import numpy as np
import jax.numpy as jnp
from scipy.spatial import cKDTree
from scipy.spatial.transform import Rotation

from unigeo_tpu.metrics.pointcloud import (
    scale_shift_align,
    icp_point_to_point,
    estimate_normals,
    accuracy_completion,
    pcd_evaluation,
)
from unigeo_tpu.ops.knn import nearest_neighbor, knn


def test_nearest_neighbor_matches_kdtree(rng):
    q = rng.normal(size=(513, 3)).astype(np.float32)
    r = rng.normal(size=(307, 3)).astype(np.float32)
    dist, idx = nearest_neighbor(jnp.asarray(q), jnp.asarray(r), chunk=128)
    gdist, gidx = cKDTree(r).query(q)
    assert np.allclose(np.asarray(dist), gdist, atol=1e-5)
    assert np.array_equal(np.asarray(idx), gidx)


def test_knn_matches_kdtree(rng):
    q = rng.normal(size=(200, 3)).astype(np.float32)
    r = rng.normal(size=(300, 3)).astype(np.float32)
    dists, idx = knn(jnp.asarray(q), jnp.asarray(r), k=5, chunk=64)
    gdist, gidx = cKDTree(r).query(q, k=5)
    assert np.allclose(np.asarray(dists), gdist, atol=1e-5)
    assert np.array_equal(np.asarray(idx), gidx)


def test_scale_shift_align_recovers_scaled_shifted_pred(rng):
    """pred = gt under a z-shift + uniform scale must align back onto gt."""
    nf, h, w = 2, 24, 32
    gt = rng.uniform(-2, 2, size=(nf, h, w, 3)).astype(np.float32)
    gt[..., 2] += 3.0
    masks = (rng.uniform(size=(nf, h, w)) < 0.9).astype(np.float32)

    scale_true = 0.25
    pred = gt.copy()
    pred *= scale_true
    pred[..., 2] += 1.5  # extra z shift

    pred_aligned, gt_out, mon = scale_shift_align(
        jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(masks)
    )
    pa = np.asarray(pred_aligned)
    valid = masks > 0
    # gt passes through untouched
    assert np.allclose(np.asarray(gt_out), gt, atol=1e-6)
    # aligned prediction matches gt on valid pixels
    err = np.linalg.norm(pa[valid] - gt[valid], axis=-1)
    assert np.median(err) < 1e-3


def test_icp_recovers_rigid_transform(rng):
    pts = rng.uniform(-1, 1, size=(800, 3)).astype(np.float32)
    R_true = Rotation.from_rotvec([0.03, -0.05, 0.02]).as_matrix().astype(np.float32)
    t_true = np.array([0.02, -0.01, 0.03], np.float32)
    dst = pts @ R_true.T + t_true
    T, src_out = icp_point_to_point(jnp.asarray(pts), jnp.asarray(dst), threshold=0.1)
    err = np.linalg.norm(np.asarray(src_out) - dst, axis=-1)
    assert err.mean() < 1e-3


def test_estimate_normals_plane(rng):
    # points on the z=0 plane → normals ±z
    pts = np.zeros((500, 3), np.float32)
    pts[:, :2] = rng.uniform(-1, 1, size=(500, 2))
    normals = np.asarray(estimate_normals(jnp.asarray(pts), k=10))
    assert np.allclose(np.abs(normals[:, 2]), 1.0, atol=1e-4)


def test_accuracy_completion_matches_kdtree_golden(rng):
    pred = rng.normal(size=(400, 3)).astype(np.float32)
    gt = rng.normal(size=(350, 3)).astype(np.float32)
    pn = rng.normal(size=(400, 3)).astype(np.float32)
    pn /= np.linalg.norm(pn, axis=-1, keepdims=True)
    gn = rng.normal(size=(350, 3)).astype(np.float32)
    gn /= np.linalg.norm(gn, axis=-1, keepdims=True)

    stats = accuracy_completion(
        jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(pn), jnp.asarray(gn)
    )

    # golden: reference formulas (metrics/utils.py:14-42)
    d_a, i_a = cKDTree(gt).query(pred)
    d_c, i_c = cKDTree(pred).query(gt)
    assert np.isclose(float(stats["acc"]), d_a.mean(), atol=1e-5)
    assert np.isclose(float(stats["acc_med"]), np.median(d_a), atol=1e-5)
    assert np.isclose(float(stats["comp"]), d_c.mean(), atol=1e-5)
    assert np.isclose(float(stats["comp_med"]), np.median(d_c), atol=1e-5)
    nc1 = np.abs(np.sum(gn[i_a] * pn, -1))
    nc2 = np.abs(np.sum(gn * pn[i_c], -1))
    assert np.isclose(float(stats["nc1"]), nc1.mean(), atol=1e-5)
    assert np.isclose(float(stats["nc2"]), nc2.mean(), atol=1e-5)


def test_pcd_evaluation_identity_prediction(rng):
    """A perfect pointmap prediction must score ~0 acc/comp and ~1 nc."""
    nf, h, w = 2, 20, 30
    gt = rng.uniform(-1, 1, size=(nf, h, w, 3)).astype(np.float32)
    gt[..., 2] += 2.0
    masks = np.ones((nf, h, w), np.float32)
    res = pcd_evaluation(gt.copy(), gt, masks, downsample_num=500)
    assert res["acc"] < 5e-3
    assert res["comp"] < 5e-3
    assert res["nc1"] > 0.95
    assert res["nc2"] > 0.95
    pts, cols = res["pred_pcd"]
    assert pts.shape[1] == 3 and cols.shape == pts.shape


def test_pcd_evaluation_scale_shift_invariance(rng):
    nf, h, w = 1, 24, 24
    gt = rng.uniform(-1, 1, size=(nf, h, w, 3)).astype(np.float32)
    gt[..., 2] += 2.0
    pred = gt * 0.3
    pred[..., 2] += 0.7
    masks = np.ones((nf, h, w), np.float32)
    res = pcd_evaluation(pred, gt, masks, downsample_num=-1)
    assert res["acc"] < 2e-2
    assert res["comp"] < 2e-2


def test_pcd_evaluation_fewer_points_than_knn_k():
    """Clips with fewer valid points than the normal-estimation k (30) must
    score, not crash (knn clamps k to the cloud size and pads columns)."""
    rng = np.random.default_rng(5)
    pts = rng.normal(size=(1, 4, 4, 3)).astype(np.float32)  # 16 points < 30
    res = pcd_evaluation(
        predicted_pcd=pts + 0.01, ground_truth_pcd=pts,
        masks=np.ones((1, 4, 4), bool), rgbs=np.ones((1, 4, 4, 3), np.float32),
        downsample_num=16,
    )
    assert np.isfinite(res["acc"]) and np.isfinite(res["comp"])
