"""Golden-parity tests for depth evaluation.

Golden values are computed inside the tests with the reference's own recipe
(numpy lstsq on the [pred, ones] design matrix, torch-style median, explicit
masked gathers) — independently of the implementation under test.
"""

import numpy as np
import pytest

from unigeo_tpu.metrics.depth import depth_evaluation
from unigeo_tpu.metrics.alignment import (
    lstsq_scale_shift,
    median_scale,
    weiszfeld_scale,
    lad_scale_shift,
)
import jax.numpy as jnp


def _reference_depth_metrics(pred, gt, mask, custom=None, s=None, t=None):
    """Reference formulas (eval_depth.py:140-164) with numpy."""
    p = pred[mask]
    g = gt[mask]
    if s is not None:
        p = s * p + t
    if custom is not None:
        keep = custom[mask] > 0
        p, g = p[keep], g[keep]
    abs_rel = np.mean(np.abs(p - g) / g)
    sq_rel = np.mean((p - g) ** 2 / g)
    rmse = np.sqrt(np.mean((p - g) ** 2))
    p_cl = np.clip(p, 1e-5, None)
    log_rmse = np.sqrt(np.mean((np.log(p_cl) - np.log(g)) ** 2))
    ratio = np.maximum(p_cl / g, g / p_cl)
    return {
        "Abs Rel": abs_rel,
        "Sq Rel": sq_rel,
        "RMSE": rmse,
        "Log RMSE": log_rmse,
        "delta < 1.25": np.mean(ratio < 1.25),
        "delta < 1.25^2": np.mean(ratio < 1.25**2),
        "delta < 1.25^3": np.mean(ratio < 1.25**3),
    }


def _make_depths(rng, nf=3, h=48, w=64):
    gt = rng.uniform(0.5, 10.0, size=(nf, h, w)).astype(np.float32)
    gt[rng.uniform(size=gt.shape) < 0.1] = 0.0  # invalid holes
    gt[rng.uniform(size=gt.shape) < 0.02] = 120.0  # beyond max_depth
    true_s, true_t = 2.3, -0.7
    noise = rng.normal(0, 0.05, size=gt.shape).astype(np.float32)
    pred = (gt - true_t) / true_s + noise
    return pred, gt


def test_lstsq_alignment_matches_numpy_lstsq(rng):
    pred, gt = _make_depths(rng)
    mask = (gt > 0) & (gt < 80)
    A = np.stack([pred[mask], np.ones(mask.sum())], axis=1).astype(np.float64)
    sol = np.linalg.lstsq(A, gt[mask].astype(np.float64), rcond=None)[0]
    s, t = lstsq_scale_shift(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask))
    assert np.isclose(float(s), sol[0], rtol=1e-4)
    assert np.isclose(float(t), sol[1], rtol=1e-3, atol=1e-4)


def test_depth_evaluation_lstsq_golden(rng):
    pred, gt = _make_depths(rng)
    mask = (gt > 0) & (gt < 80)
    A = np.stack([pred[mask], np.ones(mask.sum())], axis=1).astype(np.float64)
    s, t = np.linalg.lstsq(A, gt[mask].astype(np.float64), rcond=None)[0]
    golden = _reference_depth_metrics(pred, gt, mask, s=s, t=t)

    res, parity, aligned, gt_masked = depth_evaluation(pred, gt, alignment="lstsq")
    for k, v in golden.items():
        assert np.isclose(res[k], v, rtol=2e-3, atol=2e-4), (k, res[k], v)
    assert res["valid_pixels"] == int(mask.sum())
    assert parity.shape == gt.shape
    assert aligned.shape == pred.shape


def test_depth_evaluation_custom_mask_applied_after_alignment(rng):
    pred, gt = _make_depths(rng)
    mask = (gt > 0) & (gt < 80)
    custom = (rng.uniform(size=gt.shape) < 0.7).astype(np.float32)
    # golden: align on full validity mask, score within custom∩valid
    A = np.stack([pred[mask], np.ones(mask.sum())], axis=1).astype(np.float64)
    s, t = np.linalg.lstsq(A, gt[mask].astype(np.float64), rcond=None)[0]
    golden = _reference_depth_metrics(pred, gt, mask, custom=custom, s=s, t=t)

    res, *_ = depth_evaluation(pred, gt, custom_mask=custom, alignment="lstsq")
    for k, v in golden.items():
        assert np.isclose(res[k], v, rtol=2e-3, atol=2e-4), (k, res[k], v)
    assert res["valid_pixels"] == int((custom[mask] > 0).sum())


def test_median_alignment_torch_semantics(rng):
    torch = pytest.importorskip("torch")

    pred, gt = _make_depths(rng)
    mask = (gt > 0) & (gt < 80)
    s_torch = (
        torch.median(torch.from_numpy(gt[mask])) / torch.median(torch.from_numpy(pred[mask]))
    ).item()
    s = float(median_scale(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask)))
    assert np.isclose(s, s_torch, rtol=1e-5)


def test_weiszfeld_scale_matches_reference_iterations(rng):
    pred, gt = _make_depths(rng)
    mask = (gt > 0) & (gt < 80)
    p, g = pred[mask].astype(np.float64), gt[mask].astype(np.float64)
    # reference loop (alignment.py:170-196)
    s = np.mean(g) / np.mean(p)
    for _ in range(10):
        w = 1.0 / (np.abs(s * p - g) + 1e-8)
        s = np.sum(w * p * g) / np.sum(w * p * p)
    s_ours = float(weiszfeld_scale(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask)))
    # f32 IRLS accumulates rounding through the 10 reweighting iterations
    assert np.isclose(s_ours, s, rtol=5e-3)


def test_lad_close_to_scipy_l1(rng):
    from scipy.optimize import minimize

    pred, gt = _make_depths(rng)
    mask = (gt > 0) & (gt < 80)
    p, g = pred[mask].astype(np.float64), gt[mask].astype(np.float64)

    def l1(params):
        return np.sum(np.abs(params[0] * p + params[1] - g))

    s_ours, t_ours = lad_scale_shift(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask))
    # IRLS should reach an objective no worse than scipy's BFGS-on-L1
    ref = minimize(l1, [np.median(g) / np.median(p), 0.0])
    assert l1([float(s_ours), float(t_ours)]) <= ref.fun * 1.01


def test_all_invalid_returns_zeros():
    gt = np.zeros((2, 8, 8), np.float32)
    pred = np.ones_like(gt)
    res, *_ = depth_evaluation(pred, gt, alignment="lstsq")
    assert res["valid_pixels"] == 0
    assert res["Abs Rel"] == 0.0
    assert res["delta < 1.25"] == 0.0
    assert np.isfinite(res["RMSE"])


def test_metric_scale_mode(rng):
    pred, gt = _make_depths(rng)
    mask = (gt > 0) & (gt < 80)
    golden = _reference_depth_metrics(pred, gt, mask)
    res, *_ = depth_evaluation(pred, gt, alignment="metric")
    assert np.isclose(res["Abs Rel"], golden["Abs Rel"], rtol=1e-4)


def test_median_alignment_zero_prediction_stays_finite():
    """A degenerate all-zero prediction median falls back to scale 1 —
    metrics are finitely bad, not ~1e12 garbage poisoning CSV averages."""
    gt = np.full((1, 8, 8), 2.0, np.float32)
    pred = np.zeros((1, 8, 8), np.float32)
    res, *_ = depth_evaluation(
        predicted_depth=pred, ground_truth_depth=gt, alignment="median"
    )
    assert np.isfinite(res["Abs Rel"])
    assert res["Abs Rel"] <= 10.0
