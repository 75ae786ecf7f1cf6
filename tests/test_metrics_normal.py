"""Golden-parity tests for normal evaluation (reference: eval_normal.py)."""

import numpy as np
import pytest

from unigeo_tpu.metrics.normal import normal_evaluation


def _golden(pred, gt, mask):
    """Reference formulas (eval_normal.py:12-33) with numpy + torch median."""
    torch = pytest.importorskip("torch")

    dot = (pred * gt).sum(-1)
    na = np.linalg.norm(pred, axis=-1)
    nb = np.linalg.norm(gt, axis=-1)
    cos = np.clip(dot / (na * nb + 1e-6), -1.0, 1.0)
    err = np.degrees(np.arccos(cos))[mask]
    n = err.size
    return {
        "normal mean": err.mean(),
        "normal median": torch.median(torch.from_numpy(err)).item(),
        "normal rmse": np.sqrt((err * err).sum() / n),
        "angle < 5": 100.0 * (err < 5).sum() / n,
        "angle < 7.5": 100.0 * (err < 7.5).sum() / n,
        "angle < 11.25": 100.0 * (err < 11.25).sum() / n,
        "angle < 22.5": 100.0 * (err < 22.5).sum() / n,
        "angle < 30": 100.0 * (err < 30).sum() / n,
    }


def _random_normals(rng, shape):
    v = rng.normal(size=shape + (3,)).astype(np.float32)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_normal_evaluation_golden(rng):
    shape = (4, 32, 48)
    gt = _random_normals(rng, shape)
    noise = rng.normal(0, 0.2, size=gt.shape).astype(np.float32)
    pred = gt + noise
    pred /= np.linalg.norm(pred, axis=-1, keepdims=True)
    mask = rng.uniform(size=shape) < 0.8

    golden = _golden(pred, gt, mask)
    res = normal_evaluation(pred, gt, custom_mask=mask.astype(np.float32))
    for k, v in golden.items():
        assert np.isclose(res[k], v, rtol=1e-3, atol=1e-3), (k, res[k], v)


def test_identical_normals_zero_error(rng):
    gt = _random_normals(rng, (2, 16, 16))
    res = normal_evaluation(gt, gt)
    assert res["normal mean"] < 0.5  # arccos precision near 1.0
    assert res["angle < 5"] == 100.0


def test_opposite_normals_180(rng):
    gt = _random_normals(rng, (1, 8, 8))
    res = normal_evaluation(-gt, gt)
    assert res["normal mean"] > 179.0
    assert res["angle < 30"] == 0.0
