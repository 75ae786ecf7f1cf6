"""Surface-normal evaluation, pure JAX (reference: metrics/eval_normal.py).

Angular error = arccos of the clamped normalized dot product, in degrees
(eval_normal.py:12-18); masked stats mirror compute_normal_metrics
(eval_normal.py:24-33), including torch.median lower-middle semantics and
percentage (×100) threshold metrics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ._masked import masked_mean, masked_median

NORMAL_METRIC_KEYS = (
    "normal mean",
    "normal median",
    "normal rmse",
    "angle < 5",
    "angle < 7.5",
    "angle < 11.25",
    "angle < 22.5",
    "angle < 30",
)


@jax.jit
def _normal_metrics_jit(pred, gt, mask):
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)

    dot = jnp.sum(pred * gt, axis=-1)
    norm_a = jnp.linalg.norm(pred, axis=-1)
    norm_b = jnp.linalg.norm(gt, axis=-1)
    cos = dot / (norm_a * norm_b + 1e-6)
    cos = jnp.clip(cos, -1.0, 1.0)
    err_deg = jnp.arccos(cos) * (180.0 / np.pi)

    m = mask.astype(jnp.float32)
    mean = masked_mean(err_deg, m)
    median = masked_median(err_deg, mask, semantics="torch")
    rmse = jnp.sqrt(masked_mean(err_deg * err_deg, m))

    def pct(th):
        return 100.0 * masked_mean((err_deg < th).astype(jnp.float32), m)

    return {
        "normal mean": mean,
        "normal median": median,
        "normal rmse": rmse,
        "angle < 5": pct(5.0),
        "angle < 7.5": pct(7.5),
        "angle < 11.25": pct(11.25),
        "angle < 22.5": pct(22.5),
        "angle < 30": pct(30.0),
    }


def normal_evaluation(predicted_normal, ground_truth_normal, custom_mask=None):
    """Evaluate normal maps.

    Args:
        predicted_normal / ground_truth_normal: [Nf, H, W, 3] (channels-last,
        same as the reference driver input before its internal permute).
        custom_mask: [Nf, H, W] validity mask.

    Returns: dict of python floats with the reference's exact keys.
    """
    pred = jnp.asarray(predicted_normal)
    gt = jnp.asarray(ground_truth_normal)
    if custom_mask is None:
        mask = jnp.ones(pred.shape[:-1], dtype=bool)
    else:
        mask = jnp.asarray(custom_mask) > 0
    out = _normal_metrics_jit(pred, gt, mask)
    return {k: float(v) for k, v in out.items()}
