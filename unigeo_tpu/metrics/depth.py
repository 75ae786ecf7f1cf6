"""Depth-map evaluation, pure JAX (reference: metrics/eval_depth.py).

Behavioral parity notes (each mirrors a reference line):
  * Validity mask = 0 < gt < max_depth (eval_depth.py:60-65); the custom mask
    is applied only to the *metric* computation, AFTER alignment
    (eval_depth.py:134-138) — alignment always uses the full validity mask.
  * Alignment modes dispatch exactly like eval_depth.py:79-121; the YAML
    ``depth_alignment`` knob is honored here (the reference hardcodes lstsq
    at eval.py:49).
  * Metric order matters: pred is clamped to >= 1e-5 before Log RMSE and the
    clamped value feeds the delta thresholds too (eval_depth.py:152-164).
  * All-invalid clips return zeros (eval_depth.py:217-227).

Returns the reference's exact result keys plus the error-parity map, aligned
prediction, and masked gt (eval_depth.py:229-246).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from . import alignment as align
from ._masked import masked_mean, masked_median

DEPTH_METRIC_KEYS = (
    "Abs Rel",
    "Sq Rel",
    "RMSE",
    "Log RMSE",
    "delta < 1.",
    "delta < 1.25",
    "delta < 1.25^2",
    "delta < 1.25^3",
    "valid_pixels",
)


@functools.partial(
    jax.jit,
    static_argnames=(
        "alignment_mode",
        "max_depth",
        "disp_input",
        "pre_clip_min",
        "pre_clip_max",
        "post_clip_min",
        "post_clip_max",
        "lr",
        "max_iters",
    ),
)
def _depth_evaluation_jit(
    pred,
    gt,
    custom_mask,
    alignment_mode,
    max_depth,
    disp_input,
    pre_clip_min,
    pre_clip_max,
    post_clip_min,
    post_clip_max,
    lr,
    max_iters,
):
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)

    if max_depth is not None:
        mask = (gt > 0) & (gt < max_depth)
    else:
        mask = gt > 0

    p = pred
    if pre_clip_min is not None:
        p = jnp.maximum(p, pre_clip_min)
    if pre_clip_max is not None:
        p = jnp.minimum(p, pre_clip_max)

    g = gt
    if disp_input:
        g = 1.0 / (gt + 1e-8)

    # --- alignment over the validity mask (never the custom mask) ---
    s = jnp.float32(1.0)
    t = jnp.float32(0.0)
    if alignment_mode == "metric":
        pass
    elif alignment_mode == "lstsq":
        s, t = align.lstsq_scale_shift(p, g, mask)
    elif alignment_mode == "lad":
        s, t = align.lad_scale_shift(p, g, mask)
    elif alignment_mode == "lad2":
        s0 = masked_median(g, mask) / jnp.maximum(masked_median(p, mask), 1e-12)
        s, t = align.adam_l1_scale_shift(p, g, mask, s0, lr=lr, max_iters=max_iters)
    elif alignment_mode == "scale":
        s = align.weiszfeld_scale(p, g, mask)
        s = jnp.maximum(s, 1e-3)
    elif alignment_mode == "median":
        s = align.median_scale(p, g, mask)
    else:
        raise ValueError(f"unknown alignment mode {alignment_mode!r}")

    p_aligned = s * p + t

    if disp_input:
        # back to depth space (reference: eval_depth.py:123-126)
        p_aligned = 1.0 / jnp.maximum(p_aligned, 1e-8)

    if post_clip_min is not None:
        p_aligned = jnp.maximum(p_aligned, post_clip_min)
    if post_clip_max is not None:
        p_aligned = jnp.minimum(p_aligned, post_clip_max)

    metric_mask = mask if custom_mask is None else (mask & (custom_mask > 0))
    mm = metric_mask.astype(jnp.float32)
    n_valid = jnp.sum(mm)

    diff = p_aligned - gt
    safe_gt = jnp.where(metric_mask, gt, 1.0)
    abs_rel = masked_mean(jnp.abs(diff) / safe_gt, mm)
    sq_rel = masked_mean(diff * diff / safe_gt, mm)
    rmse = jnp.sqrt(masked_mean(diff * diff, mm))

    p_log = jnp.maximum(p_aligned, 1e-5)
    log_diff = jnp.log(p_log) - jnp.log(jnp.where(metric_mask, gt, 1.0))
    log_rmse = jnp.sqrt(masked_mean(log_diff * log_diff, mm))

    safe_p = jnp.where(metric_mask, p_log, 1.0)
    max_ratio = jnp.maximum(safe_p / safe_gt, safe_gt / safe_p)
    # "delta < 1." is identically 0 (max(p/g, g/p) >= 1 always) — the
    # reference computes the same dead threshold (eval_depth.py:162,
    # threshold_0) and we reproduce it for CSV-column parity
    d0 = masked_mean((max_ratio < 1.0).astype(jnp.float32), mm)
    d1 = masked_mean((max_ratio < 1.25).astype(jnp.float32), mm)
    d2 = masked_mean((max_ratio < 1.25**2).astype(jnp.float32), mm)
    d3 = masked_mean((max_ratio < 1.25**3).astype(jnp.float32), mm)

    has_valid = (n_valid > 0).astype(jnp.float32)
    metrics = {
        "Abs Rel": abs_rel * has_valid,
        "Sq Rel": sq_rel * has_valid,
        "RMSE": rmse * has_valid,
        "Log RMSE": log_rmse * has_valid,
        "delta < 1.": d0 * has_valid,
        "delta < 1.25": d1 * has_valid,
        "delta < 1.25^2": d2 * has_valid,
        "delta < 1.25^3": d3 * has_valid,
        "valid_pixels": n_valid,
    }

    # error-parity map over the validity mask (reference: eval_depth.py:166-204)
    parity = jnp.where(mask, jnp.abs(p_aligned - gt) / safe_gt_full(gt), 0.0)
    gt_masked = jnp.where(mask, gt, 0.0)
    return metrics, parity, p_aligned, gt_masked


def safe_gt_full(gt):
    return jnp.where(gt == 0, 1.0, gt)


def depth_evaluation(
    predicted_depth,
    ground_truth_depth,
    max_depth: Optional[float] = 80.0,
    custom_mask=None,
    alignment: str = "lstsq",
    disp_input: bool = False,
    pre_clip_min: Optional[float] = None,
    pre_clip_max: Optional[float] = None,
    post_clip_min: Optional[float] = None,
    post_clip_max: Optional[float] = None,
    lr: float = 1e-4,
    max_iters: int = 1000,
):
    """Evaluate a depth prediction against GT.

    Args:
        predicted_depth / ground_truth_depth: [H, W] or [Nf, H, W] arrays.
        custom_mask: same shape, truthy where pixels count toward the metrics.
        alignment: one of metric | lstsq | lad | lad2 | scale | median.

    Returns:
        (metrics dict of python floats, error-parity map, aligned prediction,
         masked gt) — same tuple structure as the reference
        (eval_depth.py:241-246).
    """
    pred = jnp.asarray(predicted_depth)
    gt = jnp.asarray(ground_truth_depth)
    cm = None if custom_mask is None else jnp.asarray(custom_mask)
    metrics, parity, p_aligned, gt_masked = _depth_evaluation_jit(
        pred,
        gt,
        cm,
        alignment,
        max_depth,
        disp_input,
        pre_clip_min,
        pre_clip_max,
        post_clip_min,
        post_clip_max,
        lr,
        max_iters,
    )
    out = {k: float(v) for k, v in metrics.items()}
    out["valid_pixels"] = int(out["valid_pixels"])
    return out, parity, p_aligned, gt_masked
