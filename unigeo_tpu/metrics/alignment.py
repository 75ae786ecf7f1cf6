"""Depth alignment solvers, pure JAX with static shapes.

Re-implements every alignment mode of the reference (metrics/alignment.py,
metrics/eval_depth.py:79-121) as masked closed forms / fixed-iteration loops:

  * lstsq  — scale+shift least squares (reference: alignment.py:150-167,
    np.linalg.lstsq on [pred, 1]).  Here: the mean-centered closed form,
    which is the exact same minimizer but numerically stable in f32.
  * median — median scaling (reference: eval_depth.py:119-121,
    torch.median semantics).
  * scale  — Weiszfeld IRLS scale-only (reference: alignment.py:170-196,
    10 iterations).
  * lad    — L1 scale+shift.  The reference shells out to scipy.minimize
    (BFGS on a non-smooth objective, alignment.py:79-94); here IRLS on the
    L1 objective (same fixed point, deterministic, jittable).
  * lad2   — Adam on the L1 objective (reference: alignment.py:96-147),
    reproduced with a lax.fori_loop Adam (bias-corrected, torch defaults
    beta=(0.9, 0.999), eps=1e-8).

All functions take full arrays plus a validity mask instead of pre-gathered
values, so shapes stay static under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ._masked import masked_mean, masked_median


def lstsq_scale_shift(pred, gt, mask):
    """Least-squares (s, t) minimizing sum_mask (s*pred + t - gt)^2.

    Mean-centered normal equations — identical minimizer to the reference's
    np.linalg.lstsq on the [pred, ones] design matrix (alignment.py:150-167).
    """
    m = mask.astype(jnp.float32)
    p = pred.astype(jnp.float32)
    g = gt.astype(jnp.float32)
    mean_p = masked_mean(p, m)
    mean_g = masked_mean(g, m)
    pc = (p - mean_p) * m
    gc = (g - mean_g) * m
    var_p = jnp.sum(pc * pc)
    cov = jnp.sum(pc * gc)
    s = cov / jnp.maximum(var_p, 1e-12)
    t = mean_g - s * mean_p
    return s, t


def median_scale(pred, gt, mask):
    """scale = median(gt) / median(pred) over valid pixels (torch semantics).

    (reference: eval_depth.py:119-121)
    """
    med_gt = masked_median(gt, mask, semantics="torch")
    med_pred = masked_median(pred, mask, semantics="torch")
    # degenerate prediction (median ≈ 0, e.g. zeros outside a model's
    # confident region): fall back to scale 1 so the clip scores finitely
    # bad instead of an ~1e12x scale poisoning the CSV Average row (the
    # reference divides unguarded → inf, eval_depth.py:119-121)
    ok = jnp.abs(med_pred) > 1e-8
    return jnp.where(ok, med_gt / jnp.where(ok, med_pred, 1.0), 1.0)


def weiszfeld_scale(pred, gt, mask, iters: int = 10):
    """Scale-only robust alignment by IRLS (reference: alignment.py:170-196).

    Init s = mean(gt)/mean(pred); 10 reweighting iterations with weights
    1/(|residual| + 1e-8).
    """
    m = mask.astype(jnp.float32)
    p = pred.astype(jnp.float32)
    g = gt.astype(jnp.float32)
    s0 = masked_mean(g, m) / jnp.maximum(masked_mean(p, m), 1e-12)

    def body(_, s):
        resid = jnp.abs(s * p - g) + 1e-8
        w = m / resid
        num = jnp.sum(w * p * g)
        den = jnp.sum(w * p * p)
        return num / jnp.maximum(den, 1e-12)

    return jax.lax.fori_loop(0, iters, body, s0)


def lad_scale_shift(pred, gt, mask, iters: int = 50):
    """L1 (least absolute deviations) scale+shift via IRLS.

    The reference minimizes the same objective with scipy.optimize.minimize
    starting at s = median(gt)/median(pred), t = 0 (eval_depth.py:87-93).
    IRLS solves the weighted least-squares subproblem in closed form each
    iteration; the fixed point is the LAD solution.
    """
    m = mask.astype(jnp.float32)
    p = pred.astype(jnp.float32)
    g = gt.astype(jnp.float32)
    s0 = masked_median(g, m) / jnp.maximum(masked_median(p, m), 1e-12)
    t0 = jnp.float32(0.0)

    def body(_, st):
        s, t = st
        w = m / (jnp.abs(s * p + t - g) + 1e-8)
        sw = jnp.sum(w)
        mean_p = jnp.sum(w * p) / jnp.maximum(sw, 1e-12)
        mean_g = jnp.sum(w * g) / jnp.maximum(sw, 1e-12)
        pc = p - mean_p
        gc = g - mean_g
        s_new = jnp.sum(w * pc * gc) / jnp.maximum(jnp.sum(w * pc * pc), 1e-12)
        t_new = mean_g - s_new * mean_p
        return (s_new, t_new)

    s, t = jax.lax.fori_loop(0, iters, body, (s0, t0))
    return s, t


def adam_l1_scale_shift(pred, gt, mask, s_init, t_init=0.0, lr: float = 1e-4,
                        max_iters: int = 1000):
    """Adam on sum |s*pred + t - gt| (reference: alignment.py:96-147).

    Matches torch.optim.Adam defaults (betas 0.9/0.999, eps 1e-8); runs the
    full max_iters (the reference's early-exit tolerance of 1e-6 on an
    unnormalized sum virtually never triggers at these pixel counts).
    """
    m = mask.astype(jnp.float32)
    p = pred.astype(jnp.float32)
    g = gt.astype(jnp.float32)

    def loss_grad(s, t):
        r = s * p + t - g
        sign = jnp.sign(r) * m
        return jnp.sum(sign * p), jnp.sum(sign)

    def body(i, state):
        s, t, ms, vt_s, mt, vt_t = state
        gs, gt_ = loss_grad(s, t)
        b1, b2, eps = 0.9, 0.999, 1e-8
        ms = b1 * ms + (1 - b1) * gs
        mt = b1 * mt + (1 - b1) * gt_
        vt_s = b2 * vt_s + (1 - b2) * gs * gs
        vt_t = b2 * vt_t + (1 - b2) * gt_ * gt_
        step = i.astype(jnp.float32) + 1.0
        mhat_s = ms / (1 - b1**step)
        mhat_t = mt / (1 - b1**step)
        vhat_s = vt_s / (1 - b2**step)
        vhat_t = vt_t / (1 - b2**step)
        s = s - lr * mhat_s / (jnp.sqrt(vhat_s) + eps)
        t = t - lr * mhat_t / (jnp.sqrt(vhat_t) + eps)
        return (s, t, ms, vt_s, mt, vt_t)

    init = (jnp.float32(s_init), jnp.float32(t_init), 0.0, 0.0, 0.0, 0.0)
    s, t, *_ = jax.lax.fori_loop(0, max_iters, body, init)
    return s, t
