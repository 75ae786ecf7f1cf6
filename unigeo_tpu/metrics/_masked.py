"""Masked reductions with static shapes.

The reference's metrics use boolean fancy-indexing (``x[mask]``,
reference: metrics/eval_depth.py:66-67) which produces data-dependent shapes —
a non-starter under XLA.  Every reduction here instead carries the mask as
weights over the full static-shape array, which is mathematically identical
and lets the whole metrics suite run jitted on TPU.

Median semantics: torch.median / torch.nanmedian return the LOWER of the two
middle elements for even counts, while numpy averages the two.  The reference
mixes both (torch for depth/normal/pointcloud alignment, numpy for NN
distances), so both are provided.
"""

from __future__ import annotations

import jax.numpy as jnp

_BIG = jnp.float32(3.4e38)


def masked_mean(x, mask, axis=None, eps=0.0):
    """Mean of x over elements where mask is true."""
    mask = mask.astype(x.dtype)
    num = jnp.sum(x * mask, axis=axis)
    den = jnp.sum(mask, axis=axis)
    return num / jnp.maximum(den, 1.0) if eps == 0.0 else num / (den + eps)


def masked_sum(x, mask, axis=None):
    return jnp.sum(x * mask.astype(x.dtype), axis=axis)


def _sorted_masked(x, mask):
    """Flatten, push invalid entries to +inf, sort ascending."""
    xf = jnp.ravel(x).astype(jnp.float32)
    mf = jnp.ravel(mask)
    xf = jnp.where(mf, xf, _BIG)
    return jnp.sort(xf), jnp.sum(mf.astype(jnp.int32))


def masked_median(x, mask, semantics: str = "torch"):
    """Median over valid elements of ``x``.

    semantics="torch": lower-middle element (torch.median / torch.nanmedian).
    semantics="numpy": average of the two middle elements (np.median).
    Returns NaN-free 0.0 if no element is valid.
    """
    s, n = _sorted_masked(x, mask)
    lower = s[jnp.maximum((n - 1) // 2, 0)]
    if semantics == "torch":
        out = lower
    elif semantics == "numpy":
        upper = s[jnp.maximum(jnp.minimum(n // 2, s.shape[0] - 1), 0)]
        out = jnp.where(n % 2 == 1, lower, 0.5 * (lower + upper))
    else:
        raise ValueError(f"bad median semantics: {semantics}")
    return jnp.where(n > 0, out, 0.0)


def masked_quantile(x, mask, q: float):
    """Linear-interpolation quantile over valid elements (numpy semantics)."""
    s, n = _sorted_masked(x, mask)
    pos = q * (n.astype(jnp.float32) - 1.0)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.ceil(pos).astype(jnp.int32)
    frac = pos - lo.astype(jnp.float32)
    lo = jnp.clip(lo, 0, s.shape[0] - 1)
    hi = jnp.clip(hi, 0, s.shape[0] - 1)
    out = s[lo] * (1.0 - frac) + s[hi] * frac
    return jnp.where(n > 0, out, 0.0)


def masked_median_lastdim(x, mask, semantics: str = "torch"):
    """Median over the last axis, batched over leading axes.

    x: [..., N]; mask: [..., N] → [...] medians.
    """
    xf = x.astype(jnp.float32)
    xf = jnp.where(mask, xf, _BIG)
    s = jnp.sort(xf, axis=-1)
    n = jnp.sum(mask.astype(jnp.int32), axis=-1)
    idx_lower = jnp.maximum((n - 1) // 2, 0)
    lower = jnp.take_along_axis(s, idx_lower[..., None], axis=-1)[..., 0]
    if semantics == "torch":
        out = lower
    else:
        idx_upper = jnp.clip(n // 2, 0, s.shape[-1] - 1)
        upper = jnp.take_along_axis(s, idx_upper[..., None], axis=-1)[..., 0]
        out = jnp.where(n % 2 == 1, lower, 0.5 * (lower + upper))
    return jnp.where(n > 0, out, 0.0)
