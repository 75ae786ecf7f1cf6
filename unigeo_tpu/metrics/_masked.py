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
