"""Pinhole backprojection (reference: utils/geometry_utils.py:219-253).

Works on numpy or jax arrays; the grid is built with the caller's library so
the op can sit inside a jitted pipeline or a host loader equally.
"""

from __future__ import annotations

import numpy as np


def _xp(arr):
    if isinstance(arr, np.ndarray):
        return np
    import jax.numpy as jnp

    return jnp


def backproject_to_cv_position(depth, intrinsic):
    """[H, W] depth → [H, W, 3] OpenCV camera-space points.

    x = (u - cx) z / fx, y = (v - cy) z / fy, z = depth
    (reference: geometry_utils.py:246-253)
    """
    xp = _xp(depth)
    h, w = depth.shape
    u = xp.arange(w, dtype=depth.dtype if hasattr(depth, "dtype") else None)
    v = xp.arange(h, dtype=depth.dtype if hasattr(depth, "dtype") else None)
    uu, vv = xp.meshgrid(u, v, indexing="xy")
    z = depth
    x = (uu - intrinsic[0, 2]) * z / intrinsic[0, 0]
    y = (vv - intrinsic[1, 2]) * z / intrinsic[1, 1]
    return xp.stack((x, y, z), axis=-1)


def backproject_opengl(depth, intrinsic):
    """Same, flipped to OpenGL (y up, -z forward)
    (reference: geometry_utils.py:219-230)."""
    pts = backproject_to_cv_position(depth, intrinsic)
    xp = _xp(depth)
    sign = xp.asarray([1.0, -1.0, -1.0], dtype=pts.dtype)
    return pts * sign


def backproject_batch_cv(depths, intrinsics):
    """Batched jax version: [Nf,H,W] depths + [Nf,3,3] K → [Nf,H,W,3]."""
    import jax
    import jax.numpy as jnp

    depths = jnp.asarray(depths)
    intrinsics = jnp.asarray(intrinsics)
    return jax.vmap(backproject_to_cv_position)(depths, intrinsics)
