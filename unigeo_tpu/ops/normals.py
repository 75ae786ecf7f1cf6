"""Surface normals by least-squares plane fit over local patches.

Reference algorithm (utils/geometry_utils.py:9-70): for every pixel, fit the
plane n·p = 1 to the 5×5 neighborhood of camera-space points by accumulating
the 3×3 scatter matrix ATA and right-hand side AT1 with a box filter, then
solving per-pixel; normalize and orient toward the camera (flip when
dot(n, p) > 0).

The reference tiles the image 4×4 and calls torch.linalg.lstsq per tile to
bound memory (geometry_utils.py:42-62).  On TPU none of that is needed: the
box filter is one lax.reduce_window and the per-pixel 3×3 solves batch
directly (SURVEY.md §7 step 5) — with the same 1e-6 Tikhonov identity the
reference adds (geometry_utils.py:33-34), every system is nonsingular.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _box_filter(x, patch_size: int):
    """Sum over a patch_size×patch_size window, zero-padded (SAME).

    Matches torch conv2d with an all-ones kernel and padding=patch_size//2.
    x: [..., H, W]
    """
    pad = patch_size // 2
    return jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        window_dimensions=(1,) * (x.ndim - 2) + (patch_size, patch_size),
        window_strides=(1,) * x.ndim,
        padding=((0, 0),) * (x.ndim - 2) + (((pad, pad),) * 2),
    )


@functools.partial(jax.jit, static_argnames=("patch_size",))
def surface_normals_from_points(xyz, patch_size: int = 5):
    """Camera-space points → unit normals, camera-facing.

    Args:
        xyz: [..., H, W, 3] points (any leading batch dims).
    Returns:
        [..., H, W, 3] unit normals with dot(normal, point) <= 0.
    """
    xyz = xyz.astype(jnp.float32)
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]

    sums = {
        "xx": _box_filter(x * x, patch_size),
        "yy": _box_filter(y * y, patch_size),
        "zz": _box_filter(z * z, patch_size),
        "xy": _box_filter(x * y, patch_size),
        "xz": _box_filter(x * z, patch_size),
        "yz": _box_filter(y * z, patch_size),
        "x": _box_filter(x, patch_size),
        "y": _box_filter(y, patch_size),
        "z": _box_filter(z, patch_size),
    }

    ata = jnp.stack(
        [
            sums["xx"], sums["xy"], sums["xz"],
            sums["xy"], sums["yy"], sums["yz"],
            sums["xz"], sums["yz"], sums["zz"],
        ],
        axis=-1,
    ).reshape(x.shape + (3, 3))
    ata = ata + 1e-6 * jnp.eye(3, dtype=jnp.float32)
    at1 = jnp.stack([sums["x"], sums["y"], sums["z"]], axis=-1)[..., None]

    n = jnp.linalg.solve(ata, at1)[..., 0]  # [..., H, W, 3]
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)

    # orient toward the camera (reference: geometry_utils.py:67-69)
    flip = jnp.sum(n * xyz, axis=-1, keepdims=True) > 0
    return jnp.where(flip, -n, n)


def fix_normal(normal, position, eps: float = 1e-6):
    """Flip normals pointing away from the camera
    (reference: geometry_utils.py:235-243).

    normal, position: [..., 3] channels-last.
    """
    direction = position / (
        jnp.linalg.norm(position, axis=-1, keepdims=True) + eps
    )
    flip = jnp.sum(normal * direction, axis=-1, keepdims=True) > 0.01
    return jnp.where(flip, -normal, normal)
