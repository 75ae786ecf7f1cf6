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


def _solve33(A, b):
    """Closed-form batched 3×3 solve via the adjugate (Cramer's rule).

    jnp.linalg.solve lowers to a general LU path that runs ~1000× slower
    than elementwise math for millions of tiny systems on TPU (measured
    ~2 s for [8,384,512] batches on v5e); the cofactor formula is pure VPU
    arithmetic that fuses with the surrounding ops.  The 1e-6 Tikhonov
    identity guarantees det > 0.

    A: [..., 3, 3] symmetric positive definite, b: [..., 3].
    """
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a10, a11, a12 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    a20, a21, a22 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c00 = a11 * a22 - a12 * a21
    c01 = a12 * a20 - a10 * a22
    c02 = a10 * a21 - a11 * a20
    det = a00 * c00 + a01 * c01 + a02 * c02
    c10 = a02 * a21 - a01 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a01 * a20 - a00 * a21
    c20 = a01 * a12 - a02 * a11
    c21 = a02 * a10 - a00 * a12
    c22 = a00 * a11 - a01 * a10
    b0, b1, b2 = b[..., 0], b[..., 1], b[..., 2]
    inv_det = 1.0 / det
    x0 = (c00 * b0 + c10 * b1 + c20 * b2) * inv_det
    x1 = (c01 * b0 + c11 * b1 + c21 * b2) * inv_det
    x2 = (c02 * b0 + c12 * b1 + c22 * b2) * inv_det
    return jnp.stack([x0, x1, x2], axis=-1)


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

    n = _solve33(ata, at1[..., 0])  # [..., H, W, 3]
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
