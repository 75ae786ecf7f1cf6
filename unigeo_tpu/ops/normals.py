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


def _plane_normal_direction(sums, n_count: float):
    """Un-normalized plane-normal direction from patch moment sums.

    The reference solves the uncentered normal equations
    ``(Σ p pᵀ) n = Σ p`` per pixel (geometry_utils.py:9-70).  Solving THAT
    system closed-form in f32 is catastrophically unstable: the second
    moments are O(|p|²·N) while the plane signal (the centered scatter) is
    O(extent²·N) — four to eight orders smaller — so Cramer cofactor sums
    cancel to noise (measured ~90° mean error on PNG-quantized depth).

    Instead use Sherman–Morrison: with C = Σppᵀ − N p̄p̄ᵀ (centered scatter),
        (C + N p̄p̄ᵀ) n = N p̄   ⇒   n = N·(C⁻¹p̄) / (1 + N·p̄ᵀC⁻¹p̄),
    a POSITIVE multiple of C⁻¹p̄ (C is PSD), so after normalization the
    direction adj(C_reg)·p̄ is exactly the reference's least-squares normal
    — computed on the well-scaled centered matrix, with no division at all
    (the adjugate is det·C⁻¹ and det > 0 cancels in the normalize).  Pure
    VPU arithmetic that fuses with the surrounding ops; jnp.linalg.solve's
    LU path is ~1000× slower for millions of tiny systems on TPU
    (measured ~2 s for [8,384,512] batches on v5e).

    Regularization: ε·(tr(C) + 1e-12)·I, the relative analog of the
    reference's absolute 1e-6 Tikhonov identity (geometry_utils.py:33-34)
    — only degenerate patches are affected by the difference.
    """
    mx = sums["x"] / n_count
    my = sums["y"] / n_count
    mz = sums["z"] / n_count
    cxx = sums["xx"] - n_count * mx * mx
    cyy = sums["yy"] - n_count * my * my
    czz = sums["zz"] - n_count * mz * mz
    cxy = sums["xy"] - n_count * mx * my
    cxz = sums["xz"] - n_count * mx * mz
    cyz = sums["yz"] - n_count * my * mz
    reg = 1e-6 * (cxx + cyy + czz) + 1e-12
    cxx = cxx + reg
    cyy = cyy + reg
    czz = czz + reg
    # adjugate of the symmetric regularized C
    a00 = cyy * czz - cyz * cyz
    a01 = cxz * cyz - cxy * czz
    a02 = cxy * cyz - cxz * cyy
    a11 = cxx * czz - cxz * cxz
    a12 = cxy * cxz - cxx * cyz
    a22 = cxx * cyy - cxy * cxy
    # adj(C_reg) @ p̄
    x0 = a00 * mx + a01 * my + a02 * mz
    x1 = a01 * mx + a11 * my + a12 * mz
    x2 = a02 * mx + a12 * my + a22 * mz
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

    n = _plane_normal_direction(sums, float(patch_size * patch_size))
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
