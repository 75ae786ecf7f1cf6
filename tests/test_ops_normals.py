"""Unit tests for ops/normals.py — the patch plane-fit surface-normal op.

The op reproduces the reference's get_surface_normal
(/root/reference/utils/geometry_utils.py:9-70): per pixel, fit n·p = 1 over
the 5×5 neighborhood by solving the normal equations accumulated with a
zero-padded box filter, then normalize and orient toward the camera.  The
TPU implementation solves the CENTERED scatter system instead (see
_plane_normal_direction) — mathematically the same direction, numerically
stable in f32 — so it is pinned here three ways:

1. analytically (exact plane, quadratic surface),
2. against an f64 numpy oracle of the reference's literal uncentered
   algorithm (conv2d-style zero-padded sums + per-pixel solve of
   (Σppᵀ + 1e-6·I) n = Σp), border pixels included,
3. for orientation, batching, and degenerate-input behavior.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from unigeo_tpu.ops.normals import fix_normal, surface_normals_from_points


def _box_sum_zero_pad(img, patch):
    """f64 zero-padded patch sum — the reference's conv2d(ones, pad=p//2)."""
    pad = patch // 2
    padded = np.pad(img.astype(np.float64), pad)
    h, w = img.shape
    out = np.zeros((h, w), np.float64)
    for dy in range(patch):
        for dx in range(patch):
            out += padded[dy : dy + h, dx : dx + w]
    return out


def _reference_normals_f64(xyz, patch=5):
    """The reference algorithm verbatim, in f64 where it is stable:
    solve (Σppᵀ + 1e-6 I) n = Σp per pixel, normalize, orient toward cam
    (geometry_utils.py:9-70)."""
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    s = {
        "xx": _box_sum_zero_pad(x * x, patch),
        "yy": _box_sum_zero_pad(y * y, patch),
        "zz": _box_sum_zero_pad(z * z, patch),
        "xy": _box_sum_zero_pad(x * y, patch),
        "xz": _box_sum_zero_pad(x * z, patch),
        "yz": _box_sum_zero_pad(y * z, patch),
        "x": _box_sum_zero_pad(x, patch),
        "y": _box_sum_zero_pad(y, patch),
        "z": _box_sum_zero_pad(z, patch),
    }
    h, w = x.shape
    A = np.empty((h, w, 3, 3))
    A[..., 0, 0], A[..., 0, 1], A[..., 0, 2] = s["xx"], s["xy"], s["xz"]
    A[..., 1, 0], A[..., 1, 1], A[..., 1, 2] = s["xy"], s["yy"], s["yz"]
    A[..., 2, 0], A[..., 2, 1], A[..., 2, 2] = s["xz"], s["yz"], s["zz"]
    A += 1e-6 * np.eye(3)
    b = np.stack([s["x"], s["y"], s["z"]], axis=-1)
    n = np.linalg.solve(A, b[..., None])[..., 0]
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    flip = np.sum(n * xyz, axis=-1, keepdims=True) > 0
    return np.where(flip, -n, n)


def _angles_deg(a, b):
    dots = np.clip(np.abs(np.sum(a * b, axis=-1)), 0.0, 1.0)
    return np.degrees(np.arccos(dots))


def _grid_dirs(h, w, f=60.0):
    """Pinhole viewing-ray directions (cx = w/2, cy = h/2)."""
    u = (np.arange(w) - w / 2.0) / f
    v = (np.arange(h) - h / 2.0) / f
    uu, vv = np.meshgrid(u, v)
    return uu, vv


def test_exact_plane_recovered():
    """Points on a plane not through the origin → the exact unit normal at
    every INTERIOR pixel (border patches see zero-padding ghost points)."""
    h = w = 32
    uu, vv = _grid_dirs(h, w)
    n_true = np.array([0.3, -0.5, -0.8])
    n_true /= np.linalg.norm(n_true)
    d = 2.5  # plane n·p = d
    # depth along each pinhole ray so that n·(z·[u,v,1]) = d
    z = d / (n_true[0] * uu + n_true[1] * vv + n_true[2])
    xyz = np.stack([uu * z, vv * z, z], axis=-1).astype(np.float32)
    got = np.asarray(surface_normals_from_points(jnp.asarray(xyz)))
    # unit length everywhere
    np.testing.assert_allclose(
        np.linalg.norm(got, axis=-1), 1.0, atol=1e-5
    )
    interior = got[2:-2, 2:-2]
    ang = _angles_deg(interior, n_true)
    assert ang.max() < 0.1, f"max plane-normal error {ang.max():.4f} deg"
    # oriented toward the camera: dot(n, p) <= 0
    assert np.all(np.sum(got * xyz, axis=-1) <= 1e-6)


def test_sphere_normals_radial():
    """Points on a sphere → normals approximate the radial direction (the
    5×5 tangent-plane fit is first-order exact, curvature gives the slack)."""
    h = w = 48
    uu, vv = _grid_dirs(h, w, f=160.0)
    center = np.array([0.0, 0.0, 4.0])
    r = 1.0
    # ray p(t) = t·[u,v,1]; nearest sphere intersection
    dirs = np.stack([uu, vv, np.ones_like(uu)], axis=-1)
    dn = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    b = np.sum(dn * center, axis=-1)
    disc = b**2 - (np.sum(center**2) - r**2)
    assert np.all(disc > 0), "whole grid must see the sphere"
    t = b - np.sqrt(disc)
    xyz = (dn * t[..., None]).astype(np.float32)
    got = np.asarray(surface_normals_from_points(jnp.asarray(xyz)))
    radial = xyz - center
    radial /= np.linalg.norm(radial, axis=-1, keepdims=True)
    ang = _angles_deg(got[4:-4, 4:-4], radial[4:-4, 4:-4])
    assert np.median(ang) < 0.2 and ang.max() < 0.5, (
        f"sphere normals off: median {np.median(ang):.3f}, "
        f"max {ang.max():.3f} deg"
    )


def test_matches_reference_uncentered_solve_f64(rng):
    """Direction parity with the reference's literal algorithm, run in f64
    (where its uncentered system is still well-posed), on a smooth random
    surface — borders INCLUDED, since zero-padding semantics must agree."""
    h = w = 24
    uu, vv = _grid_dirs(h, w)
    # smooth random height field around 2 m
    base = rng.normal(size=(6, 6))
    zoom = np.kron(base, np.ones((4, 4)))  # blocky → smooth via box blur
    for _ in range(3):
        zoom = _box_sum_zero_pad(zoom, 3) / 9.0
    z = 2.0 + 0.3 * zoom[:h, :w]
    xyz = np.stack([uu * z, vv * z, z], axis=-1).astype(np.float32)

    want = _reference_normals_f64(xyz.astype(np.float64))
    got = np.asarray(surface_normals_from_points(jnp.asarray(xyz)))
    ang = _angles_deg(got, want)
    assert ang.max() < 0.2, f"reference-parity max error {ang.max():.4f} deg"


def test_batch_dims_and_patch_size():
    """Leading batch dims broadcast; patch_size=3 tightens the fit window."""
    h = w = 16
    uu, vv = _grid_dirs(h, w)
    z = np.full((h, w), 2.0)
    xyz = np.stack([uu * z, vv * z, z], axis=-1).astype(np.float32)
    batch = np.stack([xyz, xyz * 1.5])[None]  # [1, 2, H, W, 3]
    out = np.asarray(surface_normals_from_points(jnp.asarray(batch)))
    assert out.shape == batch.shape
    # frontoparallel plane z=const → normal ±z, toward camera = -z...
    # but the z=2 plane has n·p = 2 > 0 with n=+z, so orientation flips it.
    interior = out[0, :, 2:-2, 2:-2]
    np.testing.assert_allclose(
        interior, np.broadcast_to([0.0, 0.0, -1.0], interior.shape),
        atol=1e-4,
    )
    out3 = np.asarray(
        surface_normals_from_points(jnp.asarray(xyz), patch_size=3)
    )
    ang = _angles_deg(out3[1:-1, 1:-1], np.array([0.0, 0.0, -1.0]))
    assert ang.max() < 0.05


def test_degenerate_inputs_finite():
    """All-zero points (masked/invalid regions) must not produce NaNs."""
    xyz = np.zeros((8, 8, 3), np.float32)
    out = np.asarray(surface_normals_from_points(jnp.asarray(xyz)))
    assert np.all(np.isfinite(out))


def test_fix_normal_flips_away_facing():
    pos = np.array([[0.0, 0.0, 2.0], [0.0, 0.0, 2.0]], np.float32)
    nrm = np.array([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]], np.float32)
    out = np.asarray(fix_normal(jnp.asarray(nrm), jnp.asarray(pos)))
    # away-facing (dot > 0.01) flipped; camera-facing untouched
    np.testing.assert_allclose(out[0], [0.0, 0.0, -1.0])
    np.testing.assert_allclose(out[1], [0.0, 0.0, -1.0])
