"""Camera-solver tests: focal recovery and PnP against synthetic geometry."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from unigeo_tpu.models.camera_solver import (
    estimate_focal_weiszfeld,
    solve_pnp_batch,
    solve_depth_and_camera_from_pointmaps,
)


def _make_scene(rng, nf=3, h=24, w=32, focal=40.0):
    """Synthetic world pointmaps consistent with known cameras."""
    K = np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]], np.float32)
    uu, vv = np.meshgrid(np.arange(w), np.arange(h), indexing="xy")
    depth = 2.0 + rng.uniform(0, 0.5, size=(nf, h, w))
    extr = []
    pts_world = []
    for i in range(nf):
        x = (uu - K[0, 2]) * depth[i] / K[0, 0]
        y = (vv - K[1, 2]) * depth[i] / K[1, 1]
        cam_pts = np.stack([x, y, depth[i]], -1)
        R = Rotation.from_rotvec(rng.normal(0, 0.05, 3)).as_matrix()
        t = rng.normal(0, 0.2, 3)
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = t  # world-to-camera
        world = (cam_pts.reshape(-1, 3) - t) @ R  # R^T (cam - t)
        extr.append(T)
        pts_world.append(world.reshape(h, w, 3))
    return np.stack(pts_world).astype(np.float32), np.stack(extr).astype(np.float32), K


def test_focal_recovery(rng):
    pts, extr, K = _make_scene(rng, nf=1)
    # frame 0 in camera coords: transform world → cam with extr[0]
    cam = pts[0] @ extr[0, :3, :3].T + extr[0, :3, 3]
    f = float(estimate_focal_weiszfeld(jnp.asarray(cam)))
    assert abs(f - K[0, 0]) / K[0, 0] < 0.02


def test_pnp_recovers_extrinsics(rng):
    pts, extr, K = _make_scene(rng)
    T = np.asarray(solve_pnp_batch(jnp.asarray(pts), jnp.asarray(K)))
    for i in range(len(extr)):
        # rotation error in degrees
        dR = T[i, :3, :3] @ extr[i, :3, :3].T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 0.5, (i, ang)
        assert np.linalg.norm(T[i, :3, 3] - extr[i, :3, 3]) < 0.02


def test_solve_depth_and_camera_pipeline(rng):
    pts, extr, K = _make_scene(rng, nf=2, focal=40.0)
    cam_pts, T, intr = solve_depth_and_camera_from_pointmaps(jnp.asarray(pts))
    assert cam_pts.shape == pts.shape
    assert np.asarray(cam_pts[..., 2]).min() > 0  # positive depths
    assert T.shape == (2, 4, 4)
    assert np.isfinite(np.asarray(T)).all()


def test_solver_vmapped_matches_serial(rng):
    """The batched (vmap-over-clips) adapter path must agree with the
    serial solve on WELL-POSED pointmaps (ill-posed inputs may flip the
    DLT eigenvector between lowerings — that is the geometry's fault)."""
    import jax

    pts, extr, K = _make_scene(rng, nf=3)
    batch = jnp.stack([jnp.asarray(pts)] * 2)
    cam_b, ext_b, _ = jax.vmap(solve_depth_and_camera_from_pointmaps)(batch)
    cam_s, ext_s, _ = solve_depth_and_camera_from_pointmaps(jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(ext_b[0]), np.asarray(ext_s),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(cam_b[1]), np.asarray(cam_s),
                               rtol=1e-3, atol=1e-3)
