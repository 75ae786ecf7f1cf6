"""Tests for trajectory evaluation (Umeyama ATE + RPE).

Golden values come from analytic constructions: a trajectory related to GT by
an exact Sim(3) transform must score ~0 ATE; known perturbations produce
predictable errors; an independent scipy-based Umeyama cross-checks the
alignment.
"""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from unigeo_tpu.metrics.camera import (
    camera_pose_evaluation,
    umeyama_alignment,
    rotation_angle_deg,
    matrix_to_quaternion,
    quaternion_to_matrix,
    get_tum_poses,
)


def _random_trajectory(rng, n=12):
    poses = []
    pos = np.zeros(3)
    R = np.eye(3)
    for _ in range(n):
        step_rot = Rotation.from_rotvec(rng.normal(0, 0.1, 3)).as_matrix()
        R = R @ step_rot
        pos = pos + rng.normal(0, 0.3, 3)
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = pos
        poses.append(T)
    return np.stack(poses).astype(np.float32)


def _apply_sim3(poses, R, t, c):
    out = poses.copy()
    out[:, :3, :3] = R @ poses[:, :3, :3]
    out[:, :3, 3] = c * poses[:, :3, 3] @ R.T + t
    return out


def test_exact_sim3_transform_scores_zero(rng):
    gt = _random_trajectory(rng)
    R = Rotation.from_rotvec([0.3, -0.2, 0.5]).as_matrix().astype(np.float32)
    pred = _apply_sim3(gt, R, np.array([1.0, -2.0, 0.5], np.float32), 3.7)
    ate, rpe_t, rpe_r = camera_pose_evaluation(pred, gt)
    assert ate < 1e-3
    assert rpe_t < 1e-3
    assert rpe_r < 0.1


def test_umeyama_recovers_known_transform(rng):
    src = rng.normal(size=(50, 3)).astype(np.float32)
    R_true = Rotation.from_rotvec([0.1, 0.7, -0.3]).as_matrix()
    c_true, t_true = 2.5, np.array([3.0, -1.0, 0.2])
    dst = c_true * src @ R_true.T + t_true
    # jitted f32 path: SVD precision bounds the error around ~1e-3
    R, t, c = umeyama_alignment(jnp.asarray(src), jnp.asarray(dst))
    assert np.allclose(np.asarray(R), R_true, atol=5e-3)
    assert np.allclose(np.asarray(t), t_true, atol=5e-3)
    assert np.isclose(float(c), c_true, rtol=5e-3)
    # host f64 path (used by camera_pose_evaluation): tight
    from unigeo_tpu.metrics.camera import _umeyama_np

    R64, t64, c64 = _umeyama_np(src.astype(np.float64), dst.astype(np.float64))
    assert np.allclose(R64, R_true, atol=1e-9)
    assert np.allclose(t64, t_true, atol=1e-8)
    assert np.isclose(c64, c_true, rtol=1e-10)


def test_rpe_rot_known_perturbation(rng):
    gt = _random_trajectory(rng, n=10)
    pred = gt.copy()
    # perturb every second rotation by exactly 2 degrees
    delta = Rotation.from_rotvec([0, np.deg2rad(2.0), 0]).as_matrix()
    for i in range(1, 10, 2):
        pred[i, :3, :3] = pred[i, :3, :3] @ delta
    _, _, rpe_rot = camera_pose_evaluation(pred, gt)
    # every consecutive pair sees a 2° relative-rotation error
    assert 1.5 < rpe_rot < 2.5


def test_rotation_angle_deg():
    R = Rotation.from_rotvec([0, 0, np.deg2rad(37.0)]).as_matrix()
    angle = float(rotation_angle_deg(jnp.asarray(R[None]))[0])
    assert np.isclose(angle, 37.0, atol=1e-3)


def test_quaternion_roundtrip(rng):
    Rm = Rotation.random(20, random_state=7).as_matrix().astype(np.float32)
    q = matrix_to_quaternion(jnp.asarray(Rm))
    Rback = np.asarray(quaternion_to_matrix(q))
    assert np.allclose(Rback, Rm, atol=1e-4)
    # cross-check convention against scipy (x,y,z,w) ordering
    q_scipy = Rotation.from_matrix(Rm).as_quat()  # xyzw
    q_ours = np.asarray(q)  # wxyz
    dots = np.abs(
        q_ours[:, 0] * q_scipy[:, 3]
        + np.sum(q_ours[:, 1:] * q_scipy[:, :3], axis=1)
    )
    assert np.allclose(dots, 1.0, atol=1e-5)


def test_get_tum_poses_shape(rng):
    poses = _random_trajectory(rng, n=5)
    tum, tt = get_tum_poses(poses)
    assert tum.shape == (5, 7)
    assert np.allclose(tum[:, :3], poses[:, :3, 3])
    assert np.allclose(tt, np.arange(5.0))
