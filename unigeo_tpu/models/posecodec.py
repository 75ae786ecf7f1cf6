"""7-DoF pose encoding (absT_quaR): [tx ty tz qw qx qy qz] ↔ 4×4 c2w.

(reference: metrics/camera.py:273-348 — the encoding CUT3R's pose head
emits, decoded by the adapter at model/cut3r.py:64-68.)
"""

from __future__ import annotations

import jax.numpy as jnp

from unigeo_tpu.metrics.camera import matrix_to_quaternion, quaternion_to_matrix


def camera_to_pose_encoding(c2w):
    """[..., 4, 4] → [..., 7] (absT_quaR)."""
    t = c2w[..., :3, 3]
    q = matrix_to_quaternion(c2w[..., :3, :3])
    return jnp.concatenate([t, q], axis=-1)


def pose_encoding_to_camera(enc):
    """[..., 7] (absT_quaR) → [..., 4, 4] camera-to-world."""
    t = enc[..., :3]
    R = quaternion_to_matrix(enc[..., 3:7])
    batch = enc.shape[:-1]
    eye = jnp.broadcast_to(jnp.eye(4), batch + (4, 4))
    out = eye.at[..., :3, :3].set(R).at[..., :3, 3].set(t)
    return out
