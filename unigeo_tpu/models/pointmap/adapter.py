"""Shared device-resident plumbing for the pointmap adapters.

The reference adapters (model/spann3r.py:36-56, model/cut3r.py:60-95,
model/dust3r.py) run network → focal/PnP → normals as separate torch/cv2
stages with host hops between them.  On the tunneled TPU backend that
pattern costs more than the network itself (tools/ablate_spann3r.py,
round 5: 6.1 s/clip of which only 0.37 s was the ViT — the rest was host
numpy passes over 47 MB clips, per-op dispatch of the eager camera glue,
and repeated device↔host transfers).

Here every adapter compiles ONE program: raw [T, 3, H, W] 0..255 frames in,
the full prediction dict out; the host touches the clip exactly twice (one
upload, one download).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from unigeo_tpu import coords
from unigeo_tpu.models.camera_solver import solve_depth_and_camera_from_pointmaps
from unigeo_tpu.ops.normals import surface_normals_from_points

# OpenCV → OpenGL normal flip (the output contract keeps normals OpenGL,
# models/base.py)
OPENGL_FLIP = (1.0, -1.0, -1.0)


def frames_from_raw(raw):
    """Traced: raw [T, 3, H, W] float32 0..255 → [T, H, W, 3] in 0..1.

    The transpose + scale run on device — doing this in host numpy was two
    full passes over a 47 MB clip on a 1-core host.
    """
    return jnp.moveaxis(raw, 1, -1) / 255.0


def outputs_from_world_pts(pts, conf) -> Dict[str, jnp.ndarray]:
    """Traced: world pointmaps [T, H, W, 3] (+conf) → the full adapter
    output dict (camera recovery + depths + OpenGL normals + c2w poses),
    mirroring reference model/spann3r.py:41-56."""
    cam_pts, extrinsics, _ = solve_depth_and_camera_from_pointmaps(pts)
    normals_gl = surface_normals_from_points(cam_pts) * jnp.asarray(
        OPENGL_FLIP, cam_pts.dtype
    )
    return {
        "pred_world_pts": pts,
        "pred_depths": cam_pts[..., 2],
        "pred_normals": normals_gl,
        "pred_poses": coords.se3_inverse(extrinsics),  # c2w (OpenCV)
        "pred_conf": conf,
    }


def raw_clip(data: Dict[str, Any]) -> np.ndarray:
    """data["images"] → contiguous float32 [T, 3, H, W] 0..255 (no other
    host-side passes — normalization happens on device)."""
    return np.ascontiguousarray(np.asarray(data["images"], dtype=np.float32))


class BatchedPointmapForward:
    """forward_batch mixin for the pointmap adapters (evaluator dp path,
    SURVEY §2.7): same-shape clips stack to [B, T, 3, H, W] and run as ONE
    vmapped program, with the batch axis sharded over the mesh's dp axis
    when more than one device is visible.  Heterogeneous shapes fall back
    to serial forward (same contract as the SVD family)."""

    @property
    def eval_batch_size(self) -> int:
        n = jax.device_count()
        return n if n > 1 else 1

    def forward_batch(self, datas):
        raws = [raw_clip(d) for d in datas]
        if len(raws) == 1 or len({r.shape for r in raws}) != 1:
            return [self.forward(d) for d in datas]
        if getattr(self, "_forward_full_batched", None) is None:
            # _full_fn is the untraced per-clip program each adapter
            # stores next to its jitted _forward_full
            self._forward_full_batched = jax.jit(
                jax.vmap(self._full_fn, in_axes=(None, 0))
            )
        batch = np.stack(raws)
        if len(jax.devices()) > 1 and batch.shape[0] % len(jax.devices()) == 0:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec

            devs = np.array(jax.devices())
            mesh = Mesh(devs, ("dp",))
            batch = jax.device_put(
                batch, NamedSharding(mesh, PartitionSpec("dp")))
        outs = self._forward_full_batched(self.params, batch)
        host = fetch_outputs(outs)
        return [
            {k: (float(v[i]) if np.ndim(v[i]) == 0 else v[i])
             for k, v in host.items()}
            for i in range(len(datas))
        ]


def fetch_outputs(outs: Dict[str, jnp.ndarray]) -> Dict[str, np.ndarray]:
    """One device→host pass for the whole output dict.

    f16-transferred fields (see downcast_for_transfer) are widened back to
    the contract's float32 on host.
    """
    host = jax.device_get(outs)
    return {
        k: (np.asarray(v, np.float32)
            if getattr(v, "dtype", None) == np.float16 else np.asarray(v))
        for k, v in host.items()
    }


# --- optional half-precision transfers --------------------------------------
#
# The dev tunnel moves ~25-40 MB/s with no overlap against compute
# (tools/ablate_spann3r.py round 5), so a 384×512 20-frame clip's f32
# outputs (~126 MB) cost ~3 s — 7× the whole fused device program.  The
# reference stacks run fp16 end-to-end (reference model/depthcrafter.py:21),
# so shipping the bulky prediction fields at f16 (~5e-4 relative) stays
# within reference numerics; depths and poses (the headline depth/pose
# metrics) always stay f32.

TRANSFER_DOWNCAST_KEYS = ("pred_world_pts", "pred_normals", "pred_conf")


def resolve_compute_dtype(arg: Optional[str]):
    """Config value → jnp dtype for the NETWORK compute path, or None
    (float32, the exactness default).  The reference stacks run fp16
    (model/depthcrafter.py:21); bfloat16 is the TPU-native equivalent —
    params are cast once at load, frames at the program boundary, and the
    predicted pointmaps are widened back to f32 BEFORE camera recovery
    (DLT/eigh and normals always run f32)."""
    val = os.environ.get("UNIGEO_COMPUTE_DTYPE") or arg
    if val in (None, "", "float32", "f32"):
        return None
    if val in ("bfloat16", "bf16"):
        return jnp.bfloat16
    raise ValueError(
        f"compute_dtype must be float32 or bfloat16, got {val!r}"
    )


def cast_params(params, dtype):
    """Cast the float leaves of a param tree to the compute dtype (once, at
    adapter construction — also halves param HBM)."""
    if dtype is None:
        return params
    return jax.tree.map(
        lambda a: a.astype(dtype)
        if jnp.issubdtype(a.dtype, jnp.floating) else a,
        params,
    )


def resolve_transfer_dtype(arg: Optional[str]):
    """Config value (+ UNIGEO_TRANSFER_DTYPE env override) → jnp dtype or
    None (full f32 transfers, the default)."""
    val = os.environ.get("UNIGEO_TRANSFER_DTYPE") or arg
    if val in (None, "", "float32", "f32"):
        return None
    if val in ("float16", "f16"):
        return jnp.float16
    raise ValueError(
        f"transfer_dtype must be float32 or float16, got {val!r}"
    )


def downcast_for_transfer(outs: Dict[str, jnp.ndarray], dtype):
    """Traced: downcast the bulky fields for the device→host hop."""
    if dtype is None:
        return outs
    return {
        k: (v.astype(dtype) if k in TRANSFER_DOWNCAST_KEYS else v)
        for k, v in outs.items()
    }
