"""Model interface: the prediction contract all model stacks implement.

Mirrors model/Readme.md:12-20 of the reference: a model is constructed with
``**model_params`` from the config and exposes ``forward(data) -> dict`` with
(any subset of):

  pred_world_pts  [Nf, H, W, 3]  world-space pointmaps, OpenCV, frame0=world
  pred_depths     [Nf, H, W]     per-frame depth
  pred_normals    [Nf, H, W, 3]  camera-space normals, OpenGL convention
                                 (the reference adapters flip their outputs
                                 to OpenGL, e.g. depthcrafter.py:57-59, and
                                 gt normals stay OpenGL in io_utils.py:34)
  pred_poses      [Nf, 4, 4]     camera-to-world, OpenCV

Unlike the reference's adapters (which wrap external torch checkpoints pinned
to cuda:0), implementations here are native JAX stacks executed through the
shared mesh executor.
"""

from __future__ import annotations

from typing import Any, Dict, Protocol, runtime_checkable

PREDICTION_KEYS = ("pred_world_pts", "pred_depths", "pred_normals", "pred_poses")


@runtime_checkable
class GeometryModel(Protocol):
    def forward(self, data: Dict[str, Any]) -> Dict[str, Any]:
        ...
