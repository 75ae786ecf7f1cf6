"""Vectorized JAX metrics suite (reference: metrics/__init__.py:1-5)."""

from unigeo_tpu.metrics.camera import camera_pose_evaluation  # noqa: F401
from unigeo_tpu.metrics.depth import depth_evaluation  # noqa: F401
from unigeo_tpu.metrics.manager import MetricsManager  # noqa: F401
from unigeo_tpu.metrics.normal import normal_evaluation  # noqa: F401
from unigeo_tpu.metrics.pointcloud import pcd_evaluation  # noqa: F401
