"""Offline preprocessors (L0): GT rendering and sensor registration."""

from unigeo_tpu.preprocess.rasterizer import rasterize_mesh  # noqa: F401
from unigeo_tpu.preprocess.sevenscenes import register_depth_to_rgb  # noqa: F401
