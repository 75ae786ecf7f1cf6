"""UniGeo-TPU: a TPU-native unified video-geometry estimation & evaluation framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of
SunYangtian/UniGeo (reference: /root/reference): a config-driven pipeline that
runs video geometry models (DepthCrafter-style SVD video-diffusion depth,
StableNormal-class diffusion normals, Spann3R/CUT3R-class feed-forward pointmap
regression) over sliding-window clips from indoor RGB-D datasets and scores
depth / surface-normal / point-cloud / camera-pose quality with a shared,
fully-vectorized JAX metrics suite.

Layering (bottom → top), mirroring SURVEY.md §1:
  - ``unigeo_tpu.coords``    — the single source of truth for OpenGL/OpenCV
    conventions and SE(3) helpers (reference scatters these across ≥10 files).
  - ``unigeo_tpu.ops``       — TPU compute primitives (Pallas attention,
    surface normals, backprojection, resize, brute-force NN).
  - ``unigeo_tpu.metrics``   — depth/normal/pointcloud/camera metrics
    (reference: metrics/*.py), pure JAX, no scipy/open3d/evo/cv2.
  - ``unigeo_tpu.data``      — dataset core + loaders emitting stacked
    [Nf, ...] clip arrays (reference: dataset/).
  - ``unigeo_tpu.models``    — native JAX model stacks (reference: model/
    adapters around external torch checkpoints).
  - ``unigeo_tpu.parallel``  — device mesh, sharded executor, train step.
  - ``unigeo_tpu.config``    — YAML config system with reference schema parity
    (reference: configs/config_utils.py).
"""

__version__ = "0.1.0"

from unigeo_tpu import coords  # noqa: F401
