"""TPU compute primitives: Pallas kernels and geometry ops."""

from unigeo_tpu.ops.knn import knn, nearest_neighbor  # noqa: F401
