"""Dataset layer: clip core + loaders (reference: dataset/__init__.py:1-6).

Importing this package registers every dataset class in the registry.
"""

from unigeo_tpu.data.base import ClipDataset, SceneIndex, slice_clips  # noqa: F401
from unigeo_tpu.data.sample import prepare_gt_label, validate_sample  # noqa: F401
from unigeo_tpu.data import synthetic  # noqa: F401
from unigeo_tpu.data import loaders  # noqa: F401
from unigeo_tpu.data import hypersim  # noqa: F401
