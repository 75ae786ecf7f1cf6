"""Model stacks (reference: model/__init__.py:1-5).

Importing this package registers every model class in the registry.
"""

from unigeo_tpu.models.base import GeometryModel, PREDICTION_KEYS  # noqa: F401
from unigeo_tpu.models import aether  # noqa: F401
from unigeo_tpu.models import identity  # noqa: F401
from unigeo_tpu.models import chronodepth  # noqa: F401
from unigeo_tpu.models import depthanyvideo  # noqa: F401
from unigeo_tpu.models import depthcrafter  # noqa: F401
from unigeo_tpu.models import pointmap  # noqa: F401
from unigeo_tpu.models import stablenormal  # noqa: F401
from unigeo_tpu.models import unigeo_cam  # noqa: F401
from unigeo_tpu.models import vda  # noqa: F401
