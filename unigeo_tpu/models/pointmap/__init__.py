"""Feed-forward pointmap regressors (DUSt3R/Spann3R/CUT3R-class)."""

from unigeo_tpu.models.pointmap.cut3r import Cut3R, tiny_cut3r_config  # noqa: F401
from unigeo_tpu.models.pointmap.dust3r import Dust3R, tiny_dust3r_config  # noqa: F401
from unigeo_tpu.models.pointmap.spann3r import Spann3R, tiny_spann3r_config  # noqa: F401
