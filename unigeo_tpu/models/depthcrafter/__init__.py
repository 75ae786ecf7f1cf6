"""DepthCrafter/SVD stack: VAE, spatio-temporal UNet, scheduler, pipeline."""

from unigeo_tpu.models.depthcrafter.model import DepthCrafter  # noqa: F401
from unigeo_tpu.models.depthcrafter.pipeline import (  # noqa: F401
    DepthCrafterPipeline,
    tiny_pipeline,
)
from unigeo_tpu.models.depthcrafter.scheduler import EulerDiscreteScheduler  # noqa: F401
from unigeo_tpu.models.depthcrafter.unet import UNetSpatioTemporal  # noqa: F401
from unigeo_tpu.models.depthcrafter.vae import AutoencoderKLTemporal  # noqa: F401
