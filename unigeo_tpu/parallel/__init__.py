"""Mesh, sharding rules, sharded executor, diffusion trainer."""

from unigeo_tpu.parallel.mesh import make_mesh  # noqa: F401
from unigeo_tpu.parallel.sharding import param_spec, shard_params  # noqa: F401
