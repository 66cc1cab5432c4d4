from infinitensor_tpu.parallel.mesh import make_mesh, local_mesh
from infinitensor_tpu.parallel.placement import Replicate, Shard, Partial
from infinitensor_tpu.parallel.llama_sharding import (
    llama_param_specs, llama_cache_specs, shard_llama,
)

__all__ = [
    "make_mesh", "local_mesh", "Replicate", "Shard", "Partial",
    "llama_param_specs", "llama_cache_specs", "shard_llama",
]
