from .mesh import AXES, init_distributed, make_mesh, replicated, shard
from .sharded import (cache_specs, make_sharded_decode_step,
                      make_sharded_prefill_step, param_specs, shard_caches,
                      shard_params, tp_kv_sharding)

__all__ = [
    "AXES", "init_distributed", "make_mesh", "replicated", "shard",
    "cache_specs", "make_sharded_decode_step", "make_sharded_prefill_step",
    "param_specs", "shard_caches", "shard_params", "tp_kv_sharding",
]
