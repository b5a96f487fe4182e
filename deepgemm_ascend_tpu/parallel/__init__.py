from .mesh import AXES, init_distributed, make_mesh, replicated, shard
from .overlap import all_gather_gemm, gemm_reduce_scatter
from .ring_attention import (ring_attention_prefill, ring_flash_prefill,
                             zigzag_inverse, zigzag_order)
from .sharded import (cache_specs, make_sharded_decode_step,
                      make_sharded_prefill_step, param_specs, shard_caches,
                      shard_params, tp_kv_sharding)

__all__ = [
    "AXES", "init_distributed", "make_mesh", "replicated", "shard",
    "all_gather_gemm", "gemm_reduce_scatter", "ring_attention_prefill",
    "ring_flash_prefill", "zigzag_inverse", "zigzag_order",
    "cache_specs", "make_sharded_decode_step", "make_sharded_prefill_step",
    "param_specs", "shard_caches", "shard_params", "tp_kv_sharding",
]
