"""Model configuration for the serving slice.

DeepSeek-V2-Lite-style geometry (the north-star E2E workload): MoE decoder
with FP8 weights and INT8 KV-cache. The reference repo has no model layer
(SURVEY.md §1 "absent" list) — this realizes BASELINE.json config 5.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    vocab_size: int = 32768
    hidden_size: int = 2048
    num_layers: int = 4
    num_heads: int = 16
    num_kv_heads: int = 4            # GQA
    head_dim: int = 128
    # MoE (DeepSeek-V2-Lite: 64 routed + 2 shared, top-6, inter 1408)
    num_experts: int = 16
    num_shared_experts: int = 1
    top_k: int = 4
    moe_intermediate: int = 1408
    first_dense_layers: int = 1      # dense FFN for the first k layers
    dense_intermediate: int = 5632
    rope_theta: float = 10000.0
    rms_eps: float = 1e-6
    max_seq_len: int = 4096
    # quantization
    fp8_weights: bool = True
    int8_kv: bool = True
    # Attention kernels: Pallas streaming int8-cache kernels — flash_decode
    # (s == 1) AND flash_prefill (s > 1, consecutive positions) — vs the
    # XLA dequantize-in-contraction fallback. One switch on purpose: both
    # kernels share the same numerics (bf16 dots, scales folded into the
    # score/probability matrices), so either you serve with kernel numerics
    # or with XLA f32 numerics, never a mix per phase.
    use_flash_decode: bool = True

    @property
    def q_dim(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def kv_dim(self) -> int:
        return self.num_kv_heads * self.head_dim


# Small config for tests / dry runs. head_dim = 128 so kv_dim/tp stays
# lane-legal at tp = 2 — the dryrun then exercises the congruent kv-sharded
# flash-decode path (parallel/sharded.py tp_kv_sharding), like real models.
TINY = ModelConfig(
    vocab_size=512, hidden_size=256, num_layers=2, num_heads=4,
    num_kv_heads=2, head_dim=128, num_experts=8, num_shared_experts=1,
    top_k=2, moe_intermediate=256, first_dense_layers=1,
    dense_intermediate=512, max_seq_len=256)

# DeepSeek-V2-Lite-like (for benches; fits one v5e chip in fp8)
V2_LITE = ModelConfig(
    vocab_size=32768, hidden_size=2048, num_layers=8, num_heads=16,
    num_kv_heads=4, head_dim=128, num_experts=32, num_shared_experts=1,
    top_k=6, moe_intermediate=1408, first_dense_layers=1,
    dense_intermediate=11008, max_seq_len=4096)  # 86*128 (fp8 lane contract)

# Dense (Llama-style) family: every layer uses the dense SwiGLU FFN —
# first_dense_layers == num_layers short-circuits the MoE machinery, so the
# same stack serves GQA dense decoders (checkpoint loader included: the HF
# name map's dense branch is exactly Llama's).
LLAMA_LIKE = ModelConfig(
    vocab_size=32768, hidden_size=2048, num_layers=8, num_heads=16,
    num_kv_heads=4, head_dim=128, num_experts=0, num_shared_experts=0,
    top_k=0, moe_intermediate=0, first_dense_layers=8,
    dense_intermediate=5632, max_seq_len=4096)

# Full DeepSeek-V2-Lite geometry (HF deepseek-ai/DeepSeek-V2-Lite, GQA
# approximation of its MLA): 27 MoE layers over 64+2 experts. Needs a
# multi-chip mesh for real weights (~16B params fp8); congruent kv-head
# sharding holds to tp = 16.
V2_LITE_FULL = ModelConfig(
    vocab_size=102400, hidden_size=2048, num_layers=27, num_heads=16,
    num_kv_heads=16, head_dim=128, num_experts=64, num_shared_experts=2,
    top_k=6, moe_intermediate=1408, first_dense_layers=1,
    dense_intermediate=10944, max_seq_len=4096)

# DeepSeek-V3/R1-scale geometry (config.json of deepseek-ai/DeepSeek-V3,
# GQA stand-in for MLA): serving it takes a pod-scale mesh — ep up to 32
# (256 % ep == 0), tp up to 16 under the congruent-kv rule, dp over hosts.
# Here as the sizing/sharding reference config; the stack is geometry-
# agnostic (same layers, same kernels).
V3_STYLE = ModelConfig(
    vocab_size=129280, hidden_size=7168, num_layers=61, num_heads=128,
    num_kv_heads=16, head_dim=128, num_experts=256, num_shared_experts=1,
    top_k=8, moe_intermediate=2048, first_dense_layers=3,
    dense_intermediate=18432, max_seq_len=8192)

TINY_DENSE = ModelConfig(
    vocab_size=512, hidden_size=256, num_layers=2, num_heads=4,
    num_kv_heads=2, head_dim=64, num_experts=0, num_shared_experts=0,
    top_k=0, moe_intermediate=0, first_dense_layers=2,
    dense_intermediate=512, max_seq_len=256)
