"""DeepSeek-V2-Lite-style MoE decoder model (the flagship serving model).

Pure-functional: ``init_params`` builds the quantized parameter pytree;
``forward`` runs prefill or decode over an int8 KV cache. All large matmuls
go through the framework's fp8 Pallas kernels; the first
``first_dense_layers`` layers use a dense SwiGLU FFN (DeepSeek-V2
convention), the rest MoE.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from .attention import AttentionParams, KVCache, attention
from .config import ModelConfig
from .layers import Fp8Linear, rms_norm
from .moe import MoEParams, _swiglu, moe_block


@dataclasses.dataclass
class DenseFFN:
    w1: Fp8Linear     # (hidden, 2·inter)
    w2: Fp8Linear     # (inter, hidden)

    @classmethod
    def create(cls, key, hidden: int, inter: int) -> "DenseFFN":
        k1, k2 = jax.random.split(key)
        return cls(w1=Fp8Linear.create(k1, hidden, 2 * inter),
                   w2=Fp8Linear.create(k2, inter, hidden))

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.w2(_swiglu(self.w1(x)))


@dataclasses.dataclass
class LayerParams:
    attn_norm: jax.Array
    attn: AttentionParams
    ffn_norm: jax.Array
    ffn: object            # DenseFFN | MoEParams


@dataclasses.dataclass
class ModelParams:
    embed: jax.Array       # (vocab, hidden) bf16
    layers: List[LayerParams]
    final_norm: jax.Array
    lm_head: jax.Array     # (hidden, vocab) bf16


for _cls, _data in [
    (DenseFFN, ["w1", "w2"]),
    (LayerParams, ["attn_norm", "attn", "ffn_norm", "ffn"]),
    (ModelParams, ["embed", "layers", "final_norm", "lm_head"]),
]:
    jax.tree_util.register_dataclass(_cls, data_fields=_data, meta_fields=[])


def init_params(key, cfg: ModelConfig) -> ModelParams:
    keys = jax.random.split(key, cfg.num_layers + 2)
    layers = []
    for i in range(cfg.num_layers):
        lk = jax.random.split(keys[i], 2)
        if i < cfg.first_dense_layers:
            ffn = DenseFFN.create(lk[1], cfg.hidden_size,
                                  cfg.dense_intermediate)
        else:
            ffn = MoEParams.create(lk[1], cfg)
        layers.append(LayerParams(
            attn_norm=jnp.ones((cfg.hidden_size,), jnp.bfloat16),
            attn=AttentionParams.create(lk[0], cfg),
            ffn_norm=jnp.ones((cfg.hidden_size,), jnp.bfloat16),
            ffn=ffn,
        ))
    embed = (jax.random.normal(keys[-2], (cfg.vocab_size, cfg.hidden_size),
                               jnp.float32) * 0.02).astype(jnp.bfloat16)
    lm_head = (jax.random.normal(keys[-1], (cfg.hidden_size, cfg.vocab_size),
                                 jnp.float32) * 0.02).astype(jnp.bfloat16)
    return ModelParams(embed=embed, layers=layers,
                       final_norm=jnp.ones((cfg.hidden_size,), jnp.bfloat16),
                       lm_head=lm_head)


def params_with_int8_experts(params: ModelParams) -> ModelParams:
    """Re-quantize every MoE layer's fp8 experts to W8A8 int8
    (moe.int8_experts_from_fp8) — the deployed-checkpoint conversion path
    to the 2× int8 MXU rate. Dense-FFN layers and already-int8 experts
    pass through unchanged."""
    from .moe import ExpertWeights, int8_experts_from_fp8

    def conv(layer: LayerParams) -> LayerParams:
        ffn = layer.ffn
        if isinstance(ffn, MoEParams) and isinstance(ffn.experts,
                                                     ExpertWeights):
            ffn = dataclasses.replace(
                ffn, experts=int8_experts_from_fp8(ffn.experts))
        return dataclasses.replace(layer, ffn=ffn)

    return dataclasses.replace(params,
                               layers=[conv(l) for l in params.layers])


def init_cache(cfg: ModelConfig, batch: int,
               max_seq: Optional[int] = None) -> List[KVCache]:
    max_seq = max_seq or cfg.max_seq_len
    return [KVCache.create(batch, max_seq, cfg.num_kv_heads, cfg.head_dim)
            for _ in range(cfg.num_layers)]


def forward(
    params: ModelParams,
    tokens: jax.Array,          # (batch, s) int32
    caches: List[KVCache],
    positions: jax.Array,       # (batch, s) int32
    seq_lens: jax.Array,        # (batch,) valid length AFTER this step
    cfg: ModelConfig,
    prefill_start: Optional[jax.Array] = None,
) -> Tuple[jax.Array, List[KVCache]]:
    """Returns (logits (batch, s, vocab) f32, updated caches).

    ``prefill_start`` (batch,) asserts positions are consecutive from it
    (row i at prefill_start + i) — enables the flash prefill kernel.
    """
    b, s = tokens.shape
    x = params.embed[tokens]                     # (b, s, hidden) bf16
    new_caches = []
    for layer, cache in zip(params.layers, caches):
        h = rms_norm(x, layer.attn_norm, cfg.rms_eps)
        attn_out, cache = attention(layer.attn, h, cache, positions,
                                    seq_lens, cfg,
                                    prefill_start=prefill_start)
        new_caches.append(cache)
        x = x + attn_out
        h = rms_norm(x, layer.ffn_norm, cfg.rms_eps)
        if isinstance(layer.ffn, MoEParams):
            flat = h.reshape(b * s, cfg.hidden_size)
            ffn_out = moe_block(layer.ffn, flat, cfg).reshape(b, s, -1)
        else:
            ffn_out = layer.ffn(h)
        x = x + ffn_out
    x = rms_norm(x, params.final_norm, cfg.rms_eps)
    logits = jnp.dot(x, params.lm_head, preferred_element_type=jnp.float32)
    return logits, new_caches


def decode_step(
    params: ModelParams,
    tokens: jax.Array,          # (batch,) int32 — one token per sequence
    caches: List[KVCache],
    seq_lens: jax.Array,        # (batch,) length BEFORE this step
    cfg: ModelConfig,
) -> Tuple[jax.Array, List[KVCache]]:
    """One decode step: returns (next-token logits (batch, vocab), caches)."""
    positions = seq_lens[:, None]                       # write slot
    logits, caches = forward(params, tokens[:, None], caches, positions,
                             seq_lens + 1, cfg)
    return logits[:, 0], caches


def generate_greedy_scan(
    params: ModelParams,
    tokens: jax.Array,          # (batch,) int32 current tokens
    caches: List[KVCache],
    seq_lens: jax.Array,
    cfg: ModelConfig,
    steps: int,
) -> Tuple[jax.Array, List[KVCache]]:
    """Device-side greedy decode of ``steps`` tokens via lax.scan — one
    dispatch for the whole generation (benchmark/throughput path; the
    serving engine uses per-step dispatch for continuous batching)."""

    def body(carry, _):
        toks, caches, lens = carry
        logits, caches = decode_step(params, toks, caches, lens, cfg)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (nxt, caches, lens + 1), nxt

    (_, caches, _), toks = jax.lax.scan(
        body, (tokens, caches, seq_lens), None, length=steps)
    return toks.T, caches  # (batch, steps)
