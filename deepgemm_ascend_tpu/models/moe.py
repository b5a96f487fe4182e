"""MoE block: top-k routing + masked grouped FP8 GEMM experts.

DeepSeek-style: routed experts + always-on shared expert(s), SwiGLU inside
each expert, FP8 blockwise weights. Dispatch uses the fixed-shape masked
grouped kernel (ops/grouped_gemm.py) for BOTH prefill and decode so the
whole step stays shape-static under jit (the "CUDA-graph-style" property
BASELINE.json asks for): capacity per expert = total token count, masked_m
says how many slots are real.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import GemmConfig
from ..ops import grouped_gemm as gg
from ..ops import quant
from .config import ModelConfig
from .layers import BF16Linear, Fp8Linear


@dataclasses.dataclass
class ExpertWeights:
    """Per-expert SwiGLU weights, fp8 blockwise.

    w1: (E, hidden, 2·inter) gate∥up fused; w2: (E, inter, hidden).
    Scales are lane-expanded once at creation (static weights).
    """

    w1_q: jax.Array
    w1_s: jax.Array      # (E, hidden/128, 2·inter) f32, lane-expanded
    w2_q: jax.Array
    w2_s: jax.Array

    @classmethod
    def create(cls, key, e: int, hidden: int, inter: int) -> "ExpertWeights":
        k1, k2 = jax.random.split(key)
        s1 = 1.0 / (hidden ** 0.5)
        s2 = 1.0 / (inter ** 0.5)
        w1 = jax.random.normal(k1, (e, hidden, 2 * inter), jnp.float32) * s1
        w2 = jax.random.normal(k2, (e, inter, hidden), jnp.float32) * s2
        w1_q, w1_bs = quant.quantize_fp8_weight(w1)
        w2_q, w2_bs = quant.quantize_fp8_weight(w2)
        return cls(
            w1_q=w1_q,
            w1_s=jnp.repeat(w1_bs, quant.BLOCK, axis=2)[:, :, :2 * inter],
            w2_q=w2_q,
            w2_s=jnp.repeat(w2_bs, quant.BLOCK, axis=2)[:, :, :hidden],
        )


@dataclasses.dataclass
class Int8ExpertWeights:
    """Per-expert SwiGLU weights, W8A8 int8 per-channel.

    Runs the experts on the MXU's int8 path (394 TOPS v5e = 2× the
    bf16/fp8 rate — ops/int8_gemm.py): per-channel weight × per-token
    activation scales factor out of the K-sum entirely. Numerically this
    trades fp8's blockwise range handling for 2× compute rate — the
    standard W8A8 serving point. Drop-in for ``ExpertWeights`` in
    ``MoEParams.experts``; ``moe_block`` dispatches on the type.

    w1_q: (E, hidden, 2·inter) int8 with w1_s (E, 1, 2·inter) f32;
    w2_q: (E, inter, hidden) int8 with w2_s (E, 1, hidden) f32.
    """

    w1_q: jax.Array
    w1_s: jax.Array
    w2_q: jax.Array
    w2_s: jax.Array

    @classmethod
    def create(cls, key, e: int, hidden: int,
               inter: int) -> "Int8ExpertWeights":
        k1, k2 = jax.random.split(key)
        w1 = jax.random.normal(k1, (e, hidden, 2 * inter),
                               jnp.float32) / (hidden ** 0.5)
        w2 = jax.random.normal(k2, (e, inter, hidden),
                               jnp.float32) / (inter ** 0.5)
        return cls.from_weights(w1, w2)

    @classmethod
    def from_weights(cls, w1: jax.Array,
                     w2: jax.Array) -> "Int8ExpertWeights":
        """Quantize float expert weights per output channel (K = axis 1)."""
        w1_q, w1_s = quant.quantize_int8(w1, axis=1)
        w2_q, w2_s = quant.quantize_int8(w2, axis=1)
        return cls(w1_q=w1_q, w1_s=w1_s, w2_q=w2_q, w2_s=w2_s)


def int8_experts_from_fp8(exp: "ExpertWeights") -> "Int8ExpertWeights":
    """Re-quantize deployed fp8 expert weights to W8A8 int8 — the realistic
    fp8-checkpoint → int8 conversion path: dequantize the blockwise fp8
    weights to f32 (exact; the stored scales are lane-expanded), then
    per-channel int8 (`Int8ExpertWeights.from_weights`)."""
    def deq(wq, ws):
        k = wq.shape[1]
        return wq.astype(jnp.float32) * jnp.repeat(
            ws, quant.BLOCK, axis=1)[:, :k, :]
    return Int8ExpertWeights.from_weights(deq(exp.w1_q, exp.w1_s),
                                          deq(exp.w2_q, exp.w2_s))


@dataclasses.dataclass
class MoEParams:
    router: BF16Linear               # (hidden, E)
    experts: ExpertWeights
    shared_w1: Optional[Fp8Linear]   # (hidden, 2·shared_inter)
    shared_w2: Optional[Fp8Linear]

    @classmethod
    def create(cls, key, cfg: ModelConfig) -> "MoEParams":
        ks = jax.random.split(key, 4)
        shared_inter = cfg.moe_intermediate * cfg.num_shared_experts
        return cls(
            router=BF16Linear.create(ks[0], cfg.hidden_size, cfg.num_experts,
                                     init_scale=0.02),
            experts=ExpertWeights.create(ks[1], cfg.num_experts,
                                         cfg.hidden_size,
                                         cfg.moe_intermediate),
            shared_w1=(Fp8Linear.create(ks[2], cfg.hidden_size,
                                        2 * shared_inter)
                       if cfg.num_shared_experts else None),
            shared_w2=(Fp8Linear.create(ks[3], shared_inter, cfg.hidden_size)
                       if cfg.num_shared_experts else None),
        )


jax.tree_util.register_dataclass(
    ExpertWeights, data_fields=["w1_q", "w1_s", "w2_q", "w2_s"],
    meta_fields=[])
jax.tree_util.register_dataclass(
    Int8ExpertWeights, data_fields=["w1_q", "w1_s", "w2_q", "w2_s"],
    meta_fields=[])
jax.tree_util.register_dataclass(
    MoEParams,
    data_fields=["router", "experts", "shared_w1", "shared_w2"],
    meta_fields=[])


def _swiglu(h: jax.Array) -> jax.Array:
    gate, up = jnp.split(h, 2, axis=-1)
    return (jax.nn.silu(gate.astype(jnp.float32))
            * up.astype(jnp.float32)).astype(jnp.bfloat16)


def route_topk(logits: jax.Array, top_k: int) -> Tuple[jax.Array, jax.Array]:
    """(T, E) → (weights (T, K) f32 normalized, indices (T, K) i32)."""
    scores = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    w, idx = jax.lax.top_k(scores, top_k)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    return w, idx


def dispatch_masked(
    topk_idx: jax.Array,    # (T, K) int32
    num_experts: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Plan the fixed-shape dispatch.

    Returns (slot (T, K) int32 — rank of (t, k) within its expert,
    masked_m (E,) int32, capacity int). Capacity = T·K worst case is shape-
    static; slots beyond an expert's count are never written.
    """
    t, k = topk_idx.shape
    flat = topk_idx.reshape(-1)
    # rank of each assignment within its expert = #earlier assignments
    # to the same expert (stable, order = token-major).
    onehot = jax.nn.one_hot(flat, num_experts, dtype=jnp.int32)  # (T·K, E)
    ranks_all = jnp.cumsum(onehot, axis=0) - onehot              # exclusive
    slot = jnp.take_along_axis(ranks_all, flat[:, None], axis=1)[:, 0]
    masked_m = jnp.sum(onehot, axis=0)
    return slot.reshape(t, k), masked_m, t * k


def moe_block(
    params: MoEParams,
    x: jax.Array,            # (T, hidden) bf16
    cfg: ModelConfig,
    *,
    capacity: Optional[int] = None,
    gemm_config: Optional[GemmConfig] = None,
    local_experts: Optional[int] = None,
    expert_offset: int = 0,
    axis_name: Optional[str] = None,
    token_chunk: Optional[int] = None,
) -> jax.Array:
    """One MoE FFN over a flat token batch; shape-static under jit.

    Under expert parallelism, ``local_experts``/``expert_offset`` restrict
    compute to this shard's experts and ``axis_name`` names the mesh axis to
    ``psum`` partial outputs over (routing is computed identically on every
    shard — replicated router weights).

    Large token batches are processed in CHUNKS (``token_chunk``, default
    ``DGA_MOE_TOKEN_CHUNK`` or 2048): the fixed-shape dispatch buffer is
    (E_local, T·K, hidden) at worst-case capacity, which is exact for
    decode-sized T but explodes for batched prefill — a 64-slot
    1024-token-bucket admission (T = 65 536) compiled to a 48 GB
    broadcast and OOM'd the chip (measured round 5, serve_bench --mode
    prefix). Every routed-expert quantity is per-token, so an exact
    ``lax.scan`` over token chunks bounds the buffer at (E, chunk·K,
    hidden) with identical results. An explicit ``capacity`` disables
    chunking (the caller owns the shape).
    """
    import os as _os

    t, hidden = x.shape
    tc = (token_chunk if token_chunk is not None
          else int(_os.environ.get("DGA_MOE_TOKEN_CHUNK", "2048")))
    if capacity is None and tc and t > tc:
        # Pad T up to a chunk multiple rather than hunting for divisors:
        # an awkward T (e.g. a 5003-token prime prefill) must still chunk,
        # or the worst-case buffer comes back (review round 5). Pad rows
        # are zeros — they route and occupy slots within their own chunk
        # (capacity tc·K covers every row) and their outputs are sliced
        # away; real rows are untouched.
        nc = -(-t // tc)
        pad = nc * tc - t
        xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x

        def body(_, xc):
            return None, _moe_routed(
                params, xc, cfg, capacity=None,
                gemm_config=gemm_config, local_experts=local_experts,
                expert_offset=expert_offset)
        _, ys = jax.lax.scan(body, None, xp.reshape(nc, tc, hidden))
        out = ys.reshape(nc * tc, hidden)[:t]
    else:
        out = _moe_routed(params, x, cfg, capacity=capacity,
                          gemm_config=gemm_config,
                          local_experts=local_experts,
                          expert_offset=expert_offset)

    if axis_name is not None:
        out = jax.lax.psum(out, axis_name)

    if params.shared_w1 is not None:
        sh = _swiglu(params.shared_w1(x))
        out = out + params.shared_w2(sh).astype(jnp.float32)
    return out.astype(jnp.bfloat16)


def _moe_routed(
    params: MoEParams,
    x: jax.Array,
    cfg: ModelConfig,
    *,
    capacity: Optional[int],
    gemm_config: Optional[GemmConfig],
    local_experts: Optional[int],
    expert_offset: int,
) -> jax.Array:
    """The routed-expert computation for one token block → (t, hidden) f32."""
    t, hidden = x.shape
    e_total = cfg.num_experts
    e_local = local_experts or e_total
    logits = params.router(x)
    weights, topk_idx = route_topk(logits, cfg.top_k)
    slot, masked_m_all, cap_default = dispatch_masked(topk_idx, e_total)
    cap = capacity or cap_default

    # Scatter tokens into the fixed (E_local, cap, hidden) buffer.
    local_idx = topk_idx - expert_offset                     # (T, K)
    in_shard = (local_idx >= 0) & (local_idx < e_local)
    e_safe = jnp.where(in_shard, local_idx, 0)
    slot_safe = jnp.where(in_shard, slot, cap - 1)
    buf = jnp.zeros((e_local, cap, hidden), jnp.bfloat16)
    flat_tokens = jnp.repeat(x[:, None, :], cfg.top_k, axis=1)  # (T, K, h)
    buf = buf.at[e_safe.reshape(-1), slot_safe.reshape(-1)].set(
        jnp.where(in_shard.reshape(-1, 1), flat_tokens.reshape(-1, hidden), 0))
    masked_m = jax.lax.dynamic_slice(
        masked_m_all, (expert_offset,), (e_local,))

    # Expert SwiGLU via masked grouped GEMM (fixed shapes) — FP8 blockwise
    # or W8A8 int8 (2× MXU rate), dispatched on the experts' type.
    exp = params.experts
    if isinstance(exp, Int8ExpertWeights):
        from ..ops import int8_gemm as i8
        a_q, a_s = quant.quantize_int8(buf, axis=-1)        # (E, cap, 1)
        h = i8.m_grouped_int8_gemm_masked(
            a_q, a_s, exp.w1_q, exp.w1_s, masked_m, config=gemm_config)
        h = _swiglu(h)
        h_q, h_s = quant.quantize_int8(h, axis=-1)
        y = i8.m_grouped_int8_gemm_masked(
            h_q, h_s, exp.w2_q, exp.w2_s, masked_m, config=gemm_config)
    else:
        a_q, a_s = quant.quantize_fp8_act(buf)
        h = gg.m_grouped_gemm_masked(
            a_q, a_s, exp.w1_q, exp.w1_s, masked_m,
            config=gemm_config, b_scales_expanded=True)
        h = _swiglu(h)
        h_q, h_s = quant.quantize_fp8_act(h)
        y = gg.m_grouped_gemm_masked(
            h_q, h_s, exp.w2_q, exp.w2_s, masked_m,
            config=gemm_config, b_scales_expanded=True)  # (E, cap, hidden)

    # Gather back + weighted combine.
    gathered = y[e_safe.reshape(-1), slot_safe.reshape(-1)]     # (T·K, h)
    gathered = jnp.where(in_shard.reshape(-1, 1), gathered, 0)
    gathered = gathered.reshape(t, cfg.top_k, hidden).astype(jnp.float32)
    return jnp.sum(gathered * weights[:, :, None], axis=1)
