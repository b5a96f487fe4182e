"""Checkpoint loading: HF-style safetensors → quantized ModelParams.

The reference ships no model layer, so this is north-star surface: a user
switching from a torch serving stack brings DeepSeek-V2-Lite-style weights
(HF naming, torch ``(out, in)`` Linear layout) and gets the FP8-quantized
parameter pytree this framework serves. Quantization happens at load time:
every large matmul weight is blockwise-FP8-quantized (128×128 scales,
``ops/quant.py``) and lane-expanded once; routers/norms/embeddings stay
bf16.

Name map (HF → ModelParams):
  model.embed_tokens.weight                      → embed
  model.norm.weight                              → final_norm
  lm_head.weight                                 → lm_head (transposed)
  model.layers.{i}.input_layernorm.weight        → layers[i].attn_norm
  model.layers.{i}.post_attention_layernorm.weight → layers[i].ffn_norm
  model.layers.{i}.self_attn.{q,k,v,o}_proj.weight → layers[i].attn.w{q,k,v,o}
  dense FFN:  .mlp.{gate,up,down}_proj.weight    → DenseFFN (gate∥up fused)
  MoE:        .mlp.gate.weight                   → router
              .mlp.experts.{e}.{gate,up,down}_proj.weight → ExpertWeights
              .mlp.shared_experts.{gate,up,down}_proj.weight → shared_w{1,2}
"""

from __future__ import annotations

import os
from typing import List, Mapping, Sequence

import jax.numpy as jnp
import numpy as np

from ..ops import fp8_gemm as fp8mod
from ..ops import quant
from .attention import AttentionParams
from .config import ModelConfig
from .layers import BF16Linear, Fp8Linear
from .model import DenseFFN, LayerParams, ModelParams
from .moe import ExpertWeights, MoEParams


def _fp8_linear(w_out_in: np.ndarray) -> Fp8Linear:
    """torch Linear weight (out, in) → Fp8Linear computing x @ W (in, out)."""
    w = jnp.asarray(np.ascontiguousarray(w_out_in.T), jnp.float32)
    w_q, w_s = quant.quantize_fp8_weight(w)
    return Fp8Linear(w_q=w_q,
                     scales_exp=fp8mod.expand_weight_scales(w_s, w.shape[1]))


def _fused_w1(gate: np.ndarray, up: np.ndarray) -> Fp8Linear:
    """gate_proj (inter, hidden) + up_proj → fused (hidden, 2·inter),
    gate first (matches moe._swiglu split order)."""
    return _fp8_linear(np.concatenate([gate, up], axis=0))


def load_params(state: Mapping[str, np.ndarray],
                cfg: ModelConfig) -> ModelParams:
    """Build quantized ModelParams from an HF-style state dict."""

    def get(name: str) -> np.ndarray:
        if name not in state:
            raise KeyError(f"checkpoint missing tensor {name!r}")
        return np.asarray(state[name], np.float32)

    layers: List[LayerParams] = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        attn = AttentionParams(
            wq=_fp8_linear(get(p + "self_attn.q_proj.weight")),
            wk=_fp8_linear(get(p + "self_attn.k_proj.weight")),
            wv=_fp8_linear(get(p + "self_attn.v_proj.weight")),
            wo=_fp8_linear(get(p + "self_attn.o_proj.weight")),
        )
        if i < cfg.first_dense_layers:
            ffn: object = DenseFFN(
                w1=_fused_w1(get(p + "mlp.gate_proj.weight"),
                             get(p + "mlp.up_proj.weight")),
                w2=_fp8_linear(get(p + "mlp.down_proj.weight")),
            )
        else:
            e = cfg.num_experts
            g = np.stack([get(p + f"mlp.experts.{j}.gate_proj.weight")
                          for j in range(e)])          # (E, inter, hidden)
            u = np.stack([get(p + f"mlp.experts.{j}.up_proj.weight")
                          for j in range(e)])
            d = np.stack([get(p + f"mlp.experts.{j}.down_proj.weight")
                          for j in range(e)])          # (E, hidden, inter)
            w1 = np.transpose(np.concatenate([g, u], axis=1), (0, 2, 1))
            w2 = np.transpose(d, (0, 2, 1))            # (E, inter, hidden)
            w1_q, w1_bs = quant.quantize_fp8_weight(jnp.asarray(w1))
            w2_q, w2_bs = quant.quantize_fp8_weight(jnp.asarray(w2))
            experts = ExpertWeights(
                w1_q=w1_q,
                w1_s=jnp.repeat(w1_bs, quant.BLOCK,
                                axis=2)[:, :, :w1.shape[2]],
                w2_q=w2_q,
                w2_s=jnp.repeat(w2_bs, quant.BLOCK,
                                axis=2)[:, :, :w2.shape[2]],
            )
            shared_w1 = shared_w2 = None
            if cfg.num_shared_experts:
                shared_w1 = _fused_w1(
                    get(p + "mlp.shared_experts.gate_proj.weight"),
                    get(p + "mlp.shared_experts.up_proj.weight"))
                shared_w2 = _fp8_linear(
                    get(p + "mlp.shared_experts.down_proj.weight"))
            ffn = MoEParams(
                router=BF16Linear(w=jnp.asarray(
                    get(p + "mlp.gate.weight").T, jnp.bfloat16)),
                experts=experts, shared_w1=shared_w1, shared_w2=shared_w2)
        layers.append(LayerParams(
            attn_norm=jnp.asarray(get(p + "input_layernorm.weight"),
                                  jnp.bfloat16),
            attn=attn,
            ffn_norm=jnp.asarray(get(p + "post_attention_layernorm.weight"),
                                 jnp.bfloat16),
            ffn=ffn,
        ))

    return ModelParams(
        embed=jnp.asarray(get("model.embed_tokens.weight"), jnp.bfloat16),
        layers=layers,
        final_norm=jnp.asarray(get("model.norm.weight"), jnp.bfloat16),
        lm_head=jnp.asarray(get("lm_head.weight").T, jnp.bfloat16),
    )


def load_safetensors(paths: Sequence[str] | str,
                     cfg: ModelConfig) -> ModelParams:
    """Load from one or more .safetensors shards (HF checkpoint layout)."""
    from safetensors import safe_open

    if isinstance(paths, (str, bytes)):
        paths = [paths]
    state: dict = {}
    for path in paths:
        with safe_open(path, framework="numpy") as f:
            for name in f.keys():
                state[name] = f.get_tensor(name)
    return load_params(state, cfg)


# ---- quantized-checkpoint persistence (orbax) -----------------------------
# Quantize-once-serve-forever: converting an HF checkpoint re-runs the fp8
# blockwise quantizer over every weight; persisting the *quantized* pytree
# makes serving cold-start a pure read. (The reference's persistence story
# is kernels + tiling caches only — SURVEY.md §5 "no model checkpoints";
# this is north-star serving surface.)

def save_quantized(params: ModelParams, path: str) -> None:
    """Write the quantized parameter pytree to an orbax checkpoint dir."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), params)


def load_quantized(path: str, cfg: ModelConfig) -> ModelParams:
    """Restore a quantized checkpoint written by :func:`save_quantized`.

    The target structure (incl. fp8/bf16 dtypes) comes from an abstract
    ``init_params`` evaluation — no weights are materialized for it.
    """
    import jax
    import orbax.checkpoint as ocp

    from .model import init_params

    template = jax.eval_shape(
        lambda: init_params(jax.random.PRNGKey(0), cfg))
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), item=template)
