"""Model building blocks: RMSNorm, RoPE, FP8 linear layers.

All heavy matmuls route through the framework's Pallas kernels (fp8 direct
MXU dots, dequant-in-accumulator); small/elementwise math stays in XLA where
the compiler fuses it. The reference has no model layer — this stack exists
for the north-star serving slice (BASELINE.json config 5).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import GemmConfig
from ..ops import fp8_gemm as fp8mod
from ..ops import quant


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * weight


def rope_freqs(head_dim: int, theta: float = 10000.0) -> jax.Array:
    return 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32)
                            / head_dim))


def apply_rope(x: jax.Array, positions: jax.Array, theta: float) -> jax.Array:
    """x: (..., seq, heads, head_dim); positions: (..., seq) int32."""
    head_dim = x.shape[-1]
    freqs = rope_freqs(head_dim, theta)                      # (hd/2,)
    angles = positions[..., :, None].astype(jnp.float32) * freqs  # (..., s, hd/2)
    cos = jnp.cos(angles)[..., :, None, :]
    sin = jnp.sin(angles)[..., :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    return out.astype(x.dtype)


@dataclasses.dataclass
class Fp8Linear:
    """FP8 blockwise-quantized weight: y = x @ W, W (in, out) e4m3.

    ``scales_exp`` is the lane-expanded (k/128, out) f32 panel, precomputed
    once at load time (weights are static in serving).
    """

    w_q: jax.Array          # (in, out) e4m3
    scales_exp: jax.Array   # (in/128, out) f32

    @classmethod
    def create(cls, key, in_dim: int, out_dim: int,
               init_scale: Optional[float] = None) -> "Fp8Linear":
        init_scale = init_scale or (1.0 / (in_dim ** 0.5))
        w = jax.random.normal(key, (in_dim, out_dim), jnp.float32) * init_scale
        w_q, w_s = quant.quantize_fp8_weight(w)
        return cls(w_q=w_q, scales_exp=fp8mod.expand_weight_scales(w_s, out_dim))

    def __call__(self, x: jax.Array, *,
                 config: Optional[GemmConfig] = None,
                 out_dtype=jnp.bfloat16) -> jax.Array:
        """x: (..., in) bf16/f32 — activation-quantized on the fly."""
        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        x_q, x_s = quant.quantize_fp8_act(x2)
        y = fp8mod.fp8_gemm(x_q, x_s, self.w_q, self.scales_exp,
                            out_dtype=out_dtype, config=config,
                            b_scales_expanded=True)
        return y.reshape(*lead, y.shape[-1])


@dataclasses.dataclass
class Int8Linear:
    """W8A8 linear: y = x @ W at the MXU's int8 rate (2× fp8/bf16 on v5e).

    Per-channel weight scales (1, out) + on-the-fly per-token activation
    quantization — the standard W8A8 serving recipe (ops/int8_gemm.py).
    Drop-in alternative to :class:`Fp8Linear` for integrators who want
    the 394-TOPS path on compute-bound projections; the flagship model
    keeps the DeepSeek fp8-blockwise recipe (finer range handling).
    """

    w_q: jax.Array       # (in, out) int8
    scales: jax.Array    # (1, out) f32 per output channel

    @classmethod
    def create(cls, key, in_dim: int, out_dim: int,
               init_scale: Optional[float] = None) -> "Int8Linear":
        init_scale = init_scale or (1.0 / (in_dim ** 0.5))
        w = jax.random.normal(key, (in_dim, out_dim), jnp.float32) * init_scale
        w_q, w_s = quant.quantize_int8(w, axis=0)
        return cls(w_q=w_q, scales=w_s)

    @classmethod
    def from_weights(cls, w: jax.Array) -> "Int8Linear":
        """Quantize a dense (in, out) weight matrix (checkpoint load)."""
        w_q, w_s = quant.quantize_int8(jnp.asarray(w, jnp.float32), axis=0)
        return cls(w_q=w_q, scales=w_s)

    def __call__(self, x: jax.Array, *,
                 config: Optional[GemmConfig] = None,
                 out_dtype=jnp.bfloat16) -> jax.Array:
        """x: (..., in) bf16/f32 — activation-quantized per token."""
        from ..ops import int8_gemm as i8mod
        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        x_q, x_s = quant.quantize_int8(x2, axis=-1)
        y = i8mod.int8_gemm(x_q, x_s, self.w_q, self.scales,
                            out_dtype=out_dtype, config=config)
        return y.reshape(*lead, y.shape[-1])


@dataclasses.dataclass
class BF16Linear:
    """Unquantized linear for small projections (routers, norms-adjacent)."""

    w: jax.Array

    @classmethod
    def create(cls, key, in_dim: int, out_dim: int,
               init_scale: Optional[float] = None) -> "BF16Linear":
        init_scale = init_scale or (1.0 / (in_dim ** 0.5))
        w = (jax.random.normal(key, (in_dim, out_dim), jnp.float32)
             * init_scale).astype(jnp.bfloat16)
        return cls(w=w)

    def __call__(self, x: jax.Array) -> jax.Array:
        return jnp.dot(x.astype(jnp.bfloat16), self.w,
                       preferred_element_type=jnp.float32).astype(jnp.bfloat16)


jax.tree_util.register_dataclass(
    Fp8Linear, data_fields=["w_q", "scales_exp"], meta_fields=[])
jax.tree_util.register_dataclass(
    BF16Linear, data_fields=["w"], meta_fields=[])
