"""Blockwise FP8 / INT8 quantization utilities.

The reference implements no quantization (bf16/fp16 kernels only —
SURVEY.md §0 scope note); this module supplies the DeepGEMM-style FP8
blockwise-scaling the north star requires:

* activations: per-(token, 128-channel-block) scales → A (m, k) fp8e4m3 with
  scales (m, ⌈k/128⌉) f32;
* weights: per-(128×128 block) scales → B (k, n) fp8e4m3 with scales
  (⌈k/128⌉, ⌈n/128⌉) f32;
* KV-cache: per-(head, token) int8 symmetric quantization.

All quantizers are pure XLA (fuses into neighbouring ops under jit); the
GEMM-side dequantization happens inside the Pallas kernel accumulator
(ops/fp8_gemm.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..utils.common import ceil_div

BLOCK = 128
FP8_MAX = 448.0          # float8_e4m3fn max normal
INT8_MAX = 127.0
_SCALE_EPS = 1e-12       # avoid div-by-zero on all-zero blocks


def _pad_to(x: jax.Array, axis: int, multiple: int) -> jax.Array:
    size = x.shape[axis]
    pad = ceil_div(size, multiple) * multiple - size
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def quantize_fp8_act(
    x: jax.Array, block: int = BLOCK,
) -> Tuple[jax.Array, jax.Array]:
    """Per-(row, k-block) FP8 quantization of activations.

    x: (..., m, k) float → (x_fp8 (..., m, k) e4m3, scales (..., m, ⌈k/block⌉) f32).
    Scale = amax(block)/448 so the block maps onto the full e4m3 range.
    """
    *lead, m, k = x.shape
    kb = ceil_div(k, block)
    xp = _pad_to(x.astype(jnp.float32), -1, block)
    g = xp.reshape(*lead, m, kb, block)
    amax = jnp.max(jnp.abs(g), axis=-1)
    scales = jnp.maximum(amax, _SCALE_EPS) / FP8_MAX
    q = (g / scales[..., None]).reshape(*lead, m, kb * block)[..., :k]
    return q.astype(jnp.float8_e4m3fn), scales


def quantize_fp8_weight(
    w: jax.Array, block: int = BLOCK,
) -> Tuple[jax.Array, jax.Array]:
    """Per-(128×128 block) FP8 quantization of weights.

    w: (..., k, n) float → (w_fp8, scales (..., ⌈k/block⌉, ⌈n/block⌉) f32).
    """
    *lead, k, n = w.shape
    kb, nb = ceil_div(k, block), ceil_div(n, block)
    wp = _pad_to(_pad_to(w.astype(jnp.float32), -1, block), -2, block)
    g = wp.reshape(*lead, kb, block, nb, block)
    amax = jnp.max(jnp.abs(g), axis=(-3, -1))
    scales = jnp.maximum(amax, _SCALE_EPS) / FP8_MAX
    q = (g / scales[..., :, None, :, None]).reshape(
        *lead, kb * block, nb * block)[..., :k, :n]
    return q.astype(jnp.float8_e4m3fn), scales


def dequantize_fp8_act(x_q: jax.Array, scales: jax.Array,
                       block: int = BLOCK) -> jax.Array:
    """Inverse of :func:`quantize_fp8_act` (f32 out) — golden-model helper."""
    *lead, m, k = x_q.shape
    kb = scales.shape[-1]
    xp = _pad_to(x_q.astype(jnp.float32), -1, block)
    g = xp.reshape(*lead, m, kb, block) * scales[..., None]
    return g.reshape(*lead, m, kb * block)[..., :k]


def dequantize_fp8_weight(w_q: jax.Array, scales: jax.Array,
                          block: int = BLOCK) -> jax.Array:
    """Inverse of :func:`quantize_fp8_weight` (f32 out) — golden-model helper."""
    *lead, k, n = w_q.shape
    kb, nb = scales.shape[-2], scales.shape[-1]
    wp = _pad_to(_pad_to(w_q.astype(jnp.float32), -1, block), -2, block)
    g = wp.reshape(*lead, kb, block, nb, block) * scales[..., :, None, :, None]
    return g.reshape(*lead, kb * block, nb * block)[..., :k, :n]


def quantize_int8(
    x: jax.Array, axis: int = -1,
) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-slice INT8 quantization along ``axis`` (KV-cache use)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis, keepdims=True)
    scales = jnp.maximum(amax, _SCALE_EPS) / INT8_MAX
    q = jnp.clip(jnp.round(x / scales), -INT8_MAX, INT8_MAX).astype(jnp.int8)
    return q, scales


def dequantize_int8(x_q: jax.Array, scales: jax.Array) -> jax.Array:
    return x_q.astype(jnp.float32) * scales
