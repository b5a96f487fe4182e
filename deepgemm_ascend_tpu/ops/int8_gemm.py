"""W8A8 INT8 GEMM — int32 accumulation at the MXU's int8 rate.

Capability extension beyond the reference (its dense kernels are
bf16/fp16 only, ``mmad_jit.cpp:42-416``) exploiting a TPU-specific
envelope fact: the MXU runs int8×int8→int32 at 2× the bf16/fp8 rate
(394 vs 197 TOPS on v5e — ``tiling/platform.py`` ``peak_int8_tops``; fp8
e4m3 does NOT get this rate, it runs at the bf16 rate, measured round 1).

Scaling scheme: per-token activation scales (m, 1) × per-channel weight
scales (1, n) — the standard W8A8 serving recipe. Unlike the fp8
blockwise op (128-deep K groups dequantized inside the accumulator,
``ops/fp8_gemm.py``), both scales factor OUT of the K sum entirely:

    out[i, j] = (Σ_k a_q[i,k]·b_q[k,j]) · a_s[i] · b_s[j]

so the kernel is one int32-accumulated dot chain over full K plus a
single f32 epilogue multiply at the store step — no per-K-group scale
traffic at all. Numerically this trades fp8's fine-grained blockwise
range handling for 2× compute rate; per-token/per-channel int8 is the
established accuracy/throughput point for W8A8 serving.

Kernel structure mirrors ops/gemm.py (grid (nm, nn, nk), K-tail zero
masking, swizzle) — reference loop-nest citation there.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import GemmConfig, KernelType, SwizzleDir
from ..tiling import selector
from ..utils.common import ceil_div, round_up
from .gemm import _interpret_default

__all__ = ["int8_gemm", "int8_gemm_with_config",
           "m_grouped_int8_gemm_contiguous", "m_grouped_int8_gemm_masked"]


def _int8_kernel(a_ref, as_ref, b_ref, bs_ref, o_ref, acc_ref, *,
                 nk: int, k_rem: int, out_dtype):
    """One (bm, bk)·(bk, bn) int8 MXU step with int32 accumulation; scales
    applied once in the store epilogue (they factor out of the K sum)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    a = a_ref[:]
    b = b_ref[:]
    if k_rem:
        # K tail: zero the out-of-range lanes of the LAST k block in both
        # operands (OOB int8 garbage would silently poison the int32 sum).
        in_tail = k == nk - 1
        a_iota = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
        a = jnp.where(~in_tail | (a_iota < k_rem), a, 0)
        b_iota = jax.lax.broadcasted_iota(jnp.int32, b.shape, 0)
        b = jnp.where(~in_tail | (b_iota < k_rem), b, 0)
    acc_ref[:] += jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(k == nk - 1)
    def _store():
        scaled = (acc_ref[:].astype(jnp.float32)
                  * as_ref[:] * bs_ref[:])      # (bm,1)·(1,bn) broadcast
        o_ref[:] = scaled.astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("config", "out_dtype", "interpret"))
def int8_gemm_with_config(
    a_q: jax.Array,
    a_scales: jax.Array,
    b_q: jax.Array,
    b_scales: jax.Array,
    *,
    config: GemmConfig,
    out_dtype=jnp.bfloat16,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """W8A8 GEMM with an explicit tile config (autotuner entry point).

    a_q (m, k) int8 with a_scales (m, 1) f32 (per token);
    b_q (k, n) int8 with b_scales (1, n) f32 (per output channel).
    """
    m, k = a_q.shape
    k2, n = b_q.shape
    if k != k2:
        raise ValueError(f"inner dims mismatch: {a_q.shape} @ {b_q.shape}")
    if a_q.dtype != jnp.int8 or b_q.dtype != jnp.int8:
        raise ValueError(
            f"int8_gemm needs int8 operands, got {a_q.dtype}/{b_q.dtype}")
    if a_scales.shape != (m, 1):
        raise ValueError(f"a_scales must be {(m, 1)}, got {a_scales.shape}")
    if b_scales.shape != (1, n):
        raise ValueError(f"b_scales must be {(1, n)}, got {b_scales.shape}")
    if interpret is None:
        interpret = _interpret_default()

    if config.kernel_type == KernelType.XLA:
        # XLA family (config.py KernelType.XLA): the int32 K-sum is exact,
        # so this is BITWISE the Pallas result (identical f32 epilogue).
        acc = jax.lax.dot_general(a_q, b_q, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32)
                * a_scales.astype(jnp.float32)
                * b_scales.astype(jnp.float32)).astype(out_dtype)

    bm = min(config.block_m, round_up(m, 32))   # int8 sublane = 32
    bn = min(config.block_n, round_up(n, 128))
    bk = min(config.block_k, round_up(k, 128))
    nm, nn, nk = ceil_div(m, bm), ceil_div(n, bn), ceil_div(k, bk)
    k_rem = k - (nk - 1) * bk if k % bk else 0

    kernel = functools.partial(_int8_kernel, nk=nk, k_rem=k_rem,
                               out_dtype=out_dtype)
    n_major = config.swizzle == SwizzleDir.N_MAJOR
    if n_major:
        grid = (nn, nm, nk)
        ix = lambda j, i, kk: (i, kk)
        jx = lambda j, i, kk: (kk, j)
        sx_a = lambda j, i, kk: (i, 0)
        sx_b = lambda j, i, kk: (0, j)
        ox = lambda j, i, kk: (i, j)
    else:
        grid = (nm, nn, nk)
        ix = lambda i, j, kk: (i, kk)
        jx = lambda i, j, kk: (kk, j)
        sx_a = lambda i, j, kk: (i, 0)
        sx_b = lambda i, j, kk: (0, j)
        ox = lambda i, j, kk: (i, j)

    params = {}
    if not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            **({"vmem_limit_bytes": config.vmem_limit_bytes}
               if config.vmem_limit_bytes else {}),
        )
    osz = jnp.dtype(out_dtype).itemsize
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), ix),
            # (bm, 1) / (1, bn) scale blocks: the size-1 dim equals the
            # full array dim, which Mosaic's block rule accepts.
            pl.BlockSpec((bm, 1), sx_a),
            pl.BlockSpec((bk, bn), jx),
            pl.BlockSpec((1, bn), sx_b),
        ],
        out_specs=pl.BlockSpec((bm, bn), ox),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=int(m * k + k * n + (m + n) * 4 + m * n * osz),
            transcendentals=0),
        interpret=interpret,
        **params,
    )(a_q, a_scales.astype(jnp.float32), b_q,
      b_scales.astype(jnp.float32))


def int8_gemm(
    a_q: jax.Array,
    a_scales: jax.Array,
    b_q: jax.Array,
    b_scales: jax.Array,
    *,
    out_dtype=jnp.bfloat16,
    config: Optional[GemmConfig] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """W8A8 GEMM: per-token × per-channel scaled int8 at the int8 MXU rate.

    Quantize with ``quant.quantize_int8(a, axis=-1)`` (per token) and
    ``quant.quantize_int8(b, axis=0)`` (per channel). Tiling comes from
    the standard three-tier selector under op key ``int8_gemm``.
    """
    m, k = a_q.shape
    n = b_q.shape[1]
    from . import fp8_gemm as fp8mod
    if fp8mod.exact_enabled():
        # Exact emulated-dequant golden (fp8mod.exact_mode()), the int8
        # counterpart of the fp8 exact path: dequantize both operands to
        # f32 and matmul at HIGHEST precision. Differs from the kernel
        # (exact int32 K-sum, one f32 epilogue multiply) only by f32
        # summation rounding.
        a = a_q.astype(jnp.float32) * a_scales.astype(jnp.float32)
        b = b_q.astype(jnp.float32) * b_scales.astype(jnp.float32)
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST).astype(out_dtype)
    cfg = selector.select_config(m, n, k, a_q.dtype, out_dtype,
                                 op="int8_gemm", override=config)
    return int8_gemm_with_config(
        a_q, a_scales, b_q, b_scales, config=cfg, out_dtype=out_dtype,
        interpret=interpret)


# ---- grouped W8A8 (MoE) ---------------------------------------------------
#
# Same scalar-prefetch grid structure as the fp8 grouped kernels
# (ops/grouped_gemm.py — DeepGEMM m_grouped_* API shape), but the W8A8
# scaling scheme (per-token × per-expert-channel) factors out of the K-sum,
# so each grid step is a pure int32 dot and the scales apply once in the
# store epilogue — no blocked scale-panel plumbing at all.


def _int8_grouped_kernel(gid_ref, a_ref, as_ref, b_ref, bs_ref, o_ref,
                         acc_ref, *, nk: int, k_rem: int, out_dtype):
    """Contiguous grouped step. Grid (nm, nn, nk); gid_ref (nm,) expert per
    m-tile (-1 = padding tile). b block (1, bk, bn) of (E, K, N);
    bs block (1, 1, bn) of (E, 1, N) per-channel expert scales."""
    i = pl.program_id(0)
    k = pl.program_id(2)
    active = gid_ref[i] >= 0

    @pl.when(k == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(active)
    def _compute():
        a = a_ref[:]
        b = b_ref[0]
        if k_rem:
            in_tail = k == nk - 1
            a_iota = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
            a = jnp.where(~in_tail | (a_iota < k_rem), a, 0)
            b_iota = jax.lax.broadcasted_iota(jnp.int32, b.shape, 0)
            b = jnp.where(~in_tail | (b_iota < k_rem), b, 0)
        acc_ref[:] += jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    @pl.when(k == nk - 1)
    def _store():
        scaled = acc_ref[:].astype(jnp.float32) * as_ref[:] * bs_ref[0]
        o_ref[:] = jnp.where(active, scaled, 0.0).astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("config", "out_dtype", "interpret"))
def _int8_grouped_contiguous_call(tile_gids, a_q, a_s, b_q, b_s, *,
                                  config, out_dtype, interpret):
    m, k = a_q.shape
    e, _, n = b_q.shape
    if config.kernel_type == KernelType.XLA:
        # Same rationale as the fp8 contiguous layout (ops/grouped_gemm.py):
        # no XLA realization for the ragged tile→expert mapping.
        raise ValueError("KernelType.XLA is not supported for the grouped "
                         "contiguous layout")
    bm = config.block_m
    bn, bk = min(config.block_n, round_up(n, 128)), min(config.block_k,
                                                        round_up(k, 128))
    nm, nn, nk = m // bm, ceil_div(n, bn), ceil_div(k, bk)
    k_rem = k - (nk - 1) * bk if k % bk else 0
    kernel = functools.partial(_int8_grouped_kernel, nk=nk, k_rem=k_rem,
                               out_dtype=out_dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nm, nn, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk, gid: (i, kk)),
            pl.BlockSpec((bm, 1), lambda i, j, kk, gid: (i, 0)),
            pl.BlockSpec((1, bk, bn),
                         lambda i, j, kk, gid: (jnp.maximum(gid[i], 0), kk,
                                                j)),
            pl.BlockSpec((1, 1, bn),
                         lambda i, j, kk, gid: (jnp.maximum(gid[i], 0), 0,
                                                j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk, gid: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
    )
    params = {}
    if not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"))
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        interpret=interpret, **params,
    )(tile_gids, a_q, a_s.astype(jnp.float32), b_q,
      b_s.astype(jnp.float32))


def m_grouped_int8_gemm_contiguous(
    a_q: jax.Array,
    a_scales: jax.Array,
    b_q: jax.Array,
    b_scales: jax.Array,
    tile_group_ids: jax.Array,
    *,
    out_dtype=jnp.bfloat16,
    config: Optional[GemmConfig] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Contiguous grouped W8A8 GEMM (MoE prefill at the int8 MXU rate).

    a_q (M_total, K) int8 rows grouped by expert (spans aligned to
    block_m — plan with ``grouped_gemm.make_contiguous_layout``);
    a_scales (M_total, 1) f32 per token; b_q (E, K, N) int8;
    b_scales (E, 1, N) f32 per expert output channel;
    tile_group_ids (M_total/block_m,) int32, -1 = padding tile.
    """
    m, k = a_q.shape
    e, k2, n = b_q.shape
    if k != k2:
        raise ValueError(f"inner dims mismatch: {a_q.shape} @ {b_q.shape}")
    if a_scales.shape != (m, 1):
        raise ValueError(f"a_scales must be {(m, 1)}, got {a_scales.shape}")
    if b_scales.shape != (e, 1, n):
        raise ValueError(
            f"b_scales must be {(e, 1, n)}, got {b_scales.shape}")
    from . import fp8_gemm as fp8mod
    if fp8mod.exact_enabled():
        # Exact emulated-dequant golden; padding tiles (gid -1) zeroed to
        # match kernel semantics.
        n_tiles_ = int(jnp.shape(tile_group_ids)[0])
        bm_ = m // max(n_tiles_, 1)
        gids = jnp.asarray(tile_group_ids, jnp.int32)
        row_gid = jnp.repeat(gids, bm_)                     # (M_total,)
        a = a_q.astype(jnp.float32) * a_scales.astype(jnp.float32)
        b = b_q.astype(jnp.float32) * b_scales.astype(jnp.float32)

        def _one_expert(acc, be):
            eidx, bmat = be
            ye = jnp.dot(a, bmat, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
            return acc + jnp.where((row_gid == eidx)[:, None], ye, 0.0), None

        y, _ = jax.lax.scan(_one_expert,
                            jnp.zeros((m, b_q.shape[2]), jnp.float32),
                            (jnp.arange(e, dtype=jnp.int32), b))
        return y.astype(out_dtype)
    n_tiles = int(jnp.shape(tile_group_ids)[0])
    bm_layout = m // max(n_tiles, 1)
    cfg = selector.select_config(
        max(bm_layout, 1), n, k, a_q.dtype, out_dtype,
        op="int8_grouped_gemm", override=config)
    if config is None and cfg.block_m != bm_layout:
        cfg = cfg.replace(block_m=bm_layout)
    if m % cfg.block_m:
        raise ValueError(f"M_total={m} not a multiple of block_m="
                         f"{cfg.block_m}")
    # The layout fixed the tile->expert mapping at its own block_m: a
    # config whose block_m disagrees would silently misindex (or read out
    # of bounds of) the scalar-prefetch expert map — same guard as the
    # fp8 twin (grouped_gemm.py).
    ntiles = m // cfg.block_m
    if jnp.shape(tile_group_ids) != (ntiles,):
        raise ValueError(f"tile_group_ids must be ({ntiles},) for "
                         f"block_m={cfg.block_m}, got "
                         f"{jnp.shape(tile_group_ids)}")
    if interpret is None:
        interpret = _interpret_default()
    return _int8_grouped_contiguous_call(
        jnp.asarray(tile_group_ids, jnp.int32), a_q, a_scales, b_q,
        b_scales, config=cfg, out_dtype=out_dtype, interpret=interpret)


def _int8_masked_kernel(mask_ref, a_ref, as_ref, b_ref, bs_ref, o_ref,
                        acc_ref, *, nk: int, k_rem: int, bm: int,
                        out_dtype):
    """Masked grouped step. Grid (E, nm, nn, nk); blocks carry a leading
    expert dim of 1 (the fp8 twin's expert_coalesce knob can be grafted
    here once probe data justifies it)."""
    e = pl.program_id(0)
    i = pl.program_id(1)
    k = pl.program_id(3)
    active = i * bm < mask_ref[e]

    @pl.when(k == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(active)
    def _compute():
        a = a_ref[0]
        b = b_ref[0]
        if k_rem:
            in_tail = k == nk - 1
            a_iota = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
            a = jnp.where(~in_tail | (a_iota < k_rem), a, 0)
            b_iota = jax.lax.broadcasted_iota(jnp.int32, b.shape, 0)
            b = jnp.where(~in_tail | (b_iota < k_rem), b, 0)
        acc_ref[:] += jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    @pl.when(k == nk - 1)
    def _store():
        scaled = acc_ref[:].astype(jnp.float32) * as_ref[0] * bs_ref[0]
        o_ref[0] = jnp.where(active, scaled, 0.0).astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("config", "out_dtype", "interpret"))
def _int8_grouped_masked_call(masked_m, a_q, a_s, b_q, b_s, *,
                              config, out_dtype, interpret):
    e, m_max, k = a_q.shape
    n = b_q.shape[2]
    if config.kernel_type == KernelType.XLA:
        # XLA family: one int8 batched dot (the int32 K-sum is exact and the
        # scales factor out — no blocked partials at all), f32 epilogue,
        # rows ≥ masked_m[e] zeroed (unspecified by the masked contract).
        acc = jax.lax.dot_general(
            a_q, b_q, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)
        y = (acc.astype(jnp.float32) * a_s.astype(jnp.float32)
             * b_s.astype(jnp.float32))
        rows = jax.lax.broadcasted_iota(jnp.int32, (e, m_max, 1), 1)
        return jnp.where(rows < masked_m[:, None, None], y,
                         0.0).astype(out_dtype)
    bm = min(config.block_m, round_up(m_max, 32))
    bn, bk = min(config.block_n, round_up(n, 128)), min(config.block_k,
                                                        round_up(k, 128))
    nm, nn, nk = ceil_div(m_max, bm), ceil_div(n, bn), ceil_div(k, bk)
    k_rem = k - (nk - 1) * bk if k % bk else 0
    kernel = functools.partial(_int8_masked_kernel, nk=nk, k_rem=k_rem,
                               bm=bm, out_dtype=out_dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(e, nm, nn, nk),
        in_specs=[
            pl.BlockSpec((1, bm, bk), lambda g, i, j, kk, mm: (g, i, kk)),
            pl.BlockSpec((1, bm, 1), lambda g, i, j, kk, mm: (g, i, 0)),
            pl.BlockSpec((1, bk, bn), lambda g, i, j, kk, mm: (g, kk, j)),
            pl.BlockSpec((1, 1, bn), lambda g, i, j, kk, mm: (g, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, bm, bn),
                               lambda g, i, j, kk, mm: (g, i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
    )
    params = {}
    if not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"))
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e, m_max, n), out_dtype),
        interpret=interpret, **params,
    )(masked_m, a_q, a_s.astype(jnp.float32), b_q, b_s.astype(jnp.float32))


def m_grouped_int8_gemm_masked(
    a_q: jax.Array,
    a_scales: jax.Array,
    b_q: jax.Array,
    b_scales: jax.Array,
    masked_m: jax.Array,
    *,
    out_dtype=jnp.bfloat16,
    config: Optional[GemmConfig] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Masked grouped W8A8 GEMM (MoE decode, fixed shapes, int8 MXU rate).

    a_q (E, M_max, K) int8 with a_scales (E, M_max, 1) f32 per token;
    b_q (E, K, N) int8 with b_scales (E, 1, N) f32; masked_m (E,) int32.
    Rows ≥ masked_m[e] are unspecified (inactive tiles zeroed), same
    contract as the fp8 twin.
    """
    e, m_max, k = a_q.shape
    e2, k2, n = b_q.shape
    if e != e2 or k != k2:
        raise ValueError(f"bad shapes: a {a_q.shape}, b {b_q.shape}")
    if a_scales.shape != (e, m_max, 1):
        raise ValueError(
            f"a_scales must be {(e, m_max, 1)}, got {a_scales.shape}")
    if b_scales.shape != (e, 1, n):
        raise ValueError(
            f"b_scales must be {(e, 1, n)}, got {b_scales.shape}")
    from . import fp8_gemm as fp8mod
    if fp8mod.exact_enabled():
        # Exact emulated-dequant golden (same contract as the fp8 twin,
        # grouped_gemm.m_grouped_gemm_masked): masked rows zeroed.
        a = a_q.astype(jnp.float32) * a_scales.astype(jnp.float32)
        b = b_q.astype(jnp.float32) * b_scales.astype(jnp.float32)
        y = jnp.einsum("emk,ekn->emn", a, b,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        rows = jnp.arange(m_max)[None, :, None]
        y = jnp.where(rows < jnp.asarray(masked_m)[:, None, None], y, 0.0)
        return y.astype(out_dtype)
    cfg = selector.select_config(
        m_max, n, k, a_q.dtype, out_dtype, op="int8_grouped_gemm_masked",
        override=config)
    if interpret is None:
        interpret = _interpret_default()
    return _int8_grouped_masked_call(
        jnp.asarray(masked_m, jnp.int32), a_q, a_scales, b_q, b_scales,
        config=cfg, out_dtype=out_dtype, interpret=interpret)
