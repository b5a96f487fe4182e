"""FP8 blockwise-scaled GEMM with dequant-in-accumulator (the north-star op).

DeepGEMM-style fine-grained scaling, absent from the reference (its kernels
are bf16/fp16 only — SURVEY.md §0): A carries per-(token, 128-channel) scales,
B carries per-(128×128)-block scales, and the scales are applied to the fp32
accumulator *inside* the Pallas kernel at 128-deep K-group granularity —
never materializing the dequantized operands in HBM.

MXU mapping: raw fp8 operands feed the MXU directly (``mxu_dtype=None``) —
on v5e the software fp8→bf16 upcast costs 5× more than the dot itself
(measured: direct 187 TF/s vs upcast 34 TF/s at 4096³), so dequantization
never touches the operands. Each 128-K-group is one natural MXU pass. Per grid step
(block_k = G·128) the kernel issues G dots and applies
``acc += p_g ⊙ a_scale[:, g] ⊙ b_scale[g, :]`` — the outer-product scale
broadcast costs ~3·bm·bn VPU flops per 256·bm·bn·128 MXU flops (≈1%).

Scale layout trick: B scales arrive as (⌈k/128⌉, ⌈n/128⌉) and are expanded to
(⌈k/128⌉, n) f32 *outside* the kernel (one ``jnp.repeat``; +3% HBM traffic)
so the in-kernel broadcast is a free sublane broadcast instead of a
lane-blocked gather. For static weights use :func:`expand_weight_scales` once
and pass ``b_scales_expanded=True``.
"""

from __future__ import annotations

import contextlib
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import GemmConfig, KernelType
from ..tiling import selector
from ..utils.common import ceil_div, round_up
from .gemm import _interpret_default
from .quant import BLOCK

__all__ = ["fp8_gemm", "fp8_gemm_with_config", "expand_weight_scales",
           "exact_mode"]

# Trace-time flag: route fp8 GEMMs (dense + grouped) through an exact
# emulated-dequant f32 XLA path instead of the Pallas kernels. The golden
# model at *model* scale — lets eval harnesses (scripts/eval_quality.py)
# measure kernel arithmetic fidelity (MXU bf16-pass rounding) end-to-end.
# NOTE: read when a jit traces, not when it runs — create a fresh jitted
# callable per mode, never flip the flag under an already-traced function.
_exact = False


@contextlib.contextmanager
def exact_mode():
    """Context manager: fp8 ops compute the emulated-dequant f32 reference
    (≙ ops/reference.py, but jittable/XLA) for the duration of tracing."""
    global _exact
    prev, _exact = _exact, True
    try:
        yield
    finally:
        _exact = prev


def exact_enabled() -> bool:
    return _exact


def _dequant_a(a_q: jax.Array, a_scales: jax.Array) -> jax.Array:
    k = a_q.shape[-1]
    s = jnp.repeat(a_scales.astype(jnp.float32), BLOCK, axis=-1)[..., :k]
    return a_q.astype(jnp.float32) * s


def _dequant_b(b_q: jax.Array, bse: jax.Array) -> jax.Array:
    """bse is the lane-expanded (…, k/128, n) panel."""
    k = b_q.shape[-2]
    s = jnp.repeat(bse.astype(jnp.float32), BLOCK, axis=-2)
    return b_q.astype(jnp.float32) * s[..., :k, :]


def expand_weight_scales(b_scales: jax.Array, n: int) -> jax.Array:
    """(kb, nb) → (kb, n): repeat each block scale across its 128 lanes."""
    kb, nb = b_scales.shape
    if nb * BLOCK < n:
        raise ValueError(f"b_scales cover {nb * BLOCK} cols < n={n}")
    return jnp.repeat(b_scales.astype(jnp.float32), BLOCK, axis=1)[:, :n]


def _fp8_gemm_kernel_folded(a_ref, as_ref, b_ref, bs_ref, o_ref, acc_ref, *,
                            nk: int, groups: int, kb_total: int, out_dtype,
                            mxu_dtype, b_t: bool = False):
    """Folded-scale variant: scales are applied to the operands in f32 and
    the scaled operands cast to bf16 for ONE full-block MXU dot per grid
    step — same loop structure as the dense kernel (ops/gemm.py), trading
    ~2^-9 multiplicand rounding for full MXU pipelining.
    """
    del mxu_dtype
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    bm, bk = a_ref.shape
    bn = b_ref.shape[0] if b_t else b_ref.shape[1]
    kb_pad = as_ref.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (kb_pad, groups), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (kb_pad, groups), 1)
    sel = (row == k * groups + col).astype(jnp.float32)
    s_a_all = jnp.dot(as_ref[:], sel, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)   # (bm, groups)

    a3 = a_ref[:].reshape(bm, groups, BLOCK).astype(jnp.float32)
    a_sc = (a3 * s_a_all[:, :, None]).astype(jnp.bfloat16).reshape(bm, bk)
    if b_t:
        # (bn, groups): fold scales along B's lane-dim k groups.
        s_b_allT = jax.lax.dot_general(
            bs_ref[:], sel, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        b3 = b_ref[:].reshape(bn, groups, BLOCK).astype(jnp.float32)
        b_sc = (b3 * s_b_allT[:, :, None]).astype(jnp.bfloat16).reshape(bn, bk)
    else:
        # B scales via the same one-hot dot (a dynamic sublane slice needs a
        # provably 8-aligned start — impossible for groups < 8). Overrun
        # groups select nothing → exact zeros, masking the ragged tail free.
        rT = jax.lax.broadcasted_iota(jnp.int32, (groups, kb_pad), 1)
        cT = jax.lax.broadcasted_iota(jnp.int32, (groups, kb_pad), 0)
        selT = (rT == k * groups + cT).astype(jnp.float32)
        s_b_all = jnp.dot(selT, bs_ref[:], preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)  # (groups, bn)
        b3 = b_ref[:].reshape(groups, BLOCK, bn).astype(jnp.float32)
        b_sc = (b3 * s_b_all[:, None, :]).astype(jnp.bfloat16).reshape(bk, bn)
    # OOB fp8 garbage (ragged tail) can be NaN; NaN·0 = NaN, so mask the
    # scaled operands where the scale was zeroed.
    if nk * groups != kb_total:
        lane = jax.lax.broadcasted_iota(jnp.int32, (bm, bk), 1)
        a_sc = jnp.where(k * BLOCK * groups + lane < kb_total * BLOCK, a_sc, 0)
        kdim = 1 if b_t else 0
        sub = jax.lax.broadcasted_iota(jnp.int32, b_sc.shape, kdim)
        b_sc = jnp.where(k * BLOCK * groups + sub < kb_total * BLOCK, b_sc, 0)
    acc_ref[:] += jax.lax.dot_general(
        a_sc, b_sc, (((1,), (1 if b_t else 0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _store():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _fp8_gemm_kernel_static(a_ref, as_ref, b_ref, bs_ref, o_ref, *,
                            groups: int, out_dtype, mxu_dtype,
                            b_t: bool = False):
    """Single-K-step variant (nk == 1, i.e. block_k == K): every k-group
    index is a *compile-time* constant, so the scale rows/columns are static
    slices instead of one-hot selection dots — measured 175 vs 162 TF/s at
    4096³ on v5e (the one-hot dots + their iota generation were the entire
    gap to the pure-dot ceiling of ~172-175). The accumulator lives in
    registers/VREGs (value accumulation) and is stored once.

    ``b_t``: B stored (n, k) — DeepGEMM's native NT layout. The k-group
    slice moves to B's lane dim and the dot contracts lane×lane; the scale
    panel keeps its (kb, n) layout either way.
    """
    acc = None
    for g in range(groups):
        a_g = a_ref[:, g * BLOCK:(g + 1) * BLOCK]
        b_g = (b_ref[:, g * BLOCK:(g + 1) * BLOCK] if b_t
               else b_ref[g * BLOCK:(g + 1) * BLOCK, :])
        if mxu_dtype is not None:
            a_g = a_g.astype(mxu_dtype)
            b_g = b_g.astype(mxu_dtype)
        dims = (((1,), (1 if b_t else 0,)), ((), ()))
        p = jax.lax.dot_general(a_g, b_g, dims,
                                preferred_element_type=jnp.float32)
        contrib = p * as_ref[:, g:g + 1] * bs_ref[g:g + 1, :]
        acc = contrib if acc is None else acc + contrib
    o_ref[:] = acc.astype(out_dtype)


def _fp8_gemm_kernel_blocked(a_ref, as_ref, b_ref, bs_ref, o_ref, acc_ref, *,
                             nk: int, groups: int, kb_total: int, out_dtype,
                             mxu_dtype, b_t: bool = False):
    """Grid (nm, nn, nk) with PER-STEP scale blocks — the default nk > 1
    accum kernel.

    a_ref: (bm, bk) fp8 | as_ref: (1, bm, groups) f32 — THIS k-step's A scales
    b_ref: (bk, bn) / (bn, bk) fp8 | bs_ref: (1, groups, bn) f32

    The round-1 kernel kept FULL scale panels resident and selected each
    k-step's rows with one-hot mini-dots, because lane-dim dynamic slicing
    has no Mosaic lowering. Reshaping the
    panels on the host to (nk, bm, groups) / (nk, groups, bn) instead lets
    the BlockSpec k-index deliver each step's scale block directly — every
    in-kernel slice is then STATIC, the same property that makes the
    nk == 1 kernel the fast path (175 vs 162 TF/s at 4096³). A ``groups``
    last/sublane block dim is Mosaic-legal because it equals the full
    array dim. Scale traffic grows from one panel per output tile to one
    tiny block per k-step — (bm + bn)·groups·4 B, noise next to the fp8
    operand blocks."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s_a_all = as_ref[0]          # (bm, groups) f32
    s_b_all = bs_ref[0]          # (groups, bn) f32
    ragged = nk * groups != kb_total
    for g in range(groups):
        a_g = a_ref[:, g * BLOCK:(g + 1) * BLOCK]
        b_g = (b_ref[:, g * BLOCK:(g + 1) * BLOCK] if b_t
               else b_ref[g * BLOCK:(g + 1) * BLOCK, :])
        if mxu_dtype is not None:
            a_g = a_g.astype(mxu_dtype)
            b_g = b_g.astype(mxu_dtype)
        if ragged:
            # Last grid step may overrun kb_total; zero BOTH dot inputs
            # (OOB fp8 garbage can decode to NaN; 0 × NaN = NaN). The
            # zero-padded scale blocks alone would not save a NaN product.
            valid = k * groups + g < kb_total
            a_g = jnp.where(valid, a_g, jnp.zeros_like(a_g))
            b_g = jnp.where(valid, b_g, jnp.zeros_like(b_g))
        p = jax.lax.dot_general(a_g, b_g, (((1,), (1 if b_t else 0,)),
                                           ((), ())),
                                preferred_element_type=jnp.float32)
        # Dequant-in-accumulator: scales applied in f32, matching the
        # emulated-dequant golden to bf16-free precision.
        acc_ref[:] += p * s_a_all[:, g:g + 1] * s_b_all[g:g + 1, :]

    @pl.when(k == nk - 1)
    def _store():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _check_scale_mode(scale_mode: str, allow_relaxed: bool) -> None:
    """Numerics gate: ``folded`` trades ~2^-9 multiplicand rounding for one
    full-block dot per step — within its documented 5e-3 rel-L2 contract but
    OUTSIDE the strict outlier-ratio ≤ 1e-4 acceptance gate on heavy-tail
    data (the reference's acceptance form, `framework/tests/test.py:19-21`).
    Require explicit opt-in so nobody picks it expecting gate-clean output."""
    if scale_mode == "folded" and not allow_relaxed:
        raise ValueError(
            "scale_mode='folded' fails the strict outlier-ratio <=1e-4 "
            "acceptance gate (documented ~2^-9 operand rounding; 5e-3 "
            "rel-L2 contract). Pass allow_relaxed=True to opt in, or use "
            "the default scale_mode='accum' (gate-clean, dequant in the "
            "f32 accumulator).")


def _fp8_gemm_xla(a_q, a_scales, b_q, b_scales_expanded, *, out_dtype, b_t):
    """XLA-family realization (config.py ``KernelType.XLA``): blocked einsum
    with the SAME accum-mode scale math as the Pallas kernels — fp8→bf16
    upcast is exact (e4m3's 3 mantissa bits ⊂ bf16's 7), each 128-deep
    K-block dot accumulates in f32, and per-block scales multiply the f32
    partials before the final f32 block sum. Gate-clean (outlier ratio
    ≤ 1e-4 vs the dequant golden), unlike scale_mode='folded'.

    Materializes a (kb, m, n) f32 partial — intended for the small
    dispatch-floor-bound shapes the autotuner admits it for
    (tiling/autotune.py XLA candidate gate), not large GEMMs.
    """
    m, k = a_q.shape
    kb = k // BLOCK
    n = b_q.shape[0] if b_t else b_q.shape[1]
    a3 = a_q.reshape(m, kb, BLOCK).astype(jnp.bfloat16)
    if b_t:
        b3 = b_q.reshape(n, kb, BLOCK).astype(jnp.bfloat16)
        partial = jnp.einsum("mbk,nbk->bmn", a3, b3,
                             preferred_element_type=jnp.float32)
    else:
        b3 = b_q.reshape(kb, BLOCK, n).astype(jnp.bfloat16)
        partial = jnp.einsum("mbk,bkn->bmn", a3, b3,
                             preferred_element_type=jnp.float32)
    scaled = (partial
              * a_scales.astype(jnp.float32).T[:, :, None]
              * b_scales_expanded[:, None, :])
    return jnp.sum(scaled, axis=0).astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("config", "out_dtype", "interpret", "mxu_dtype",
                              "scale_mode", "allow_relaxed", "b_layout"))
def fp8_gemm_with_config(
    a_q: jax.Array,
    a_scales: jax.Array,
    b_q: jax.Array,
    b_scales_expanded: jax.Array,
    *,
    config: GemmConfig,
    out_dtype=jnp.bfloat16,
    interpret: Optional[bool] = None,
    mxu_dtype=None,
    scale_mode: str = "accum",
    allow_relaxed: bool = False,
    b_layout: str = "n",
) -> jax.Array:
    """FP8 GEMM with explicit tiling; ``b_scales_expanded`` is (kb, n) f32
    regardless of ``b_layout`` (the scale panel layout is kernel-internal).

    ``b_layout='t'``: B stored (n, k) — DeepGEMM's native NT convention
    (weights K-major in HBM); the kernels contract B's lane dim directly,
    no HBM transpose. ≙ the reference's hardcoded A-row/B-col layout pair
    (`catlass_dynamic_matmul_tiling.cpp:83-104`)."""
    _check_scale_mode(scale_mode, allow_relaxed)
    if b_layout not in ("n", "t"):
        raise ValueError(f"b_layout must be 'n' or 't', got {b_layout!r}")
    b_t = b_layout == "t"
    m, k = a_q.shape
    if b_t:
        n, k2 = b_q.shape
    else:
        k2, n = b_q.shape
    if k != k2:
        raise ValueError(f"inner dims mismatch: {a_q.shape} @ {b_q.shape} "
                         f"(b_layout={b_layout})")
    if k % BLOCK:
        raise ValueError(f"fp8_gemm requires k % {BLOCK} == 0, got k={k}")
    if n % BLOCK:
        raise ValueError(f"fp8_gemm requires n % {BLOCK} == 0, got n={n}")
    kb = k // BLOCK
    if a_scales.shape != (m, kb):
        raise ValueError(f"a_scales must be {(m, kb)}, got {a_scales.shape}")
    if b_scales_expanded.shape != (kb, n):
        raise ValueError(
            f"expanded b_scales must be {(kb, n)}, got {b_scales_expanded.shape}")
    if interpret is None:
        interpret = _interpret_default()

    if config.kernel_type == KernelType.XLA:
        if scale_mode != "accum" or mxu_dtype is not None:
            # The XLA realization implements accum-mode math only; silently
            # substituting it for an explicit folded/mxu_dtype opt-in would
            # mislabel a numerics comparison.
            raise ValueError(
                "KernelType.XLA supports only the default scale_mode="
                f"'accum' / mxu_dtype=None (got {scale_mode!r}/{mxu_dtype})")
        return _fp8_gemm_xla(a_q, a_scales, b_q, b_scales_expanded,
                             out_dtype=out_dtype, b_t=b_t)

    bm = min(config.block_m, round_up(m, 32))   # fp8 sublane = 32
    bn = min(config.block_n, n)
    bk = min(config.block_k, k)
    if bk % BLOCK:
        raise ValueError(f"block_k must be a multiple of {BLOCK}, got {bk}")
    if bn % BLOCK:
        raise ValueError(f"block_n must be a multiple of {BLOCK}, got {bn}")
    groups = bk // BLOCK
    nm, nn, nk = ceil_div(m, bm), ceil_div(n, bn), ceil_div(k, bk)

    cost = pl.CostEstimate(
        flops=2 * m * n * k,
        bytes_accessed=int(m * k + k * n + m * kb * 4 + kb * n * 4
                           + m * n * jnp.dtype(out_dtype).itemsize),
        transcendentals=0)
    params = {}
    if not interpret:
        # Must match the grid actually built below: only the accum mode
        # takes the 2-D single-K-step grid.
        two_d = nk == 1 and scale_mode == "accum"
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=(("parallel", "parallel") if two_d else
                                 ("parallel", "parallel", "arbitrary")),
            **({"vmem_limit_bytes": config.vmem_limit_bytes}
               if config.vmem_limit_bytes else {}),
        )

    b_block = (bn, bk) if b_t else (bk, bn)

    if nk == 1 and scale_mode == "accum":
        # Whole K in one grid step: static scale slices, no one-hot, no
        # scratch accumulator (fastest path — the tuner's preferred configs
        # land here whenever K fits VMEM).
        kernel = functools.partial(
            _fp8_gemm_kernel_static, groups=groups,
            out_dtype=out_dtype, mxu_dtype=mxu_dtype, b_t=b_t)
        b_map2 = ((lambda i, j: (j, 0)) if b_t else (lambda i, j: (0, j)))
        return pl.pallas_call(
            kernel,
            grid=(nm, nn),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j: (i, 0)),
                pl.BlockSpec((bm, kb), lambda i, j: (i, 0)),
                pl.BlockSpec(b_block, b_map2),
                pl.BlockSpec((kb, bn), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
            out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
            cost_estimate=cost,
            interpret=interpret,
            **params,
        )(a_q, a_scales.astype(jnp.float32), b_q, b_scales_expanded)

    b_map3 = ((lambda i, j, kk: (j, kk)) if b_t
              else (lambda i, j, kk: (kk, j)))

    if scale_mode == "accum":
        # Reshape the scale panels so the grid's k index addresses each
        # step's scale block (see _fp8_gemm_kernel_blocked): zero-pad kb to
        # nk·groups (zero scales ⇒ zero contribution; the kernel still
        # masks the fp8 operands against NaN), then split the k-block axis
        # out front.
        kb_pad = nk * groups
        a_sc = a_scales.astype(jnp.float32)
        b_sc = b_scales_expanded
        if kb_pad != kb:
            a_sc = jnp.pad(a_sc, ((0, 0), (0, kb_pad - kb)))
            b_sc = jnp.pad(b_sc, ((0, kb_pad - kb), (0, 0)))
        a_sc3 = jnp.moveaxis(a_sc.reshape(m, nk, groups), 1, 0)
        b_sc3 = b_sc.reshape(nk, groups, n)
        kernel = functools.partial(
            _fp8_gemm_kernel_blocked, nk=nk, groups=groups, kb_total=kb,
            out_dtype=out_dtype, mxu_dtype=mxu_dtype, b_t=b_t)
        return pl.pallas_call(
            kernel,
            grid=(nm, nn, nk),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
                pl.BlockSpec((1, bm, groups), lambda i, j, kk: (kk, i, 0)),
                pl.BlockSpec(b_block, b_map3),
                pl.BlockSpec((1, groups, bn), lambda i, j, kk: (kk, 0, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
            out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
            cost_estimate=cost,
            interpret=interpret,
            **params,
        )(a_q, a_sc3, b_q, b_sc3)

    kernel = functools.partial(
        _fp8_gemm_kernel_folded, nk=nk, groups=groups, kb_total=kb,
        out_dtype=out_dtype, mxu_dtype=mxu_dtype, b_t=b_t)
    return pl.pallas_call(
        kernel,
        grid=(nm, nn, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            # Full scale panels: block index constant in kk → resident across
            # the whole K loop of one output tile (no per-step refetch).
            pl.BlockSpec((bm, kb), lambda i, j, kk: (i, 0)),
            pl.BlockSpec(b_block, b_map3),
            pl.BlockSpec((kb, bn), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        cost_estimate=cost,
        interpret=interpret,
        **params,
    )(a_q, a_scales.astype(jnp.float32), b_q, b_scales_expanded)


def fp8_gemm(
    a_q: jax.Array,
    a_scales: jax.Array,
    b_q: jax.Array,
    b_scales: jax.Array,
    *,
    out_dtype=jnp.bfloat16,
    config: Optional[GemmConfig] = None,
    interpret: Optional[bool] = None,
    mxu_dtype=None,
    b_scales_expanded: bool = False,
    scale_mode: str = "accum",
    allow_relaxed: bool = False,
    auto_pad: bool = False,
    b_layout: str = "n",
) -> jax.Array:
    """Blockwise-scaled FP8 GEMM (DeepGEMM ``gemm_fp8_fp8_bf16_nt`` analogue).

    a_q: (m, k) e4m3 with a_scales (m, k/128) f32;
    b_q: (k, n) e4m3 with b_scales (k/128, n/128) f32 — or (k/128, n) if
    ``b_scales_expanded`` (pre-expanded once for static weights).
    ``b_layout='t'``: B stored (n, k) with b_scales (n/128, k/128) —
    DeepGEMM's native NT call (K-major weights need no HBM transpose);
    tiling is cached per layout (op key ``fp8_gemm_nt``).
    ``auto_pad`` lifts ragged n/k into the 128-multiple kernel contract via
    scale-preserving zero padding (tiling/padding.py) and slices the output
    back; without it ragged shapes raise.
    ``scale_mode='folded'`` requires ``allow_relaxed=True`` (it is outside
    the strict acceptance gate — see :func:`_check_scale_mode`).
    """
    _check_scale_mode(scale_mode, allow_relaxed)
    if b_layout not in ("n", "t"):
        raise ValueError(f"b_layout must be 'n' or 't', got {b_layout!r}")
    b_t = b_layout == "t"
    if b_t and b_scales_expanded:
        raise ValueError("b_layout='t' requires unexpanded (n/128, k/128) "
                         "b_scales — the expanded panel layout is "
                         "kernel-internal")
    n_b = b_q.shape[0] if b_t else b_q.shape[1]
    if _exact:
        if b_t:
            bse = expand_weight_scales(
                jnp.swapaxes(b_scales, 0, 1), n_b)
            b_deq = jnp.swapaxes(_dequant_b(jnp.swapaxes(b_q, 0, 1), bse),
                                 0, 1)
            return jax.lax.dot_general(
                _dequant_a(a_q, a_scales), b_deq, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST).astype(out_dtype)
        bse = (b_scales if b_scales_expanded
               else expand_weight_scales(b_scales, n_b))
        return jnp.dot(_dequant_a(a_q, a_scales), _dequant_b(b_q, bse),
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST).astype(out_dtype)
    if auto_pad and b_scales_expanded:
        raise ValueError("auto_pad requires unexpanded b_scales (the pad "
                         "helper re-expands them; pass b_scales_expanded="
                         "False)")
    if auto_pad and not b_scales_expanded:
        if b_t:
            from ..tiling.padding import pad_fp8_operands_nt
            a_q, a_scales, b_q, b_scales, n_orig = pad_fp8_operands_nt(
                a_q, a_scales, b_q, b_scales)
        else:
            from ..tiling.padding import pad_fp8_operands
            a_q, a_scales, b_q, b_scales, n_orig = pad_fp8_operands(
                a_q, a_scales, b_q, b_scales)
        out = fp8_gemm(a_q, a_scales, b_q, b_scales, out_dtype=out_dtype,
                       config=config, interpret=interpret,
                       mxu_dtype=mxu_dtype, scale_mode=scale_mode,
                       allow_relaxed=allow_relaxed, b_layout=b_layout)
        return out[:, :n_orig]
    m, k = a_q.shape
    n = n_b
    op = "fp8_gemm_nt" if b_t else "fp8_gemm"
    cfg = selector.select_config(
        m, n, k, a_q.dtype, out_dtype, op=op, k_granularity=BLOCK,
        override=config)
    if b_t:
        # Scale panel keeps the (kb, n) layout either way: transpose the
        # tiny (nb, kb) block-scale table, then lane-expand.
        bse = expand_weight_scales(jnp.swapaxes(b_scales, 0, 1), n)
    else:
        bse = (b_scales if b_scales_expanded
               else expand_weight_scales(b_scales, n))
    return fp8_gemm_with_config(
        a_q, a_scales, b_q, bse, config=cfg, out_dtype=out_dtype,
        interpret=interpret, mxu_dtype=mxu_dtype, scale_mode=scale_mode,
        allow_relaxed=allow_relaxed, b_layout=b_layout)


