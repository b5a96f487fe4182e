"""Dense GEMM Pallas kernels (bf16/fp16/fp32 in, fp32/bf16 out).

TPU-native re-design of the reference's generated AscendC GEMM
(``framework/csrc/jit/generate_code.hpp:123-369`` / hand-written original
``framework/deep_gemm_ascend/include/impls/mmad_jit.cpp:42-416``). The
reference's loop nest — core grid (m_sections × n_sections), L1 tiles with
double buffering, L0 Mmad with ``cmatrixInitVal`` on the first k step, Fixpipe
store of the fp32 accumulator — maps onto Pallas as:

* core grid + per-core tile loops  →  ``pallas_call`` grid (nm, nn, nk) with
  ``dimension_semantics=("parallel","parallel","arbitrary")``; Mosaic assigns
  grid cells to TensorCores and pipelines HBM→VMEM copies automatically
  (≙ the TQue double buffer, `mmad_jit.cpp:137-151`);
* ``Mmad(..., cmatrixInitVal=first)`` (`mmad_jit.cpp:365-380`)  →  zero the
  fp32 VMEM accumulator at k == 0 and ``jnp.dot(..,
  preferred_element_type=f32)`` on the MXU;
* Fixpipe CO1→GM (`mmad_jit.cpp:396-411`)  →  cast + write the out block on
  the last k step;
* Nd2Nz/Zz/Zn layout juggling (`mmad_jit.cpp:276-359`)  →  not needed; Mosaic
  lays VMEM tiles out for the MXU;
* tail handling (``m_o_fix``/``r_m_blocks`` etc., `get_best_config.hpp:96-150`)
  →  BlockSpec masks ragged M/N writes; only the K tail needs an explicit
  in-kernel mask because out-of-bounds K garbage would contaminate valid
  accumulator values.

Split-K (``KSPLIT``) covers the reference's split-K/stream-K family
(`padding_streamk_matmul_kernel.h:28-131`): K is parallelized over the grid
into partial fp32 outputs reduced outside the kernel.
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

__all__ = ["gemm", "bgemm", "gemm_with_config"]


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _gemm_kernel(a_ref, b_ref, o_ref, acc_ref, *, nk: int, k_rem: int,
                 out_dtype, a_t: bool = False, b_t: bool = False):
    """One (bm, bk) × (bk, bn) MXU step with fp32 accumulation.

    Grid = (m, n, k) with k innermost; ``acc_ref`` is VMEM scratch that
    persists across the k steps of one output tile. ``a_t``/``b_t`` flag
    transposed-in-HBM operands (A stored (k, m) / B stored (n, k)) — the
    reference dispatches four layout combinations with per-layout tiling
    (`op_host/op_tiling/do_tiling.h:24-26`, `do_tiling.cpp:20-204`); on TPU
    the MXU contracts either dim natively via ``dot_general`` dimension
    numbers, so the layouts share one kernel.
    """
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _zero():  # ≙ cmatrixInitVal on first Mmad (`mmad_jit.cpp:369-378`)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    a = a_ref[:]
    b = b_ref[:]
    if k_rem:
        # K tail: zero the out-of-range tail of the LAST k block in BOTH
        # operands — out-of-bounds garbage (NaN in interpret mode) would
        # otherwise contaminate the accumulator even against a zeroed other
        # side (0 × NaN = NaN). ≙ k_o_fix tail math (`get_best_config.hpp:117-125`).
        in_tail = k == nk - 1
        a_kdim = 0 if a_t else 1
        a_iota = jax.lax.broadcasted_iota(jnp.int32, a.shape, a_kdim)
        a = jnp.where(~in_tail | (a_iota < k_rem), a, 0)
        b_kdim = 1 if b_t else 0
        b_iota = jax.lax.broadcasted_iota(jnp.int32, b.shape, b_kdim)
        b = jnp.where(~in_tail | (b_iota < k_rem), b, 0)
    dims = (((0 if a_t else 1,), (1 if b_t else 0,)), ((), ()))
    acc_ref[:] += jax.lax.dot_general(a, b, dims,
                                      preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _store():  # ≙ Fixpipe epilogue (`mmad_jit.cpp:396-411`)
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _check_layout(layout: str) -> tuple[bool, bool]:
    if len(layout) != 2 or any(c not in "nt" for c in layout):
        raise ValueError(f"layout must be one of nn/nt/tn/tt, got {layout!r}")
    return layout[0] == "t", layout[1] == "t"


@functools.partial(
    jax.jit,
    static_argnames=("config", "out_dtype", "interpret", "layout"),
)
def gemm_with_config(
    a: jax.Array,
    b: jax.Array,
    *,
    config: GemmConfig,
    out_dtype=jnp.float32,
    interpret: Optional[bool] = None,
    layout: str = "nn",
) -> jax.Array:
    """``a @ b`` with an explicit tile config (the autotuner entry point).

    ≙ the reference bench path where tiling knobs come from the caller
    (`gemm_bench.hpp:49-113`) — but here re-specializing per config is just a
    cached jit compile, so the reference's params-in-GM generic-binary trick
    (`generate_code.hpp:78-121`) is unnecessary.

    ``layout``: two chars for (A, B) — "n" = stored as the logical operand
    ((m,k) / (k,n) row-major), "t" = stored transposed ((k,m) / (n,k)).
    ≙ the reference's 4-way layout dispatch (`do_tiling.h:24-26`); the
    kernel contracts either dim via dot_general, no HBM transpose.
    """
    a_t, b_t = _check_layout(layout)
    if a.ndim != 2 or b.ndim != 2:
        raise ValueError(f"gemm expects 2-D operands, got {a.shape} @ {b.shape}")
    m, k = (a.shape[1], a.shape[0]) if a_t else a.shape
    k2, n = (b.shape[1], b.shape[0]) if b_t else b.shape
    if k != k2:
        raise ValueError(f"inner dims mismatch: {a.shape} @ {b.shape} "
                         f"(layout {layout})")
    if interpret is None:
        interpret = _interpret_default()

    if config.kernel_type == KernelType.XLA:
        # XLA family (config.py KernelType.XLA): same contraction, no
        # Pallas dispatch — wins on dispatch-floor-bound small shapes.
        dims = (((0 if a_t else 1,), (1 if b_t else 0,)), ((), ()))
        return jax.lax.dot_general(
            a, b, dims, preferred_element_type=jnp.float32
        ).astype(out_dtype)

    sub_a = _sublane(a.dtype)
    sub_b = _sublane(b.dtype)
    if a_t:
        # A block is (bk, bm): bm sits in the lane dim → multiple of 128
        # or the full (ragged) m extent.
        bm = min(config.block_m, m if m % 128 else round_up(m, 128))
        if m % 128 == 0 and bm % 128:
            bm = round_up(bm, 128)
        elif m % 128:
            bm = m
    else:
        bm = min(config.block_m, round_up(m, sub_a))
    if b_t:
        # B block is (bn, bk): bn in the sublane dim, bk in the lane dim.
        bn = min(config.block_n, round_up(n, sub_b))
    else:
        bn = min(config.block_n, round_up(n, 128))
    bk = min(config.block_k, round_up(k, 128))
    if config.pad_k and k % bk and layout == "nn":
        # Pre-pad K in HBM instead of masking the tail on every grid step —
        # the padding cost model's PAD_K decision (tiling/padding.py,
        # ≙ the reference's explicit padding family `select_kernel.cpp:353-364`).
        from ..tiling.padding import pad_k_operands
        a, b = pad_k_operands(a, b, bk)
        k = a.shape[1]
    nm, nn, nk = ceil_div(m, bm), ceil_div(n, bn), ceil_div(k, bk)
    k_rem = k - (nk - 1) * bk if k % bk else 0

    if (config.kernel_type == KernelType.KSPLIT and config.k_split > 1
            and nk >= config.k_split and layout == "nn"):
        return _gemm_ksplit(a, b, bm, bn, bk, config.k_split, out_dtype, interpret)

    kernel = functools.partial(_gemm_kernel, nk=nk, k_rem=k_rem,
                               out_dtype=out_dtype, a_t=a_t, b_t=b_t)

    a_idx = (lambda i, kk: (kk, i)) if a_t else (lambda i, kk: (i, kk))
    b_idx = (lambda j, kk: (j, kk)) if b_t else (lambda j, kk: (kk, j))
    n_major = config.swizzle == SwizzleDir.N_MAJOR
    if n_major:
        grid = (nn, nm, nk)
        a_map = lambda j, i, kk: a_idx(i, kk)
        b_map = lambda j, i, kk: b_idx(j, kk)
        o_map = lambda j, i, kk: (i, j)
    else:
        grid = (nm, nn, nk)
        a_map = lambda i, j, kk: a_idx(i, kk)
        b_map = lambda i, j, kk: b_idx(j, kk)
        o_map = lambda i, j, kk: (i, j)

    params = {}
    if not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            **({"vmem_limit_bytes": config.vmem_limit_bytes}
               if config.vmem_limit_bytes else {}),
        )
    flops = 2 * m * n * k
    bytes_accessed = (m * k * a.dtype.itemsize + k * n * b.dtype.itemsize
                      + m * n * jnp.dtype(out_dtype).itemsize)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bk, bm) if a_t else (bm, bk), a_map),
            pl.BlockSpec((bn, bk) if b_t else (bk, bn), b_map),
        ],
        out_specs=pl.BlockSpec((bm, bn), o_map),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=int(flops), bytes_accessed=int(bytes_accessed), transcendentals=0),
        interpret=interpret,
        **params,
    )(a, b)


def _ksplit_kernel(a_ref, b_ref, o_ref, acc_ref, *, nk: int, k_rem: int,
                   nk_per_split: int):
    """Split-K partial-product kernel: grid (s, m, n, k_inner)."""
    s = pl.program_id(0)
    kk = pl.program_id(3)
    k = s * nk_per_split + kk  # global k block index

    @pl.when(kk == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    a = a_ref[:]
    b = b_ref[:]
    if k_rem:
        # >= (not ==) so grid-overrun steps clamped onto the tail block are
        # masked too (their B block is the tail block incl. OOB rows).
        in_tail = k >= nk - 1
        a_lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
        a = jnp.where(~in_tail | (a_lane < k_rem), a, 0)
        b_sub = jax.lax.broadcasted_iota(jnp.int32, b.shape, 0)
        b = jnp.where(~in_tail | (b_sub < k_rem), b, 0)
    # Grid may overrun nk when nk % k_split != 0: the index map clamps the
    # block to the last valid one; zero A so the duplicate contributes nothing.
    a = jnp.where(k < nk, a, 0)
    acc_ref[:] += jnp.dot(a, b, preferred_element_type=jnp.float32)

    @pl.when(kk == nk_per_split - 1)
    def _store():
        o_ref[:] = acc_ref[:]


def _gemm_ksplit(a, b, bm, bn, bk, k_split, out_dtype, interpret):
    m, k = a.shape
    _, n = b.shape
    nm, nn, nk = ceil_div(m, bm), ceil_div(n, bn), ceil_div(k, bk)
    nk_per_split = ceil_div(nk, k_split)
    k_rem = k - (nk - 1) * bk if k % bk else 0

    kernel = functools.partial(
        _ksplit_kernel, nk=nk, k_rem=k_rem, nk_per_split=nk_per_split)

    def clamp_k(kidx):
        # Clamp OOB k blocks to the last valid one; the kernel zeroes them.
        return jnp.minimum(kidx, nk - 1)

    params = {}
    if not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        )
    partial_out = pl.pallas_call(
        kernel,
        grid=(k_split, nm, nn, nk_per_split),
        in_specs=[
            pl.BlockSpec((bm, bk),
                         lambda s, i, j, kk: (i, clamp_k(s * nk_per_split + kk))),
            pl.BlockSpec((bk, bn),
                         lambda s, i, j, kk: (clamp_k(s * nk_per_split + kk), j)),
        ],
        out_specs=pl.BlockSpec((None, bm, bn), lambda s, i, j, kk: (s, i, j)),
        out_shape=jax.ShapeDtypeStruct((k_split, m, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=interpret,
        **params,
    )(a, b)
    # Reduce epilogue ≙ StreamkReduceAdd (`padding_streamk_matmul_kernel.h:96-101`).
    return jnp.sum(partial_out, axis=0).astype(out_dtype)


def _sublane(dtype) -> int:
    from ..tiling.platform import min_sublane
    return min_sublane(dtype)


def gemm(
    a: jax.Array,
    b: jax.Array,
    *,
    out_dtype=jnp.float32,
    config: Optional[GemmConfig] = None,
    interpret: Optional[bool] = None,
    layout: str = "nn",
) -> jax.Array:
    """Dense ``a @ b`` with automatic tile selection (cache → analytic).

    The public analogue of ``deep_gemm_ascend.run_mmad_rtc``
    (`framework/csrc/python_api.cpp:30-36`, flow §3.1 of SURVEY.md), with the
    shape-specialized compile handled by ``jax.jit`` + the XLA compilation
    cache instead of string codegen + cmake. ``layout`` selects operand
    storage (nn/nt/tn/tt — ≙ `do_tiling.h:24-26`); non-nn layouts key the
    tiling cache separately (per-layout tiling, like the reference).
    """
    a_t, b_t = _check_layout(layout)
    if a.ndim != 2 or b.ndim != 2:
        raise ValueError(f"gemm expects 2-D operands, got {a.shape} @ {b.shape}")
    m, k = (a.shape[1], a.shape[0]) if a_t else a.shape
    n = b.shape[0] if b_t else b.shape[1]
    op = "gemm" if layout == "nn" else f"gemm_{layout}"
    cfg = selector.select_config(m, n, k, a.dtype, out_dtype, op=op,
                                 override=config)
    return gemm_with_config(a, b, config=cfg, out_dtype=out_dtype,
                            interpret=interpret, layout=layout)


def bgemm(
    a: jax.Array,
    b: jax.Array,
    *,
    out_dtype=jnp.float32,
    config: Optional[GemmConfig] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Batched GEMM (…, M, K) @ (…, K, N) — ≙ the reference's batch loop
    (`mmad_jit.cpp:153`); implemented by vmapping the 2-D kernel so each
    batch element reuses the same compiled Pallas program."""
    if a.ndim == 2:
        return gemm(a, b, out_dtype=out_dtype, config=config, interpret=interpret)
    if a.ndim != b.ndim:
        raise ValueError(f"rank mismatch: {a.shape} vs {b.shape}")
    m, k, n = a.shape[-2], a.shape[-1], b.shape[-1]
    cfg = selector.select_config(m, n, k, a.dtype, out_dtype, op="bgemm",
                                 override=config)
    fn = functools.partial(gemm_with_config, config=cfg, out_dtype=out_dtype,
                           interpret=interpret)
    for _ in range(a.ndim - 2):
        fn = jax.vmap(fn)
    return fn(a, b)
