"""Grouped FP8 GEMM for MoE — contiguous (prefill) and masked (decode).

The reference has no grouped GEMM (SURVEY.md §1 "absent" list); the API
shape follows DeepGEMM's ``m_grouped_gemm_fp8_fp8_bf16_nt_contiguous`` /
``..._masked`` as the north star requires, realized as Pallas
scalar-prefetch grids (``pltpu.PrefetchScalarGridSpec``):

* **contiguous**: one flat (M_total, K) activation matrix whose rows are
  grouped by expert; each group's row span is padded to a multiple of
  ``block_m`` (DeepGEMM imposes the same alignment). A per-m-tile expert-id
  vector is scalar-prefetched and drives the *index map* of the expert
  weight tensor — the TPU analogue of DeepGEMM's tensor-of-pointers.
  Padding tiles carry id -1 → compute is skipped and zeros are written.

* **masked**: per-expert activation buffers of a fixed decode-friendly shape
  (E, M_max, K) with a ``masked_m`` vector saying how many rows are real —
  the "CUDA-graph-style fixed shapes" config: the compiled kernel is
  identical across steps, only tensor contents (incl. masked_m) change.

Both kernels reuse the dequant-in-accumulator structure of ops/fp8_gemm.py
(raw fp8 into the MXU — the v5e software upcast is 5× the dot cost — with
128-deep K groups and f32 scale application on the accumulator).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import GemmConfig, KernelType
from ..tiling import selector
from ..utils.common import ceil_div, round_up
from . import fp8_gemm as fp8mod
from .gemm import _interpret_default
from .quant import BLOCK

__all__ = [
    "m_grouped_gemm_contiguous",
    "m_grouped_gemm_masked",
    "make_contiguous_layout",
]


def make_contiguous_layout(
    tokens_per_expert: Sequence[int], block_m: int,
) -> Tuple[int, np.ndarray, np.ndarray]:
    """Plan the contiguous layout: (m_total_padded, tile_group_ids, row_map).

    ``row_map[i]`` = source row feeding padded row i (or -1 for padding);
    ``tile_group_ids[t]`` = expert of m-tile t (or -1 for padding tiles).
    """
    tile_ids, row_map = [], []
    src = 0
    for e, cnt in enumerate(tokens_per_expert):
        padded = round_up(int(cnt), block_m) if cnt else 0
        for r in range(padded):
            row_map.append(src + r if r < cnt else -1)
        src += int(cnt)
        tile_ids.extend([e] * (padded // block_m))
    m_total = len(row_map)
    return m_total, np.asarray(tile_ids, np.int32), np.asarray(row_map, np.int32)


def _grouped_kernel(gid_ref, a_ref, as_ref, b_ref, bs_ref, o_ref, acc_ref, *,
                    nk: int, groups: int, kb_total: int, out_dtype,
                    b_t: bool = False):
    """Contiguous grouped GEMM step. Grid (nm, nn, nk).

    gid_ref: (nm,) int32 scalar-prefetch — expert id per m tile (-1 = pad).
    b_ref block: (1, bk, bn) of (E, K, N) — or (1, bn, bk) of (E, N, K) when
    ``b_t`` (DeepGEMM's native NT grouped layout, K-major expert weights;
    the dot contracts B's lane dim, no HBM transpose — same convention as
    the dense twin's ``b_layout='t'``).

    Scale panels arrive PRE-SPLIT by k-block — as_ref (1, bm, groups) of
    (nk, M, groups), bs_ref (1, 1, groups, bn) of (E, nk, groups, N) — so
    every in-kernel scale slice is static (same blocked-scale layout as the
    dense twin, ops/fp8_gemm.py ``_fp8_gemm_kernel_blocked``; replaces the
    round-1 one-hot selection dots, which cost ~8% at 4096³).
    """
    i = pl.program_id(0)
    k = pl.program_id(2)
    active = gid_ref[i] >= 0

    @pl.when(k == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(active)
    def _compute():
        s_a_all = as_ref[0]          # (bm, groups)
        s_b_all = bs_ref[0, 0]       # (groups, bn)
        ragged = nk * groups != kb_total
        for g in range(groups):
            a_g = a_ref[:, g * BLOCK:(g + 1) * BLOCK]
            b_g = (b_ref[0, :, g * BLOCK:(g + 1) * BLOCK] if b_t
                   else b_ref[0, g * BLOCK:(g + 1) * BLOCK, :])
            if ragged:
                # Overrun groups: zero BOTH dot inputs (OOB fp8 garbage can
                # be NaN; the zero-padded scales alone cannot save NaN·0).
                valid = k * groups + g < kb_total
                a_g = jnp.where(valid, a_g, jnp.zeros_like(a_g))
                b_g = jnp.where(valid, b_g, jnp.zeros_like(b_g))
            p = jax.lax.dot_general(
                a_g, b_g, (((1,), (1 if b_t else 0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_ref[:] += p * s_a_all[:, g:g + 1] * s_b_all[g:g + 1, :]

    @pl.when(k == nk - 1)
    def _store():
        o_ref[:] = jnp.where(active, acc_ref[:], 0.0).astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("config", "out_dtype", "interpret", "b_t"))
def _grouped_contiguous_call(
    tile_gids, a_q, a_scales, b_q, bs_exp, *, config, out_dtype, interpret,
    b_t=False):
    m, k = a_q.shape
    if b_t:
        e, n, _ = b_q.shape
    else:
        e, _, n = b_q.shape
    kb = k // BLOCK
    if config.kernel_type == KernelType.XLA:
        # No XLA realization for the ragged contiguous layout (a dense
        # segment-matmul would recompute every expert's panel for all rows);
        # refuse loudly rather than silently running the Pallas path.
        raise ValueError("KernelType.XLA is not supported for the grouped "
                         "contiguous layout")
    bm, bn, bk = config.block_m, min(config.block_n, n), min(config.block_k, k)
    if bn % BLOCK or bk % BLOCK:
        raise ValueError(
            f"block_n/block_k must be multiples of {BLOCK}, got {bn}/{bk}")
    groups = bk // BLOCK
    nm, nn, nk = m // bm, ceil_div(n, bn), ceil_div(k, bk)
    kb_pad = nk * groups
    a_sc = a_scales.astype(jnp.float32)
    if kb_pad > kb:
        # Zero-padded scale groups: zero contribution (the kernel still
        # masks the fp8 operands against NaN).
        a_sc = jnp.pad(a_sc, ((0, 0), (0, kb_pad - kb)))
        bs_exp = jnp.pad(bs_exp, ((0, 0), (0, kb_pad - kb), (0, 0)))
    # Blocked scale layout (see _grouped_kernel): k-block axis out front so
    # the grid index delivers each step's scale block.
    a_sc3 = jnp.moveaxis(a_sc.reshape(m, nk, groups), 1, 0)
    e_b = bs_exp.shape[0]
    bs4 = bs_exp.reshape(e_b, nk, groups, bs_exp.shape[2])

    kernel = functools.partial(
        _grouped_kernel, nk=nk, groups=groups, kb_total=kb,
        out_dtype=out_dtype, b_t=b_t)

    b_block = (1, bn, bk) if b_t else (1, bk, bn)
    b_map = ((lambda i, j, kk, gid: (jnp.maximum(gid[i], 0), j, kk)) if b_t
             else (lambda i, j, kk, gid: (jnp.maximum(gid[i], 0), kk, j)))
    # Clamp -1 (padding) to 0 for the weight index maps; the kernel skips
    # compute and zeroes the output for those tiles.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nm, nn, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk, gid: (i, kk)),
            pl.BlockSpec((1, bm, groups), lambda i, j, kk, gid: (kk, i, 0)),
            pl.BlockSpec(b_block, b_map),
            pl.BlockSpec((1, 1, groups, bn),
                         lambda i, j, kk, gid: (jnp.maximum(gid[i], 0), kk, 0,
                                                j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk, gid: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
    )
    params = {}
    if not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"))
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        interpret=interpret,
        **params,
    )(tile_gids, a_q, a_sc3, b_q, bs4)


def m_grouped_gemm_contiguous(
    a_q: jax.Array,
    a_scales: jax.Array,
    b_q: jax.Array,
    b_scales: jax.Array,
    tile_group_ids: jax.Array,
    *,
    out_dtype=jnp.bfloat16,
    config: Optional[GemmConfig] = None,
    interpret: Optional[bool] = None,
    b_scales_expanded: bool = False,
    b_layout: str = "n",
) -> jax.Array:
    """Contiguous grouped FP8 GEMM (MoE prefill).

    a_q: (M_total, K) e4m3, rows grouped by expert, group spans aligned to
    ``config.block_m``; a_scales: (M_total, K/128) f32; b_q: (E, K, N) e4m3;
    b_scales: (E, K/128, N/128) f32; tile_group_ids: (M_total/block_m,) int32
    expert id per m-tile, -1 for padding tiles. Returns (M_total, N).
    Use :func:`make_contiguous_layout` to plan the layout.

    ``b_layout='t'``: b_q (E, N, K) with b_scales (E, N/128, K/128) —
    DeepGEMM's native ``m_grouped_gemm_fp8_fp8_bf16_nt_contiguous``
    convention (K-major expert weights, no HBM transpose at load).
    """
    if b_layout not in ("n", "t"):
        raise ValueError(f"b_layout must be 'n' or 't', got {b_layout!r}")
    b_t = b_layout == "t"
    if b_t and b_scales_expanded:
        raise ValueError("b_layout='t' requires unexpanded (E, N/128, K/128) "
                         "b_scales")
    m, k = a_q.shape
    if b_t:
        e, n, k2 = b_q.shape
    else:
        e, k2, n = b_q.shape
    if k != k2 or k % BLOCK or n % BLOCK:
        raise ValueError(f"bad shapes: a {a_q.shape}, b {b_q.shape} "
                         f"(b_layout={b_layout}; k and n must be multiples "
                         f"of {BLOCK})")
    n_tiles = jnp.shape(tile_group_ids)[0]  # static even under tracing
    if b_t:
        # Scale panel keeps the (E, kb, n) layout either way: transpose the
        # tiny per-expert (nb, kb) block tables, then lane-expand.
        bs_exp = jnp.repeat(
            jnp.swapaxes(b_scales.astype(jnp.float32), 1, 2), BLOCK,
            axis=2)[:, :, :n]
    else:
        bs_exp = (b_scales.astype(jnp.float32) if b_scales_expanded else
                  jnp.repeat(b_scales.astype(jnp.float32), BLOCK,
                             axis=2)[:, :, :n])
    if fp8mod.exact_enabled():
        bm_ex = m // max(n_tiles, 1)
        gid_rows = jnp.repeat(jnp.asarray(tile_group_ids, jnp.int32), bm_ex)
        a = fp8mod._dequant_a(a_q, a_scales)
        # For b_t, swapaxes yields (E, K, N) — _dequant_b's layout, and
        # already the right orientation for the dot below.
        b = fp8mod._dequant_b(jnp.swapaxes(b_q, 1, 2) if b_t else b_q, bs_exp)
        y = jnp.zeros((m, n), jnp.float32)
        for ei in range(e):  # static expert loop — eval path only
            ye = jnp.dot(a, b[ei], preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
            y = y + jnp.where((gid_rows == ei)[:, None], ye, 0.0)
        return y.astype(out_dtype)
    cfg = selector.select_config(
        max(m // max(n_tiles, 1), 1), n, k,
        a_q.dtype, out_dtype,
        op="grouped_gemm_nt" if b_t else "grouped_gemm",
        k_granularity=BLOCK, override=config)
    # The layout already fixed block_m (M_total / #tiles,
    # make_contiguous_layout) — an independently-selected block_m would
    # break the tile→expert mapping, so the selector only chooses bn/bk.
    bm_layout = m // max(int(n_tiles), 1)
    if config is None and cfg.block_m != bm_layout:
        cfg = cfg.replace(block_m=bm_layout)
    bm = cfg.block_m
    if m % bm:
        raise ValueError(f"M_total={m} must be a multiple of block_m={bm}")
    ntiles = m // bm
    tile_gids = jnp.asarray(tile_group_ids, jnp.int32)
    if tile_gids.shape != (ntiles,):
        raise ValueError(
            f"tile_group_ids must be ({ntiles},), got {tile_gids.shape}")
    if interpret is None:
        interpret = _interpret_default()
    return _grouped_contiguous_call(
        tile_gids, a_q, a_scales, b_q, bs_exp,
        config=cfg, out_dtype=out_dtype, interpret=interpret, b_t=b_t)


def _masked_kernel(mask_ref, a_ref, as_ref, b_ref, bs_ref, o_ref, acc_ref, *,
                   nk: int, groups: int, kb_total: int, bm: int, out_dtype,
                   b_t: bool = False, ec: int = 1):
    """Masked grouped GEMM step. Grid (E/ec, nm, nn, nk).

    mask_ref: (E,) int32 scalar-prefetch — valid row count per expert.
    Blocks carry a leading expert dim of ``ec``. ``b_t``: B stored
    (E, N, K) (DeepGEMM's native NT masked layout); the dot contracts B's
    lane dim. Scale panels arrive pre-split by k-block — as_ref
    (ec, 1, bm, groups) of (E, nk, M_max, groups), bs_ref (ec, 1, groups,
    bn) of (E, nk, groups, N) — static in-kernel slices, no one-hot (see
    ops/fp8_gemm.py ``_fp8_gemm_kernel_blocked``).

    ``ec`` > 1 COALESCES ec experts per grid step (per-expert grid fusion,
    VERDICT r3 item 4): small per-expert decode shapes make per-step
    blocks tiny — ec× bigger DMAs and ec× fewer grid steps amortize the
    per-step pipeline latency; each coalesced expert keeps its own
    activity predicate and fp32 accumulator plane.
    """
    eg = pl.program_id(0)
    i = pl.program_id(1)
    k = pl.program_id(3)

    for ecx in range(ec):
        active = i * bm < mask_ref[eg * ec + ecx]

        @pl.when(k == 0)
        def _zero(ecx=ecx):
            acc_ref[ecx] = jnp.zeros_like(acc_ref[ecx])

        @pl.when(active)
        def _compute(ecx=ecx):
            s_a_all = as_ref[ecx, 0]       # (bm, groups)
            s_b_all = bs_ref[ecx, 0]       # (groups, bn)
            ragged = nk * groups != kb_total
            for g in range(groups):
                a_g = a_ref[ecx, :, g * BLOCK:(g + 1) * BLOCK]
                b_g = (b_ref[ecx, :, g * BLOCK:(g + 1) * BLOCK] if b_t
                       else b_ref[ecx, g * BLOCK:(g + 1) * BLOCK, :])
                if ragged:
                    valid = k * groups + g < kb_total
                    a_g = jnp.where(valid, a_g, jnp.zeros_like(a_g))
                    b_g = jnp.where(valid, b_g, jnp.zeros_like(b_g))
                p = jax.lax.dot_general(
                    a_g, b_g, (((1,), (1 if b_t else 0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc_ref[ecx] += p * s_a_all[:, g:g + 1] * s_b_all[g:g + 1, :]

        @pl.when(k == nk - 1)
        def _store(ecx=ecx, active=active):
            # Rows at/after masked_m[e] are unspecified in DeepGEMM; we
            # zero the whole inactive tile (cheap, deterministic).
            o_ref[ecx] = jnp.where(active, acc_ref[ecx],
                                   0.0).astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("config", "out_dtype", "interpret", "b_t"))
def _grouped_masked_call(
    masked_m, a_q, a_scales, b_q, bs_exp, *, config, out_dtype, interpret,
    b_t=False):
    e, m_max, k = a_q.shape
    n = b_q.shape[1] if b_t else b_q.shape[2]
    kb = k // BLOCK

    if config.kernel_type == KernelType.XLA:
        # XLA family (config.py KernelType.XLA): the dense blocked-einsum
        # realization vmapped over the expert axis — ONE copy of the subtle
        # accum-mode scale algebra (fp8_gemm._fp8_gemm_xla). Rows at or
        # after masked_m[e] — unspecified by the DeepGEMM contract — are
        # zeroed per ROW here (the Pallas kernel zeroes per inactive TILE).
        y = jax.vmap(functools.partial(fp8mod._fp8_gemm_xla,
                                       out_dtype=jnp.float32, b_t=b_t))(
            a_q, a_scales, b_q, bs_exp)
        rows = jax.lax.broadcasted_iota(jnp.int32, (e, m_max, 1), 1)
        return jnp.where(rows < masked_m[:, None, None], y,
                         0.0).astype(out_dtype)

    bm = min(config.block_m, m_max)
    bn, bk = min(config.block_n, n), min(config.block_k, k)
    if bn % BLOCK or bk % BLOCK:
        raise ValueError(
            f"block_n/block_k must be multiples of {BLOCK}, got {bn}/{bk}")
    groups = bk // BLOCK
    nm, nn, nk = ceil_div(m_max, bm), ceil_div(n, bn), ceil_div(k, bk)
    kb_pad = nk * groups
    a_sc = a_scales.astype(jnp.float32)
    if kb_pad > kb:
        a_sc = jnp.pad(a_sc, ((0, 0), (0, 0), (0, kb_pad - kb)))
        bs_exp = jnp.pad(bs_exp, ((0, 0), (0, kb_pad - kb), (0, 0)))
    # Blocked scale layout (see _masked_kernel): k-block axis after E.
    a_sc4 = jnp.moveaxis(a_sc.reshape(e, m_max, nk, groups), 2, 1)
    bs4 = bs_exp.reshape(e, nk, groups, bs_exp.shape[2])

    # Per-expert grid fusion knob: coalesce ec experts per grid step when
    # the expert count divides evenly (else fall back to 1 — the knob is a
    # sweepable candidate, never a correctness requirement).
    ec = config.expert_coalesce if e % max(config.expert_coalesce, 1) == 0 \
        else 1
    kernel = functools.partial(
        _masked_kernel, nk=nk, groups=groups, kb_total=kb, bm=bm,
        out_dtype=out_dtype, b_t=b_t, ec=ec)
    b_block = (ec, bn, bk) if b_t else (ec, bk, bn)
    b_map = ((lambda g, i, j, kk, mm: (g, j, kk)) if b_t
             else (lambda g, i, j, kk, mm: (g, kk, j)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(e // ec, nm, nn, nk),
        in_specs=[
            pl.BlockSpec((ec, bm, bk), lambda g, i, j, kk, mm: (g, i, kk)),
            pl.BlockSpec((ec, 1, bm, groups),
                         lambda g, i, j, kk, mm: (g, kk, i, 0)),
            pl.BlockSpec(b_block, b_map),
            pl.BlockSpec((ec, 1, groups, bn),
                         lambda g, i, j, kk, mm: (g, kk, 0, j)),
        ],
        out_specs=pl.BlockSpec((ec, bm, bn),
                               lambda g, i, j, kk, mm: (g, i, j)),
        scratch_shapes=[pltpu.VMEM((ec, bm, bn), jnp.float32)],
    )
    params = {}
    if not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"))
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e, m_max, n), out_dtype),
        interpret=interpret,
        **params,
    )(masked_m, a_q, a_sc4, b_q, bs4)


def m_grouped_gemm_masked(
    a_q: jax.Array,
    a_scales: jax.Array,
    b_q: jax.Array,
    b_scales: jax.Array,
    masked_m: jax.Array,
    *,
    out_dtype=jnp.bfloat16,
    config: Optional[GemmConfig] = None,
    interpret: Optional[bool] = None,
    b_scales_expanded: bool = False,
    b_layout: str = "n",
) -> jax.Array:
    """Masked grouped FP8 GEMM (MoE decode, fixed shapes).

    a_q: (E, M_max, K) e4m3; a_scales: (E, M_max, K/128) f32;
    b_q: (E, K, N) e4m3; b_scales: (E, K/128, N/128) f32;
    masked_m: (E,) int32 — rows ≥ masked_m[e] are ignored. Their output is
    UNSPECIFIED (whole inactive tiles are zeroed; the tail rows of a
    partially-active tile contain garbage — gather only valid slots, as
    models/moe.py does). Shapes are static across decode steps; only
    contents vary.

    ``b_layout='t'``: b_q (E, N, K) with b_scales (E, N/128, K/128) —
    DeepGEMM's native ``m_grouped_gemm_fp8_fp8_bf16_nt_masked`` convention.
    """
    if b_layout not in ("n", "t"):
        raise ValueError(f"b_layout must be 'n' or 't', got {b_layout!r}")
    b_t = b_layout == "t"
    if b_t and b_scales_expanded:
        raise ValueError("b_layout='t' requires unexpanded (E, N/128, K/128) "
                         "b_scales")
    e, m_max, k = a_q.shape
    if b_t:
        e2, n, k2 = b_q.shape
    else:
        e2, k2, n = b_q.shape
    if e != e2 or k != k2 or k % BLOCK or n % BLOCK:
        raise ValueError(f"bad shapes: a {a_q.shape}, b {b_q.shape} "
                         f"(b_layout={b_layout}; k and n must be multiples "
                         f"of {BLOCK})")
    if b_t:
        bs_exp = jnp.repeat(
            jnp.swapaxes(b_scales.astype(jnp.float32), 1, 2), BLOCK,
            axis=2)[:, :, :n]
    else:
        bs_exp = (b_scales.astype(jnp.float32) if b_scales_expanded else
                  jnp.repeat(b_scales.astype(jnp.float32), BLOCK,
                             axis=2)[:, :, :n])
    if fp8mod.exact_enabled():
        # Exact emulated-dequant path (fp8mod.exact_mode()) — the model-scale
        # golden; masked rows zeroed to match kernel semantics.
        a = fp8mod._dequant_a(a_q, a_scales)
        b = fp8mod._dequant_b(jnp.swapaxes(b_q, 1, 2) if b_t else b_q, bs_exp)
        y = jnp.einsum("emk,ekn->emn", a, b,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        rows = jnp.arange(m_max)[None, :, None]
        y = jnp.where(rows < jnp.asarray(masked_m)[:, None, None], y, 0.0)
        return y.astype(out_dtype)
    cfg = selector.select_config(
        m_max, n, k, a_q.dtype, out_dtype,
        op="grouped_gemm_masked_nt" if b_t else "grouped_gemm_masked",
        k_granularity=BLOCK, override=config)
    if interpret is None:
        interpret = _interpret_default()
    return _grouped_masked_call(
        jnp.asarray(masked_m, jnp.int32), a_q, a_scales, b_q, bs_exp,
        config=cfg, out_dtype=out_dtype, interpret=interpret, b_t=b_t)
