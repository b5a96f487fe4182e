"""DeepGEMM-style API aliases (upstream deepseek-ai/DeepGEMM names).

The reference repo is an Ascend port of DeepGEMM: its own Python surface is
``run_mmad_*`` (``compat/__init__.py``), but users arriving FROM DeepGEMM
expect the upstream entry points. This module provides them with DeepGEMM's
calling convention — ``(tensor, scales)`` tuples, an explicit ``out``
buffer, NT (K-major (n, k)) weight layout — as thin wrappers over the
native ops (``ops/fp8_gemm.py``, ``ops/grouped_gemm.py``).

Inputs may be JAX arrays, numpy arrays, or torch tensors (converted like
the ``run_mmad_*`` shims); a torch ``out`` gets the result copied in and
returned (true in-place semantics), otherwise the result is returned.

CUDA-specific knobs intentionally degrade to documented no-ops:
``get_col_major_tma_aligned_tensor`` returns its input unchanged (TMA is a
Hopper addressing concept; Pallas BlockSpecs handle layout), and the masked
call's ``expected_m`` hint is accepted and ignored (it tunes CUDA persistent
-kernel occupancy; XLA specializes on the static shapes instead).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from ..ops.fp8_gemm import fp8_gemm
from ..ops.grouped_gemm import m_grouped_gemm_contiguous, m_grouped_gemm_masked
from ..ops.quant import BLOCK
from ..utils.common import ceil_div  # re-export: deep_gemm.ceil_div
from . import _check_out, _to_jax

__all__ = [
    "ceil_div",
    "gemm_fp8_fp8_bf16_nt",
    "get_col_major_tma_aligned_tensor",
    "get_m_alignment_for_contiguous_layout",
    "m_grouped_gemm_fp8_fp8_bf16_nt_contiguous",
    "m_grouped_gemm_fp8_fp8_bf16_nt_masked",
]


def get_m_alignment_for_contiguous_layout() -> int:
    """Row-group alignment the contiguous layout requires (= the scale
    block, as in DeepGEMM). Group every expert's token rows to multiples
    of this before calling the contiguous GEMM."""
    return BLOCK


def get_col_major_tma_aligned_tensor(x):
    """DeepGEMM pre-arranges lhs scales for TMA; on TPU the Pallas
    BlockSpec pipeline handles operand layout, so this is the identity —
    kept so ported callers run unchanged."""
    return x


def _pair(t: Tuple) -> Tuple:
    q, s = t
    return _to_jax(q), _to_jax(s)


def gemm_fp8_fp8_bf16_nt(lhs: Tuple, rhs: Tuple, out=None):
    """``out = lhs @ rhs.T`` — DeepGEMM's dense NT entry point.

    lhs: (a_q (m, k) fp8e4m3, a_scales (m, ⌈k/128⌉) f32);
    rhs: (b_q (n, k) fp8e4m3, b_scales (⌈n/128⌉, ⌈k/128⌉) f32);
    out: (m, n) bf16 buffer (torch → copied into; else returned).
    Ragged n/k are lifted via scale-preserving zero padding (auto_pad).
    """
    a_q, a_s = _pair(lhs)
    b_q, b_s = _pair(rhs)
    res = fp8_gemm(a_q, a_s, b_q, b_s, b_layout="t", auto_pad=True,
                   out_dtype=jnp.bfloat16)
    return _check_out(res, out)


def _tile_ids_from_m_indices(m_indices, m_total: int):
    """Per-ROW group ids (DeepGEMM ``m_indices``, -1 = padding row) → this
    framework's per-TILE ids at the 128-row contiguous alignment."""
    bm = get_m_alignment_for_contiguous_layout()
    if m_total % bm:
        raise ValueError(
            f"m_indices length {m_total} must be a multiple of "
            f"{bm} (get_m_alignment_for_contiguous_layout())")
    idx = _to_jax(m_indices).astype(jnp.int32)
    tiles = idx.reshape(m_total // bm, bm)
    import jax
    if not isinstance(idx, jax.core.Tracer):
        # Concrete input: validate alignment eagerly. Under jit (tracer)
        # the host check is impossible — the caller owns DeepGEMM's
        # alignment contract there, exactly as upstream does.
        import numpy as np
        t_np = np.asarray(tiles)
        if not (t_np == t_np[:, :1]).all():
            raise ValueError(
                "each 128-row tile must map to a single group id (align "
                "every expert's rows to "
                "get_m_alignment_for_contiguous_layout())")
    return tiles[:, 0]


def m_grouped_gemm_fp8_fp8_bf16_nt_contiguous(lhs: Tuple, rhs: Tuple, out,
                                              m_indices):
    """Grouped NT GEMM over expert-contiguous rows (MoE prefill).

    lhs: (a_q (m_sum, k), a_scales (m_sum, ⌈k/128⌉)); rhs: (b_q
    (num_groups, n, k), b_scales (num_groups, ⌈n/128⌉, ⌈k/128⌉));
    m_indices: (m_sum,) int32 group id per row, -1 for padding rows
    (their output is zeroed). Rows of one group must be contiguous and
    128-aligned, as in DeepGEMM.
    """
    a_q, a_s = _pair(lhs)
    b_q, b_s = _pair(rhs)
    tile_ids = _tile_ids_from_m_indices(m_indices, a_q.shape[0])
    res = m_grouped_gemm_contiguous(a_q, a_s, b_q, b_s, tile_ids,
                                    b_layout="t", out_dtype=jnp.bfloat16)
    return _check_out(res, out)


def m_grouped_gemm_fp8_fp8_bf16_nt_masked(lhs: Tuple, rhs: Tuple, out,
                                          masked_m,
                                          expected_m: Optional[int] = None):
    """Grouped NT GEMM with per-group valid-row counts (MoE decode).

    lhs: (a_q (num_groups, m_max, k), a_scales (num_groups, m_max,
    ⌈k/128⌉)); rhs as in the contiguous call; masked_m: (num_groups,)
    int32. ``expected_m`` (a CUDA occupancy hint) is accepted and ignored.
    Rows ≥ masked_m[g] are unspecified, matching DeepGEMM's contract.
    """
    del expected_m
    a_q, a_s = _pair(lhs)
    b_q, b_s = _pair(rhs)
    res = m_grouped_gemm_masked(a_q, a_s, b_q, b_s, _to_jax(masked_m),
                                b_layout="t", out_dtype=jnp.bfloat16)
    return _check_out(res, out)
