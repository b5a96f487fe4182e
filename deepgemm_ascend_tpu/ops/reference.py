"""Emulated-dequant golden models (CPU/XLA, no Pallas).

Role of the reference's golden scripts (``scripts/gen_golden.py:10-23``,
``scripts/verify.py:14-35``): an independent wide-precision model every
kernel is gated against. For FP8 the golden dequantizes operands to f32
exactly (the scales are exact f32) and matmuls in f32/f64.
"""

from __future__ import annotations

import numpy as np

from .quant import BLOCK


def fp8_gemm_reference(a_q, a_scales, b_q, b_scales) -> np.ndarray:
    """Exact emulated-dequant reference: dequant in f64, matmul in f64."""
    a_q = np.asarray(a_q, dtype=np.float64)      # e4m3 → exact in f64
    b_q = np.asarray(b_q, dtype=np.float64)
    a_s = np.asarray(a_scales, dtype=np.float64)
    b_s = np.asarray(b_scales, dtype=np.float64)
    m, k = a_q.shape
    _, n = b_q.shape
    kb = k // BLOCK
    a = (a_q.reshape(m, kb, BLOCK) * a_s[:, :, None]).reshape(m, k)
    nb = b_s.shape[1]
    b = (b_q.reshape(kb, BLOCK, nb, BLOCK)
         * b_s[:, None, :, None]).reshape(k, n)
    return (a @ b).astype(np.float32)


def grouped_gemm_reference(a_q, a_scales, b_q, b_scales, group_sizes) -> np.ndarray:
    """Contiguous grouped FP8 GEMM reference: rows of A are partitioned into
    len(group_sizes) groups, each multiplied by its own expert weight."""
    out = []
    start = 0
    for g, rows in enumerate(group_sizes):
        if rows:
            out.append(fp8_gemm_reference(
                a_q[start:start + rows], a_scales[start:start + rows],
                b_q[g], b_scales[g]))
        start += rows
    return np.concatenate(out, axis=0) if out else np.zeros(
        (0, b_q.shape[-1]), np.float32)
