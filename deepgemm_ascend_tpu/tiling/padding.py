"""Padding cost model and pad/unpad helpers — tail-handling tier.

TPU-native re-derivation of the reference's padding machinery
(``aclnn_.../op_host/op_tiling/select_kernel.cpp:22-268`` — the
``GetBandwidth`` empirical DMA polynomial and the ``GetPaddingTag``
t00/t01/t10/t11 argmin cost model feeding ``PaddingCommonMatmulB16Handler``,
Python mirror ``get_best_config/padding_calculator.py:13-280``). The
*decision structure* carries over — compare the cost of explicitly padding
an operand in main memory against the cost of computing on the unpadded
layout — but the TPU costs are different in kind:

* On Ascend, unaligned inner axes throttle the Nd2Nz DMA engine, so the
  reference models DMA bandwidth as a degree-6 polynomial of the axis
  alignment and pads A/B into workspace with an AIV pre-pass kernel.
* On TPU, HBM arrays are physically tiled to (sublane, 128-lane) multiples
  by XLA, so *alignment* of loads is free and M/N tails cost nothing beyond
  the padded-tile MXU waste already priced by the analytic roofline
  (`tiling/analytic.py:estimate_time` padded_flops). The one tail that has
  a *recurring* cost is the **K tail**: when ``k % block_k != 0`` the dense
  kernel must mask both operands' out-of-range K lanes on *every* grid step
  (branchless iota+compare+select, `ops/gemm.py:66-75`) because OOB garbage
  would contaminate the fp32 accumulator. Pre-padding K with zeros in HBM
  removes the in-kernel masking at the one-time cost of a pad copy.

So the TPU padding tag reduces to one honest decision — mask-in-kernel vs
pre-pad-K — plus the FP8 *contract* padding (``fp8_gemm`` requires n, k to
be multiples of 128; :func:`pad_fp8_operands` lifts ragged problems into
that contract with scale-preserving padding).
"""

from __future__ import annotations

import dataclasses
import enum

import jax
import jax.numpy as jnp

from ..utils.common import ceil_div, round_up
from . import platform as plat


class PaddingTag(enum.IntEnum):
    """Tail-handling decision (≙ ``PaddingTag`` t00..t11,
    ``op_host/op_tiling/tiling_params.h:33-40`` — collapsed to the
    decisions that exist on TPU)."""

    NONE = 0     # aligned, or masked tails win (≙ t00: pad neither)
    PAD_K = 1    # pre-pad K with zeros in HBM (≙ t11-style explicit pad)


@dataclasses.dataclass(frozen=True)
class PaddingCost:
    """Both sides of the decision, for observability/tests."""

    mask_s: float   # recurring in-kernel K-tail masking cost per GEMM call
    pad_s: float    # one-time HBM pad copy cost
    tag: PaddingTag


def estimate_mask_cost(
    m: int, n: int, k: int,
    bm: int, bn: int, bk: int,
    info: plat.PlatformInfo | None = None,
) -> float:
    """Seconds of VPU time the branchless K-tail masking adds per call.

    The dense kernel's tail path (`ops/gemm.py:66-75`) runs on every grid
    step when ``k % bk != 0``: two broadcasted iotas, compares, and selects
    over the (bm, bk) A block and (bk, bn) B block ≈ 3 VPU ops/element.
    """
    info = info or plat.detect()
    if k % bk == 0:
        return 0.0
    nm, nn, nk = ceil_div(m, bm), ceil_div(n, bn), ceil_div(k, bk)
    ops_per_step = 3.0 * (bm * bk + bk * bn)
    return nm * nn * nk * ops_per_step / (info.vpu_tops * 1e12)


def estimate_pad_cost(
    m: int, n: int, k: int,
    bk: int,
    a_itemsize: int, b_itemsize: int,
    info: plat.PlatformInfo | None = None,
) -> float:
    """Seconds to materialize zero-K-padded copies of A and B in HBM.

    Read + write of both operands at HBM bandwidth (the pad itself is a
    fused memset; traffic dominates) — the TPU replacement for the
    reference's ``GetBandwidth`` polynomial + AIV pad-kernel simulation
    (`select_kernel.cpp:82-268`).
    """
    info = info or plat.detect()
    if k % bk == 0:
        return 0.0
    k_pad = round_up(k, bk)
    bytes_moved = (m * (k + k_pad) * a_itemsize
                   + n * (k + k_pad) * b_itemsize)
    return bytes_moved / (info.hbm_gbps * 1e9)


def get_padding_tag(
    m: int, n: int, k: int,
    bm: int, bn: int, bk: int,
    a_itemsize: int = 2, b_itemsize: int = 2,
    info: plat.PlatformInfo | None = None,
    calls_amortized: int = 1,
) -> PaddingCost:
    """Argmin of mask-vs-pad cost (≙ ``GetPaddingTag`` argmin over t00..t11,
    `select_kernel.cpp:82-268`).

    ``calls_amortized``: how many GEMM calls reuse the padded operands
    (weights padded once serve every call; activations only one).
    """
    info = info or plat.detect()
    mask_s = estimate_mask_cost(m, n, k, bm, bn, bk, info)
    pad_s = estimate_pad_cost(m, n, k, bk, a_itemsize, b_itemsize, info)
    tag = (PaddingTag.PAD_K
           if mask_s * max(calls_amortized, 1) > pad_s and pad_s > 0.0
           else PaddingTag.NONE)
    return PaddingCost(mask_s=mask_s, pad_s=pad_s, tag=tag)


def pad_k_operands(a: jax.Array, b: jax.Array, bk: int):
    """Zero-pad the contraction dim of ``a`` (m, k) and ``b`` (k, n) to a
    multiple of ``bk``. Zeros contribute nothing to the accumulator, so the
    padded GEMM is exact and needs no in-kernel K masking."""
    k = a.shape[-1]
    pad = round_up(k, bk) - k
    if pad == 0:
        return a, b
    a_p = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])
    b_p = jnp.pad(b, [(0, pad)] + [(0, 0)] * (b.ndim - 1))
    return a_p, b_p


def pad_fp8_operands(
    a_q: jax.Array, a_scales: jax.Array,
    b_q: jax.Array, b_scales: jax.Array,
    block: int = 128,
):
    """Lift a ragged FP8 problem into the kernel contract (n, k ≡ 0 mod 128).

    Quantized values are zero-padded (zero e4m3 encodes exact 0 → padded
    products vanish); scale tensors are **one**-padded so no 0·scale or
    garbage-scale terms arise. Returns
    ``(a_q, a_scales, b_q, b_scales, n_orig)`` — slice the GEMM output with
    ``out[..., :n_orig]``.

    This is the TPU analogue of the reference's AIV padding pre-pass
    (`padding_common_matmul_kernel.h:27-131`): an explicit re-layout in main
    memory ahead of an aligned-layout kernel.
    """
    m, k = a_q.shape
    k2, n = b_q.shape
    if k != k2:
        raise ValueError(f"inner dims mismatch: {a_q.shape} @ {b_q.shape}")
    k_pad, n_pad = round_up(k, block), round_up(n, block)
    kb_pad = k_pad // block
    if k_pad != k:
        a_q = jnp.pad(a_q, ((0, 0), (0, k_pad - k)))
        b_q = jnp.pad(b_q, ((0, k_pad - k), (0, 0)))
    if n_pad != n:
        b_q = jnp.pad(b_q, ((0, 0), (0, n_pad - n)))
    if a_scales.shape[1] < kb_pad:
        a_scales = jnp.pad(
            a_scales, ((0, 0), (0, kb_pad - a_scales.shape[1])),
            constant_values=1.0)
    nb_pad = n_pad // block
    pads = ((0, kb_pad - b_scales.shape[0]), (0, nb_pad - b_scales.shape[1]))
    if any(p for pair in pads for p in pair):
        b_scales = jnp.pad(b_scales, pads, constant_values=1.0)
    return a_q, a_scales, b_q, b_scales, n


def pad_fp8_operands_nt(
    a_q: jax.Array, a_scales: jax.Array,
    bt_q: jax.Array, bt_scales: jax.Array,
    block: int = 128,
):
    """NT twin of :func:`pad_fp8_operands`: B stored (n, k) with
    (n/128, k/128) block scales (DeepGEMM's native layout) — padded
    in-place in that layout, no HBM transpose. Same zero-value /
    one-scale discipline; returns ``(a_q, a_scales, bt_q, bt_scales,
    n_orig)``."""
    m, k = a_q.shape
    n, k2 = bt_q.shape
    if k != k2:
        raise ValueError(f"inner dims mismatch: {a_q.shape} @ "
                         f"{bt_q.shape} (NT)")
    k_pad, n_pad = round_up(k, block), round_up(n, block)
    kb_pad, nb_pad = k_pad // block, n_pad // block
    if k_pad != k:
        a_q = jnp.pad(a_q, ((0, 0), (0, k_pad - k)))
    if k_pad != k or n_pad != n:
        bt_q = jnp.pad(bt_q, ((0, n_pad - n), (0, k_pad - k)))
    if a_scales.shape[1] < kb_pad:
        a_scales = jnp.pad(
            a_scales, ((0, 0), (0, kb_pad - a_scales.shape[1])),
            constant_values=1.0)
    pads = ((0, nb_pad - bt_scales.shape[0]),
            (0, kb_pad - bt_scales.shape[1]))
    if any(p for pair in pads for p in pair):
        bt_scales = jnp.pad(bt_scales, pads, constant_values=1.0)
    return a_q, a_scales, bt_q, bt_scales, n
