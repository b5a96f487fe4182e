"""Typed GEMM tiling configuration.

TPU-native counterpart of two reference structures:

* the 28-field JIT ``Config`` (``framework/csrc/jit/get_best_config.hpp:8-31``
  — L1 tile blocks, tails, per-core partition). On TPU the Pallas pipeline
  subsumes the tail/partition bookkeeping (``m_o_fix``/``r_m_blocks`` etc.),
  so the config reduces to the three block sizes + kernel-family knobs.
* ``TilingParams`` (``aclnn_.../op_host/op_tiling/tiling_params.h:16-68`` —
  m1/n1/k1, swizzle offset/direction, splitkFactor, kernelSerial).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any


class KernelType(enum.IntEnum):
    """Kernel family, mirroring the reference's handler-chain outcomes.

    Reference: ``CatlassKernelType`` (``op_kernel/kernel/kernel_utils.h:26-40``)
    and the selector chain (``op_tiling/select_kernel.cpp:333-369``). On TPU
    there is no padding family — BlockSpec handles ragged tails — so the
    surviving families are SMALL (single grid cell), COMMON (2-D output grid
    with sequential K), and KSPLIT (K parallelized over the grid with a
    reduction epilogue, covering the reference's split-K/stream-K role).

    XLA is a TPU-only addition with no reference counterpart: skip Pallas
    entirely and realize the op as plain XLA ops (dot_general / blocked
    einsum with the identical f32-accumulator scale math). Every Pallas
    dispatch pays a fixed prologue (grid setup + pipeline warm-up); for
    dispatch-floor-bound small shapes (the sub-85% straggler rows —
    VERDICT r3 item 4) XLA's fused-into-the-graph realization can win.
    Block sizes/swizzle are ignored; the family is selected per shape by
    sweep evidence through the ordinary tiling cache, never analytically.
    """

    SMALL = 0
    COMMON = 1
    KSPLIT = 2
    XLA = 3


class SwizzleDir(enum.IntEnum):
    """Output-tile traversal major order (≙ swizzleDirection,
    ``tiling_params.h:30`` / ``DynamicGemmIdentityBlockSwizzle``)."""

    M_MAJOR = 0  # iterate n fastest
    N_MAJOR = 1  # iterate m fastest


@dataclasses.dataclass(frozen=True)
class GemmConfig:
    """Static tiling parameters for one Pallas GEMM instantiation.

    Hashable and usable as a jit static argument — the TPU analogue of the
    reference's shape-keyed compile cache signature
    (``framework/csrc/jit/compiler.hpp:29`` ``"b{}m{}n{}k{}_type{}"``).
    """

    block_m: int = 256
    block_n: int = 256
    block_k: int = 512
    kernel_type: KernelType = KernelType.COMMON
    k_split: int = 1                     # > 1 only for KSPLIT
    # Major raster order only — the reference's *grouped* swizzle
    # (swizzleOffset=3, `tiling_params.h:29`) exists for L2 locality across
    # concurrent cores; a TPU TensorCore runs grid steps sequentially and
    # reuses a block only when consecutive steps index the same one, which
    # the major-order choice already maximizes (panel re-read volume is
    # governed by block sizes and priced by the analytic roofline).
    swizzle: SwizzleDir = SwizzleDir.M_MAJOR
    vmem_limit_bytes: int = 0            # 0 = compiler default
    # Pre-pad K with zeros in HBM instead of masking the K tail in-kernel —
    # decided by the padding cost model (tiling/padding.py, ≙ GetPaddingTag
    # `select_kernel.cpp:82-268`). No-op when block_k divides K.
    pad_k: bool = False
    # Masked grouped GEMM only: experts processed per grid step. >1
    # coalesces EC experts' blocks into one step (bigger DMAs, EC× fewer
    # grid steps) — the "per-expert grid fusion" candidate for small
    # per-expert decode shapes (VERDICT r3 item 4). Ignored by dense and
    # contiguous kernels; silently treated as 1 when E % EC != 0.
    expert_coalesce: int = 1

    def __post_init__(self):
        if self.block_m <= 0 or self.block_n <= 0 or self.block_k <= 0:
            raise ValueError(f"block sizes must be positive: {self}")
        if self.k_split < 1:
            raise ValueError(f"k_split must be >= 1: {self}")
        if self.kernel_type != KernelType.KSPLIT and self.k_split != 1:
            raise ValueError(f"k_split > 1 requires KSPLIT kernel: {self}")
        if self.expert_coalesce < 1:
            raise ValueError(f"expert_coalesce must be >= 1: {self}")

    def replace(self, **kw: Any) -> "GemmConfig":
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["kernel_type"] = int(self.kernel_type)
        d["swizzle"] = int(self.swizzle)
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "GemmConfig":
        d = dict(d)
        d["kernel_type"] = KernelType(d.get("kernel_type", 1))
        d["swizzle"] = SwizzleDir(d.get("swizzle", 0))
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})
