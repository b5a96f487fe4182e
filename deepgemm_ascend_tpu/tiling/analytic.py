"""Analytic tiling model — tier 1 of the three-tier tiling system.

TPU-native re-derivation of the reference's analytic tiler
(``aclnn_.../op_host/op_tiling/do_tiling.cpp:20-204`` — ``DoTilingLayout*``,
``BalanceWorkload``, ``JudgeSpace``, ``GetMaxK1``) and of the JIT-path
heuristic (``framework/csrc/jit/get_best_config.hpp:33-91``). The *logic*
carries over — enumerate legal tiles under on-chip-memory constraints, then
pick the one minimizing a roofline time estimate — but the constants are TPU:
VMEM instead of L1/L0, the 128×128 MXU instead of the 16×16 cube block, and
Pallas's automatic double-buffered pipeline instead of hand-managed TQue
double buffering (``mmad_jit.cpp:137-151``).

Unlike the reference's single default ansatz (m1×n1×k1 = 128×256×256,
``do_tiling.cpp:25``) we score a small legal grid with an explicit
max(compute, memory) roofline — this is cheap (≲ a few hundred candidates)
and replaces the empirical bandwidth polynomial (``select_kernel.cpp:22-80``)
with a first-principles HBM traffic model.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Iterable, Sequence

import jax.numpy as jnp

from ..config import GemmConfig, KernelType, SwizzleDir
from ..utils.common import ceil_div, round_up
from . import platform as plat

# Fraction of VMEM the pipeline may occupy. Mosaic needs headroom for
# spills/semaphores; mirrors the reference's L1 512KB hard cap in JudgeSpace
# (`op_tiling/utils.cpp:28-47`) being checked against full capacity while
# L0C had its own slack.
VMEM_FRACTION = 0.8
# Effective VMEM scratch bandwidth for the accumulator RMW term in
# estimate_time (fit to the 4096³ fp8 nk-cliff measurements; see there).
_VMEM_GBPS = 1300.0


@dataclasses.dataclass(frozen=True)
class CostParams:
    """Calibrated cost-model constants for one (device, op) pair.

    ≙ the reference's empirically-fitted bandwidth polynomial
    (`select_kernel.cpp:22-114`, a 6th-degree GB/s fit from measurements):
    instead of nominal datasheet constants, these are fit per op from the
    owned on-chip sweep records (scripts/calibrate_cost_model.py) — per-op
    because each op is its own kernel family with its own prologue cost and
    effective-bandwidth behaviour (the NT/NN layouts differ by up to 5
    points on the same shapes, VERDICT r2 Missing #2).
    """

    hbm_gbps: float          # effective HBM stream bandwidth
    vmem_gbps: float         # accumulator-RMW effective bandwidth
    startup0: float          # per-dispatch launch cost (s)
    startup1: float          # per-grid-step overhead (s)
    compute_factor: float    # effective fraction of peak MXU flops


_NOMINAL = CostParams(hbm_gbps=0.0, vmem_gbps=_VMEM_GBPS, startup0=3e-6,
                      startup1=1e-7, compute_factor=1.0)

_calibration_cache: dict | None = None


def _load_calibration() -> dict:
    """Packaged per-(device, op) fitted constants; {} when absent."""
    global _calibration_cache
    if _calibration_cache is None:
        import json
        import os
        path = os.path.join(os.path.dirname(__file__), "..", "data",
                            "cost_model.json")
        _calibration_cache = {}
        if os.path.exists(path):
            try:
                with open(path) as f:
                    _calibration_cache = json.load(f)
            except (OSError, ValueError):
                _calibration_cache = {}
    return _calibration_cache


def get_cost_params(op: str | None, info: plat.PlatformInfo) -> CostParams:
    """Resolve calibrated constants for (device, op); nominal fallback.

    Layout-specialized ops (``fp8_gemm_nt``…) fall back to their base op's
    fit before nominal, so an uncalibrated layout still gets the measured
    device constants.
    """
    calib = _load_calibration().get(info.device_kind, {})
    entry = None
    if op is not None:
        entry = calib.get(op)
        if entry is None and op[-3:] in ("_nt", "_tn", "_tt"):
            entry = calib.get(op[:-3])
    # op=None keeps the nominal constants: callers that want calibrated
    # estimates pass the op explicitly (selector/predictor/autotuner do);
    # silently remapping None to the bf16-gemm fit would change every
    # legacy estimate and break the native-equivalence oracle on-device.
    if entry is None:
        return dataclasses.replace(_NOMINAL, hbm_gbps=info.hbm_gbps)
    return CostParams(
        hbm_gbps=float(entry.get("hbm_gbps", info.hbm_gbps)),
        vmem_gbps=float(entry.get("vmem_gbps", _VMEM_GBPS)),
        startup0=float(entry.get("startup0", 3e-6)),
        startup1=float(entry.get("startup1", 1e-7)),
        compute_factor=float(entry.get("compute_factor", 1.0)),
    )


def vmem_footprint(
    bm: int, bn: int, bk: int,
    a_itemsize: int, b_itemsize: int, out_itemsize: int,
    acc_itemsize: int = 4,
    extra_bytes: int = 0,
) -> int:
    """Bytes of VMEM used by one pipelined grid step.

    Pallas double-buffers every input/output block (the TPU analogue of the
    reference's L1 double buffer, `mmad_jit.cpp:137-151`); the fp32
    accumulator scratch is single-buffered.
    """
    a = bm * bk * a_itemsize
    b = bk * bn * b_itemsize
    o = bm * bn * out_itemsize
    acc = bm * bn * acc_itemsize
    return 2 * (a + b + o) + acc + extra_bytes


def judge_space(
    bm: int, bn: int, bk: int,
    a_itemsize: int, b_itemsize: int, out_itemsize: int,
    info: plat.PlatformInfo | None = None,
    extra_bytes: int = 0,
) -> bool:
    """True iff the tile triple fits the VMEM budget.

    ≙ reference ``JudgeSpace`` (`op_tiling/utils.cpp:28-47`): L1 ≤ 512KB with
    A+B double buffered and L0C ≤ 128KB, re-expressed for VMEM.
    """
    info = info or plat.detect()
    used = vmem_footprint(bm, bn, bk, a_itemsize, b_itemsize, out_itemsize,
                          extra_bytes=extra_bytes)
    return used <= int(info.vmem_bytes * VMEM_FRACTION)


def get_max_block_k(
    bm: int, bn: int,
    a_itemsize: int, b_itemsize: int, out_itemsize: int,
    k: int,
    info: plat.PlatformInfo | None = None,
    granularity: int = 128,
) -> int:
    """Largest block_k (multiple of ``granularity``) fitting VMEM.

    ≙ reference ``GetMaxK1`` (`op_tiling/utils.cpp:66-77`): largest
    k1 ∈ {1024,512,256,128} that fits L1.
    """
    info = info or plat.detect()
    best = granularity
    for cand in (4096, 2048, 1024, 512, 256, 128):
        if cand % granularity:
            continue
        if cand > round_up(k, granularity):
            continue
        if judge_space(bm, bn, cand, a_itemsize, b_itemsize, out_itemsize, info):
            best = max(best, cand)
    return best


@dataclasses.dataclass(frozen=True)
class _Estimate:
    time_s: float
    compute_s: float
    memory_s: float
    vmem_bytes: int


def estimate_time(
    m: int, n: int, k: int,
    bm: int, bn: int, bk: int,
    a_itemsize: int, b_itemsize: int, out_itemsize: int,
    info: plat.PlatformInfo,
    in_dtype=jnp.bfloat16,
    op: str | None = None,
    params: CostParams | None = None,
) -> _Estimate:
    """Roofline time estimate for one tiling candidate.

    Compute: padded MACs at MXU peak (padding waste is real waste — the MXU
    runs the full tile). Memory: A panel is re-read once per n-supertile, B
    once per m-supertile, C written once. The constants come from
    :func:`get_cost_params` — per-op fits from on-chip sweep records where
    available (≙ the reference's fitted bandwidth polynomial,
    `select_kernel.cpp:22-114`), nominal datasheet values otherwise.
    """
    if params is None:
        params = get_cost_params(op, info)
    nm, nn, nk = ceil_div(m, bm), ceil_div(n, bn), ceil_div(k, bk)
    padded_flops = 2.0 * (nm * bm) * (nn * bn) * (nk * bk)
    compute_s = padded_flops / (info.peak_flops(in_dtype)
                                * params.compute_factor)

    # Output-stationary raster with k innermost: the A panel (bm × K) is
    # streamed once per (i, j) pair → A traffic = nn · M·K; likewise the B
    # panel is streamed once per i → B traffic = nm · K·N. Larger bn cuts A
    # re-reads, larger bm cuts B re-reads — the roofline scorer trades those
    # against VMEM.
    a_bytes = nn * (nm * bm) * (nk * bk) * a_itemsize
    b_bytes = nm * (nk * bk) * (nn * bn) * b_itemsize
    c_bytes = (nm * bm) * (nn * bn) * out_itemsize
    hbm = params.hbm_gbps if params.hbm_gbps > 0 else info.hbm_gbps
    memory_s = (a_bytes + b_bytes + c_bytes) / (hbm * 1e9)

    vmem = vmem_footprint(bm, bn, bk, a_itemsize, b_itemsize, out_itemsize)
    # Pipeline can't hide whichever is smaller; small grids underutilize.
    steps = nm * nn * nk
    startup = params.startup0 + params.startup1 * steps
    # K-blocked grids (nk > 1) pay a per-step accumulator read-modify-write
    # in VMEM scratch; the nk == 1 fp8 kernel accumulates in registers and
    # stores once. On-chip evidence (4096³ fp8): (512,512,2048) 145 TF/s vs
    # (512,512,4096) 175 — the 164 µs gap over 64 extra grid steps matches
    # the 2·bm·bn·4 B VMEM round trip per step at ~1.3 TB/s. Charged to the
    # COMPUTE side: on memory-bound shapes the RMW hides behind the HBM
    # stream (the swept small-M winners keep small bk), on compute-bound
    # ones it serializes with the MXU dependency chain.
    acc_rmw_s = 0.0
    if nk > 1:
        acc_rmw_s = steps * (2.0 * bm * bn * 4) / (params.vmem_gbps * 1e9)
    return _Estimate(max(compute_s + acc_rmw_s, memory_s) + startup,
                     compute_s, memory_s, vmem)


def _aligned_candidates(dim: int, align: int, caps: Sequence[int]) -> list[int]:
    """Legal block sizes for one dimension: aligned, ≤ padded dim."""
    hi = round_up(dim, align)
    out = [c for c in caps if c % align == 0 and c <= hi]
    if round_up(dim, align) not in out and round_up(dim, align) <= max(caps):
        out.append(round_up(dim, align))
    return sorted(set(out)) or [align]


def enumerate_candidates(
    m: int, n: int, k: int,
    a_itemsize: int, b_itemsize: int, out_itemsize: int,
    info: plat.PlatformInfo,
    k_granularity: int = 128,
) -> list[tuple[int, int, int]]:
    """Legal (bm, bn, bk) grid under alignment + VMEM constraints.

    ≙ reference candidate generator ``CatlassParameter.grid_generate_parameters``
    (`get_best_config/catlass_parameter.py:14-120`) with TPU constraints:
    lane-dim blocks are multiples of 128, sublane-dim blocks multiples of the
    dtype min tile, everything fits VMEM_FRACTION of VMEM.
    """
    sub_a = plat._SUBLANES.get(a_itemsize, 8)
    bm_caps = (16, 32, 64, 128, 256, 512, 1024)
    bn_caps = (128, 256, 384, 512, 768, 1024, 2048)
    bk_caps = (128, 256, 512, 1024, 2048, 4096)
    hi_m = round_up(m, sub_a)
    bms = {c for c in bm_caps if c % sub_a == 0 and c <= max(hi_m, 128)}
    if hi_m <= max(bm_caps):
        bms.add(hi_m)  # exact skinny-M tile (decode GEMMs: m = 8, 64, …)
    bms = sorted(bms) or [sub_a]
    bns = _aligned_candidates(n, info.lane, bn_caps)
    k_pad = round_up(k, k_granularity)
    bks = {c for c in bk_caps if c % k_granularity == 0 and c <= k_pad}
    # Full-K and half/quarter-K blocks for ANY K (not just power-of-two
    # caps): block_k == K makes nk == 1, which on the fp8 path selects the
    # static-scale-slice kernel (ops/fp8_gemm.py — measured 175 vs 162 TF/s
    # at 4096³); DeepSeek K values (7168, 18432, 16384) are not in the cap
    # table, so without this the fast path was unreachable for them.
    for frac in (1, 2, 4):
        cand = round_up(ceil_div(k_pad, frac), k_granularity)
        if cand >= k_granularity:
            bks.add(cand)
    bks = sorted(bks) or [k_pad]
    out = []
    for bm in bms:
        for bn in bns:
            for bk in bks:
                if judge_space(bm, bn, bk, a_itemsize, b_itemsize, out_itemsize, info):
                    out.append((bm, bn, bk))
    return out


def select_kernel_type(
    m: int, n: int, k: int, bm: int, bn: int, bk: int,
    info: plat.PlatformInfo,
) -> tuple[KernelType, int]:
    """Kernel-family choice, same handler-chain shape as the reference.

    ≙ ``SelectKernel`` first-match chain (`select_kernel.cpp:333-369`):
    small → stream-k → padding → common. TPU drops the padding family
    (BlockSpec masks tails) and gates KSPLIT on megacore utilisation.
    On-chip evidence for the 1-core gate (v5e, autotune_results_r3
    ``--inject-ksplit`` rows): split-K there is NEUTRAL, not harmful —
    best KSPLIT vs best COMMON within ±2% on long-K/small-MN shapes
    (64×512×16384: +1%; 64×7168×16384: +2%; 8×7168×18432: −2%) — so
    COMMON is kept: same speed, no (k_split, m, n) f32 partials buffer.

    The split count is workload-balanced: on TPU the megacore splitter —
    not the program — assigns grid slices to cores, so the reference's
    fractional stream-K assignment (`padding_streamk_matmul_kernel.h:28-131`,
    core i takes k-chunks [i·w, (i+1)·w) with fractional w) is not
    expressible. The expressible equivalent minimizes the same objective it
    balances: per-core makespan ``ceil(parallel_work/cores) · k_steps_per
    _split``, searched over split counts (ties → fewer partials, i.e. less
    f32 reduce traffic).
    """
    nm, nn, nk = ceil_div(m, bm), ceil_div(n, bn), ceil_div(k, bk)
    if nm == 1 and nn == 1 and nk == 1:
        return KernelType.SMALL, 1
    if info.num_cores > 1 and nm * nn < info.num_cores and nk >= 2 * info.num_cores:
        cores = info.num_cores
        best_s, best_cost = min(cores, nk), None
        for s in range(2, min(nk, 4 * cores) + 1):
            cost = ceil_div(s * nm * nn, cores) * ceil_div(nk, s)
            if best_cost is None or cost < best_cost:
                best_s, best_cost = s, cost
        return KernelType.KSPLIT, best_s
    return KernelType.COMMON, 1


def get_best_config(
    m: int, n: int, k: int,
    a_itemsize: int = 2, b_itemsize: int = 2, out_itemsize: int = 4,
    k_granularity: int = 128,
    device_kind: str | None = None,
    op: str | None = None,
) -> GemmConfig:
    """Analytic best tile for an (m, n, k) problem.

    Role of the reference's ``get_best_config`` (`csrc/jit/get_best_config.hpp:33`)
    and ``DoTiling`` dispatch (`do_tiling.h:24-26`), TPU constants. ``op``
    selects the calibrated per-op cost constants (≙ the reference's four
    per-layout DoTiling policies, `do_tiling.cpp:20-204` — here the layouts
    differ by fitted constants instead of hand-written tile swaps).
    Results are memoized per (shape, op, DEVICE) — the device is resolved
    here, outside the cache, so a mid-process ``DGA_DEVICE`` change
    (platform.detect re-reads it, advisor r3) can never serve a config
    computed under the previous device's envelope. The in-process memo ≙
    the reference's in-memory tiling cache (`op_tiling/cache.cpp:22-101`);
    the persistent tier lives in ``tiling.cache``. When the native core
    (csrc/dga_core.cpp) is available it computes the same answer in C++
    (equivalence-tested); this Python path is the reference implementation
    and the fallback.
    """
    if device_kind is None:
        device_kind = plat.detect().device_kind
    return _get_best_config_for_device(
        m, n, k, a_itemsize, b_itemsize, out_itemsize, k_granularity,
        device_kind, op)


@functools.lru_cache(maxsize=4096)
def _get_best_config_for_device(
    m: int, n: int, k: int,
    a_itemsize: int, b_itemsize: int, out_itemsize: int,
    k_granularity: int,
    device_kind: str,
    op: str | None,
) -> GemmConfig:
    # (get_best_config.cache_clear is aliased below for back-compat.)
    info = plat.info_for(device_kind)
    params = get_cost_params(op, info)
    hbm = params.hbm_gbps if params.hbm_gbps > 0 else info.hbm_gbps
    from .. import native as _native
    cfg = _native.select_config_native(
        m, n, k, a_itemsize, b_itemsize, out_itemsize, k_granularity,
        info.vmem_bytes, info.peak_flops(
            {1: jnp.float8_e4m3fn, 2: jnp.bfloat16,
             4: jnp.float32}[a_itemsize]) * params.compute_factor,
        hbm, info.num_cores,
        vmem_gbps=params.vmem_gbps, startup0=params.startup0,
        startup1=params.startup1)
    if cfg is not None:
        return _apply_padding_tag(cfg, m, n, k, a_itemsize, b_itemsize, info)
    in_dtype = {1: jnp.float8_e4m3fn, 2: jnp.bfloat16,
                4: jnp.float32}[a_itemsize]
    best, best_est = None, None
    for bm, bn, bk in enumerate_candidates(
            m, n, k, a_itemsize, b_itemsize, out_itemsize, info, k_granularity):
        est = estimate_time(m, n, k, bm, bn, bk,
                            a_itemsize, b_itemsize, out_itemsize, info,
                            in_dtype, params=params)
        if best_est is None or est.time_s < best_est.time_s:
            best, best_est = (bm, bn, bk), est
    if best is None:  # degenerate fallback: minimal legal tile
        sub_a = plat._SUBLANES.get(a_itemsize, 8)
        best = (max(sub_a, 128), 128, k_granularity)
    bm, bn, bk = best
    ktype, ksplit = select_kernel_type(m, n, k, bm, bn, bk, info)
    # N-major swizzle when the n extent dwarfs m — mirrors the reference's
    # swizzleDirection = m > n ? 0 : 1 (`tiling_params.h:63-64`).
    swz = SwizzleDir.M_MAJOR if m >= n else SwizzleDir.N_MAJOR
    cfg = GemmConfig(block_m=bm, block_n=bn, block_k=bk,
                     kernel_type=ktype, k_split=ksplit, swizzle=swz)
    return _apply_padding_tag(cfg, m, n, k, a_itemsize, b_itemsize, info)


# Back-compat: callers/tests clear the memo through the public name.
get_best_config.cache_clear = _get_best_config_for_device.cache_clear


def _apply_padding_tag(cfg: GemmConfig, m: int, n: int, k: int,
                       a_itemsize: int, b_itemsize: int,
                       info: plat.PlatformInfo) -> GemmConfig:
    """Attach the mask-vs-pad K-tail decision (tiling/padding.py) — applied
    uniformly whether the tile search ran in C++ or Python, keeping the two
    backends equivalence-testable."""
    from . import padding
    tag = padding.get_padding_tag(
        m, n, k, cfg.block_m, cfg.block_n, cfg.block_k,
        a_itemsize, b_itemsize, info)
    if tag.tag == padding.PaddingTag.PAD_K:
        return cfg.replace(pad_k=True)
    return cfg
