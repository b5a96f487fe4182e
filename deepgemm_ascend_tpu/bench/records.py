"""Physical-plausibility screening for autotune sweep records.

Why this exists: timing on this rig subtracts a measured RPC floor from a
scan-chained device time (`bench/timing.py`). When the chain is too short
(the pre-adaptive "coarse" round-1 sweeps) or the transport degrades
mid-sweep, the subtraction collapses and a record claims a time *below the
shape's roofline light-speed* — physically impossible, but it would win
every downstream argmin: the published tiling table, the benchmark report,
the cost-model fit, and the predictor training set (observed: a 26 µs
memory-bound shape "measured" at 1 ns). The reference's tuner trusts
msprof's on-device Task Duration so it has no such failure mode
(`benchmark.py:400-418`); the TPU-side equivalent guard is this screen:
reject any record faster than ``tol`` × light-speed for its shape.

Every consumer of raw sweep jsonl must go through :func:`plausible` (the
sweep itself additionally gates at admission time, `tiling/autotune.py`).
"""

from __future__ import annotations

from . import roofline as _roofline
from ..tiling import platform as _plat

# op → (in_dtype, out_dtype) — sweep records don't carry dtypes; the op
# determines them (mirrors the selector's cache keying).
OP_DTYPES = {
    "fp8_gemm": ("float8_e4m3fn", "bfloat16"),
    "fp8_gemm_nt": ("float8_e4m3fn", "bfloat16"),
    "gemm": ("bfloat16", "float32"),
    "gemm_nt": ("bfloat16", "float32"),
    "gemm_tn": ("bfloat16", "float32"),
    "gemm_tt": ("bfloat16", "float32"),
    "int8_gemm": ("int8", "bfloat16"),
    "int8_grouped_gemm": ("int8", "bfloat16"),
    "int8_grouped_gemm_masked": ("int8", "bfloat16"),
    "grouped_gemm": ("float8_e4m3fn", "bfloat16"),
    "grouped_gemm_nt": ("float8_e4m3fn", "bfloat16"),
    "grouped_gemm_masked": ("float8_e4m3fn", "bfloat16"),
    "grouped_gemm_masked_nt": ("float8_e4m3fn", "bfloat16"),
    "grouped_masked": ("float8_e4m3fn", "bfloat16"),  # legacy op key
}


def is_xla(config: dict) -> bool:
    """True iff a sweep-record config dict is the XLA kernel family.

    XLA-family records (config.KernelType.XLA) ignore their block fields —
    every consumer that reasons about timing THROUGH the blocks (cost-model
    calibration, predictor training, the vs-analytic report column) must
    exclude them via this one predicate rather than re-hardcoding the enum
    value.
    """
    from ..config import KernelType
    return config.get("kernel_type", 1) == int(KernelType.XLA)

# Tolerance on the roofline fraction. Genuine records top out just under
# 1.0 (best observed: 0.988 on a bandwidth-saturated shape); corrupted
# ones land at ≥1.16. The margin absorbs rounding in the platform
# constants, not real kernels.
DEFAULT_TOL = 1.05


def flops_scale(r: dict) -> float:
    """Expert count E for grouped records, 1.0 for dense.

    Grouped sweeps store per-expert (m, n, k) but E-scaled tflops, so
    E = tflops · t / (2·m·n·k) exactly (both written by the same process).
    """
    t, tf = r.get("time_s", 0.0), r.get("tflops", 0.0)
    if t <= 0 or not tf:
        return 1.0
    return max(1.0, round(tf * 1e12 * t / (2.0 * r["m"] * r["n"] * r["k"])))


def light_speed_floor_s(op: str, m: int, n: int, k: int,
                        in_dtype, out_dtype, scale: float,
                        info: "_plat.PlatformInfo | None" = None) -> float:
    """A PHYSICAL lower bound on the runtime of one sweep record.

    Dense: ``scale`` = 1 → the plain max(compute, memory) roofline.
    Grouped CONTIGUOUS: ``scale`` multiplies the per-(m,n,k) work, but it
    counts m-TILES for uneven layouts (autotune_sweep records m = layout
    block_m with flops_scale = n_tiles), which can exceed the expert
    count — and only experts carry distinct B panels. A valid bound for
    ANY expert count e ≥ 1 therefore scales compute and the A/out traffic
    by ``scale`` but counts the B panel ONCE. Grouped MASKED: the sweep
    records per-expert (m, n, k) with E-scaled tflops, so ``scale`` = E
    exactly and the kernel streams E DISTINCT B panels — count the B
    panel E times too (the m-tiles ambiguity is contiguous-only; a
    once-counted B would leave the screen ~E× looser than physical on
    small-m B-dominated masked decode shapes).
    """
    import jax.numpy as jnp
    info = info or _plat.detect()
    rl = _roofline.gemm_roofline(m, n, k, in_dtype, out_dtype, info)
    if scale <= 1 or "grouped" not in op:   # int8_grouped_* counts too
        return rl.light_speed_s * scale
    isz = jnp.dtype(in_dtype).itemsize
    osz = jnp.dtype(out_dtype).itemsize
    comp = rl.compute_bound_s * scale
    b_panels = scale if "masked" in op else 1.0
    bytes_lb = (scale * (m * k * isz + m * n * osz)
                + b_panels * k * n * isz)
    return max(comp, bytes_lb / (info.hbm_gbps * 1e9))


def roofline_fraction(r: dict, info: "_plat.PlatformInfo | None" = None) -> float:
    """floor_s / measured_s for one record (>1 ⇒ faster than light)."""
    info = info or _plat.detect()
    op = r.get("op", "gemm")
    in_dt, out_dt = OP_DTYPES.get(op, ("bfloat16", "float32"))
    floor = light_speed_floor_s(op, r["m"], r["n"], r["k"], in_dt, out_dt,
                                flops_scale(r), info)
    return floor / max(r["time_s"], 1e-12)


def plausible(r: dict, info: "_plat.PlatformInfo | None" = None,
              tol: float = DEFAULT_TOL) -> bool:
    """True iff the record's time is physically achievable for its shape."""
    if r.get("time_s", -1.0) <= 0:
        return False
    if r.get("op", "gemm") not in OP_DTYPES:
        return True  # unknown op: cannot score, do not silently drop
    return roofline_fraction(r, info) <= tol
