"""TPU platform introspection.

TPU-native counterpart of the reference's hardware envelope struct
(``aclnn_catlass_dynamic_matmul/op_host/op_tiling/platform_info.h:16-41`` —
coreNum/UB/L1/L0A/L0B/L0C sizes queried from the CANN platform manager, with
Atlas-A2 defaults). On TPU the relevant envelope is: VMEM capacity per core,
MXU systolic-array shape, minimum (sublane, lane) tile per dtype, number of
TensorCores sharing a chip (megacore), and peak FLOP/s + HBM bandwidth for
roofline accounting.

Values are conservative published numbers; unknown device kinds fall back to
v5e-like defaults so host-side tiling logic always works (including on CPU).
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp


# Minimum (sublane, lane) tile per dtype — lane dim is always 128.
_SUBLANES = {
    4: 8,    # f32/i32
    2: 16,   # bf16/f16
    1: 32,   # int8 / fp8
}


def min_sublane(dtype) -> int:
    """Minimum second-to-last-dim tile for ``dtype`` (lane dim is 128)."""
    itemsize = jnp.dtype(dtype).itemsize
    return _SUBLANES.get(itemsize, 8)


LANE = 128
MXU = 128


@dataclasses.dataclass(frozen=True)
class PlatformInfo:
    """Hardware envelope used by the analytic tiler and roofline reporter."""

    device_kind: str = "cpu"
    num_cores: int = 1              # TensorCores per chip (megacore count)
    vmem_bytes: int = 16 * 2**20    # VMEM per core (conservative; see pallas guide)
    mxu: int = MXU                  # systolic array dimension
    lane: int = LANE
    hbm_bytes: int = 16 * 2**30
    hbm_gbps: float = 819.0         # HBM bandwidth GB/s
    peak_bf16_tflops: float = 197.0
    peak_int8_tops: float = 394.0
    ici_gbps: float = 0.0           # per-link ICI bandwidth (one direction)
    vpu_tops: float = 1.8           # VPU elementwise throughput (Top/s)

    def peak_flops(self, dtype) -> float:
        """Peak FLOP/s for matmuls with the given *input* dtype.

        fp8 (e4m3/e5m2) runs the MXU at the **bf16** rate on these parts —
        measured on v5e: pure fp8 dot ≈172-175 TF/s vs the 197 bf16 peak,
        nowhere near the 394 int8 rate (pricing fp8 at the int8 peak made
        every compute-bound fp8 roofline fraction look half as good and
        skewed the analytic tiler's compute/memory balance)."""
        dt = jnp.dtype(dtype)
        if "float8" in dt.name:
            return self.peak_bf16_tflops * 1e12
        if dt.itemsize == 1:
            return self.peak_int8_tops * 1e12
        if dt.itemsize == 2:
            return self.peak_bf16_tflops * 1e12
        # f32 matmul runs through multiple bf16 passes; ~1/3 of bf16 peak.
        return self.peak_bf16_tflops * 1e12 / 3.0


_KNOWN = {
    # device_kind (lowered, substring match) -> PlatformInfo
    "v5 lite": PlatformInfo("tpu v5e", 1, 16 * 2**20, MXU, LANE, 16 * 2**30, 819.0, 197.0, 394.0, 186.0, 1.8),
    "v5e": PlatformInfo("tpu v5e", 1, 16 * 2**20, MXU, LANE, 16 * 2**30, 819.0, 197.0, 394.0, 186.0, 1.8),
    "v5p": PlatformInfo("tpu v5p", 2, 16 * 2**20, MXU, LANE, 95 * 2**30, 2765.0, 459.0, 918.0, 800.0, 4.0),
    "v5": PlatformInfo("tpu v5e", 1, 16 * 2**20, MXU, LANE, 16 * 2**30, 819.0, 197.0, 394.0, 186.0, 1.8),
    "v4": PlatformInfo("tpu v4", 2, 16 * 2**20, MXU, LANE, 32 * 2**30, 1228.0, 275.0, 275.0, 400.0, 3.0),
    "v6": PlatformInfo("tpu v6e", 1, 16 * 2**20, MXU, LANE, 32 * 2**30, 1640.0, 918.0, 1836.0, 360.0, 3.6),
    "cpu": PlatformInfo("cpu", 1, 16 * 2**20, MXU, LANE, 16 * 2**30, 100.0, 1.0, 2.0, 0.0, 0.1),
}


def detect() -> PlatformInfo:
    """Detect the local accelerator; fall back to v5e-like defaults.

    ``DGA_DEVICE`` overrides detection (e.g. ``DGA_DEVICE="tpu v5e"``):
    offline tooling (harvest, reports, cost-model fits) can then run with
    the target device's envelope without touching the accelerator — ≙ the
    reference tuners' SOC_VERSION override (`framework/CMakeLists.txt:7`).
    The env var is re-read on every call (only the underlying backend
    query is cached), so setting ``DGA_DEVICE`` after a first detection
    still takes effect — no import-order dependency.
    """
    return _detect(os.environ.get("DGA_DEVICE"))


def info_for(kind: str) -> PlatformInfo:
    """Envelope for a device-kind string (substring match, v5e/cpu
    fallbacks) — lets device-aware caches key on the kind explicitly."""
    kind = kind.lower()
    for key, info in _KNOWN.items():
        if key in kind:
            return info
    if "tpu" in kind:
        return _KNOWN["v5e"]
    return _KNOWN["cpu"]


@functools.cache
def _detect(env) -> PlatformInfo:
    if env:
        kind = env.lower()
    else:
        try:
            kind = jax.devices()[0].device_kind.lower()
        except Exception:  # pragma: no cover - no backend at all
            kind = "cpu"
    return info_for(kind)


detect.cache_clear = _detect.cache_clear  # back-compat for test overrides
