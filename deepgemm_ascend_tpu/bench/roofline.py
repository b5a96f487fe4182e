"""Roofline accounting for GEMM benchmarks."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..tiling import platform as plat


@dataclasses.dataclass(frozen=True)
class Roofline:
    flops: int
    bytes: int
    peak_flops: float
    peak_bytes_per_s: float

    @property
    def compute_bound_s(self) -> float:
        return self.flops / self.peak_flops

    @property
    def memory_bound_s(self) -> float:
        return self.bytes / self.peak_bytes_per_s

    @property
    def light_speed_s(self) -> float:
        return max(self.compute_bound_s, self.memory_bound_s)

    def fraction(self, measured_s: float) -> float:
        """Fraction of the roofline achieved (1.0 = speed of light)."""
        return self.light_speed_s / max(measured_s, 1e-12)


def gemm_roofline(m: int, n: int, k: int, in_dtype, out_dtype,
                  info: plat.PlatformInfo | None = None) -> Roofline:
    info = info or plat.detect()
    in_size = jnp.dtype(in_dtype).itemsize
    out_size = jnp.dtype(out_dtype).itemsize
    flops = 2 * m * n * k
    # Minimal traffic: each operand + output touched once.
    nbytes = m * k * in_size + k * n * in_size + m * n * out_size
    return Roofline(flops, nbytes, info.peak_flops(in_dtype),
                    info.hbm_gbps * 1e9)
