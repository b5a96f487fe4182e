"""deepgemm_ascend_tpu — a TPU-native FP8 quantized-inference engine.

Brand-new framework with the capabilities of ``sglang-npu/DeepGEMM_Ascend``
re-designed for JAX/XLA/Pallas (see SURVEY.md for the structural analysis and
the capability → TPU mechanism mapping). Core surface:

* dense GEMM with three-tier tiling (cache → learned predictor → analytic):
  :func:`gemm`, :func:`bgemm`
* FP8 blockwise-scaled GEMM with dequant-in-accumulator Pallas kernels:
  :func:`fp8_gemm` (per-128-channel activation scales × 128×128 weight blocks)
* grouped GEMM for MoE prefill/decode: :func:`m_grouped_gemm_contiguous`,
  :func:`m_grouped_gemm_masked`
* quantization utilities, autotuner, verification, benchmarking, a sharded
  serving slice — see the submodules.

Reference-compat shims (``run_mmad_custom`` / ``run_mmad_rtc`` /
``run_mmad_bench``, ``framework/deep_gemm_ascend/__init__.py:1-5``) live in
:mod:`deepgemm_ascend_tpu.compat`.
"""

from .config import GemmConfig, KernelType, SwizzleDir
from .ops import bgemm, gemm, gemm_with_config
from .tiling import select_config

__version__ = "0.1.0"

__all__ = [
    "GemmConfig", "KernelType", "SwizzleDir",
    "bgemm", "gemm", "gemm_with_config", "select_config",
    "__version__",
]


def __getattr__(name):
    # Lazy heavy submodule loading keeps `import deepgemm_ascend_tpu` light.
    if name in ("fp8_gemm", "fp8_gemm_with_config"):
        from .ops import fp8_gemm as _m
        return getattr(_m, name)
    if name in ("m_grouped_gemm_contiguous", "m_grouped_gemm_masked"):
        from .ops import grouped_gemm as _m
        return getattr(_m, name)
    if name in ("int8_gemm", "int8_gemm_with_config",
                "m_grouped_int8_gemm_contiguous",
                "m_grouped_int8_gemm_masked"):
        from .ops import int8_gemm as _m
        return getattr(_m, name)
    if name in ("quantize_activations", "quantize_weights_blockwise"):
        from .ops import quant as _m
        return getattr(_m, name)
    if name == "compat":
        # NOTE: must go through importlib — `from . import compat` here
        # looks the attribute up on this module first, re-entering this
        # __getattr__ forever.
        import importlib
        return importlib.import_module(".compat", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
