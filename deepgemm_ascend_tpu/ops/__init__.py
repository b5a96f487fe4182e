from .gemm import bgemm, gemm, gemm_with_config

__all__ = ["bgemm", "gemm", "gemm_with_config"]
