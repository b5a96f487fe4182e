from .compile_cache import (CompileStats, enable_persistent_cache,
                            kernel_signature, stats)

__all__ = ["CompileStats", "enable_persistent_cache", "kernel_signature",
           "stats"]
