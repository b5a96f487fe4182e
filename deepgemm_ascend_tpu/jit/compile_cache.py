"""Shape-specialized compilation caching.

TPU-native counterpart of the reference's JIT compile/cache layer
(``framework/csrc/jit/compiler.hpp:10-120`` + ``cache.hpp:11-33``): the
reference string-formats AscendC source per shape, shells out to cmake, and
caches fatbins on disk keyed ``"b{}m{}n{}k{}_type{}"`` so compiles persist
across processes. On TPU the pieces map to:

* string codegen        → tracing a Python kernel under ``jax.jit``
  (Python *is* the template language; tile params are static args);
* cmake + fatbin        → XLA/Mosaic compilation;
* on-disk fatbin cache  → JAX's persistent compilation cache
  (:func:`enable_persistent_cache`), keyed by HLO hash — strictly stronger
  than the shape signature;
* in-process KernelRuntimeCache → jit's internal C++ fastpath cache.

This module adds the observable bits: enabling the disk cache at a DGA_*
env-var path, and per-signature compile/hit statistics for parity with the
reference's cache-revalidation behavior (`kernel_runtime.hpp:27-30`).
"""

from __future__ import annotations

import dataclasses
import os
import threading
from typing import Optional

import jax

_ENV_CACHE_DIR = ("DGA_KERNEL_CACHE_DIR", "JAX_COMPILATION_CACHE_DIR")
_enabled_dir: Optional[str] = None
_lock = threading.Lock()


def kernel_signature(op: str, batch: int, m: int, n: int, k: int,
                     kernel_type: int = 0) -> str:
    """≙ the reference cache key ``"b{}m{}n{}k{}_type{}"``
    (`compiler.hpp:29`), extended with the op name."""
    return f"{op}_b{batch}m{m}n{n}k{k}_type{kernel_type}"


def enable_persistent_cache(path: Optional[str] = None) -> str:
    """Enable the on-disk compilation cache (kernels persist across
    processes, ≙ `compiler.hpp:29-35` + `cache.hpp:17-33`)."""
    global _enabled_dir
    with _lock:
        if path is None:
            for var in _ENV_CACHE_DIR:
                path = os.environ.get(var)
                if path:
                    break
        if path is None:
            path = os.path.join(os.path.expanduser("~"), ".cache",
                                "deepgemm_ascend_tpu", "xla_cache")
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled_dir = path
        return path


@dataclasses.dataclass
class CompileStats:
    """Per-signature compile bookkeeping (observability parity with the
    reference's [DGA] logs around cache hits/misses)."""

    compiles: dict = dataclasses.field(default_factory=dict)
    hits: dict = dataclasses.field(default_factory=dict)

    def record(self, sig: str, cache_hit: bool) -> None:
        book = self.hits if cache_hit else self.compiles
        book[sig] = book.get(sig, 0) + 1

    def summary(self) -> dict:
        return {
            "unique_kernels": len(self.compiles),
            "total_compiles": sum(self.compiles.values()),
            "total_hits": sum(self.hits.values()),
            "cache_dir": _enabled_dir,
        }


stats = CompileStats()
