"""Persistent tiling cache — tier 0 of the tiling system.

TPU-native counterpart of the reference's singleton tiling cache with CSV
file backing (``aclnn_.../op_host/op_tiling/cache.cpp:22-101``, ``cache.h:26-51``,
CSV engine ``csv.cpp:31-141``): key (m,n,k) → tiling params, loaded at init
from the path in env ``CACHE_FILE_PATH``, appended on new entries. Differences:

* keys include op kind and dtypes (the reference hardcoded b16 dense GEMM);
* storage is JSONL (one record per line, append-only, crash-tolerant — the
  same format the reference's autotuner used for sweep results,
  ``framework/benchmark/benchmark.py:420-428``);
* env var ``DGA_CACHE_FILE_PATH`` (the name the catlass example used,
  ``custom_catlass/README_zh.md:44-48``) with ``DGA_TPU_CACHE`` as an alias.

A C++ engine for the hot lookup path lives in ``csrc/tiling_core.cpp``; this
module is the authoritative fallback and the persistence layer.
"""

from __future__ import annotations

import json
import os
import threading
from typing import Iterator, Optional

from ..config import GemmConfig

_ENV_VARS = ("DGA_CACHE_FILE_PATH", "DGA_TPU_CACHE")


def cache_key(op: str, m: int, n: int, k: int, in_dtype: str, out_dtype: str,
              extra: str = "") -> str:
    """Shape-keyed signature, ≙ the compiler cache key
    ``"b{}m{}n{}k{}_type{}"`` (`csrc/jit/compiler.hpp:29`)."""
    return f"{op}:m{m}n{n}k{k}:{in_dtype}->{out_dtype}:{extra}"


def packaged_tilings_path() -> Optional[str]:
    """Packaged autotuned tilings for the detected device kind (shipped
    from on-chip sweeps, ``scripts/publish_tilings.py``), or None."""
    from . import platform as plat
    kind = plat.detect().device_kind.replace(" ", "_")
    path = os.path.join(os.path.dirname(__file__), "..", "data",
                        f"tilings_{kind}.jsonl")
    path = os.path.abspath(path)
    return path if os.path.exists(path) else None


class TilingCache:
    """Thread-safe in-memory map with optional JSONL file backing.

    ``preload_packaged``: overlay the shipped per-device autotuned table
    (read-only — new entries append to ``path``/env only). Enabled for the
    process-wide singleton so serving picks up swept configs out of the
    box; explicit instances stay empty for test isolation.
    """

    def __init__(self, path: Optional[str] = None,
                 preload_packaged: bool = False):
        self._lock = threading.Lock()
        self._map: dict[str, GemmConfig] = {}
        if path is None:
            for var in _ENV_VARS:
                path = os.environ.get(var)
                if path:
                    break
        self._path = path
        if preload_packaged:
            packaged = packaged_tilings_path()
            if packaged:
                self._load(packaged)
        if self._path and os.path.exists(self._path):
            self._load(self._path)

    # -- persistence ------------------------------------------------------
    def _load(self, path: Optional[str] = None) -> None:
        with open(path or self._path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                    self._map[rec["key"]] = GemmConfig.from_dict(rec["config"])
                except (json.JSONDecodeError, KeyError, ValueError, TypeError):
                    continue  # tolerate partial/corrupt lines (crash resume)

    def _append(self, key: str, cfg: GemmConfig) -> None:
        if not self._path:
            return
        os.makedirs(os.path.dirname(os.path.abspath(self._path)), exist_ok=True)
        with open(self._path, "a") as f:
            f.write(json.dumps({"key": key, "config": cfg.to_dict()}) + "\n")

    # -- public API (mirrors Cache::GetTiling/SetTiling, cache.cpp:69-101) -
    def get(self, key: str) -> Optional[GemmConfig]:
        with self._lock:
            return self._map.get(key)

    def set(self, key: str, cfg: GemmConfig, persist: bool = True) -> None:
        with self._lock:
            if self._map.get(key) == cfg:
                return
            self._map[key] = cfg
            if persist:
                self._append(key, cfg)

    def __len__(self) -> int:
        return len(self._map)

    def __iter__(self) -> Iterator[tuple[str, GemmConfig]]:
        return iter(list(self._map.items()))

    def clear(self) -> None:
        with self._lock:
            self._map.clear()


_global_caches: dict = {}        # device_kind -> TilingCache
_global_lock = threading.Lock()


def global_cache() -> TilingCache:
    """Process-wide singleton PER DEVICE KIND, ≙
    ``Cache::TilingCache::Instance`` (`cache.cpp:22-27`).

    Keyed on the detected device so a mid-process ``DGA_DEVICE`` change
    (platform.detect re-reads it, advisor r3) gets a fresh instance
    preloading THAT device's packaged tilings — entries resolved under
    the previous device's envelope can no longer be served as cache hits
    (self-review r4). Cache keys inside one instance stay device-less:
    the on-disk jsonl format is shared with the packaged per-device
    tables (``tilings_<device>.jsonl``), which are device-scoped by file.
    """
    from . import platform as plat
    kind = plat.detect().device_kind
    with _global_lock:
        inst = _global_caches.get(kind)
        if inst is None:
            inst = _global_caches[kind] = TilingCache(preload_packaged=True)
        return inst


def reset_global_cache(path: Optional[str] = None) -> TilingCache:
    """Re-create the current device's singleton (tests / env change)."""
    from . import platform as plat
    kind = plat.detect().device_kind
    with _global_lock:
        inst = _global_caches[kind] = TilingCache(path)
        return inst
