"""ctypes loader for the native host core (csrc/dga_core.cpp).

Compiles the C++ core on first use into a per-user cache dir (the same
compile-once-reuse-forever discipline as the reference's runtime cmake
compiles, ``csrc/jit/compiler.hpp:40-84`` — but host-only: TPU device code
is Pallas/Mosaic, not string codegen). Falls back to the pure-Python
implementations in tiling/ when no C++ toolchain is available; the Python
side is the reference implementation, equivalence-tested in
tests/test_native.py.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import shutil
import subprocess
import threading
from typing import Optional

_SRC = os.path.join(os.path.dirname(__file__), "csrc", "dga_core.cpp")
_ABI = 3

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


class NativeConfig(ctypes.Structure):
    _fields_ = [
        ("block_m", ctypes.c_int32),
        ("block_n", ctypes.c_int32),
        ("block_k", ctypes.c_int32),
        ("kernel_type", ctypes.c_int32),
        ("k_split", ctypes.c_int32),
        ("swizzle", ctypes.c_int32),
    ]


def _cache_dir() -> str:
    root = os.environ.get("DGA_NATIVE_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "deepgemm_ascend_tpu", "native")
    os.makedirs(root, exist_ok=True)
    return root


def _build() -> Optional[str]:
    cxx = shutil.which(os.environ.get("CXX", "g++")) or shutil.which("c++")
    if cxx is None or not os.path.exists(_SRC):
        return None
    with open(_SRC, "rb") as f:
        sig = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(_cache_dir(), f"libdga_core_{sig}_abi{_ABI}.so")
    if os.path.exists(so_path):
        return so_path
    tmp = so_path + f".tmp{os.getpid()}"
    cmd = [cxx, "-O2", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so_path)
        return so_path
    except (subprocess.SubprocessError, OSError):
        if os.path.exists(tmp):
            os.remove(tmp)
        return None


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native core; None if unavailable."""
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if os.environ.get("DGA_DISABLE_NATIVE"):
            _load_failed = True
            return None
        so = _build()
        if so is None:
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(so)
            if lib.dga_abi_version() != _ABI:
                raise OSError("ABI mismatch")
        except OSError:
            _load_failed = True
            return None
        lib.dga_select_config.restype = ctypes.c_int64
        lib.dga_select_config.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_double,
            ctypes.c_double, ctypes.c_int32,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(NativeConfig)]
        lib.dga_vmem_footprint.restype = ctypes.c_int64
        lib.dga_vmem_footprint.argtypes = [ctypes.c_int64] * 3 + [ctypes.c_int32] * 3
        lib.dga_estimate_time.restype = ctypes.c_double
        lib.dga_estimate_time.argtypes = (
            [ctypes.c_int64] * 6 + [ctypes.c_int32] * 3
            + [ctypes.c_int64, ctypes.c_double, ctypes.c_double]
            + [ctypes.c_double, ctypes.c_double, ctypes.c_double])
        lib.dga_cache_init.argtypes = [ctypes.c_char_p]
        lib.dga_cache_get.restype = ctypes.c_int32
        lib.dga_cache_get.argtypes = [ctypes.c_char_p,
                                      ctypes.POINTER(NativeConfig)]
        lib.dga_cache_set.argtypes = [ctypes.c_char_p,
                                      ctypes.POINTER(NativeConfig),
                                      ctypes.c_int32]
        lib.dga_cache_size.restype = ctypes.c_int64
        lib.dga_padding_tag.restype = ctypes.c_int32
        lib.dga_padding_tag.argtypes = (
            [ctypes.c_int64] * 6 + [ctypes.c_int32] * 2
            + [ctypes.c_double, ctypes.c_double, ctypes.c_int64,
               ctypes.POINTER(ctypes.c_double),
               ctypes.POINTER(ctypes.c_double)])
        _lib = lib
        return _lib


def padding_tag_native(m: int, n: int, k: int, bm: int, bn: int, bk: int,
                       a_item: int, b_item: int, vpu_tops: float,
                       hbm_gbps: float, calls_amortized: int = 1):
    """Native mask-vs-pad K-tail decision; None if the library is
    unavailable. Returns (tag int, mask_s, pad_s) — mirrors
    tiling/padding.py::get_padding_tag (the Python reference)."""
    lib = load()
    if lib is None:
        return None
    mask_s = ctypes.c_double()
    pad_s = ctypes.c_double()
    tag = lib.dga_padding_tag(m, n, k, bm, bn, bk, a_item, b_item,
                              vpu_tops, hbm_gbps, calls_amortized,
                              ctypes.byref(mask_s), ctypes.byref(pad_s))
    return int(tag), float(mask_s.value), float(pad_s.value)


def select_config_native(m: int, n: int, k: int, a_item: int, b_item: int,
                         out_item: int, k_gran: int, vmem_bytes: int,
                         peak_flops: float, hbm_gbps: float,
                         num_cores: int, *, vmem_gbps: float = 1300.0,
                         startup0: float = 3e-6, startup1: float = 1e-7):
    """Native analytic config; None if the library is unavailable.
    ``peak_flops``/``hbm_gbps`` are the EFFECTIVE (calibrated) values;
    the extra keywords carry the remaining fitted cost constants."""
    lib = load()
    if lib is None:
        return None
    out = NativeConfig()
    lib.dga_select_config(m, n, k, a_item, b_item, out_item, k_gran,
                          vmem_bytes, peak_flops, hbm_gbps, num_cores,
                          vmem_gbps, startup0, startup1,
                          ctypes.byref(out))
    from .config import GemmConfig, KernelType, SwizzleDir
    return GemmConfig(
        block_m=out.block_m, block_n=out.block_n, block_k=out.block_k,
        kernel_type=KernelType(out.kernel_type), k_split=out.k_split,
        swizzle=SwizzleDir(out.swizzle))
