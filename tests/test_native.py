"""Native C++ core ↔ Python reference equivalence.

Mirrors the reference's gtest coverage of its C++ tiling stack
(``aclnn_.../tests``: do_tiling, select_kernel, cache, csv) but with a
stronger oracle: the Python implementation in tiling/analytic.py is the
spec, and the C++ must agree exactly on every probe shape.
"""

import ctypes
import os

import pytest

from deepgemm_ascend_tpu import native
from deepgemm_ascend_tpu.config import GemmConfig
from deepgemm_ascend_tpu.tiling import analytic, platform


lib = native.load()
pytestmark = pytest.mark.skipif(lib is None, reason="no C++ toolchain")

SHAPES = [
    (4096, 4096, 4096), (8, 7168, 18432), (64, 24576, 1536),
    (128, 4096, 7168), (1279, 5003, 7681), (1, 128, 128),
    (100, 130, 70), (2048, 4096, 7168),
]


def _py_config(m, n, k, a_i, b_i, o_i, gran):
    """Python analytic result, bypassing the native fast path."""
    info = platform.detect()
    import jax.numpy as jnp
    in_dtype = {1: jnp.int8, 2: jnp.bfloat16, 4: jnp.float32}[a_i]
    best, best_est = None, None
    for bm, bn, bk in analytic.enumerate_candidates(
            m, n, k, a_i, b_i, o_i, info, gran):
        est = analytic.estimate_time(m, n, k, bm, bn, bk, a_i, b_i, o_i,
                                     info, in_dtype)
        if best_est is None or est.time_s < best_est.time_s:
            best, best_est = (bm, bn, bk), est
    return best


@pytest.mark.parametrize("m,n,k", SHAPES)
@pytest.mark.parametrize("a_i,gran", [(2, 128), (1, 128)])
def test_native_matches_python_analytic(m, n, k, a_i, gran):
    info = platform.detect()
    import jax.numpy as jnp
    in_dtype = {1: jnp.int8, 2: jnp.bfloat16}[a_i]
    cfg = native.select_config_native(
        m, n, k, a_i, a_i, 4, gran, info.vmem_bytes,
        info.peak_flops(in_dtype), info.hbm_gbps, info.num_cores)
    py = _py_config(m, n, k, a_i, a_i, 4, gran)
    assert (cfg.block_m, cfg.block_n, cfg.block_k) == py, (cfg, py)


def test_native_vmem_footprint_matches():
    for bm, bn, bk in [(128, 128, 128), (512, 1024, 2048), (16, 128, 256)]:
        got = lib.dga_vmem_footprint(bm, bn, bk, 2, 2, 4)
        want = analytic.vmem_footprint(bm, bn, bk, 2, 2, 4)
        assert got == want


def test_native_estimate_time_matches():
    info = platform.detect()
    import jax.numpy as jnp
    for m, n, k in SHAPES[:4]:
        got = lib.dga_estimate_time(m, n, k, 256, 256, 512, 2, 2, 4,
                                    info.vmem_bytes,
                                    info.peak_flops(jnp.bfloat16),
                                    info.hbm_gbps, 1300.0, 3e-6, 1e-7)
        want = analytic.estimate_time(m, n, k, 256, 256, 512, 2, 2, 4,
                                      info, jnp.bfloat16).time_s
        assert abs(got - want) / want < 1e-9


def test_native_cache_roundtrip(tmp_path):
    path = str(tmp_path / "tilings.csv").encode()
    lib.dga_cache_init(path)
    cfg = native.NativeConfig(256, 512, 1024, 1, 1, 0)
    assert lib.dga_cache_get(b"gemm:m1n2k3", ctypes.byref(
        native.NativeConfig())) == 0
    lib.dga_cache_set(b"gemm:m1n2k3", ctypes.byref(cfg), 1)
    out = native.NativeConfig()
    assert lib.dga_cache_get(b"gemm:m1n2k3", ctypes.byref(out)) == 1
    assert (out.block_m, out.block_n, out.block_k) == (256, 512, 1024)
    # persistence: re-init reloads from CSV
    lib.dga_cache_init(path)
    out2 = native.NativeConfig()
    assert lib.dga_cache_get(b"gemm:m1n2k3", ctypes.byref(out2)) == 1
    assert out2.block_k == 1024
    assert lib.dga_cache_size() == 1


def test_selector_end_to_end_uses_native():
    # get_best_config must return a native-backed result identical to the
    # GemmConfig contract (hashable, legal blocks).
    analytic.get_best_config.cache_clear()
    cfg = analytic.get_best_config(4096, 4096, 4096)
    assert isinstance(cfg, GemmConfig)
    assert cfg.block_n % 128 == 0 and cfg.block_k % 128 == 0


def test_native_cpp_unit_suite(tmp_path):
    """Build + run the native assert suite (csrc/dga_core_test.cpp — the
    gtest-tier analogue, ≙ `aclnn_.../tests/CMakeLists.txt:14-39`)."""
    import shutil
    import subprocess

    cxx = shutil.which(os.environ.get("CXX", "g++")) or shutil.which("c++")
    if cxx is None:
        pytest.skip("no C++ compiler")
    csrc = os.path.join(os.path.dirname(native.__file__), "csrc")
    exe = str(tmp_path / "dga_core_test")
    subprocess.run(
        [cxx, "-O1", "-std=c++17",
         os.path.join(csrc, "dga_core.cpp"),
         os.path.join(csrc, "dga_core_test.cpp"), "-o", exe],
        check=True, capture_output=True, timeout=180)
    res = subprocess.run([exe, str(tmp_path / "cache.csv")],
                         capture_output=True, text=True, timeout=60)
    assert res.returncode == 0, res.stderr
    assert "all checks passed" in res.stdout


def test_native_padding_tag_matches_python():
    """C++ padding decision must be EXACTLY the Python reference
    (tiling/padding.py::get_padding_tag) — same costs, same argmin."""
    from deepgemm_ascend_tpu.tiling import padding as pad

    info = platform.detect()
    cases = [
        # aligned K → NONE with zero costs
        (512, 512, 512, 128, 128, 128, 2, 2, 1),
        # ragged K, one call → masking usually cheaper
        (512, 512, 640, 128, 128, 256, 2, 2, 1),
        # ragged K, weights reused many times → padding amortizes
        (4096, 4096, 7000, 256, 256, 512, 2, 2, 10_000),
        (64, 24576, 1530, 64, 1024, 512, 1, 1, 1),
        (1279, 5003, 7681, 256, 128, 1024, 2, 2, 64),
    ]
    for m, n, k, bm, bn, bk, a_i, b_i, calls in cases:
        got = native.padding_tag_native(
            m, n, k, bm, bn, bk, a_i, b_i, info.vpu_tops, info.hbm_gbps,
            calls)
        assert got is not None
        tag, mask_s, pad_s = got
        want = pad.get_padding_tag(m, n, k, bm, bn, bk, a_i, b_i, info,
                                   calls_amortized=calls)
        assert tag == int(want.tag), (tag, want)
        assert mask_s == pytest.approx(want.mask_s, rel=1e-12)
        assert pad_s == pytest.approx(want.pad_s, rel=1e-12)
