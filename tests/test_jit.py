"""Compile-cache layer tests (jit/compile_cache.py).

≙ the reference's compiler/cache unit coverage (`compiler.hpp:26-35` key
construction, on-disk persistence, `cache.hpp:17-33` revalidation) — on TPU
the heavy lifting is JAX's persistent compilation cache; what we own is the
signature scheme, the enable plumbing, and the hit/miss bookkeeping.
"""

import os

import jax

from deepgemm_ascend_tpu.jit import compile_cache


def test_kernel_signature_matches_reference_form():
    sig = compile_cache.kernel_signature("gemm", 1, 4096, 4096, 4096)
    # ≙ "b{}m{}n{}k{}_type{}" (`compiler.hpp:29`), op-prefixed.
    assert sig == "gemm_b1m4096n4096k4096_type0"
    assert compile_cache.kernel_signature("fp8_gemm", 2, 8, 16, 32, 1) \
        == "fp8_gemm_b2m8n16k32_type1"


def test_enable_persistent_cache_explicit_path(tmp_path):
    path = str(tmp_path / "xla_cache")
    got = compile_cache.enable_persistent_cache(path)
    assert got == path and os.path.isdir(path)
    assert jax.config.jax_compilation_cache_dir == path


def test_enable_persistent_cache_env_path(tmp_path, monkeypatch):
    path = str(tmp_path / "from_env")
    monkeypatch.setenv("DGA_KERNEL_CACHE_DIR", path)
    got = compile_cache.enable_persistent_cache()
    assert got == path and os.path.isdir(path)


def test_compile_stats_bookkeeping():
    stats = compile_cache.CompileStats()
    stats.record("gemm_b1m8n8k8_type0", cache_hit=False)
    stats.record("gemm_b1m8n8k8_type0", cache_hit=True)
    stats.record("gemm_b1m8n8k8_type0", cache_hit=True)
    s = stats.summary()
    assert s["unique_kernels"] == 1
    assert s["total_compiles"] == 1
    assert s["total_hits"] == 2
