"""Dense GEMM correctness tests.

Modeled on the reference device test (``framework/tests/test.py:23-128``):
heavy-tail lognormal inputs, golden = wide-precision matmul of the rounded
inputs, acceptance = outlier-ratio ≤ 1e-4. Runs hermetically on CPU via the
Pallas interpreter (SURVEY.md §4 notes the reference has no such hermetic
kernel tier — this is an improvement, not a translation).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import deepgemm_ascend_tpu as dga
from deepgemm_ascend_tpu.config import GemmConfig, KernelType
from deepgemm_ascend_tpu.utils import golden, verify


def _golden_bf16(a, b):
    a32 = np.asarray(jnp.asarray(a, jnp.bfloat16), np.float32)
    b32 = np.asarray(jnp.asarray(b, jnp.bfloat16), np.float32)
    return a32.astype(np.float64) @ b32.astype(np.float64)


# Shapes chosen to cover: aligned, ragged M/N/K tails, skinny decode-style M,
# and a prime-ish trio like the reference suite (`benchmark.py:24-44`).
SHAPES = [
    (128, 128, 128),
    (256, 512, 384),
    (96, 1536, 608),      # reference static-kernel shape family (mmad.cpp)
    (8, 256, 736),        # skinny decode M
    (100, 130, 70),       # all-ragged
    (257, 129, 257),      # prime-ish tails
]


@pytest.mark.parametrize("m,n,k", SHAPES)
def test_gemm_bf16_vs_golden(m, n, k):
    a, b, _ = golden.gen_golden_gemm(m, n, k, seed=m * 7 + n)
    a_bf = jnp.asarray(a, jnp.bfloat16)
    b_bf = jnp.asarray(b, jnp.bfloat16)
    out = dga.gemm(a_bf, b_bf)
    assert out.dtype == jnp.float32
    ref = _golden_bf16(a, b)
    res = verify.verify(np.asarray(out), ref, rtol=2e-2, atol=1e-2,
                        max_ratio=1e-4, name=f"gemm{m}x{n}x{k}")
    assert res.ok, res


def test_gemm_f32_matches_xla():
    # f32: our blocked kernel vs XLA's matmul — different summation order, so
    # tolerance covers f32 non-associativity only (not a looser numeric tier).
    a, b, _ = golden.gen_golden_gemm(64, 96, 160, seed=3)
    ja, jb = jnp.asarray(a), jnp.asarray(b)
    out = dga.gemm(ja, jb)
    ref = np.asarray(jnp.matmul(ja, jb))
    res = verify.verify(np.asarray(out), ref, rtol=1e-4, atol=1e-4)
    assert res.ok, res


def test_gemm_f32_uniform_vs_golden():
    # Well-conditioned positive inputs: tight agreement with the f64 golden.
    a, b, ref = golden.gen_golden_gemm(64, 96, 160, seed=3, heavy_tail=False)
    out = dga.gemm(jnp.asarray(a), jnp.asarray(b))
    res = verify.verify(np.asarray(out), ref, rtol=1e-4, atol=1e-5)
    assert res.ok, res


def test_gemm_explicit_config_tail_masking():
    # Force a block_k that does NOT divide K: k-tail masking must hold.
    a, b, ref = golden.gen_golden_gemm(64, 128, 300, seed=5, heavy_tail=False)
    cfg = GemmConfig(block_m=64, block_n=128, block_k=128)
    out = dga.gemm_with_config(jnp.asarray(a), jnp.asarray(b), config=cfg)
    res = verify.verify(np.asarray(out), ref, rtol=1e-4, atol=1e-5)
    assert res.ok, res


def test_gemm_ksplit_matches_common():
    a, b, _ = golden.gen_golden_gemm(32, 128, 1024, seed=9)
    common = dga.gemm_with_config(
        jnp.asarray(a), jnp.asarray(b),
        config=GemmConfig(block_m=32, block_n=128, block_k=128))
    ks = dga.gemm_with_config(
        jnp.asarray(a), jnp.asarray(b),
        config=GemmConfig(block_m=32, block_n=128, block_k=128,
                          kernel_type=KernelType.KSPLIT, k_split=4))
    np.testing.assert_allclose(np.asarray(ks), np.asarray(common),
                               rtol=1e-4, atol=1e-4)


def test_gemm_ksplit_uneven_split():
    # nk = ceil(900/128) = 8 blocks over k_split=3 → 3+3+2 with clamping.
    a, b, ref = golden.gen_golden_gemm(16, 128, 900, seed=11, heavy_tail=False)
    ks = dga.gemm_with_config(
        jnp.asarray(a), jnp.asarray(b),
        config=GemmConfig(block_m=16, block_n=128, block_k=128,
                          kernel_type=KernelType.KSPLIT, k_split=3))
    res = verify.verify(np.asarray(ks), ref, rtol=1e-4, atol=1e-5)
    assert res.ok, res


def test_bgemm_batched():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(3, 32, 64)).astype(np.float32)
    b = rng.normal(size=(3, 64, 128)).astype(np.float32)
    out = dga.bgemm(jnp.asarray(a), jnp.asarray(b))
    ref = np.einsum("bmk,bkn->bmn", a.astype(np.float64), b.astype(np.float64))
    res = verify.verify(np.asarray(out), ref, rtol=1e-4, atol=1e-4)
    assert res.ok, res


def test_gemm_under_jit():
    a, b, _ = golden.gen_golden_gemm(64, 128, 128, seed=21)

    @jax.jit
    def f(x, y):
        return dga.gemm(x, y)

    out = f(jnp.asarray(a), jnp.asarray(b))
    ref = np.asarray(jnp.matmul(jnp.asarray(a), jnp.asarray(b)))
    assert verify.verify(np.asarray(out), ref, rtol=1e-6, atol=1e-6).ok


def test_gemm_out_dtype_bf16():
    a, b, _ = golden.gen_golden_gemm(32, 128, 64, seed=2)
    out = dga.gemm(jnp.asarray(a), jnp.asarray(b), out_dtype=jnp.bfloat16)
    assert out.dtype == jnp.bfloat16


def test_gemm_fp16_inputs():
    """The reference's second dtype ("half" in FILE_EXEC,
    `generate_code.hpp:123-369`): the dtype-agnostic kernel must accept
    fp16 operands with fp32 accumulation."""
    a, b, _ = golden.gen_golden_gemm(48, 96, 160, seed=5)
    a16, b16 = np.asarray(a, np.float16), np.asarray(b, np.float16)
    out = dga.gemm(jnp.asarray(a16), jnp.asarray(b16))
    assert out.dtype == jnp.float32
    ref = np.matmul(a16.astype(np.float32), b16.astype(np.float32))
    assert verify.verify(np.asarray(out), ref, rtol=2e-2, atol=2e-2).ok


def test_gemm_shape_errors():
    a = jnp.zeros((4, 8))
    b = jnp.zeros((9, 4))
    with pytest.raises(ValueError):
        dga.gemm(a, b)


# ---- operand layouts (nt / tn / tt) ----
# ≙ the reference's 4-way layout dispatch (`do_tiling.h:24-26`,
# `do_tiling.cpp:20-204`): the kernel contracts either dim via dot_general
# dimension numbers instead of transposing in HBM.

@pytest.mark.parametrize("layout", ["nt", "tn", "tt"])
@pytest.mark.parametrize("m,n,k", [
    (128, 256, 384),
    (64, 128, 736),       # ragged K tail
    (100, 130, 128),      # ragged M/N (lane-dim full-extent blocks)
])
def test_gemm_layouts_vs_golden(layout, m, n, k):
    a, b, _ = golden.gen_golden_gemm(m, n, k, seed=m + n + k)
    a_bf = jnp.asarray(a, jnp.bfloat16)
    b_bf = jnp.asarray(b, jnp.bfloat16)
    a_in = a_bf.T if layout[0] == "t" else a_bf
    b_in = b_bf.T if layout[1] == "t" else b_bf
    out = dga.gemm(jnp.asarray(a_in), jnp.asarray(b_in),
                   layout=layout)
    ref = _golden_bf16(a, b)
    res = verify.verify(np.asarray(out), ref, rtol=2e-2, atol=1e-2,
                        max_ratio=1e-4, name=f"gemm_{layout}_{m}x{n}x{k}")
    assert res.ok, res


def test_gemm_layout_rejects_bad_string():
    a = jnp.zeros((16, 32), jnp.bfloat16)
    b = jnp.zeros((32, 16), jnp.bfloat16)
    with pytest.raises(ValueError):
        dga.gemm(a, b, layout="xy")


def test_gemm_layout_mismatched_inner_dims():
    a = jnp.zeros((16, 32), jnp.bfloat16)
    b = jnp.zeros((48, 16), jnp.bfloat16)   # (n, k): k=16 != 32
    with pytest.raises(ValueError):
        dga.gemm(a, b, layout="nt")
