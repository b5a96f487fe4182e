"""W8A8 int8 GEMM vs f64 dequant golden (ops/int8_gemm.py).

Capability extension beyond the reference (bf16/fp16 dense only): the
int8 MXU path runs at 2× the bf16/fp8 rate on v5e. Correctness here is
EXACT up to the output cast: the int32 K-sum is exact (no rounding until
the f32 scale epilogue), so the kernel must match the integer reference
to f32 precision.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepgemm_ascend_tpu.config import GemmConfig
from deepgemm_ascend_tpu.ops import int8_gemm as i8
from deepgemm_ascend_tpu.ops import quant
from deepgemm_ascend_tpu.utils import golden, verify


def _mk(m, k, n, seeds=(0, 1)):
    a = golden.gen_heavy_tail((m, k), seed=seeds[0])
    b = golden.gen_heavy_tail((k, n), seed=seeds[1])
    a_q, a_s = quant.quantize_int8(jnp.asarray(a), axis=-1)   # (m,1)
    b_q, b_s = quant.quantize_int8(jnp.asarray(b), axis=0)    # (1,n)
    return a_q, a_s, b_q, b_s


def _golden(a_q, a_s, b_q, b_s):
    acc = np.asarray(a_q, np.float64) @ np.asarray(b_q, np.float64)
    return acc * np.asarray(a_s, np.float64) * np.asarray(b_s, np.float64)


@pytest.mark.parametrize("shape,cfg", [
    ((64, 256, 128), GemmConfig(32, 128, 128)),
    ((128, 512, 256), GemmConfig(64, 128, 256)),   # multi-step K
])
def test_int8_gemm_matches_integer_golden(shape, cfg):
    m, k, n = shape
    a_q, a_s, b_q, b_s = _mk(m, k, n)
    out = i8.int8_gemm_with_config(a_q, a_s, b_q, b_s, config=cfg,
                                   out_dtype=jnp.float32)
    ref = _golden(a_q, a_s, b_q, b_s)
    # int32 accumulation is exact; only the f32 scale epilogue rounds.
    res = verify.verify(np.asarray(out), ref, rtol=1e-5, atol=1e-6)
    assert res.ok, res


def test_int8_gemm_k_tail_masked():
    # k=320 with bk=256 leaves a 64-lane tail the kernel must zero.
    m, k, n = 32, 320, 128
    a_q, a_s, b_q, b_s = _mk(m, k, n, seeds=(2, 3))
    out = i8.int8_gemm_with_config(a_q, a_s, b_q, b_s,
                                   config=GemmConfig(32, 128, 256),
                                   out_dtype=jnp.float32)
    ref = _golden(a_q, a_s, b_q, b_s)
    res = verify.verify(np.asarray(out), ref, rtol=1e-5, atol=1e-6)
    assert res.ok, res


def test_int8_gemm_selector_path_and_bf16_out():
    m, k, n = 64, 256, 256
    a_q, a_s, b_q, b_s = _mk(m, k, n, seeds=(4, 5))
    out = i8.int8_gemm(a_q, a_s, b_q, b_s)          # three-tier selector
    assert out.dtype == jnp.bfloat16
    ref = _golden(a_q, a_s, b_q, b_s)
    res = verify.verify(np.asarray(out, np.float32), ref,
                        rtol=1e-2, atol=1e-2)       # bf16 output rounding
    assert res.ok, res


def test_int8_gemm_rejects_bad_scales_and_dtypes():
    a_q, a_s, b_q, b_s = _mk(32, 128, 128)
    with pytest.raises(ValueError, match="a_scales"):
        i8.int8_gemm_with_config(a_q, a_s[:, 0], b_q, b_s,
                                 config=GemmConfig(32, 128, 128))
    with pytest.raises(ValueError, match="int8"):
        i8.int8_gemm_with_config(a_q.astype(jnp.bfloat16), a_s, b_q, b_s,
                                 config=GemmConfig(32, 128, 128))


def test_int8_gemm_package_lazy_export():
    import deepgemm_ascend_tpu as dga
    assert dga.int8_gemm is i8.int8_gemm
