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


def test_int8_grouped_contiguous_matches_golden():
    from deepgemm_ascend_tpu.ops.grouped_gemm import make_contiguous_layout
    e, k, n, bm = 3, 256, 128, 16
    b = golden.gen_heavy_tail((e, k, n), seed=7)
    b_q, b_s = quant.quantize_int8(jnp.asarray(b), axis=1)    # (e,1,n)
    tokens = [16, 5, 0]    # uneven, incl. an empty expert
    m_total, tile_ids, row_map = make_contiguous_layout(tokens, bm)
    a_rows = golden.gen_heavy_tail((sum(tokens), k), seed=8)
    a = np.zeros((m_total, k), np.float64)
    for i, src in enumerate(row_map):
        if src >= 0:
            a[i] = a_rows[src]
    a_q, a_s = quant.quantize_int8(jnp.asarray(a), axis=-1)   # (m,1)
    out = i8.m_grouped_int8_gemm_contiguous(
        a_q, a_s, b_q, b_s, jnp.asarray(tile_ids),
        config=GemmConfig(block_m=bm, block_n=128, block_k=128),
        out_dtype=jnp.float32)
    out = np.asarray(out)
    row = 0
    for g, cnt in enumerate(tokens):
        padded = -(-cnt // bm) * bm if cnt else 0
        if not padded:
            continue
        seg = slice(row, row + padded)
        ref = (np.asarray(a_q, np.float64)[seg]
               @ np.asarray(b_q, np.float64)[g]
               * np.asarray(a_s, np.float64)[seg]
               * np.asarray(b_s, np.float64)[g])
        res = verify.verify(out[seg][:cnt], ref[:cnt], rtol=1e-5,
                            atol=1e-6)
        assert res.ok, (g, res)
        row += padded
    # padding TILES (id -1) zeroed — e.g. none here beyond group pads;
    # group-pad ROWS within a live tile are computed (garbage ok per
    # contract), so only assert the valid rows above.


def test_int8_grouped_masked_matches_golden_and_zeroes():
    e, m_max, k, n = 4, 32, 256, 128
    masked = [16, 3, 0, 32]
    b = golden.gen_heavy_tail((e, k, n), seed=9)
    b_q, b_s = quant.quantize_int8(jnp.asarray(b), axis=1)
    a = golden.gen_heavy_tail((e, m_max, k), seed=10)
    a_q, a_s = quant.quantize_int8(jnp.asarray(a), axis=-1)   # (e,m,1)
    out = i8.m_grouped_int8_gemm_masked(
        a_q, a_s, b_q, b_s, jnp.asarray(masked),
        config=GemmConfig(block_m=16, block_n=128, block_k=128),
        out_dtype=jnp.float32)
    out = np.asarray(out)
    for g in range(e):
        mm = masked[g]
        ref = (np.asarray(a_q, np.float64)[g]
               @ np.asarray(b_q, np.float64)[g]
               * np.asarray(a_s, np.float64)[g]
               * np.asarray(b_s, np.float64)[g])
        res = verify.verify(out[g, :mm], ref[:mm], rtol=1e-5, atol=1e-6)
        assert res.ok, (g, res)
        first_dead = -(-mm // 16) * 16
        assert np.all(out[g, first_dead:] == 0.0), g


def test_int8_vs_fp8_numerics_tradeoff_documented():
    """Quantization-error sanity on heavy-tail data: W8A8 per-token int8
    must stay within a usable band of the TRUE (unquantized) product, and
    the docstring's claimed tradeoff (coarser range handling than fp8
    blockwise, 2× compute rate) must not mean catastrophic error."""
    m, k, n = 64, 512, 256
    a = golden.gen_heavy_tail((m, k), seed=20)
    b = golden.gen_heavy_tail((k, n), seed=21)
    exact = np.asarray(a, np.float64) @ np.asarray(b, np.float64)

    a_q, a_s = quant.quantize_int8(jnp.asarray(a), axis=-1)
    b_q, b_s = quant.quantize_int8(jnp.asarray(b), axis=0)
    out = np.asarray(i8.int8_gemm_with_config(
        a_q, a_s, b_q, b_s, config=GemmConfig(32, 128, 256),
        out_dtype=jnp.float32), np.float64)
    rel = (np.linalg.norm(out - exact) / np.linalg.norm(exact))
    # Heavy-tail per-token int8: a few % relative L2 is the expected W8A8
    # operating band; >10% would mean the scale plumbing is broken.
    assert rel < 0.05, rel


def test_int8_linear_layer_matches_fp32_reference():
    """Int8Linear building block: W8A8 projection within the expected
    quantization band of the dense f32 product; jit-stable."""
    from deepgemm_ascend_tpu.models.layers import Int8Linear
    key = jax.random.PRNGKey(3)
    lin = Int8Linear.create(key, 256, 384)
    x = jnp.asarray(golden.gen_heavy_tail((4, 8, 256), seed=30),
                    jnp.bfloat16)
    y = lin(x)
    assert y.shape == (4, 8, 384) and y.dtype == jnp.bfloat16
    w_deq = (np.asarray(lin.w_q, np.float64)
             * np.asarray(lin.scales, np.float64))
    ref = np.asarray(x, np.float64).reshape(-1, 256) @ w_deq
    rel = (np.linalg.norm(np.asarray(y, np.float64).reshape(-1, 384) - ref)
           / np.linalg.norm(ref))
    assert rel < 0.05, rel
    # from_weights roundtrip agrees with create-time quantization
    lin2 = Int8Linear.from_weights(w_deq.astype(np.float32))
    y2 = lin2(x)
    assert np.isfinite(np.asarray(y2, np.float32)).all()
