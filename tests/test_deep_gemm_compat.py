"""DeepGEMM-style API aliases (compat/deep_gemm.py) — plumbing + parity."""

import jax.numpy as jnp
import numpy as np
import pytest

from deepgemm_ascend_tpu.compat import deep_gemm as dg
from deepgemm_ascend_tpu.ops import grouped_gemm as gg
from deepgemm_ascend_tpu.ops import quant, reference
from deepgemm_ascend_tpu.utils import golden, verify


def _dense(m, n, k, seed=0):
    a = golden.gen_heavy_tail((m, k), seed=seed)
    b = golden.gen_heavy_tail((k, n), seed=seed + 1)
    a_q, a_s = quant.quantize_fp8_act(jnp.asarray(a))
    b_q, b_s = quant.quantize_fp8_weight(jnp.asarray(b))
    # NT storage: (n, k) weights with (n/128, k/128) scales
    return a_q, a_s, jnp.swapaxes(b_q, 0, 1), jnp.swapaxes(b_s, 0, 1), \
        b_q, b_s


def test_gemm_fp8_fp8_bf16_nt_vs_golden():
    m, n, k = 64, 256, 512
    a_q, a_s, bt_q, bt_s, b_q, b_s = _dense(m, n, k, seed=3)
    out = dg.gemm_fp8_fp8_bf16_nt((a_q, a_s), (bt_q, bt_s))
    assert out.shape == (m, n) and out.dtype == jnp.bfloat16
    ref = reference.fp8_gemm_reference(a_q, a_s, b_q, b_s)
    res = verify.verify(np.asarray(out, np.float32), ref,
                        rtol=2e-2, atol=1e-2)
    assert res.ok, res


def test_gemm_nt_torch_out_inplace():
    torch = pytest.importorskip("torch")
    m, n, k = 32, 128, 256
    a_q, a_s, bt_q, bt_s, *_ = _dense(m, n, k, seed=5)
    out = torch.zeros((m, n), dtype=torch.float32)
    ret = dg.gemm_fp8_fp8_bf16_nt((a_q, a_s), (bt_q, bt_s), out)
    assert ret is out
    assert float(out.abs().sum()) > 0.0


def test_grouped_contiguous_m_indices_conversion():
    e, k, n = 2, 256, 128
    bm = dg.get_m_alignment_for_contiguous_layout()
    assert bm == 128
    b = golden.gen_heavy_tail((e, k, n), seed=7)
    b_q, b_s = quant.quantize_fp8_weight(jnp.asarray(b))
    m_sum = 3 * bm  # expert0: 1 tile, expert1: 1 tile, padding: 1 tile
    a = golden.gen_heavy_tail((m_sum, k), seed=8)
    a_q, a_s = quant.quantize_fp8_act(jnp.asarray(a))
    m_indices = jnp.concatenate([
        jnp.full((bm,), 0, jnp.int32),
        jnp.full((bm,), 1, jnp.int32),
        jnp.full((bm,), -1, jnp.int32)])
    out = dg.m_grouped_gemm_fp8_fp8_bf16_nt_contiguous(
        (a_q, a_s), (jnp.swapaxes(b_q, 1, 2), jnp.swapaxes(b_s, 1, 2)),
        None, m_indices)
    out = np.asarray(out, np.float32)
    # native-call equality (the alias is plumbing over the same kernel)
    ref = np.asarray(gg.m_grouped_gemm_contiguous(
        a_q, a_s, b_q, b_s, jnp.asarray([0, 1, -1], jnp.int32)), np.float32)
    np.testing.assert_array_equal(out, ref)
    assert np.all(out[2 * bm:] == 0.0)          # padding tile zeroed
    assert np.any(out[:bm] != 0.0)


def test_grouped_contiguous_rejects_misaligned_groups():
    bm = dg.get_m_alignment_for_contiguous_layout()
    bad = jnp.concatenate([jnp.full((bm // 2,), 0, jnp.int32),
                           jnp.full((bm + bm // 2,), 1, jnp.int32)])
    a_q = jnp.zeros((2 * bm, 256), jnp.float8_e4m3fn)
    a_s = jnp.ones((2 * bm, 2), jnp.float32)
    b_q = jnp.zeros((2, 128, 256), jnp.float8_e4m3fn)
    b_s = jnp.ones((2, 1, 2), jnp.float32)
    with pytest.raises(ValueError, match="single group id"):
        dg.m_grouped_gemm_fp8_fp8_bf16_nt_contiguous(
            (a_q, a_s), (b_q, b_s), None, bad)


def test_grouped_masked_alias():
    e, m_max, k, n = 2, 32, 256, 128
    masked = jnp.asarray([20, 7])
    b = golden.gen_heavy_tail((e, k, n), seed=9)
    b_q, b_s = quant.quantize_fp8_weight(jnp.asarray(b))
    a = golden.gen_heavy_tail((e, m_max, k), seed=10)
    a_q, a_s = quant.quantize_fp8_act(jnp.asarray(a))
    out = dg.m_grouped_gemm_fp8_fp8_bf16_nt_masked(
        (a_q, a_s), (jnp.swapaxes(b_q, 1, 2), jnp.swapaxes(b_s, 1, 2)),
        None, masked, expected_m=16)   # hint accepted + ignored
    ref = gg.m_grouped_gemm_masked(
        a_q, a_s, jnp.swapaxes(b_q, 1, 2), jnp.swapaxes(b_s, 1, 2), masked,
        b_layout="t")
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(ref, np.float32))


def test_gemm_nt_torch_fp8_inputs():
    """DeepGEMM callers hold torch fp8/bf16 tensors; the bridge must be
    lossless (torch .numpy() rejects those dtypes — review finding)."""
    torch = pytest.importorskip("torch")
    m, n, k = 32, 128, 256
    a_q, a_s, bt_q, bt_s, b_q, b_s = _dense(m, n, k, seed=11)

    def to_torch_fp8(x):
        return torch.from_numpy(
            np.asarray(x).view(np.uint8)).view(torch.float8_e4m3fn)

    lhs = (to_torch_fp8(a_q), torch.from_numpy(np.asarray(a_s)))
    rhs = (to_torch_fp8(bt_q), torch.from_numpy(np.asarray(bt_s)))
    out_t = dg.gemm_fp8_fp8_bf16_nt(lhs, rhs)
    out_j = dg.gemm_fp8_fp8_bf16_nt((a_q, a_s), (bt_q, bt_s))
    np.testing.assert_array_equal(np.asarray(out_t, np.float32),
                                  np.asarray(out_j, np.float32))


def test_grouped_contiguous_alias_traces_under_jit():
    """The m_indices→tile-id conversion must not host-materialize a tracer
    (review finding); validation is skipped under jit by contract."""
    import jax
    e, k, n = 2, 256, 128
    bm = dg.get_m_alignment_for_contiguous_layout()
    b = golden.gen_heavy_tail((e, k, n), seed=12)
    b_q, b_s = quant.quantize_fp8_weight(jnp.asarray(b))
    a = golden.gen_heavy_tail((2 * bm, k), seed=13)
    a_q, a_s = quant.quantize_fp8_act(jnp.asarray(a))
    bt_q, bt_s = jnp.swapaxes(b_q, 1, 2), jnp.swapaxes(b_s, 1, 2)
    m_indices = jnp.repeat(jnp.arange(2, dtype=jnp.int32), bm)

    @jax.jit
    def f(aq, asc, bq, bs, mi):
        return dg.m_grouped_gemm_fp8_fp8_bf16_nt_contiguous(
            (aq, asc), (bq, bs), None, mi)

    out = f(a_q, a_s, bt_q, bt_s, m_indices)
    ref = dg.m_grouped_gemm_fp8_fp8_bf16_nt_contiguous(
        (a_q, a_s), (bt_q, bt_s), None, m_indices)
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(ref, np.float32))


def test_tma_alignment_helper_is_identity():
    x = jnp.ones((4, 4))
    assert dg.get_col_major_tma_aligned_tensor(x) is x
    assert dg.ceil_div(7, 3) == 3
