"""FP8 blockwise-scaled GEMM vs emulated-dequant golden.

Acceptance follows the reference form (outlier ratio ≤ 1e-4,
``framework/tests/test.py:19-21``) with DeepGEMM-style tolerances: the
kernel applies scales in f32 on the accumulator, so error vs the exact
dequant golden is bf16-multiplicand rounding only (~2^-8 relative).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from deepgemm_ascend_tpu.config import GemmConfig
from deepgemm_ascend_tpu.ops import fp8_gemm as fp8mod
from deepgemm_ascend_tpu.ops import quant, reference
from deepgemm_ascend_tpu.utils import golden, verify


def _mk(m, n, k, seed=0):
    a = golden.gen_heavy_tail((m, k), seed=seed)
    b = golden.gen_heavy_tail((k, n), seed=seed + 1)
    a_q, a_s = quant.quantize_fp8_act(jnp.asarray(a))
    b_q, b_s = quant.quantize_fp8_weight(jnp.asarray(b))
    return a_q, a_s, b_q, b_s


SHAPES = [
    (128, 128, 128),
    (256, 512, 384),
    (64, 256, 896),      # decode-ish skinny
    (100, 256, 384),     # ragged M (K, N stay 128-aligned by contract)
]


@pytest.mark.parametrize("m,n,k", SHAPES)
def test_fp8_gemm_vs_dequant_golden(m, n, k):
    a_q, a_s, b_q, b_s = _mk(m, n, k, seed=m + n)
    out = fp8mod.fp8_gemm(a_q, a_s, b_q, b_s)
    assert out.dtype == jnp.bfloat16
    ref = reference.fp8_gemm_reference(a_q, a_s, b_q, b_s)
    res = verify.verify(np.asarray(out, np.float32), ref,
                        rtol=2e-2, atol=1e-2, name=f"fp8 {m}x{n}x{k}")
    assert res.ok, res


def test_fp8_gemm_f32_out_tight():
    # f32 output + f32 scale application: only bf16 multiplicand rounding.
    m, n, k = 64, 256, 512
    a_q, a_s, b_q, b_s = _mk(m, n, k, seed=7)
    out = fp8mod.fp8_gemm(a_q, a_s, b_q, b_s, out_dtype=jnp.float32)
    ref = reference.fp8_gemm_reference(a_q, a_s, b_q, b_s)
    res = verify.verify(np.asarray(out), ref, rtol=5e-2, atol=1e-3)
    assert res.ok, res
    # relative L2 must be small (scales exact, values within bf16 of exact)
    assert verify.relative_l2_error(np.asarray(out), ref) < 2e-2


def test_fp8_gemm_block_k_not_dividing_k():
    # k = 640 = 5 groups; block_k = 256 (2 groups) → ragged last grid step.
    m, n, k = 32, 128, 640
    a_q, a_s, b_q, b_s = _mk(m, n, k, seed=3)
    cfg = GemmConfig(block_m=32, block_n=128, block_k=256)
    out = fp8mod.fp8_gemm(a_q, a_s, b_q, b_s, config=cfg)
    ref = reference.fp8_gemm_reference(a_q, a_s, b_q, b_s)
    res = verify.verify(np.asarray(out, np.float32), ref, rtol=2e-2, atol=1e-2)
    assert res.ok, res


def test_fp8_gemm_preexpanded_scales():
    m, n, k = 32, 256, 256
    a_q, a_s, b_q, b_s = _mk(m, n, k, seed=5)
    bse = fp8mod.expand_weight_scales(b_s, n)
    out1 = fp8mod.fp8_gemm(a_q, a_s, b_q, bse, b_scales_expanded=True)
    out2 = fp8mod.fp8_gemm(a_q, a_s, b_q, b_s)
    np.testing.assert_array_equal(np.asarray(out1, np.float32),
                                  np.asarray(out2, np.float32))


def test_fp8_gemm_rejects_unaligned():
    a_q = jnp.zeros((16, 100), jnp.float8_e4m3fn)
    a_s = jnp.zeros((16, 1), jnp.float32)
    b_q = jnp.zeros((100, 128), jnp.float8_e4m3fn)
    b_s = jnp.zeros((1, 1), jnp.float32)
    with pytest.raises(ValueError, match="k % 128"):
        fp8mod.fp8_gemm(a_q, a_s, b_q, b_s)


def test_quant_roundtrip_error_bounded():
    x = golden.gen_heavy_tail((64, 384), seed=11)
    x_q, s = quant.quantize_fp8_act(jnp.asarray(x))
    x_dq = np.asarray(quant.dequantize_fp8_act(x_q, s))
    # e4m3 relative error ≤ 2^-4 within each scaled block (plus tiny denorm tail)
    rel = np.abs(x_dq - x) / np.maximum(np.abs(x), 1e-6)
    assert np.quantile(rel, 0.99) < 0.07, np.quantile(rel, 0.99)


def test_weight_quant_blocks():
    w = golden.gen_heavy_tail((256, 384), seed=13)
    w_q, s = quant.quantize_fp8_weight(jnp.asarray(w))
    assert s.shape == (2, 3)
    w_dq = np.asarray(quant.dequantize_fp8_weight(w_q, s))
    rel = np.abs(w_dq - w) / np.maximum(np.abs(w), 1e-6)
    assert np.quantile(rel, 0.99) < 0.07


def test_int8_kv_roundtrip():
    x = golden.gen_heavy_tail((4, 32, 64), seed=17)
    q, s = quant.quantize_int8(jnp.asarray(x), axis=-1)
    x_dq = np.asarray(quant.dequantize_int8(q, s))
    rel_l2 = verify.relative_l2_error(x_dq, x)
    # int8 symmetric on heavy-tail data: ~1% L2 is the expected floor.
    assert rel_l2 < 0.02, rel_l2


def test_fp8_gemm_folded_mode_close_to_accum():
    # Folded scales: one extra bf16 rounding on each operand (~2^-9 rel).
    m, n, k = 64, 256, 512
    a_q, a_s, b_q, b_s = _mk(m, n, k, seed=23)
    acc = np.asarray(fp8mod.fp8_gemm(a_q, a_s, b_q, b_s,
                                     out_dtype=jnp.float32), np.float32)
    fold = np.asarray(fp8mod.fp8_gemm(a_q, a_s, b_q, b_s,
                                      out_dtype=jnp.float32,
                                      scale_mode="folded",
                                      allow_relaxed=True), np.float32)
    assert verify.relative_l2_error(fold, acc) < 5e-3


def test_fp8_gemm_folded_requires_opt_in():
    """folded mode is outside the strict outlier-ratio gate — it must raise
    unless the caller explicitly accepts the relaxed numerics contract."""
    m, n, k = 32, 128, 256
    a_q, a_s, b_q, b_s = _mk(m, n, k, seed=41)
    with pytest.raises(ValueError, match="allow_relaxed"):
        fp8mod.fp8_gemm(a_q, a_s, b_q, b_s, scale_mode="folded")


@pytest.mark.parametrize("cfg", [
    None,                                        # selector (nk==1 fast path)
    GemmConfig(block_m=64, block_n=128, block_k=256),   # multi-K accum path
])
def test_fp8_gemm_accum_passes_strict_gate(cfg):
    """Every selectable scale mode (accum, both kernel variants) must pass
    the reference-form acceptance gate — outlier ratio <= 1e-4 vs the
    emulated-dequant golden on heavy-tail data (`framework/tests/test.py:19-21`)."""
    m, n, k = 128, 256, 512
    a_q, a_s, b_q, b_s = _mk(m, n, k, seed=43)
    got = np.asarray(fp8mod.fp8_gemm(a_q, a_s, b_q, b_s, config=cfg,
                                     out_dtype=jnp.float32), np.float32)
    want = np.asarray(reference.fp8_gemm_reference(a_q, a_s, b_q, b_s),
                      np.float32)
    res = verify.verify(got, want, rtol=2e-2, atol=1e-4, max_ratio=1e-4)
    assert res.ok, res


def test_fp8_gemm_folded_ragged_block_k():
    m, n, k = 32, 128, 640
    a_q, a_s, b_q, b_s = _mk(m, n, k, seed=29)
    cfg = GemmConfig(block_m=32, block_n=128, block_k=256)
    acc = np.asarray(fp8mod.fp8_gemm(a_q, a_s, b_q, b_s, config=cfg,
                                     out_dtype=jnp.float32), np.float32)
    fold = np.asarray(fp8mod.fp8_gemm(a_q, a_s, b_q, b_s, config=cfg,
                                      out_dtype=jnp.float32,
                                      scale_mode="folded",
                                      allow_relaxed=True), np.float32)
    assert not np.isnan(fold).any()
    assert verify.relative_l2_error(fold, acc) < 5e-3


def test_exact_mode_matches_numpy_reference():
    """fp8_gemm.exact_mode() must reproduce ops/reference.py bit-for-bit
    (both are f64/f32-exact dequant); it is the model-scale golden used by
    scripts/eval_quality.py."""
    m, n, k = 32, 256, 384
    a_q, a_s, b_q, b_s = _mk(m, n, k, seed=31)
    with fp8mod.exact_mode():
        got = np.asarray(fp8mod.fp8_gemm(a_q, a_s, b_q, b_s,
                                         out_dtype=jnp.float32), np.float32)
    assert not fp8mod.exact_enabled()  # context restored
    ref = reference.fp8_gemm_reference(
        np.asarray(a_q), np.asarray(a_s), np.asarray(b_q), np.asarray(b_s))
    assert verify.relative_l2_error(got, ref) < 1e-6


def test_exact_mode_grouped_masked_matches_kernel():
    from deepgemm_ascend_tpu.ops import grouped_gemm as gg
    e, m_max, k, n = 3, 32, 256, 128
    rng = np.random.default_rng(37)
    a = rng.normal(size=(e, m_max, k)).astype(np.float32)
    b = rng.normal(size=(e, k, n)).astype(np.float32)
    a_q, a_s = quant.quantize_fp8_act(jnp.asarray(a))
    b_q, b_s = quant.quantize_fp8_weight(jnp.asarray(b))
    masked_m = jnp.asarray([32, 7, 0], jnp.int32)
    kern = np.asarray(gg.m_grouped_gemm_masked(
        a_q, a_s, b_q, b_s, masked_m, out_dtype=jnp.float32,
        interpret=True), np.float32)
    with fp8mod.exact_mode():
        exact = np.asarray(gg.m_grouped_gemm_masked(
            a_q, a_s, b_q, b_s, masked_m, out_dtype=jnp.float32), np.float32)
    # Interpret-mode kernel is also f32-exact → tight agreement on VALID
    # rows. Rows in [masked_m, tile edge) are unspecified in the kernel
    # (DeepGEMM semantics); exact mode zeroes them — compare valid only.
    for ei, mm in enumerate([32, 7, 0]):
        if mm:
            assert verify.relative_l2_error(
                exact[ei, :mm], kern[ei, :mm]) < 1e-5
    assert np.all(exact[1, 7:] == 0) and np.all(exact[2] == 0)


# ---- NT layout (DeepGEMM's native convention: B stored (n, k)) ----

@pytest.mark.parametrize("m,n,k", [
    (128, 256, 384),
    (64, 512, 896),
    (100, 128, 256),      # ragged M
])
def test_fp8_gemm_nt_vs_dequant_golden(m, n, k):
    """b_layout='t': B (n, k) e4m3 with (n/128, k/128) scales must match
    the nn-layout kernel on the logically-identical problem, and pass the
    strict gate vs the emulated-dequant golden."""
    a_q, a_s, b_q, b_s = _mk(m, n, k, seed=m + 2 * n)
    # Build the NT operands from the same logical B.
    b_q_t = jnp.asarray(b_q.T)           # (n, k)
    b_s_t = jnp.asarray(b_s.T)           # (n/128, k/128)
    got = np.asarray(fp8mod.fp8_gemm(a_q, a_s, b_q_t, b_s_t, b_layout="t",
                                     out_dtype=jnp.float32), np.float32)
    want = np.asarray(reference.fp8_gemm_reference(a_q, a_s, b_q, b_s),
                      np.float32)
    res = verify.verify(got, want, rtol=2e-2, atol=1e-4, max_ratio=1e-4)
    assert res.ok, res


def test_fp8_gemm_nt_multistep_and_folded():
    """NT with an explicit multi-K-step config (accum one-hot path) and the
    folded path (opt-in) both reproduce their nn twins."""
    m, n, k = 64, 256, 512
    a_q, a_s, b_q, b_s = _mk(m, n, k, seed=77)
    b_q_t = jnp.asarray(b_q.T)
    b_s_t = jnp.asarray(b_s.T)
    cfg = GemmConfig(block_m=64, block_n=128, block_k=256)
    for mode in ("accum", "folded"):
        nn = np.asarray(fp8mod.fp8_gemm(
            a_q, a_s, b_q, b_s, config=cfg, out_dtype=jnp.float32,
            scale_mode=mode, allow_relaxed=True), np.float32)
        nt = np.asarray(fp8mod.fp8_gemm(
            a_q, a_s, b_q_t, b_s_t, config=cfg, out_dtype=jnp.float32,
            scale_mode=mode, allow_relaxed=True, b_layout="t"), np.float32)
        assert verify.relative_l2_error(nt, nn) < 1e-6, mode


def test_fp8_gemm_nt_exact_mode():
    m, n, k = 32, 128, 256
    a_q, a_s, b_q, b_s = _mk(m, n, k, seed=88)
    with fp8mod.exact_mode():
        nt = np.asarray(fp8mod.fp8_gemm(
            a_q, a_s, jnp.asarray(b_q.T),
            jnp.asarray(b_s.T), b_layout="t",
            out_dtype=jnp.float32), np.float32)
    want = np.asarray(reference.fp8_gemm_reference(a_q, a_s, b_q, b_s),
                      np.float32)
    assert verify.relative_l2_error(nt, want) < 1e-5
