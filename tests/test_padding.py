"""Padding cost model + pad/unpad helper tests.

Mirrors the reference's padding-model tier
(``test/get_best_config/test_padding_calculator.py`` — 21 cases over the
bandwidth model, t00..t11 tag argmin, and force rules) re-targeted at the
TPU decision surface (tiling/padding.py): K-tail mask-vs-pad costing, the
FP8 contract lift, and end-to-end numerical equivalence of the padded paths.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from deepgemm_ascend_tpu.config import GemmConfig
from deepgemm_ascend_tpu.ops import fp8_gemm as fp8mod
from deepgemm_ascend_tpu.ops import quant, reference
from deepgemm_ascend_tpu.ops.gemm import gemm_with_config
from deepgemm_ascend_tpu.tiling import analytic, padding, platform
from deepgemm_ascend_tpu.utils import verify


TPU_INFO = platform.PlatformInfo(
    device_kind="tpu v5e", hbm_gbps=819.0, vpu_tops=1.8)


# ---- cost model (≙ test_padding_calculator.py bandwidth/tag cases) ----

def test_mask_cost_zero_when_aligned():
    assert padding.estimate_mask_cost(4096, 4096, 4096, 512, 512, 512,
                                      TPU_INFO) == 0.0
    assert padding.estimate_pad_cost(4096, 4096, 4096, 512, 2, 2,
                                     TPU_INFO) == 0.0


def test_mask_cost_positive_when_ragged():
    c = padding.estimate_mask_cost(4096, 4096, 5000, 512, 512, 512, TPU_INFO)
    assert c > 0.0


def test_pad_cost_scales_with_operand_bytes():
    small = padding.estimate_pad_cost(128, 128, 5000, 512, 2, 2, TPU_INFO)
    big = padding.estimate_pad_cost(8192, 8192, 5000, 512, 2, 2, TPU_INFO)
    assert big > small > 0.0


def test_tag_none_when_aligned():
    cost = padding.get_padding_tag(4096, 4096, 4096, 512, 512, 512,
                                   info=TPU_INFO)
    assert cost.tag == padding.PaddingTag.NONE
    assert cost.mask_s == cost.pad_s == 0.0


def test_tag_pad_k_when_masking_dominates():
    # Large grid, ragged K: per-step masking across thousands of grid steps
    # dwarfs one pad copy.
    cost = padding.get_padding_tag(8192, 8192, 6000, 256, 256, 512,
                                   info=TPU_INFO)
    assert cost.mask_s > cost.pad_s
    assert cost.tag == padding.PaddingTag.PAD_K


def test_amortization_biases_towards_padding():
    m, n, k = 64, 512, 1000
    once = padding.get_padding_tag(m, n, k, 64, 512, 512, info=TPU_INFO,
                                   calls_amortized=1)
    many = padding.get_padding_tag(m, n, k, 64, 512, 512, info=TPU_INFO,
                                   calls_amortized=10_000)
    # With heavy reuse the one-time pad must win whenever masking costs > 0.
    assert many.tag == padding.PaddingTag.PAD_K
    assert once.mask_s == many.mask_s  # model is per-call


def test_analytic_config_carries_pad_decision():
    analytic.get_best_config.cache_clear()
    cfg = analytic.get_best_config(4096, 4096, 4096)
    assert cfg.pad_k is False  # aligned shape: never pad


# ---- pad helpers ----

def test_pad_k_operands_roundtrip():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(16, 300)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(300, 128)), jnp.float32)
    a_p, b_p = padding.pad_k_operands(a, b, 128)
    assert a_p.shape == (16, 384) and b_p.shape == (384, 128)
    np.testing.assert_allclose(np.asarray(a_p @ b_p), np.asarray(a @ b),
                               rtol=1e-5, atol=1e-5)


def test_pad_k_operands_noop_when_aligned():
    a = jnp.zeros((8, 256)); b = jnp.zeros((256, 128))
    a_p, b_p = padding.pad_k_operands(a, b, 128)
    assert a_p is a and b_p is b


def test_gemm_pad_k_matches_masked(rng):
    m, n, k = 64, 256, 300  # ragged K
    a = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(k, n)), jnp.bfloat16)
    masked = gemm_with_config(
        a, b, config=GemmConfig(64, 256, 128), interpret=True)
    padded = gemm_with_config(
        a, b, config=GemmConfig(64, 256, 128, pad_k=True), interpret=True)
    np.testing.assert_allclose(np.asarray(padded), np.asarray(masked),
                               rtol=1e-5, atol=1e-5)


# ---- FP8 contract lift ----

def test_pad_fp8_operands_shapes():
    rng = np.random.default_rng(1)
    m, k, n = 32, 200, 200
    a_q = jnp.asarray(rng.normal(size=(m, k)), jnp.float8_e4m3fn)
    b_q = jnp.asarray(rng.normal(size=(k, n)), jnp.float8_e4m3fn)
    a_s = jnp.ones((m, 2), jnp.float32)
    b_s = jnp.ones((2, 2), jnp.float32)
    aq, asc, bq, bs, n_orig = padding.pad_fp8_operands(a_q, a_s, b_q, b_s)
    assert aq.shape == (m, 256) and bq.shape == (256, 256)
    assert asc.shape == (m, 2) and bs.shape == (2, 2)
    assert n_orig == n


def test_fp8_gemm_auto_pad_matches_reference(rng):
    m, k, n = 32, 200, 250  # both ragged
    x = rng.normal(size=(m, k)).astype(np.float32)
    w = rng.normal(size=(k, n)).astype(np.float32)
    a_q, a_s = quant.quantize_fp8_act(jnp.asarray(x))
    b_q, b_s = quant.quantize_fp8_weight(jnp.asarray(w))
    out = fp8mod.fp8_gemm(a_q, a_s, b_q, b_s, auto_pad=True,
                          config=GemmConfig(32, 128, 128), interpret=True)
    assert out.shape == (m, n)
    # Golden: emulated dequant on the padded tensors (the pad is
    # scale-preserving, so this equals the ragged-problem semantics).
    aq_p, as_p, bq_p, bs_p, _ = padding.pad_fp8_operands(a_q, a_s, b_q, b_s)
    ref = reference.fp8_gemm_reference(
        np.asarray(aq_p), np.asarray(as_p), np.asarray(bq_p),
        np.asarray(bs_p))[:, :n]
    res = verify.verify(np.asarray(out, np.float32), ref,
                        rtol=1e-2, atol=1e-2, max_ratio=1e-4)
    assert res.ok, res


def test_fp8_gemm_ragged_without_auto_pad_raises(rng):
    a_q = jnp.zeros((8, 200), jnp.float8_e4m3fn)
    b_q = jnp.zeros((200, 128), jnp.float8_e4m3fn)
    a_s = jnp.ones((8, 2), jnp.float32)
    b_s = jnp.ones((2, 1), jnp.float32)
    with pytest.raises(ValueError):
        fp8mod.fp8_gemm(a_q, a_s, b_q, b_s, interpret=True)


def test_fp8_gemm_nt_auto_pad_matches_reference(rng):
    """NT-layout auto_pad (round 4): DeepGEMM's native (n, k) K-major
    weights padded IN their layout — no HBM transpose — must match the
    scale-preserving padded golden."""
    m, k, n = 32, 200, 250  # both ragged
    x = rng.normal(size=(m, k)).astype(np.float32)
    wt = rng.normal(size=(n, k)).astype(np.float32)   # (n, k) storage
    a_q, a_s = quant.quantize_fp8_act(jnp.asarray(x))
    bt_q, bt_s = quant.quantize_fp8_weight(jnp.asarray(wt))
    out = fp8mod.fp8_gemm(a_q, a_s, bt_q, bt_s, auto_pad=True,
                          b_layout="t", config=GemmConfig(32, 128, 128),
                          interpret=True)
    assert out.shape == (m, n)
    aq_p, as_p, bq_p, bs_p, _ = padding.pad_fp8_operands_nt(
        a_q, a_s, bt_q, bt_s)
    ref = reference.fp8_gemm_reference(
        np.asarray(aq_p), np.asarray(as_p),
        np.asarray(bq_p).T, np.asarray(bs_p).T)[:, :n]
    res = verify.verify(np.asarray(out, np.float32), ref,
                        rtol=1e-2, atol=1e-2, max_ratio=1e-4)
    assert res.ok, res
