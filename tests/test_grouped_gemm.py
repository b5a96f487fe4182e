"""Grouped FP8 GEMM (contiguous + masked) vs per-group dequant golden."""

import jax.numpy as jnp
import numpy as np
import pytest

from deepgemm_ascend_tpu.config import GemmConfig
from deepgemm_ascend_tpu.ops import grouped_gemm as gg
from deepgemm_ascend_tpu.ops import quant, reference
from deepgemm_ascend_tpu.utils import golden, verify


def _mk_experts(e, k, n, seed=0):
    b = golden.gen_heavy_tail((e, k, n), seed=seed)
    b_q, b_s = quant.quantize_fp8_weight(jnp.asarray(b))
    return b_q, b_s


def _mk_acts(m, k, seed=0):
    a = golden.gen_heavy_tail((m, k), seed=seed)
    return quant.quantize_fp8_act(jnp.asarray(a))


def test_contiguous_layout_planner():
    m_total, tile_ids, row_map = gg.make_contiguous_layout([5, 0, 9], 8)
    assert m_total == 24  # 8 + 0 + 16
    np.testing.assert_array_equal(tile_ids, [0, 2, 2])
    assert (row_map >= -1).all()
    assert (row_map[:5] == np.arange(5)).all()
    assert (row_map[5:8] == -1).all()


@pytest.mark.parametrize("tokens", [[32, 64, 0, 16], [1, 7, 33, 2]])
def test_grouped_contiguous_vs_golden(tokens):
    e, k, n, bm = 4, 256, 256, 16
    b_q, b_s = _mk_experts(e, k, n, seed=1)
    m_total, tile_ids, row_map = gg.make_contiguous_layout(tokens, bm)
    a_q_src, a_s_src = _mk_acts(sum(tokens), k, seed=2)
    # scatter rows into the padded layout (padding rows zero)
    a_q = np.zeros((m_total, k), np.float32)
    a_s = np.ones((m_total, k // 128), np.float32)
    valid = row_map >= 0
    a_q[valid] = np.asarray(a_q_src, np.float32)[row_map[valid]]
    a_s[valid] = np.asarray(a_s_src)[row_map[valid]]
    a_q = jnp.asarray(a_q, jnp.float8_e4m3fn)
    a_s = jnp.asarray(a_s)

    out = gg.m_grouped_gemm_contiguous(
        a_q, a_s, b_q, b_s, tile_ids,
        config=GemmConfig(block_m=bm, block_n=128, block_k=128))

    # golden: per padded group span
    padded_sizes = []
    for t in tokens:
        padded_sizes.append(-(-t // bm) * bm if t else 0)
    groups_present = [g for g, s in enumerate(padded_sizes) if s]
    ref = reference.grouped_gemm_reference(
        np.asarray(a_q, np.float32).astype(np.float64),
        np.asarray(a_s), np.asarray(b_q, np.float32)[groups_present],
        np.asarray(b_s)[groups_present],
        [padded_sizes[g] for g in groups_present])
    res = verify.verify(np.asarray(out, np.float32), ref,
                        rtol=2e-2, atol=1e-2)
    assert res.ok, res


def test_grouped_contiguous_padding_tiles_zeroed():
    e, k, n, bm = 2, 128, 128, 16
    b_q, b_s = _mk_experts(e, k, n, seed=3)
    # expert0: 16 rows, then one all-padding tile (id -1)
    a_q, a_s = _mk_acts(32, k, seed=4)
    tile_ids = jnp.asarray([0, -1], jnp.int32)
    out = gg.m_grouped_gemm_contiguous(
        a_q, a_s, b_q, b_s, tile_ids,
        config=GemmConfig(block_m=bm, block_n=128, block_k=128))
    out = np.asarray(out, np.float32)
    assert np.all(out[16:] == 0.0)
    assert np.any(out[:16] != 0.0)


@pytest.mark.parametrize("masked", [[16, 3, 0, 32], [1, 1, 1, 1]])
def test_grouped_masked_vs_golden(masked):
    e, m_max, k, n = 4, 32, 256, 128
    b_q, b_s = _mk_experts(e, k, n, seed=5)
    a = golden.gen_heavy_tail((e, m_max, k), seed=6)
    a_q, a_s = quant.quantize_fp8_act(jnp.asarray(a))
    out = gg.m_grouped_gemm_masked(
        a_q, a_s, b_q, b_s, jnp.asarray(masked),
        config=GemmConfig(block_m=16, block_n=128, block_k=128))
    out = np.asarray(out, np.float32)
    for g in range(e):
        ref_g = reference.fp8_gemm_reference(
            np.asarray(a_q[g], np.float32), np.asarray(a_s[g]),
            np.asarray(b_q[g], np.float32), np.asarray(b_s[g]))
        mm = masked[g]
        # valid rows match the golden
        res = verify.verify(out[g, :mm], ref_g[:mm], rtol=2e-2, atol=1e-2)
        assert res.ok, (g, res)
    # fully-masked tiles must be zeroed (tile granularity = block_m=16)
    for g in range(e):
        first_dead_tile = -(-masked[g] // 16) * 16
        assert np.all(out[g, first_dead_tile:] == 0.0), g


def test_grouped_masked_fixed_shape_recompile_free():
    # Same shapes, different masked_m → must reuse the same compiled fn.
    e, m_max, k, n = 2, 16, 128, 128
    b_q, b_s = _mk_experts(e, k, n, seed=7)
    a = golden.gen_heavy_tail((e, m_max, k), seed=8)
    a_q, a_s = quant.quantize_fp8_act(jnp.asarray(a))
    cfg = GemmConfig(block_m=16, block_n=128, block_k=128)
    o1 = gg.m_grouped_gemm_masked(a_q, a_s, b_q, b_s, jnp.asarray([16, 16]), config=cfg)
    o2 = gg.m_grouped_gemm_masked(a_q, a_s, b_q, b_s, jnp.asarray([4, 0]), config=cfg)
    assert o1.shape == o2.shape
    assert np.all(np.asarray(o2, np.float32)[1] == 0.0)


def test_grouped_contiguous_nt_matches_n_layout():
    # quantize_fp8_weight of the transposed weights yields exactly the
    # transposed q-values and block-scale tables (max-abs is
    # transpose-invariant), so NT output must match the N-layout output.
    e, k, n, bm = 2, 384, 256, 16
    b_q, b_s = _mk_experts(e, k, n, seed=11)
    m_total, tile_ids, _ = gg.make_contiguous_layout([16, 32], bm)
    a_q, a_s = _mk_acts(m_total, k, seed=12)
    cfg = GemmConfig(block_m=bm, block_n=128, block_k=128)
    out_n = gg.m_grouped_gemm_contiguous(a_q, a_s, b_q, b_s, tile_ids,
                                         config=cfg)
    out_t = gg.m_grouped_gemm_contiguous(
        a_q, a_s, jnp.swapaxes(b_q, 1, 2), jnp.swapaxes(b_s, 1, 2), tile_ids,
        config=cfg, b_layout="t")
    np.testing.assert_allclose(np.asarray(out_t, np.float32),
                               np.asarray(out_n, np.float32),
                               rtol=1e-5, atol=1e-5)


def test_grouped_masked_nt_matches_n_layout():
    e, m_max, k, n = 2, 32, 384, 128
    b_q, b_s = _mk_experts(e, k, n, seed=13)
    a = golden.gen_heavy_tail((e, m_max, k), seed=14)
    a_q, a_s = quant.quantize_fp8_act(jnp.asarray(a))
    masked = jnp.asarray([20, 7])
    cfg = GemmConfig(block_m=16, block_n=128, block_k=128)
    out_n = gg.m_grouped_gemm_masked(a_q, a_s, b_q, b_s, masked, config=cfg)
    out_t = gg.m_grouped_gemm_masked(
        a_q, a_s, jnp.swapaxes(b_q, 1, 2), jnp.swapaxes(b_s, 1, 2), masked,
        config=cfg, b_layout="t")
    np.testing.assert_allclose(np.asarray(out_t, np.float32),
                               np.asarray(out_n, np.float32),
                               rtol=1e-5, atol=1e-5)


def test_grouped_nt_rejects_expanded_scales():
    e, k, n = 2, 128, 128
    b_q, b_s = _mk_experts(e, k, n, seed=15)
    a_q, a_s = _mk_acts(16, k, seed=16)
    with pytest.raises(ValueError, match="unexpanded"):
        gg.m_grouped_gemm_contiguous(
            a_q, a_s, jnp.swapaxes(b_q, 1, 2), jnp.swapaxes(b_s, 1, 2),
            jnp.asarray([0], jnp.int32), b_layout="t", b_scales_expanded=True)


@pytest.mark.parametrize("ec", [2, 4])
def test_grouped_masked_expert_coalesce_matches_ec1(ec):
    """expert_coalesce > 1 (per-expert grid fusion, VERDICT r3 item 4) is
    a pure scheduling knob: outputs must be BITWISE equal to the ec=1
    kernel, including zeroed inactive tiles, in both weight layouts."""
    e, m_max, k, n = 4, 32, 256, 128
    masked = jnp.asarray([16, 3, 0, 32])
    b_q, b_s = _mk_experts(e, k, n, seed=11)
    a = golden.gen_heavy_tail((e, m_max, k), seed=12)
    a_q, a_s = quant.quantize_fp8_act(jnp.asarray(a))
    base = GemmConfig(block_m=16, block_n=128, block_k=128)
    ref = gg.m_grouped_gemm_masked(a_q, a_s, b_q, b_s, masked, config=base)
    out = gg.m_grouped_gemm_masked(
        a_q, a_s, b_q, b_s, masked,
        config=base.replace(expert_coalesce=ec))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # NT layout too
    ref_t = gg.m_grouped_gemm_masked(
        a_q, a_s, jnp.swapaxes(b_q, 1, 2), jnp.swapaxes(b_s, 1, 2), masked,
        config=base, b_layout="t")
    out_t = gg.m_grouped_gemm_masked(
        a_q, a_s, jnp.swapaxes(b_q, 1, 2), jnp.swapaxes(b_s, 1, 2), masked,
        config=base.replace(expert_coalesce=ec), b_layout="t")
    np.testing.assert_array_equal(np.asarray(out_t), np.asarray(ref_t))
    # E % ec != 0 falls back to ec=1 silently (correctness never gated on
    # the knob)
    out3 = gg.m_grouped_gemm_masked(
        a_q, a_s, b_q, b_s, masked, config=base.replace(expert_coalesce=3))
    np.testing.assert_array_equal(np.asarray(out3), np.asarray(ref))
