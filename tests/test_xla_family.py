"""XLA kernel family (config.py ``KernelType.XLA``) — parity + routing.

The XLA family realizes an op as plain XLA (dot_general / blocked einsum)
with the SAME f32-accumulator scale math as the Pallas kernels, skipping
the per-dispatch Pallas prologue. It exists for the dispatch-floor-bound
small straggler shapes (VERDICT r3 item 4); it is selected per shape by
sweep evidence only (tiling/autotune.py ``xla_candidate_ok``), never
analytically — mirroring how the reference admits a kernel family only
after its benchmark measures it (`framework/benchmark/benchmark.py:24-44`).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from deepgemm_ascend_tpu.config import GemmConfig, KernelType
from deepgemm_ascend_tpu.ops import fp8_gemm as fp8mod
from deepgemm_ascend_tpu.ops import grouped_gemm as gg
from deepgemm_ascend_tpu.ops import int8_gemm as i8mod
from deepgemm_ascend_tpu.ops import quant, reference
from deepgemm_ascend_tpu.ops.gemm import gemm_with_config
from deepgemm_ascend_tpu.tiling import autotune
from deepgemm_ascend_tpu.tiling import cache
from deepgemm_ascend_tpu.utils import golden, verify

XCFG = GemmConfig(kernel_type=KernelType.XLA)


# ---------------------------------------------------------------- dense bf16
@pytest.mark.parametrize("layout", ["nn", "nt", "tn", "tt"])
def test_dense_bf16_xla_matches_pallas(layout):
    m, n, k = 64, 256, 384
    rng = np.random.default_rng(3)
    a_log = rng.standard_normal((m, k)).astype(np.float32)
    b_log = rng.standard_normal((k, n)).astype(np.float32)
    a = jnp.asarray(a_log.T if layout[0] == "t" else a_log, jnp.bfloat16)
    b = jnp.asarray(b_log.T if layout[1] == "t" else b_log, jnp.bfloat16)
    out_x = gemm_with_config(a, b, config=XCFG, layout=layout)
    out_p = gemm_with_config(a, b, config=GemmConfig(64, 128, 128),
                             layout=layout)
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(out_p),
                               rtol=1e-5, atol=1e-5)


# ------------------------------------------------------------------ fp8 dense
@pytest.mark.parametrize("b_layout", ["n", "t"])
def test_fp8_xla_gate_clean_and_matches_accum(b_layout):
    m, n, k = 64, 256, 512
    a = golden.gen_heavy_tail((m, k), seed=11)
    b = golden.gen_heavy_tail((k, n), seed=12)
    a_q, a_s = quant.quantize_fp8_act(jnp.asarray(a))
    b_q, b_s = quant.quantize_fp8_weight(jnp.asarray(b))
    bse = fp8mod.expand_weight_scales(b_s, n)
    b_dev = jnp.asarray(np.asarray(b_q).T) if b_layout == "t" else b_q
    out_x = fp8mod.fp8_gemm_with_config(
        a_q, a_s, b_dev, bse, config=XCFG, b_layout=b_layout)
    # gate-clean vs the dequant golden (the strict acceptance form)
    ref = reference.fp8_gemm_reference(a_q, a_s, b_q, b_s)
    res = verify.verify(np.asarray(out_x, np.float32), ref,
                        rtol=2e-2, atol=1e-2, name=f"fp8 XLA {b_layout}")
    assert res.ok, res
    # same accum semantics as the Pallas kernel (only f32 sum order differs)
    out_p = fp8mod.fp8_gemm_with_config(
        a_q, a_s, b_dev, bse, config=GemmConfig(64, 128, 128),
        b_layout=b_layout)
    assert verify.relative_l2_error(
        np.asarray(out_x, np.float32), np.asarray(out_p, np.float32)) < 1e-3


# ----------------------------------------------------------------- int8 dense
def test_int8_xla_bitwise_equals_pallas():
    m, n, k = 48, 256, 384
    rng = np.random.default_rng(5)
    a = rng.standard_normal((m, k)).astype(np.float32)
    b = rng.standard_normal((k, n)).astype(np.float32)
    a_q, a_s = quant.quantize_int8(jnp.asarray(a), axis=-1)
    b_q, b_s = quant.quantize_int8(jnp.asarray(b), axis=0)
    out_x = i8mod.int8_gemm_with_config(a_q, a_s, b_q, b_s, config=XCFG)
    out_p = i8mod.int8_gemm_with_config(a_q, a_s, b_q, b_s,
                                        config=GemmConfig(64, 128, 128))
    # int32 K-sum is exact in both realizations; epilogue is the same
    # elementwise f32 math → bitwise-identical outputs.
    assert np.array_equal(np.asarray(out_x, np.float32),
                          np.asarray(out_p, np.float32))


# -------------------------------------------------------------- masked grouped
@pytest.mark.parametrize("b_layout", ["n", "t"])
def test_masked_xla_valid_rows_match_invalid_zero(b_layout):
    e, m_max, k, n = 4, 32, 256, 128
    masked = [16, 3, 0, 32]
    a = golden.gen_heavy_tail((e, m_max, k), seed=21)
    b = golden.gen_heavy_tail((e, k, n), seed=22)
    a_q, a_s = quant.quantize_fp8_act(jnp.asarray(a))
    b_q, b_s = quant.quantize_fp8_weight(jnp.asarray(b))
    if b_layout == "t":
        b_dev, bs_dev = jnp.swapaxes(b_q, 1, 2), jnp.swapaxes(b_s, 1, 2)
    else:
        b_dev, bs_dev = b_q, b_s
    out_x = np.asarray(gg.m_grouped_gemm_masked(
        a_q, a_s, b_dev, bs_dev, jnp.asarray(masked), config=XCFG,
        b_layout=b_layout), np.float32)
    out_p = np.asarray(gg.m_grouped_gemm_masked(
        a_q, a_s, b_dev, bs_dev, jnp.asarray(masked),
        config=GemmConfig(block_m=16, block_n=128, block_k=128),
        b_layout=b_layout), np.float32)
    for g, mm in enumerate(masked):
        np.testing.assert_allclose(out_x[g, :mm], out_p[g, :mm],
                                   rtol=2e-2, atol=1e-2)
        # XLA family zeroes per row (within the unspecified-rows contract)
        assert np.all(out_x[g, mm:] == 0.0)


def test_contiguous_xla_rejected():
    e, k, n = 2, 128, 128
    b = golden.gen_heavy_tail((e, k, n), seed=31)
    b_q, b_s = quant.quantize_fp8_weight(jnp.asarray(b))
    a = golden.gen_heavy_tail((32, k), seed=32)
    a_q, a_s = quant.quantize_fp8_act(jnp.asarray(a))
    with pytest.raises(ValueError, match="XLA"):
        gg.m_grouped_gemm_contiguous(
            a_q, a_s, b_q, b_s, jnp.asarray([0, 1], jnp.int32),
            config=GemmConfig(block_m=16, block_n=128, block_k=128,
                              kernel_type=KernelType.XLA))


def test_int8_masked_xla_valid_rows_bitwise_invalid_zero():
    e, m_max, k, n = 4, 32, 256, 128
    masked = jnp.asarray([16, 3, 0, 32])
    rng = np.random.default_rng(7)
    a = rng.standard_normal((e, m_max, k)).astype(np.float32)
    b = rng.standard_normal((e, k, n)).astype(np.float32)
    a_q, a_s = quant.quantize_int8(jnp.asarray(a), axis=-1)
    b_q, b_s = quant.quantize_int8(jnp.asarray(b), axis=1)
    out_x = np.asarray(i8mod.m_grouped_int8_gemm_masked(
        a_q, a_s, b_q, b_s, masked, config=XCFG), np.float32)
    out_p = np.asarray(i8mod.m_grouped_int8_gemm_masked(
        a_q, a_s, b_q, b_s, masked,
        config=GemmConfig(block_m=16, block_n=128, block_k=128)), np.float32)
    for g, mm in enumerate([16, 3, 0, 32]):
        # int32 K-sum exact in both → bitwise on valid rows
        assert np.array_equal(out_x[g, :mm], out_p[g, :mm])
        assert np.all(out_x[g, mm:] == 0.0)


def test_int8_contiguous_xla_rejected():
    rng = np.random.default_rng(8)
    a = rng.standard_normal((32, 128)).astype(np.float32)
    b = rng.standard_normal((2, 128, 128)).astype(np.float32)
    a_q, a_s = quant.quantize_int8(jnp.asarray(a), axis=-1)
    b_q, b_s = quant.quantize_int8(jnp.asarray(b), axis=1)
    with pytest.raises(ValueError, match="XLA"):
        i8mod.m_grouped_int8_gemm_contiguous(
            a_q, a_s, b_q, b_s, jnp.asarray([0, 1], jnp.int32),
            config=GemmConfig(block_m=16, block_n=128, block_k=128,
                              kernel_type=KernelType.XLA))


def test_fp8_xla_rejects_nondefault_numerics():
    m, n, k = 32, 128, 256
    a = golden.gen_heavy_tail((m, k), seed=41)
    b = golden.gen_heavy_tail((k, n), seed=42)
    a_q, a_s = quant.quantize_fp8_act(jnp.asarray(a))
    b_q, b_s = quant.quantize_fp8_weight(jnp.asarray(b))
    bse = fp8mod.expand_weight_scales(b_s, n)
    with pytest.raises(ValueError, match="accum"):
        fp8mod.fp8_gemm_with_config(a_q, a_s, b_q, bse, config=XCFG,
                                    scale_mode="folded", allow_relaxed=True)


# ------------------------------------------------------------ candidate gate
def test_xla_candidate_gate():
    ok = autotune.xla_candidate_ok
    assert ok("gemm", 977, 977, 977)               # bf16 prime straggler
    assert ok("fp8_gemm", 64, 512, 2048)           # 42.4% straggler row
    assert ok("grouped_gemm_masked", 128, 2048, 512, flops_scale=8)
    # plain dense admits XLA at EVERY size since round 5: the fixed timing
    # chain measured XLA's bf16 emitter at 98.1% of peak on 4096^3 —
    # ahead of every Pallas config — so it always competes.
    assert ok("gemm", 4096, 4096, 4096)
    assert ok("int8_gemm", 8192, 8192, 8192)
    assert not ok("grouped_gemm_contiguous", 64, 512, 512, flops_scale=4)
    # the contiguous layout's RUNTIME op keys lack the "contiguous" suffix
    assert not ok("grouped_gemm", 128, 1408, 2048, flops_scale=4)
    assert not ok("grouped_gemm_nt", 128, 1408, 2048, flops_scale=4)
    assert ok("grouped_gemm_masked_nt", 128, 2048, 512, flops_scale=8)
    # int8: masked has an (exact, bufferless) XLA realization; contiguous not
    assert ok("int8_grouped_gemm_masked", 64, 2048, 512, flops_scale=8)
    assert not ok("int8_grouped_gemm", 64, 2048, 512, flops_scale=8)
    # fp8 partial-buffer cap: huge (kb, m, n) f32 refused even if cheap FLOPs
    assert not ok("fp8_gemm", 8192, 8192, 256)


def test_sweep_measures_and_caches_xla_winner(tmp_path):
    calls = []

    def time_fn(cfg):
        calls.append(cfg)
        return 0.05 if cfg.kernel_type == KernelType.XLA else 1.0

    tuner = autotune.Autotuner(
        None, time_fn, op="fp8_gemm",
        results_path=str(tmp_path / "r.jsonl"),
        checkpoint_path=str(tmp_path / "c.json"),
        cache=cache.TilingCache(str(tmp_path / "cache.jsonl")))
    cands = [GemmConfig(128, 128, 128), GemmConfig(64, 128, 256)]
    win = tuner.sweep_shape(64, 512, 2048, cands, in_dtype=jnp.float8_e4m3fn,
                            out_dtype=jnp.bfloat16)
    assert any(c.kernel_type == KernelType.XLA for c in calls)
    assert win is not None and win.kernel_type == KernelType.XLA
    key = cache.cache_key("fp8_gemm", 64, 512, 2048, "float8_e4m3fn",
                          "bfloat16", "g128")
    cached = tuner._cache.get(key)
    assert cached is not None and cached.kernel_type == KernelType.XLA


def test_sweep_skips_xla_for_large_blockscaled_shape(tmp_path):
    """The flops/partial ceilings still gate the BLOCK-SCALED family
    (fp8): its XLA realization materializes a (kb, m, n) f32 partial, so
    large shapes never get the candidate. (Plain dense admits XLA at
    every size since round 5 — covered by test_xla_candidate_gate.)"""
    calls = []

    def time_fn(cfg):
        calls.append(cfg)
        return 1.0

    tuner = autotune.Autotuner(
        None, time_fn, op="fp8_gemm",
        results_path=str(tmp_path / "r.jsonl"),
        checkpoint_path=str(tmp_path / "c.json"),
        cache=cache.TilingCache(str(tmp_path / "cache.jsonl")))
    tuner.sweep_shape(4096, 4096, 4096, [GemmConfig(256, 256, 512)],
                      in_dtype=jnp.float8_e4m3fn, out_dtype=jnp.bfloat16)
    assert all(c.kernel_type != KernelType.XLA for c in calls)


def test_xla_config_dict_roundtrip():
    d = XCFG.to_dict()
    assert d["kernel_type"] == 3
    back = GemmConfig.from_dict(d)
    assert back == XCFG and back.kernel_type == KernelType.XLA


# ------------------------------------------------- timing-chain integrity
def test_timing_chain_keeps_full_gemm_flops():
    """The timing harness must not let XLA shrink a transparent GEMM.

    ``time_gemm_like`` taps ``out[:1, :1]`` to chain iterations; without
    the optimization_barrier in ``build_chain`` the algebraic simplifier
    rewrites slice(dot(a, b)) → dot(a[:1, :], b[:, :1]) and the harness
    times a 1-element GEMM (observed on-chip: a bf16 prime-shape XLA dot
    reporting 5795% of light speed). Compile the REAL chain — with the
    REAL ``timing._gemm_tap_perturb`` tap, not an inline copy — on the
    pinned CPU backend and assert the compiled cost still carries the
    full m·n·k work per iteration.
    """
    import jax

    from deepgemm_ascend_tpu.bench import timing

    m = n = k = 128
    iters = 4
    a = jnp.zeros((m, k), jnp.bfloat16)
    b = jnp.zeros((k, n), jnp.bfloat16)

    def xla_dot(x, y):
        return jnp.dot(x, y, preferred_element_type=jnp.float32)

    run = timing.build_chain(
        lambda x, y: xla_dot(x, y), timing._gemm_tap_perturb, iters)
    # Pin the backend: cost_analysis() availability/shape varies per
    # backend, and the flop accounting asserted below was measured on CPU.
    compiled = jax.jit(run, backend="cpu").lower(a, b).compile()
    analyses = compiled.cost_analysis()
    analysis = analyses[0] if isinstance(analyses, (list, tuple)) else analyses
    if analysis is None or "flops" not in analysis:
        import pytest
        pytest.skip("cost_analysis() has no 'flops' on this backend")
    flops = float(analysis.get("flops", 0.0))
    # cost_analysis counts the while-loop BODY once (not ×trip-count):
    # one full GEMM is 2·m·n·k = 4.19e6 flops; the sliced/eliminated bug
    # compiles to ~4.9e4 (measured both ways on this rig).
    assert flops >= 0.9 * 2 * m * n * k, (
        f"timing chain compiled to {flops:.3e} flops per scan body — the "
        f"GEMM was sliced/eliminated (expected ≥ {2 * m * n * k:.3e})")
