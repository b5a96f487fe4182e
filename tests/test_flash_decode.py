"""Flash-decode kernel tests: equivalence with the XLA attention fallback.

The XLA dequantize-in-contraction path (models/attention.py else-branch) is
the spec; the Pallas streaming kernel must match it on the same int8 cache
to f32 tolerance (both do exact int8→float conversion; only the bf16 dots
and probs rounding differ).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepgemm_ascend_tpu.models import TINY, decode_step, init_cache, init_params
from deepgemm_ascend_tpu.models.attention import KVCache
from deepgemm_ascend_tpu.ops import quant
from deepgemm_ascend_tpu.ops.flash_decode import flash_decode_gqa
from deepgemm_ascend_tpu.utils import verify


def _mk_cache(rng, b, kvh, s_max, hd):
    k = rng.normal(size=(b, kvh, s_max, hd)).astype(np.float32)
    v = rng.normal(size=(b, kvh, s_max, hd)).astype(np.float32)
    k_q, k_s = quant.quantize_int8(jnp.asarray(k), axis=-1)
    v_q, v_s = quant.quantize_int8(jnp.asarray(v), axis=-1)
    return (k_q, k_s[..., 0], v_q, v_s[..., 0])


def _reference(q, k_q, k_s, v_q, v_s, seq_lens):
    """Dense f64 attention over the dequantized cache (masked rows)."""
    b, h, hd = q.shape
    kvh = k_q.shape[1]
    g = h // kvh
    kf = np.asarray(k_q, np.float64) * np.asarray(k_s)[..., None]
    vf = np.asarray(v_q, np.float64) * np.asarray(v_s)[..., None]
    out = np.zeros((b, h, hd))
    for bi in range(b):
        ln = int(seq_lens[bi])
        for hi in range(h):
            if ln == 0:
                continue
            kv = hi // g
            s = (np.asarray(q[bi, hi], np.float64)
                 @ kf[bi, kv, :ln].T) / np.sqrt(hd)
            p = np.exp(s - s.max())
            p /= p.sum()
            out[bi, hi] = p @ vf[bi, kv, :ln]
    return out


@pytest.mark.parametrize("b,heads,kvh,s_max,hd,lens", [
    (2, 4, 2, 64, 64, [64, 17]),          # full + ragged
    (3, 8, 2, 128, 128, [1, 0, 100]),     # single-token, empty, partial
    (1, 4, 4, 32, 64, [32]),              # MHA (group = 1)
])
def test_flash_matches_reference(b, heads, kvh, s_max, hd, lens):
    rng = np.random.default_rng(0)
    k_q, k_s, v_q, v_s = _mk_cache(rng, b, kvh, s_max, hd)
    q = jnp.asarray(rng.normal(size=(b, heads, hd)), jnp.float32)
    seq_lens = jnp.asarray(lens, jnp.int32)
    got = np.asarray(flash_decode_gqa(q, k_q, k_s, v_q, v_s, seq_lens,
                                      block_s=128, interpret=True))
    want = _reference(q, k_q, k_s, v_q, v_s, lens)
    res = verify.verify(got.astype(np.float32), want.astype(np.float32),
                        rtol=2e-2, atol=2e-2, max_ratio=1e-3)
    assert res.ok, res
    assert np.all(got[np.asarray(lens) == 0] == 0)  # empty slots → zeros


def test_flash_multiblock_online_softmax():
    # Several S blocks exercise the running-max renormalization.
    rng = np.random.default_rng(1)
    b, heads, kvh, s_max, hd = 2, 4, 2, 512, 64
    k_q, k_s, v_q, v_s = _mk_cache(rng, b, kvh, s_max, hd)
    q = jnp.asarray(rng.normal(size=(b, heads, hd)) * 4.0, jnp.float32)
    lens = [512, 300]
    got = np.asarray(flash_decode_gqa(q, k_q, k_s, v_q, v_s,
                                      jnp.asarray(lens, jnp.int32),
                                      block_s=128, interpret=True))
    want = _reference(q, k_q, k_s, v_q, v_s, lens)
    res = verify.verify(got.astype(np.float32), want.astype(np.float32),
                        rtol=2e-2, atol=2e-2, max_ratio=1e-3)
    assert res.ok, res


def test_decode_step_flash_vs_xla_fallback():
    """The full model must produce (near-)identical logits with the flash
    kernel and with the XLA attention path."""
    cfg_flash = TINY
    cfg_xla = dataclasses.replace(TINY, use_flash_decode=False)
    assert cfg_flash.use_flash_decode
    params = init_params(jax.random.PRNGKey(0), cfg_flash)
    toks = jnp.asarray([3, 5], jnp.int32)

    def run(cfg):
        caches = init_cache(cfg, 2, max_seq=32)
        lens = jnp.zeros((2,), jnp.int32)
        logits = None
        for t in range(4):
            logits, caches = decode_step(params, toks + t, caches, lens, cfg)
            lens = lens + 1
        return np.asarray(logits, np.float32)

    lf = run(cfg_flash)
    lx = run(cfg_xla)
    # The kernel's bf16 dots differ from the XLA path's f32 einsums by
    # ~2^-8 per op; through the MoE the perturbation can flip top-k expert
    # routing (discrete), so model-level logits tolerate more than the
    # op-level 2e-2 (op-level equivalence vs f64 is the strong guarantee,
    # tests above).
    assert np.all(np.isfinite(lf))
    assert verify.relative_l2_error(lf, lx) < 0.15


def test_flash_inplace_matches_write_then_attend():
    """Direct unit test of the fused cache-writing kernel: its aliased
    writeback (int8 value tiles AND f32 scale slabs) must equal
    KVCache.write_quantized + flash_decode_gqa on the same inputs — the
    cache arrays EXACTLY, the attention output to kernel tolerance."""
    from deepgemm_ascend_tpu.ops.flash_decode import flash_decode_gqa_inplace
    rng = np.random.default_rng(7)
    b, heads, kvh, s_max, hd = 3, 4, 2, 256, 64
    k_q, k_s, v_q, v_s = _mk_cache(rng, b, kvh, s_max, hd)
    q = jnp.asarray(rng.normal(size=(b, heads, hd)), jnp.float32)
    # lens INCLUDE the new token: mid-block, block-boundary, first-token.
    lens = jnp.asarray([100, 128, 1], jnp.int32)
    k_new = rng.normal(size=(b, kvh, hd)).astype(np.float32)
    v_new = rng.normal(size=(b, kvh, hd)).astype(np.float32)
    kq_new, ks_new = quant.quantize_int8(jnp.asarray(k_new)[:, None], axis=-1)
    vq_new, vs_new = quant.quantize_int8(jnp.asarray(v_new)[:, None], axis=-1)

    out, kq2, vq2, ks2, vs2 = flash_decode_gqa_inplace(
        q, k_q, k_s, v_q, v_s,
        kq_new[:, 0], vq_new[:, 0], ks_new[:, 0, :, 0], vs_new[:, 0, :, 0],
        lens, block_s=128, interpret=True)

    # Reference: scatter via the KVCache path, then attend the full cache.
    cache = KVCache(k_q=k_q, k_s=k_s, v_q=v_q, v_s=v_s)
    positions = (lens - 1)[:, None]
    # write_quantized expects (b, s, kvh, …) layout.
    ref = cache.write_quantized(
        jnp.transpose(kq_new, (0, 1, 2, 3)).reshape(b, 1, kvh, hd),
        ks_new.reshape(b, 1, kvh, 1), vq_new.reshape(b, 1, kvh, hd),
        vs_new.reshape(b, 1, kvh, 1), positions)
    np.testing.assert_array_equal(np.asarray(kq2), np.asarray(ref.k_q))
    np.testing.assert_array_equal(np.asarray(vq2), np.asarray(ref.v_q))
    np.testing.assert_array_equal(np.asarray(ks2), np.asarray(ref.k_s))
    np.testing.assert_array_equal(np.asarray(vs2), np.asarray(ref.v_s))

    want = np.asarray(flash_decode_gqa(q, ref.k_q, ref.k_s, ref.v_q,
                                       ref.v_s, lens, block_s=128,
                                       interpret=True))
    res = verify.verify(np.asarray(out, np.float32), want.astype(np.float32),
                        rtol=2e-2, atol=2e-2, max_ratio=1e-3)
    assert res.ok, res


def test_flash_inplace_full_slot_overflow_clamped():
    """A slot whose length already equals S (the engine decodes freed/full
    slots too, passing lens+1 = S+1) must not corrupt OTHER slots' cache
    rows — the wrapper clamps seq_lens to the cache extent."""
    from deepgemm_ascend_tpu.ops.flash_decode import flash_decode_gqa_inplace
    rng = np.random.default_rng(8)
    b, heads, kvh, s_max, hd = 2, 4, 2, 128, 64
    k_q, k_s, v_q, v_s = _mk_cache(rng, b, kvh, s_max, hd)
    q = jnp.asarray(rng.normal(size=(b, heads, hd)), jnp.float32)
    lens = jnp.asarray([s_max + 1, 50], jnp.int32)   # slot 0 overflows
    zq = jnp.zeros((b, kvh, hd), jnp.int8)
    zs = jnp.zeros((b, kvh), jnp.float32)
    out, kq2, vq2, ks2, vs2 = flash_decode_gqa_inplace(
        q, k_q, k_s, v_q, v_s, zq, zq, zs, zs, lens,
        block_s=128, interpret=True)
    assert np.all(np.isfinite(np.asarray(out)))
    # Slot 1's write landed at its own pos (49) — rows elsewhere untouched.
    np.testing.assert_array_equal(np.asarray(kq2[1, :, :49]),
                                  np.asarray(k_q[1, :, :49]))
    np.testing.assert_array_equal(np.asarray(kq2[1, :, 49]),
                                  np.zeros((kvh, hd), np.int8))
    np.testing.assert_array_equal(np.asarray(kq2[1, :, 50:]),
                                  np.asarray(k_q[1, :, 50:]))
    # Slot 0 (clamped to pos = S-1): only its last row may change.
    np.testing.assert_array_equal(np.asarray(kq2[0, :, :s_max - 1]),
                                  np.asarray(k_q[0, :, :s_max - 1]))


def test_flash_rejects_bad_heads():
    q = jnp.zeros((1, 5, 64))
    k = jnp.zeros((1, 2, 32, 64), jnp.int8)
    s = jnp.zeros((1, 2, 32))
    with pytest.raises(ValueError):
        flash_decode_gqa(q, k, s, k, s, jnp.zeros((1,), jnp.int32))


# ---- flash prefill (ops/flash_prefill.py) ----

def _prefill_reference(q, k_q, k_s, v_q, v_s, start, seq_lens):
    b, s, h, hd = q.shape
    kvh = k_q.shape[1]
    g = h // kvh
    kf = np.asarray(k_q, np.float64) * np.asarray(k_s)[..., None]
    vf = np.asarray(v_q, np.float64) * np.asarray(v_s)[..., None]
    out = np.zeros((b, s, h, hd))
    for bi in range(b):
        for qi in range(s):
            pos = start[bi] + qi
            ln = min(pos + 1, int(seq_lens[bi]))
            if ln <= 0:
                continue
            for hi in range(h):
                kv = hi // g
                sc = (np.asarray(q[bi, qi, hi], np.float64)
                      @ kf[bi, kv, :ln].T) / np.sqrt(hd)
                p = np.exp(sc - sc.max())
                p /= p.sum()
                out[bi, qi, hi] = p @ vf[bi, kv, :ln]
    return out


@pytest.mark.parametrize("b,heads,kvh,s,s_max,hd,starts,lens", [
    (2, 4, 2, 16, 64, 64, [0, 8], [16, 24]),     # fresh + continued prompt
    (1, 8, 2, 32, 128, 128, [0], [32]),
    (1, 4, 4, 16, 64, 64, [3], [19]),             # offset continuation
])
def test_flash_prefill_matches_reference(b, heads, kvh, s, s_max, hd,
                                         starts, lens):
    from deepgemm_ascend_tpu.ops.flash_prefill import flash_prefill_gqa
    rng = np.random.default_rng(0)
    k_q, k_s, v_q, v_s = _mk_cache(rng, b, kvh, s_max, hd)
    q = jnp.asarray(rng.normal(size=(b, s, heads, hd)), jnp.float32)
    got = np.asarray(flash_prefill_gqa(
        q, k_q, k_s, v_q, v_s, jnp.asarray(starts, jnp.int32),
        jnp.asarray(lens, jnp.int32), block_q=16, block_s=128,
        interpret=True))
    want = _prefill_reference(q, k_q, k_s, v_q, v_s, starts, lens)
    res = verify.verify(got.astype(np.float32), want.astype(np.float32),
                        rtol=2e-2, atol=2e-2, max_ratio=1e-3)
    assert res.ok, res


def test_flash_prefill_ragged_s_raises():
    from deepgemm_ascend_tpu.ops.flash_prefill import flash_prefill_gqa
    q = jnp.zeros((1, 5, 4, 64))
    k = jnp.zeros((1, 2, 64, 64), jnp.int8)
    sc = jnp.zeros((1, 2, 64))
    with pytest.raises(ValueError):
        flash_prefill_gqa(q, k, sc, k, sc, jnp.zeros((1,), jnp.int32),
                          jnp.asarray([5], jnp.int32), interpret=True)


def test_model_prefill_flash_vs_xla():
    """forward() with prefill_start (flash prefill) must match the XLA
    prefill path at the first layer's tolerance scale."""
    from deepgemm_ascend_tpu.models import forward, init_params
    cfg = TINY
    params = init_params(jax.random.PRNGKey(0), cfg)
    b, s = 2, 16
    toks = jax.random.randint(jax.random.PRNGKey(1), (b, s), 0,
                              cfg.vocab_size)
    pos = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
    lens = jnp.full((b,), s, jnp.int32)
    lf, _ = forward(params, toks, init_cache(cfg, b, 32), pos, lens, cfg,
                    prefill_start=jnp.zeros((b,), jnp.int32))
    lx, _ = forward(params, toks, init_cache(cfg, b, 32), pos, lens, cfg)
    # bf16 kernel dots vs f32 einsums, MoE routing amplification — same
    # tolerance rationale as the decode twin above.
    assert np.all(np.isfinite(np.asarray(lf)))
    assert verify.relative_l2_error(np.asarray(lf), np.asarray(lx)) < 0.15


def test_flash_state_merge_equals_full_attention():
    """state variant over [0, len-1) + analytic merge of the final token
    must equal flash over [0, len) — the decode path's split-update
    identity (models/attention.py)."""
    from deepgemm_ascend_tpu.ops.flash_decode import flash_decode_gqa_state
    rng = np.random.default_rng(5)
    b, heads, kvh, s_max, hd = 2, 4, 2, 128, 64
    k_q, k_s, v_q, v_s = _mk_cache(rng, b, kvh, s_max, hd)
    q = jnp.asarray(rng.normal(size=(b, heads, hd)), jnp.float32)
    lens = jnp.asarray([100, 1], jnp.int32)   # incl. the just-written token

    full = np.asarray(flash_decode_gqa(q, k_q, k_s, v_q, v_s, lens,
                                       block_s=64, interpret=True))

    acc, m, l = flash_decode_gqa_state(q, k_q, k_s, v_q, v_s, lens - 1,
                                       block_s=64, interpret=True)
    g = heads // kvh
    kv_map = np.arange(heads) // g
    pos = np.asarray(lens) - 1
    kf = (np.asarray(k_q, np.float32)
          * np.asarray(k_s)[..., None])[np.arange(b)[:, None],
                                        kv_map[None, :], pos[:, None]]
    vf = (np.asarray(v_q, np.float32)
          * np.asarray(v_s)[..., None])[np.arange(b)[:, None],
                                        kv_map[None, :], pos[:, None]]
    s_cur = np.sum(np.asarray(q) * kf, -1) / np.sqrt(hd)
    m_new = np.maximum(np.asarray(m), s_cur)
    alpha = np.exp(np.asarray(m) - m_new)
    beta = np.exp(s_cur - m_new)
    merged = ((np.asarray(acc) * alpha[..., None] + beta[..., None] * vf)
              / (np.asarray(l) * alpha + beta)[..., None])
    # The split path computes the final token's term in f32 while the full
    # kernel runs it through the bf16 dot — ~1% accumulation-order noise.
    res = verify.verify(merged.astype(np.float32), full.astype(np.float32),
                        rtol=2e-2, atol=2e-2, max_ratio=1e-3)
    assert res.ok, res
