"""Model stack tests: attention w/ int8 KV, MoE routing/dispatch, decode.

Golden strategy mirrors the reference device tests (outlier-ratio + cross-
check vs an independent implementation, ``framework/tests/test.py:80-93``):
the MoE block is cross-checked against a dense per-token loop reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepgemm_ascend_tpu.models import (TINY, KVCache, ModelConfig,
                                        decode_step, dispatch_masked, forward,
                                        init_cache, init_params, moe_block,
                                        route_topk)
from deepgemm_ascend_tpu.models.moe import MoEParams, _swiglu
from deepgemm_ascend_tpu.ops import quant
from deepgemm_ascend_tpu.utils import verify


def test_route_topk_normalized():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(6, 8)),
                         jnp.float32)
    w, idx = route_topk(logits, 3)
    assert w.shape == (6, 3) and idx.shape == (6, 3)
    np.testing.assert_allclose(np.asarray(jnp.sum(w, -1)), 1.0, rtol=1e-5)


def test_dispatch_masked_slots_unique_and_counts():
    idx = jnp.asarray([[0, 1], [0, 2], [0, 1], [3, 0]], jnp.int32)
    slot, masked_m, cap = dispatch_masked(idx, 4)
    assert cap == 8
    np.testing.assert_array_equal(np.asarray(masked_m), [4, 2, 1, 1])
    # slots within expert 0 must be 0,1,2,3 in token order
    flat = np.asarray(idx).reshape(-1)
    slots = np.asarray(slot).reshape(-1)
    for e in range(4):
        got = sorted(slots[flat == e])
        assert got == list(range(len(got))), (e, got)


def test_moe_block_token_chunking_matches():
    """Chunked dispatch (round 5: bounds the (E, T·K, hidden) buffer for
    batched prefill) must match the unchunked path. Routing, scatter, and
    combine are per-token, so the only difference is KERNEL ROUNDING: the
    chunked capacity is smaller, the selector may pick a different tile
    config, and a different block_k split reorders the f32 accumulation —
    a few bf16 ulp on O(1) outputs (measured max 0.013), the same class
    of difference as any tile-config change."""
    cfg = TINY
    params = MoEParams.create(jax.random.PRNGKey(0), cfg)
    t = 512
    x = (jax.random.normal(jax.random.PRNGKey(2), (t, cfg.hidden_size),
                           jnp.float32) * 0.5).astype(jnp.bfloat16)
    full = np.asarray(moe_block(params, x, cfg, token_chunk=0), np.float32)
    chunked = np.asarray(moe_block(params, x, cfg, token_chunk=256),
                         np.float32)
    np.testing.assert_allclose(chunked, full, rtol=0.05, atol=0.05)
    # bulk agreement: the outlier-ratio form of the acceptance gate
    close = np.isclose(chunked, full, rtol=2e-2, atol=2e-2)
    assert close.mean() > 0.999, close.mean()
    # ragged T (no divisor): pads to a chunk multiple, slices back — the
    # review-found fallback-to-unchunked hole
    t2 = 500
    x2 = x[:t2]
    full2 = np.asarray(moe_block(params, x2, cfg, token_chunk=0), np.float32)
    chunk2 = np.asarray(moe_block(params, x2, cfg, token_chunk=256),
                        np.float32)
    assert chunk2.shape == full2.shape
    close2 = np.isclose(chunk2, full2, rtol=2e-2, atol=2e-2)
    assert close2.mean() > 0.999, close2.mean()


def test_moe_block_matches_dense_reference():
    cfg = TINY
    rng = jax.random.PRNGKey(0)
    params = MoEParams.create(rng, cfg)
    t = 16
    x = (jax.random.normal(jax.random.PRNGKey(1), (t, cfg.hidden_size),
                           jnp.float32) * 0.5).astype(jnp.bfloat16)
    out = np.asarray(moe_block(params, x, cfg), np.float32)

    # dense reference: loop tokens, dequantized expert weights in f32
    w1 = np.asarray(quant.dequantize_fp8_weight(
        params.experts.w1_q,
        # w1_s stored lane-expanded: take block-representative columns
        jnp.asarray(np.asarray(params.experts.w1_s)[:, :, ::128])))
    w2 = np.asarray(quant.dequantize_fp8_weight(
        params.experts.w2_q,
        jnp.asarray(np.asarray(params.experts.w2_s)[:, :, ::128])))
    logits = np.asarray(params.router(x), np.float32)
    w, idx = route_topk(jnp.asarray(logits), cfg.top_k)
    w, idx = np.asarray(w), np.asarray(idx)

    ref = np.zeros((t, cfg.hidden_size), np.float32)
    xq, xs = quant.quantize_fp8_act(x)
    xdq = np.asarray(quant.dequantize_fp8_act(xq, xs))  # kernel sees fp8 acts
    for tt in range(t):
        acc = np.zeros(cfg.hidden_size, np.float32)
        for kk in range(cfg.top_k):
            e = idx[tt, kk]
            h = xdq[tt] @ w1[e]
            g, u = np.split(h, 2)
            hmid = (g / (1 + np.exp(-g))) * u
            hq, hs = quant.quantize_fp8_act(jnp.asarray(hmid[None]))
            hdq = np.asarray(quant.dequantize_fp8_act(hq, hs))[0]
            acc += w[tt, kk] * (hdq @ w2[e])
        ref[tt] = acc
    if params.shared_w1 is not None:
        sh = _swiglu(params.shared_w1(x))
        ref += np.asarray(params.shared_w2(sh), np.float32)

    rel = verify.relative_l2_error(out, ref)
    assert rel < 0.06, rel  # fp8 double-quant + bf16 out rounding


def test_attention_decode_vs_prefill_consistency():
    # XLA attention both sides: this test checks CACHE semantics (prefill
    # writes ≡ incremental writes), not kernel rounding — the flash decode
    # path's bf16 dots + analytic current-token merge add ~1% that MoE
    # routing amplifies past the int8-requant tolerance.
    import dataclasses
    cfg = dataclasses.replace(TINY, use_flash_decode=False)
    params = init_params(jax.random.PRNGKey(0), cfg)
    b, prompt = 2, 5
    toks = jax.random.randint(jax.random.PRNGKey(1), (b, prompt), 0,
                              cfg.vocab_size)
    # full prefill
    caches = init_cache(cfg, b, max_seq=32)
    pos = jnp.broadcast_to(jnp.arange(prompt)[None], (b, prompt))
    lens = jnp.full((b,), prompt, jnp.int32)
    logits_full, _ = forward(params, toks, caches, pos, lens, cfg)
    # incremental: prefill first 4 then decode token 5
    caches2 = init_cache(cfg, b, max_seq=32)
    logits_p, caches2 = forward(params, toks[:, :4], caches2, pos[:, :4],
                                jnp.full((b,), 4, jnp.int32), cfg)
    logits_d, _ = decode_step(params, toks[:, 4], caches2,
                              jnp.full((b,), 4, jnp.int32), cfg)
    got = np.asarray(logits_d)
    want = np.asarray(logits_full[:, -1])
    # int8 KV requant: small differences allowed
    rel = verify.relative_l2_error(got, want)
    assert rel < 0.05, rel


@pytest.mark.slow  # smoke subsumed by the decode-vs-prefill consistency
# test above (same decode_step path, stronger assertion)
def test_decode_step_shapes_and_finite():
    cfg = TINY
    params = init_params(jax.random.PRNGKey(2), cfg)
    b = 4
    caches = init_cache(cfg, b, max_seq=16)
    toks = jnp.zeros((b,), jnp.int32)
    logits, caches = decode_step(params, toks, caches,
                                 jnp.zeros((b,), jnp.int32), cfg)
    assert logits.shape == (b, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()
    # second step at length 1
    logits2, _ = decode_step(params, jnp.argmax(logits, -1).astype(jnp.int32),
                             caches, jnp.ones((b,), jnp.int32), cfg)
    assert np.isfinite(np.asarray(logits2)).all()


def test_kv_cache_update_roundtrip():
    c = KVCache.create(2, 8, 2, 64)
    k = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 2, 64))
    v = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 2, 64))
    pos = jnp.broadcast_to(jnp.arange(3)[None], (2, 3))
    c2 = c.update(k, v, pos)
    # layout: (batch, kv_heads, S, head_dim); scales (batch, kv_heads, S)
    kf = np.asarray(c2.k_q, np.float32) * np.asarray(c2.k_s)[..., None]
    want = np.asarray(k).transpose(0, 2, 1, 3)       # (b, kvh, s, hd)
    rel = verify.relative_l2_error(kf[:, :, :3], want)
    assert rel < 0.02, rel
    assert np.all(np.asarray(c2.k_q)[:, :, 3:] == 0)


def test_dense_family_decodes_and_generates():
    """Llama-style dense family: first_dense_layers == num_layers — no MoE
    machinery anywhere in the traced program."""
    from deepgemm_ascend_tpu.models import TINY_DENSE, init_params
    from deepgemm_ascend_tpu.models.model import DenseFFN
    cfg = TINY_DENSE
    params = init_params(jax.random.PRNGKey(0), cfg)
    assert all(isinstance(l.ffn, DenseFFN) for l in params.layers)
    caches = init_cache(cfg, 2, max_seq=16)
    lens = jnp.zeros((2,), jnp.int32)
    logits, caches = decode_step(params, jnp.asarray([1, 2]), caches, lens,
                                 cfg)
    assert logits.shape == (2, cfg.vocab_size)
    assert bool(jnp.isfinite(logits).all())


def test_fullsize_config_geometry():
    """The full DeepSeek-V2-Lite and V3-scale geometry configs must respect
    every sharding/kernel contract the stack assumes: 128-lane q/kv dims,
    congruent kv-head sharding up to tp=16, expert counts divisible by the
    ep axes the mesh builder offers, and flash-legal head_dim."""
    from deepgemm_ascend_tpu.models import V2_LITE_FULL, V3_STYLE
    for cfg in (V2_LITE_FULL, V3_STYLE):
        assert cfg.q_dim % 128 == 0 and cfg.kv_dim % 128 == 0
        assert cfg.head_dim == 128
        assert cfg.num_heads % cfg.num_kv_heads == 0
        for tp in (2, 4, 8, 16):
            assert cfg.num_kv_heads % tp == 0
            assert (cfg.kv_dim // tp) % 128 == 0
            assert cfg.num_heads % tp == 0
        for ep in (2, 4, 8):
            assert cfg.num_experts % ep == 0
