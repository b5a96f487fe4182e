"""Ring attention (parallel/ring_attention.py) vs full-sequence reference.

The CP primitive must match plain full-sequence softmax attention to f32
rounding for both causal and full masks, at every ring size that divides
the 8-device mesh, including ragged-ish head/batch shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepgemm_ascend_tpu.parallel import make_mesh
from deepgemm_ascend_tpu.parallel.ring_attention import (
    ring_attention_prefill, zigzag_inverse, zigzag_order)
from deepgemm_ascend_tpu.parallel.sharded import shard_map

P = jax.sharding.PartitionSpec


def _ref_attention(q, k, v, causal):
    qf, kf, vf = (x.astype(np.float32) for x in
                  (np.asarray(q), np.asarray(k), np.asarray(v)))
    b, s, h, d = qf.shape
    out = np.empty_like(qf)
    for bi in range(b):
        for hi in range(h):
            sc = qf[bi, :, hi] @ kf[bi, :, hi].T / np.sqrt(d)
            if causal:
                sc = np.where(np.tril(np.ones((s, s), bool)), sc, -np.inf)
            sc = sc - sc.max(-1, keepdims=True)
            p = np.exp(sc)
            p /= p.sum(-1, keepdims=True)
            out[bi, :, hi] = p @ vf[bi, :, hi]
    return out


def _qkv(b, s, h, d, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.standard_normal((b, s, h, d)) * 0.5,
                             jnp.bfloat16)
    return mk(), mk(), mk()


@pytest.mark.parametrize("cp,causal", [
    (2, True), (4, True),
    pytest.param(8, True, marks=pytest.mark.slow),  # cp 2/4 cover the ring
    (4, False)])
def test_ring_attention_matches_full(cp, causal):
    b, s, h, d = 2, 16 * cp, 2, 32
    q, k, v = _qkv(b, s, h, d, seed=cp)
    mesh = make_mesh(tp=cp)

    f = jax.jit(shard_map(
        lambda ql, kl, vl: ring_attention_prefill(
            ql, kl, vl, axis_name="model", cp=cp, causal=causal),
        mesh,
        in_specs=(P(None, "model"), P(None, "model"), P(None, "model")),
        out_specs=P(None, "model")))
    out = np.asarray(f(q, k, v), np.float32)
    ref = _ref_attention(q, k, v, causal)
    np.testing.assert_allclose(out, ref, rtol=5e-2, atol=5e-2)


@pytest.mark.parametrize("cp", [
    2, 4, pytest.param(8, marks=pytest.mark.slow)])
def test_zigzag_schedule_matches_full(cp):
    """The load-balanced zigzag schedule must be numerically identical to
    full attention after un-permuting the output rows."""
    b, s, h, d = 2, 8 * 2 * cp, 2, 32
    q, k, v = _qkv(b, s, h, d, seed=20 + cp)
    order = zigzag_order(cp, s)
    inv = zigzag_inverse(cp, s)
    mesh = make_mesh(tp=cp)
    f = jax.jit(shard_map(
        lambda ql, kl, vl: ring_attention_prefill(
            ql, kl, vl, axis_name="model", cp=cp, schedule="zigzag"),
        mesh,
        in_specs=(P(None, "model"),) * 3,
        out_specs=P(None, "model")))
    out_z = np.asarray(f(q[:, order], k[:, order], v[:, order]), np.float32)
    ref = _ref_attention(q, k, v, causal=True)
    np.testing.assert_allclose(out_z[:, inv], ref, rtol=5e-2, atol=5e-2)


def test_zigzag_order_roundtrip():
    order = zigzag_order(4, 32)
    inv = zigzag_inverse(4, 32)
    x = np.arange(32)
    assert (x[order][inv] == x).all()
    # rank 0 owns chunks 0 and 7 of 8
    assert list(order[:8]) == list(range(0, 4)) + list(range(28, 32))


@pytest.mark.parametrize("cp", [2, 4])
def test_ring_flash_prefill_matches_reference(cp):
    """The Pallas-chunk int8-cache CP prefill must match full-sequence
    attention computed on the DEQUANTIZED cache values."""
    from deepgemm_ascend_tpu.ops import quant
    from deepgemm_ascend_tpu.parallel.ring_attention import \
        ring_flash_prefill

    b, s, heads, kvh, d = 2, 32 * cp, 4, 2, 64
    rng = np.random.default_rng(cp)
    q = jnp.asarray(rng.standard_normal((b, s, heads, d)) * 0.5,
                    jnp.bfloat16)
    k = rng.standard_normal((b, kvh, s, d)).astype(np.float32)
    v = rng.standard_normal((b, kvh, s, d)).astype(np.float32)
    k_q, k_s = quant.quantize_int8(jnp.asarray(k), axis=-1)
    v_q, v_s = quant.quantize_int8(jnp.asarray(v), axis=-1)
    k_s, v_s = k_s[..., 0], v_s[..., 0]

    mesh = make_mesh(tp=cp)
    f = jax.jit(shard_map(
        lambda ql, kq, ks, vq, vs: ring_flash_prefill(
            ql, kq, ks, vq, vs, axis_name="model", cp=cp,
            block_q=16, block_s=128),
        mesh,
        in_specs=(P(None, "model"), P(None, None, "model"),
                  P(None, None, "model"), P(None, None, "model"),
                  P(None, None, "model")),
        out_specs=P(None, "model")))
    out = np.asarray(f(q, k_q, k_s, v_q, v_s), np.float32)

    # reference on the dequantized cache (same values the kernel sees),
    # broadcast to q heads
    kd = np.asarray(k_q, np.float32) * np.asarray(k_s)[..., None]
    vd = np.asarray(v_q, np.float32) * np.asarray(v_s)[..., None]
    g = heads // kvh
    kd = np.repeat(kd, g, axis=1).transpose(0, 2, 1, 3)   # (b, s, heads, d)
    vd = np.repeat(vd, g, axis=1).transpose(0, 2, 1, 3)
    ref = _ref_attention(q, jnp.asarray(kd), jnp.asarray(vd), causal=True)
    np.testing.assert_allclose(out, ref, rtol=5e-2, atol=5e-2)


def test_ring_attention_gqa_matches_broadcast():
    """GQA (fewer kv heads) must equal the kv-broadcast formulation —
    the ring rotates the small KV and expands per hop."""
    cp, b, s, h, hk, d = 4, 1, 32, 4, 2, 16
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((b, s, h, d)) * 0.5, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, hk, d)) * 0.5, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, hk, d)) * 0.5, jnp.bfloat16)
    mesh = make_mesh(tp=cp)
    run = lambda kk, vv: np.asarray(jax.jit(shard_map(
        lambda ql, kl, vl: ring_attention_prefill(
            ql, kl, vl, axis_name="model", cp=cp),
        mesh, in_specs=(P(None, "model"),) * 3,
        out_specs=P(None, "model")))(q, kk, vv), np.float32)
    out_gqa = run(k, v)
    out_bcast = run(jnp.repeat(k, h // hk, axis=2),
                    jnp.repeat(v, h // hk, axis=2))
    np.testing.assert_allclose(out_gqa, out_bcast, rtol=1e-5, atol=1e-5)


def test_ring_attention_cp1_matches_full():
    b, s, h, d = 1, 32, 2, 16
    q, k, v = _qkv(b, s, h, d, seed=9)
    out = np.asarray(ring_attention_prefill(
        q, k, v, axis_name="model", cp=1), np.float32)
    ref = _ref_attention(q, k, v, causal=True)
    np.testing.assert_allclose(out, ref, rtol=5e-2, atol=5e-2)


def test_ring_attention_memory_shape_contract():
    with pytest.raises(ValueError, match="must match"):
        ring_attention_prefill(
            jnp.zeros((1, 8, 2, 16), jnp.bfloat16),
            jnp.zeros((1, 8, 2, 8), jnp.bfloat16),
            jnp.zeros((1, 8, 2, 16), jnp.bfloat16),
            axis_name="model", cp=1)


def test_ring_uses_collective_permute():
    cp = 8
    b, s, h, d = 1, 8 * cp, 1, 16
    q, k, v = _qkv(b, s, h, d, seed=3)
    mesh = make_mesh(tp=cp)
    f = jax.jit(shard_map(
        lambda ql, kl, vl: ring_attention_prefill(
            ql, kl, vl, axis_name="model", cp=cp),
        mesh,
        in_specs=(P(None, "model"),) * 3,
        out_specs=P(None, "model")))
    hlo = f.lower(q, k, v).compile().as_text()
    assert "collective-permute" in hlo
    assert "all-gather" not in hlo and "all-reduce" not in hlo
