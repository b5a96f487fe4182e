"""Checkpoint loader tests: HF-style state dict → quantized ModelParams.

Fixture strategy mirrors the reference's (no shipped weights; fabricate a
real-but-tiny checkpoint on the fly — ≙ `test_get_best_config.py:28-37`).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepgemm_ascend_tpu.models import (TINY, decode_step, init_cache,
                                        load_params)
from deepgemm_ascend_tpu.models.moe import MoEParams


def _tiny_state(rng, cfg):
    s = {}

    def w(*shape, scale=0.02):
        return rng.normal(size=shape).astype(np.float32) * scale

    s["model.embed_tokens.weight"] = w(cfg.vocab_size, cfg.hidden_size)
    s["model.norm.weight"] = np.ones((cfg.hidden_size,), np.float32)
    s["lm_head.weight"] = w(cfg.vocab_size, cfg.hidden_size)
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        s[p + "input_layernorm.weight"] = np.ones((cfg.hidden_size,),
                                                  np.float32)
        s[p + "post_attention_layernorm.weight"] = np.ones(
            (cfg.hidden_size,), np.float32)
        s[p + "self_attn.q_proj.weight"] = w(cfg.q_dim, cfg.hidden_size)
        s[p + "self_attn.k_proj.weight"] = w(cfg.kv_dim, cfg.hidden_size)
        s[p + "self_attn.v_proj.weight"] = w(cfg.kv_dim, cfg.hidden_size)
        s[p + "self_attn.o_proj.weight"] = w(cfg.hidden_size, cfg.q_dim)
        if i < cfg.first_dense_layers:
            s[p + "mlp.gate_proj.weight"] = w(cfg.dense_intermediate,
                                              cfg.hidden_size)
            s[p + "mlp.up_proj.weight"] = w(cfg.dense_intermediate,
                                            cfg.hidden_size)
            s[p + "mlp.down_proj.weight"] = w(cfg.hidden_size,
                                              cfg.dense_intermediate)
        else:
            s[p + "mlp.gate.weight"] = w(cfg.num_experts, cfg.hidden_size)
            for j in range(cfg.num_experts):
                q = p + f"mlp.experts.{j}."
                s[q + "gate_proj.weight"] = w(cfg.moe_intermediate,
                                              cfg.hidden_size)
                s[q + "up_proj.weight"] = w(cfg.moe_intermediate,
                                            cfg.hidden_size)
                s[q + "down_proj.weight"] = w(cfg.hidden_size,
                                              cfg.moe_intermediate)
            si = cfg.moe_intermediate * cfg.num_shared_experts
            s[p + "mlp.shared_experts.gate_proj.weight"] = w(
                si, cfg.hidden_size)
            s[p + "mlp.shared_experts.up_proj.weight"] = w(
                si, cfg.hidden_size)
            s[p + "mlp.shared_experts.down_proj.weight"] = w(
                cfg.hidden_size, si)
    return s


@pytest.fixture(scope="module")
def state_and_params():
    rng = np.random.default_rng(0)
    state = _tiny_state(rng, TINY)
    return state, load_params(state, TINY)


def test_load_shapes(state_and_params):
    state, params = state_and_params
    cfg = TINY
    assert params.embed.shape == (cfg.vocab_size, cfg.hidden_size)
    assert params.lm_head.shape == (cfg.hidden_size, cfg.vocab_size)
    assert len(params.layers) == cfg.num_layers
    moe = params.layers[-1].ffn
    assert isinstance(moe, MoEParams)
    assert moe.experts.w1_q.shape == (cfg.num_experts, cfg.hidden_size,
                                      2 * cfg.moe_intermediate)
    assert moe.experts.w2_q.shape == (cfg.num_experts, cfg.moe_intermediate,
                                      cfg.hidden_size)
    assert moe.router.w.shape == (cfg.hidden_size, cfg.num_experts)


def test_loaded_linear_matches_raw_weight(state_and_params):
    """The quantized wq must reproduce x @ W.T within fp8 block tolerance."""
    state, params = state_and_params
    w = state["model.layers.0.self_attn.q_proj.weight"]  # (q_dim, hidden)
    x = np.random.default_rng(1).normal(
        size=(16, TINY.hidden_size)).astype(np.float32)
    got = np.asarray(params.layers[0].attn.wq(jnp.asarray(x),
                                              out_dtype=jnp.float32))
    want = x @ w.T
    rel = (np.linalg.norm(got - want) / np.linalg.norm(want))
    # BOTH operands are e4m3-quantized (weights at load, activations on the
    # fly) — ~2% rel-L2 each on gaussian data → ~3-4% combined floor.
    assert rel < 0.06, rel


def test_loaded_model_decodes(state_and_params):
    _, params = state_and_params
    cfg = TINY
    caches = init_cache(cfg, 2, max_seq=16)
    logits, _ = jax.jit(
        lambda p, t, c, l: decode_step(p, t, c, l, cfg))(
        params, jnp.zeros((2,), jnp.int32), caches,
        jnp.zeros((2,), jnp.int32))
    assert logits.shape == (2, cfg.vocab_size)
    assert bool(jnp.isfinite(logits).all())


def test_missing_tensor_raises():
    with pytest.raises(KeyError):
        load_params({}, TINY)


def test_safetensors_roundtrip(tmp_path, state_and_params):
    from safetensors.numpy import save_file

    from deepgemm_ascend_tpu.models import load_safetensors
    state, params = state_and_params
    path = str(tmp_path / "model.safetensors")
    save_file(state, path)
    params2 = load_safetensors(path, TINY)
    np.testing.assert_array_equal(
        np.asarray(params.layers[0].attn.wq.w_q).view(np.uint8),
        np.asarray(params2.layers[0].attn.wq.w_q).view(np.uint8))
    np.testing.assert_array_equal(np.asarray(params.embed),
                                  np.asarray(params2.embed))


def test_quantized_checkpoint_roundtrip(tmp_path, state_and_params):
    from deepgemm_ascend_tpu.models import load_quantized, save_quantized
    _, params = state_and_params
    path = str(tmp_path / "ckpt")
    save_quantized(params, path)
    restored = load_quantized(path, TINY)
    # fp8 payloads bit-identical; structure preserved.
    np.testing.assert_array_equal(
        np.asarray(params.layers[0].attn.wq.w_q).view(np.uint8),
        np.asarray(restored.layers[0].attn.wq.w_q).view(np.uint8))
    np.testing.assert_array_equal(np.asarray(params.lm_head, np.float32),
                                  np.asarray(restored.lm_head, np.float32))
    moe = restored.layers[-1].ffn
    from deepgemm_ascend_tpu.models.moe import MoEParams
    assert isinstance(moe, MoEParams)
