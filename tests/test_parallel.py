"""Sharded decode over the 8-device virtual CPU mesh.

Validates the dp/ep/tp shard_map step compiles, runs, and matches the
single-device model numerically (the reference has no equivalent — its only
multi-device mode was sweep-sharding, SURVEY.md §2.7).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepgemm_ascend_tpu.models import TINY, decode_step, init_cache, init_params
from deepgemm_ascend_tpu.parallel import (make_mesh, make_sharded_decode_step,
                                          shard_caches, shard_params)
from deepgemm_ascend_tpu.utils import verify


@pytest.fixture(scope="module")
def setup():
    cfg = TINY
    params = init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_make_mesh_axis_inference():
    mesh = make_mesh()
    assert mesh.devices.size == len(jax.devices())
    mesh2 = make_mesh(dp=2, ep=2, tp=2)
    assert dict(mesh2.shape) == {"data": 2, "expert": 2, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(dp=3)


@pytest.mark.parametrize("dp,ep,tp", [(2, 2, 2), (1, 1, 8)])
def test_sharded_decode_matches_single_device(setup, dp, ep, tp):
    cfg, params = setup
    if cfg.num_heads % tp or cfg.num_experts % ep:
        pytest.skip("axis does not divide")
    b = 4
    toks = jax.random.randint(jax.random.PRNGKey(1), (b,), 0, cfg.vocab_size)
    lens = jnp.zeros((b,), jnp.int32)

    # JITTED reference: eager-vs-jit fusion changes fp8 rounding at
    # quantization boundaries (can even flip routing); the sharded step is
    # bitwise-equal to the jitted single-device program. The reference must
    # use the SAME attention path as the sharded step: with congruent kv
    # sharding (tp_kv) the sharded step runs the flash kernel, so the
    # reference keeps flash on; otherwise both use the XLA path (the
    # kernel's bf16 dots differ by ~2^-8, which MoE routing amplifies —
    # see test_flash_decode.py).
    import dataclasses
    import functools
    from deepgemm_ascend_tpu.parallel.sharded import tp_kv_sharding
    mesh = make_mesh(dp=dp, ep=ep, tp=tp)
    same_path = tp == 1 or tp_kv_sharding(mesh, cfg)
    cfg_ref = cfg if same_path else dataclasses.replace(
        cfg, use_flash_decode=False)
    ref_logits, _ = jax.jit(functools.partial(decode_step, cfg=cfg_ref))(
        params, toks, init_cache(cfg, b, 16), lens)

    p_sh = shard_params(mesh, params, cfg)
    c_sh = shard_caches(mesh, init_cache(cfg, b, 16), cfg)
    step = make_sharded_decode_step(mesh, cfg, params)
    logits, caches = step(p_sh, toks, c_sh, lens)

    assert logits.shape == (b, cfg.vocab_size)
    rel = verify.relative_l2_error(np.asarray(logits), np.asarray(ref_logits))
    assert rel < 0.02, rel
    # caches updated and still sharded on data
    assert caches[0].k_q.shape[0] == b


def test_sharded_decode_two_steps(setup):
    cfg, params = setup
    mesh = make_mesh(dp=2, ep=2, tp=2)
    b = 4
    p_sh = shard_params(mesh, params, cfg)
    caches = shard_caches(mesh, init_cache(cfg, b, 16), cfg)
    step = make_sharded_decode_step(mesh, cfg, params)
    toks = jnp.zeros((b,), jnp.int32)
    lens = jnp.zeros((b,), jnp.int32)
    logits, caches = step(p_sh, toks, caches, lens)
    nxt = jnp.argmax(logits, -1).astype(jnp.int32)
    logits2, _ = step(p_sh, nxt, caches, lens + 1)
    assert np.isfinite(np.asarray(logits2)).all()


def test_sharded_dp_ep_uses_flash_and_matches(setup):
    """tp == 1 meshes route attention through the flash-decode kernel; the
    result must equal the single-device (flash) jitted program bitwise —
    dp/ep sharding touches no attention math."""
    import functools
    cfg, params = setup
    b = 4
    toks = jnp.asarray([1, 2, 3, 4], jnp.int32)
    lens = jnp.zeros((b,), jnp.int32)
    ref, _ = jax.jit(functools.partial(decode_step, cfg=cfg))(
        params, toks, init_cache(cfg, b, 16), lens)
    mesh = make_mesh(dp=2, ep=4, tp=1)
    p = shard_params(mesh, params, cfg)
    c = shard_caches(mesh, init_cache(cfg, b, 16))
    step = make_sharded_decode_step(mesh, cfg, params)
    logits, _ = step(p, toks, c, lens)
    assert verify.relative_l2_error(np.asarray(logits), np.asarray(ref)) < 1e-6


def test_tp_kv_sharded_flash_decode_matches_and_traces(setup):
    """VERDICT r1 #1: tp > 1 with congruent kv sharding must (a) trace the
    fused flash-decode kernel in every layer (counter, not hope), (b) match
    the single-device flash program, and (c) shard the cache on kv heads."""
    import functools
    from deepgemm_ascend_tpu.parallel.sharded import tp_kv_sharding
    from deepgemm_ascend_tpu.utils.logging import metrics
    cfg, params = setup
    mesh = make_mesh(dp=1, ep=4, tp=2)
    assert tp_kv_sharding(mesh, cfg), "TINY must support tp=2 kv sharding"
    b = 4
    toks = jnp.asarray([1, 2, 3, 4], jnp.int32)
    lens = jnp.zeros((b,), jnp.int32)

    ref, _ = jax.jit(functools.partial(decode_step, cfg=cfg))(
        params, toks, init_cache(cfg, b, 16), lens)

    p_sh = shard_params(mesh, params, cfg)
    c_sh = shard_caches(mesh, init_cache(cfg, b, 16), cfg)
    # Cache device-sharded on (data=batch, model=kv heads).
    sharding = c_sh[0].k_q.sharding
    shard_shape = sharding.shard_shape(c_sh[0].k_q.shape)
    assert shard_shape[1] == cfg.num_kv_heads // 2

    from deepgemm_ascend_tpu.serving.engine import clear_program_cache
    clear_program_cache()   # trace-time counters need a fresh build
    metrics.reset()
    step = make_sharded_decode_step(mesh, cfg, params)
    logits, caches = step(p_sh, toks, c_sh, lens)
    snap = metrics.snapshot()
    assert snap.get("attention.flash_decode_trace", 0) == cfg.num_layers, snap
    assert snap.get("attention.xla_fallback_trace", 0) == 0, snap

    rel = verify.relative_l2_error(np.asarray(logits), np.asarray(ref))
    assert rel < 0.02, rel
    # Two more steps keep the sharded cache consistent with the reference
    # decode (the kernel's in-place writeback is per-shard).
    nxt = jnp.argmax(logits, -1).astype(jnp.int32)
    logits2, caches = step(p_sh, nxt, caches, lens + 1)
    assert np.isfinite(np.asarray(logits2)).all()


@pytest.mark.parametrize(
    "dp,ep,tp",
    # The tp=1 case carries the BITWISE cache-parity claim the dp-sharded
    # prefill docs lean on — it must run in the default suite; the tp=2
    # dequant-tolerance variant is the slow-marked sibling (its tp/kv
    # coverage also exists in test_tp_kv_sharded_flash_decode_*).
    [(2, 4, 1), pytest.param(2, 2, 2, marks=pytest.mark.slow)])
def test_mesh_prefill_matches_single_host(setup, dp, ep, tp):
    """VERDICT r1 #3: mesh admission must be a one-dispatch bucketed prefill
    (flash-prefill kernel per shard, trace-counted), with caches equal to
    the single-host prefill — bitwise when tp == 1 (cache writes happen
    before any MoE psum, so dp/ep cannot perturb them), dequant-tolerance
    under tp (per-shard fp8 column blocks round differently)."""
    from deepgemm_ascend_tpu.serving import Engine
    from deepgemm_ascend_tpu.utils.logging import metrics
    cfg, params = setup
    prompt = [(i * 7 + 3) % cfg.vocab_size for i in range(24)]  # bucket 32
    from deepgemm_ascend_tpu.serving.engine import clear_program_cache
    clear_program_cache()   # flash_prefill_trace asserts trace-time counts
    eng1 = Engine(params, cfg, max_slots=4, max_seq_len=64)
    mesh = make_mesh(dp=dp, ep=ep, tp=tp)
    eng2 = Engine(params, cfg, max_slots=4, max_seq_len=64, mesh=mesh)
    id1 = eng1.scheduler.submit(prompt, 2)
    id2 = eng2.scheduler.submit(prompt, 2)
    metrics.reset()
    out1 = eng1.step()
    out2 = eng2.step()
    snap = metrics.snapshot()
    # The mesh prefill program must contain the flash-prefill kernel in
    # every layer (single dispatch, no token-at-a-time decode scan). Both
    # engines trace one prefill program → 2 × num_layers.
    from deepgemm_ascend_tpu.parallel.sharded import tp_kv_sharding
    if tp == 1 or tp_kv_sharding(mesh, cfg):
        assert snap.get("attention.flash_prefill_trace", 0) == \
            2 * cfg.num_layers, snap
    assert out1[id1][0] == out2[id2][0]          # same greedy first token

    for li, (c1, c2) in enumerate(zip(eng1.caches, eng2.caches)):
        if tp == 1:
            np.testing.assert_array_equal(np.asarray(c1.k_q),
                                          np.asarray(c2.k_q), err_msg=f"L{li}")
            np.testing.assert_array_equal(np.asarray(c1.v_q),
                                          np.asarray(c2.v_q), err_msg=f"L{li}")
            np.testing.assert_array_equal(np.asarray(c1.k_s),
                                          np.asarray(c2.k_s), err_msg=f"L{li}")
            np.testing.assert_array_equal(np.asarray(c1.v_s),
                                          np.asarray(c2.v_s), err_msg=f"L{li}")
        else:
            for qn, sn in (("k_q", "k_s"), ("v_q", "v_s")):
                f1 = (np.asarray(getattr(c1, qn), np.float32)
                      * np.asarray(getattr(c1, sn))[..., None])
                f2 = (np.asarray(getattr(c2, qn), np.float32)
                      * np.asarray(getattr(c2, sn))[..., None])
                rel = verify.relative_l2_error(f2, f1)
                assert rel < 0.05, (li, qn, rel)


def test_sampled_step_greedy_matches_gather(setup):
    """In-graph sharded sampling (temperature 0) must be bit-identical to
    argmax over the gathered logits — the max-reduce replaces the
    (batch, vocab) all-gather, not the semantics."""
    cfg, params = setup
    mesh = make_mesh(dp=1, ep=4, tp=2)
    b = 4
    toks = jnp.asarray([1, 2, 3, 4], jnp.int32)
    lens = jnp.zeros((b,), jnp.int32)
    p_sh = shard_params(mesh, params, cfg)

    step = make_sharded_decode_step(mesh, cfg, params)
    logits, _ = step(p_sh, toks, shard_caches(mesh, init_cache(cfg, b, 16),
                                              cfg), lens)
    expect = np.asarray(jnp.argmax(logits, axis=-1))

    from deepgemm_ascend_tpu.parallel import make_sharded_decode_step as mk
    sampled = mk(mesh, cfg, params, sample={"temperature": 0.0, "top_k": 0})
    nxt, _ = sampled(p_sh, toks, shard_caches(mesh, init_cache(cfg, b, 16),
                                              cfg), lens,
                     jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(nxt), expect)


def test_sampled_step_topk_membership(setup):
    """Temperature sampling with top-k truncation: every sampled token must
    lie in the GLOBAL top-k of that row's gathered logits (the per-shard
    candidate union argument), across several keys."""
    cfg, params = setup
    mesh = make_mesh(dp=2, ep=2, tp=2)
    b, k = 4, 4
    toks = jnp.asarray([5, 6, 7, 8], jnp.int32)
    lens = jnp.zeros((b,), jnp.int32)
    p_sh = shard_params(mesh, params, cfg)

    step = make_sharded_decode_step(mesh, cfg, params)
    logits, _ = step(p_sh, toks, shard_caches(mesh, init_cache(cfg, b, 16),
                                              cfg), lens)
    top = np.asarray(jax.lax.top_k(logits, k)[1])       # (b, k) global

    sampled = make_sharded_decode_step(
        mesh, cfg, params, sample={"temperature": 1.0, "top_k": k})
    seen = set()
    for seed in range(5):
        nxt, _ = sampled(p_sh, toks,
                         shard_caches(mesh, init_cache(cfg, b, 16), cfg),
                         lens, jax.random.PRNGKey(seed))
        nxt = np.asarray(nxt)
        for row in range(b):
            assert nxt[row] in top[row], (row, nxt[row], top[row])
            seen.add((row, int(nxt[row])))
    assert len(seen) > b  # actually samples, not a disguised argmax


def test_attention_rejects_incongruent_kv_shard(setup):
    """A kv-sharded cache with mismatched local q heads must raise."""
    from deepgemm_ascend_tpu.models.attention import attention
    cfg, params = setup
    cache = init_cache(cfg, 2, 16)[0]
    # Fake a kv-sharded cache (1 local kv head) while claiming ALL q heads.
    half = jax.tree.map(lambda x: x[:, :1], cache)
    x = jnp.zeros((2, 1, cfg.hidden_size), jnp.bfloat16)
    with pytest.raises(ValueError, match="congruent"):
        attention(params.layers[0].attn, x, half,
                  jnp.zeros((2, 1), jnp.int32), jnp.ones((2,), jnp.int32),
                  cfg)


def test_topp_threshold_matches_gathered_kept_set():
    """Sharded nucleus cutoff (bounded threshold search, no gather) must
    reproduce the gathered reference's kept set (serving/engine.py
    sample_logits: keep = cum - probs < p, all ties at the cutoff kept)."""
    from jax.sharding import Mesh, PartitionSpec as P
    from deepgemm_ascend_tpu.parallel import sharded as sh
    devs = np.asarray(jax.devices()[:8])
    mesh = Mesh(devs, ("model",))
    b, v = 5, 64 * 8
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(b, v)) * 3.0, jnp.float32)
    for p in (0.3, 0.9, 0.999):
        f = sh.shard_map(
            lambda xl: sh._topp_threshold_sharded(xl, p, "model")[:, None],
            mesh, in_specs=(P(None, "model"),), out_specs=P(None, "model"))
        cuts = np.asarray(f(logits))                    # (b, 8), all equal
        assert np.all(cuts == cuts[:, :1]), p
        kept = np.asarray(logits) > cuts[:, :1]

        ls = np.sort(np.asarray(logits, np.float64), axis=1)[:, ::-1]
        probs = np.exp(ls - ls[:, :1])
        probs /= probs.sum(axis=1, keepdims=True)
        cum = np.cumsum(probs, axis=1)
        keep_sorted = (cum - probs) < p
        keep_sorted[:, 0] = True
        cutoff = np.where(keep_sorted, ls, np.inf).min(axis=1, keepdims=True)
        kept_ref = np.asarray(logits, np.float64) >= cutoff
        np.testing.assert_array_equal(kept, kept_ref), p


@pytest.mark.slow  # top-p membership is implied by the stronger exact
# kept-set equality test above (test_topp_threshold_matches_gathered_kept_set)
def test_sampled_step_topp_membership(setup):
    """top_p < 1 in the sharded step: every sampled token must lie in the
    reference nucleus of that row's gathered logits, and the engine no
    longer needs the gather path for it (VERDICT r2 item 7)."""
    cfg, params = setup
    mesh = make_mesh(dp=1, ep=4, tp=2)
    b, p = 4, 0.7
    toks = jnp.asarray([3, 1, 4, 1], jnp.int32)
    lens = jnp.zeros((b,), jnp.int32)
    p_sh = shard_params(mesh, params, cfg)

    step = make_sharded_decode_step(mesh, cfg, params)
    logits, _ = step(p_sh, toks, shard_caches(mesh, init_cache(cfg, b, 16),
                                              cfg), lens)
    ls = np.sort(np.asarray(logits, np.float64), axis=1)[:, ::-1]
    probs = np.exp(ls - ls[:, :1])
    probs /= probs.sum(axis=1, keepdims=True)
    cum = np.cumsum(probs, axis=1)
    keep_sorted = (cum - probs) < p
    keep_sorted[:, 0] = True
    cutoff = np.where(keep_sorted, ls, np.inf).min(axis=1, keepdims=True)
    nucleus = [set(np.nonzero(np.asarray(logits, np.float64)[r]
                              >= cutoff[r])[0]) for r in range(b)]

    sampled = make_sharded_decode_step(
        mesh, cfg, params,
        sample={"temperature": 1.0, "top_k": 0, "top_p": p})
    for seed in range(4):
        nxt, _ = sampled(p_sh, toks,
                         shard_caches(mesh, init_cache(cfg, b, 16), cfg),
                         lens, jax.random.PRNGKey(seed))
        for row in range(b):
            assert int(np.asarray(nxt)[row]) in nucleus[row], (seed, row)


def test_topp_threshold_outlier_logit_keeps_absolute_resolution():
    """Advisor r3: one extreme-but-finite logit (e.g. a masked-out token at
    -1e30) used to stretch the threshold-search bracket so wide that the
    final cutoff resolution was ~1e30/16⁶ ≈ 6e22 — the cutoff collapsed to
    garbage and the kept set admitted the whole non-outlier vocab. The
    absolute bracket [max(mn−1, mx−33), mx] keeps ~2e-6 resolution
    regardless of outliers; the kept set must equal the gathered
    reference's nucleus exactly."""
    from jax.sharding import Mesh, PartitionSpec as P
    from deepgemm_ascend_tpu.parallel import sharded as sh
    devs = np.asarray(jax.devices()[:8])
    mesh = Mesh(devs, ("model",))
    b, v = 3, 64 * 8
    rng = np.random.default_rng(1)
    raw = rng.normal(size=(b, v)) * 3.0
    raw[:, 17] = -1e30      # finite outlier, one per row (same shard)
    logits = jnp.asarray(raw, jnp.float32)
    p = 0.9
    f = sh.shard_map(
        lambda xl: sh._topp_threshold_sharded(xl, p, "model")[:, None],
        mesh, in_specs=(P(None, "model"),), out_specs=P(None, "model"))
    cuts = np.asarray(f(logits))
    assert np.all(cuts == cuts[:, :1])
    kept = np.asarray(logits) > cuts[:, :1]

    ls = np.sort(np.asarray(logits, np.float64), axis=1)[:, ::-1]
    probs = np.exp(ls - ls[:, :1])
    probs /= probs.sum(axis=1, keepdims=True)
    cum = np.cumsum(probs, axis=1)
    keep_sorted = (cum - probs) < p
    keep_sorted[:, 0] = True
    cutoff = np.where(keep_sorted, ls, np.inf).min(axis=1, keepdims=True)
    kept_ref = np.asarray(logits, np.float64) >= cutoff
    np.testing.assert_array_equal(kept, kept_ref)
