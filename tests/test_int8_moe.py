"""W8A8 int8 MoE experts (models/moe.Int8ExpertWeights) vs float reference.

The int8 expert path trades fp8's blockwise range handling for 2× MXU rate
(per-channel weight × per-token activation scales); accuracy must stay at
the established W8A8 point (~1% relative on SwiGLU expert stacks).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from deepgemm_ascend_tpu.models.config import TINY
from deepgemm_ascend_tpu.models.layers import BF16Linear
from deepgemm_ascend_tpu.models.moe import (Int8ExpertWeights, MoEParams,
                                            moe_block, route_topk)
from deepgemm_ascend_tpu.utils import verify


def _setup(t=16, hidden=128, inter=128, e=4, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), 4)
    w1 = jax.random.normal(keys[0], (e, hidden, 2 * inter),
                           jnp.float32) / hidden ** 0.5
    w2 = jax.random.normal(keys[1], (e, inter, hidden),
                           jnp.float32) / inter ** 0.5
    router = BF16Linear.create(keys[2], hidden, e, init_scale=0.02)
    x = (jax.random.normal(keys[3], (t, hidden), jnp.float32)
         * 0.3).astype(jnp.bfloat16)
    return w1, w2, router, x


def _ref_moe(x, router, w1, w2, top_k):
    """Float reference with identical routing math."""
    logits = router(x)
    weights, idx = route_topk(logits, top_k)
    xf = np.asarray(x, np.float32)
    w1n, w2n = np.asarray(w1), np.asarray(w2)
    t, hidden = xf.shape
    out = np.zeros((t, hidden), np.float32)
    for ti in range(t):
        for kk in range(top_k):
            ex = int(idx[ti, kk])
            h = xf[ti] @ w1n[ex]
            gate, up = np.split(h, 2)
            act = (gate / (1 + np.exp(-gate))) * up
            # match the kernel path's bf16 requantization boundary loosely
            out[ti] += float(weights[ti, kk]) * (act @ w2n[ex])
    return out


def test_int8_moe_block_matches_float_reference():
    cfg = dataclasses.replace(
        TINY, hidden_size=128, moe_intermediate=128, num_experts=4,
        top_k=2, num_shared_experts=0)
    w1, w2, router, x = _setup(hidden=128, inter=128, e=4)
    experts = Int8ExpertWeights.from_weights(w1, w2)
    params = MoEParams(router=router, experts=experts,
                       shared_w1=None, shared_w2=None)
    out = np.asarray(moe_block(params, x, cfg), np.float32)
    ref = _ref_moe(x, router, w1, w2, cfg.top_k)
    assert verify.relative_l2_error(out, ref) < 0.05
    res = verify.verify(out, ref, rtol=0.1, atol=0.05)
    assert res.ok, res


def test_int8_moe_block_jits_and_is_pytree():
    cfg = dataclasses.replace(
        TINY, hidden_size=128, moe_intermediate=128, num_experts=4,
        top_k=2, num_shared_experts=0)
    w1, w2, router, x = _setup(seed=1)
    params = MoEParams(router=router,
                       experts=Int8ExpertWeights.from_weights(w1, w2),
                       shared_w1=None, shared_w2=None)
    f = jax.jit(lambda p, x: moe_block(p, x, cfg))
    y1 = f(params, x)
    y2 = moe_block(params, x, cfg)
    np.testing.assert_array_equal(np.asarray(y1, np.float32),
                                  np.asarray(y2, np.float32))
