#!/usr/bin/env python
"""Measure ONE full-size transformer layer on silicon (VERDICT r2 item 8).

Instantiates a single MoE decoder layer at real geometry — V2_LITE_FULL
(all 64 experts resident, the single-chip case) and V3_STYLE (ep-sliced:
256/ep experts resident, one expert-parallel shard's compute) — runs the
decode step on chip, and reports ms/layer plus the naive full-model
projection tokens/s = batch / (num_layers × t_layer). This replaces the
geometry-only sharding-contract asserts (tests/test_model.py) with
measured numbers.

The ep shard computes its local experts' tokens only (expert_offset=0,
no psum — the collective is ICI-bound, measured separately in
docs/MULTICHIP.md); attention + router run replicated, exactly as one
shard of the sharded decode step does.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Honor JAX_PLATFORMS explicitly (CPU smokes / debugging): this image's
# sitecustomize force-registers the TPU plugin, so the env var alone is
# ignored (see scripts/autotune_sweep.py).
if os.environ.get("JAX_PLATFORMS"):
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--cache-len", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--min-chain", type=float, default=0.25)
    ap.add_argument("--configs", nargs="*",
                    default=["v2_lite_full:1", "v3_style:32"],
                    help="name:ep pairs")
    ap.add_argument("--expert-quant", choices=["fp8", "int8"], default="fp8",
                    help="expert weight quantization: fp8 blockwise or W8A8 "
                         "int8 (2x MXU rate, models/moe.Int8ExpertWeights)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from deepgemm_ascend_tpu.bench import timing
    from deepgemm_ascend_tpu.models.attention import (AttentionParams,
                                                      KVCache, attention)
    from deepgemm_ascend_tpu.models.config import V2_LITE_FULL, V3_STYLE
    from deepgemm_ascend_tpu.models.layers import BF16Linear, rms_norm
    from deepgemm_ascend_tpu.models.moe import (ExpertWeights,
                                                Int8ExpertWeights, MoEParams,
                                                moe_block)

    cfgs = {"v2_lite_full": V2_LITE_FULL, "v3_style": V3_STYLE}

    for spec in args.configs:
        name, ep_s = spec.split(":")
        cfg = cfgs[name]
        ep = int(ep_s)
        e_local = cfg.num_experts // ep
        b = args.batch
        s_len = min(args.cache_len, cfg.max_seq_len)

        key = jax.random.PRNGKey(0)
        k_attn, k_router, k_exp = jax.random.split(key, 3)
        attn = AttentionParams.create(k_attn, cfg)
        router = BF16Linear.create(k_router, cfg.hidden_size,
                                   cfg.num_experts, init_scale=0.02)
        expert_cls = (Int8ExpertWeights if args.expert_quant == "int8"
                      else ExpertWeights)
        experts = expert_cls.create(k_exp, e_local, cfg.hidden_size,
                                    cfg.moe_intermediate)
        moe = MoEParams(router=router, experts=experts, shared_w1=None,
                        shared_w2=None)
        norm = jnp.ones((cfg.hidden_size,), jnp.bfloat16)
        cache = KVCache.create(b, s_len, cfg.num_kv_heads, cfg.head_dim)
        x = (jax.random.normal(jax.random.PRNGKey(1), (b, 1, cfg.hidden_size),
                               jnp.float32) * 0.1).astype(jnp.bfloat16)
        seq_lens = jnp.full((b,), s_len - 2, jnp.int32)
        positions = seq_lens[:, None]

        # Weights/caches are ARGUMENTS, not closure captures: closed-over
        # arrays are embedded in the lowered HLO as constants, and at this
        # geometry (hundreds of MB of expert weights) the serialized
        # module exceeded the remote-compile transport's body limit
        # (observed: HTTP 413 on the tunnel). As parameters only their
        # shapes enter the program.
        def layer_step(x, cache_kq, cache_ks, cache_vq, cache_vs,
                       attn_p, moe_p, norm_p, positions_p, seq_lens_p):
            cache_ = KVCache(cache_kq, cache_ks, cache_vq, cache_vs)
            h = rms_norm(x, norm_p, cfg.rms_eps)
            attn_out, cache2 = attention(attn_p, h, cache_, positions_p,
                                         seq_lens_p + 1, cfg)
            x1 = x + attn_out
            h2 = rms_norm(x1, norm_p, cfg.rms_eps)
            ffn = moe_block(moe_p, h2.reshape(b, cfg.hidden_size), cfg,
                            local_experts=e_local, expert_offset=0)
            return x1 + ffn[:, None, :]

        t = timing.time_fn(
            layer_step, (x, cache.k_q, cache.k_s, cache.v_q, cache.v_s,
                         attn, moe, norm, positions, seq_lens),
            iters=args.iters, repeats=2,
            min_chain_seconds=args.min_chain)
        ms = t.seconds * 1e3
        proj = b / (cfg.num_layers * t.seconds)
        # Expert GEMM flops actually computed on this shard (expected
        # tokens routed to local experts = b·top_k/ep on average).
        print(f"[layer_bench] {name} ep={ep} (E_local={e_local}) "
              f"experts={args.expert_quant} "
              f"batch={b} cache={s_len}: {ms:.3f} ms/layer | "
              f"projected full-model ({cfg.num_layers}L, this shard's "
              f"compute replicated): {proj:.0f} tok/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
