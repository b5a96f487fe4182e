#!/usr/bin/env python
"""Round-5 targeted candidates for the bf16 straggler shapes.

The 40-config r4f deep sweep left bf16 4096^3 at 84.9% and the primes at
77-81% of peak while the fp8 twin reaches 89%+ at the same shapes. The
analytic prefix never proposed the low-HBM-traffic corner its generator
prunes at the 16 MB VMEM budget: LARGE (bm, bn) tiles (fewer re-reads of
each operand: A is read N/bn times, B M/bm times — at bf16's 2x bytes/elem
that traffic is exactly what the fp8 twin doesn't pay) and bf16 full-K
tiles in the fp8 winner's geometry. This sweep appends those hand-picked
candidates to the ORIGINAL r3 result files (config-keyed resume: the
existing records replay, only the new candidates burn chip time) so the
normal harvest path packages any winner.

Run while the chip chain is paused (.chip_pause) — the measurements are
timing-sensitive.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("JAX_PLATFORMS"):
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main(argv=None) -> int:
    import jax.numpy as jnp

    from deepgemm_ascend_tpu.bench import timing
    from deepgemm_ascend_tpu.config import GemmConfig, SwizzleDir
    from deepgemm_ascend_tpu.ops.gemm import gemm_with_config
    from deepgemm_ascend_tpu.tiling import autotune
    from deepgemm_ascend_tpu.tiling.cache import TilingCache
    from deepgemm_ascend_tpu.utils import golden

    out_dir = "autotune_results_r3"
    cache = TilingCache(os.path.join(out_dir, "tilings.jsonl"))
    NM = SwizzleDir.N_MAJOR

    # (m, n, k) -> extra candidates. VMEM-borderline tiles are included
    # deliberately: a Mosaic allocation failure is recorded as poisoned
    # and skipped on resume, which is cheap evidence.
    targets = {
        (4096, 4096, 4096): [
            GemmConfig(1024, 1024, 256), GemmConfig(1024, 1024, 512),
            GemmConfig(2048, 512, 256), GemmConfig(512, 2048, 256),
            GemmConfig(2048, 1024, 256),
            GemmConfig(512, 256, 4096), GemmConfig(256, 512, 4096),
            GemmConfig(1024, 512, 1024, swizzle=NM),
            GemmConfig(1024, 1024, 512, swizzle=NM),
        ],
        (1279, 5003, 7681): [
            GemmConfig(128, 256, 7808), GemmConfig(256, 256, 7808),
            GemmConfig(384, 128, 7808),
            GemmConfig(256, 128, 7808, swizzle=NM),
            GemmConfig(1024, 1024, 256),
        ],
        (3511, 6151, 8191): [
            GemmConfig(128, 256, 8192), GemmConfig(256, 128, 8192),
            GemmConfig(256, 256, 8192),
            GemmConfig(1024, 1024, 256), GemmConfig(1024, 512, 512),
            GemmConfig(512, 512, 2048, swizzle=NM),
        ],
        (5119, 6997, 9901): [
            GemmConfig(128, 256, 9984), GemmConfig(256, 128, 9984),
            GemmConfig(1024, 1024, 256), GemmConfig(1024, 1024, 512),
            GemmConfig(1024, 512, 1024, swizzle=NM),
        ],
    }

    # fp8 4096^3 — the bench.py headline shape (89.1% swept over 34
    # configs, all full-K winners at bn 256/512): probe the unexplored
    # large-bm / odd-bn corners of the full-K family and N-major twins.
    fp8_targets = {
        (4096, 4096, 4096): [
            GemmConfig(1024, 384, 4096), GemmConfig(768, 512, 4096),
            GemmConfig(512, 768, 4096), GemmConfig(1024, 512, 2048),
            GemmConfig(512, 512, 4096, swizzle=NM),
            GemmConfig(1024, 256, 4096, swizzle=NM),
        ],
    }

    def load_prior(path):
        """Deduped configs already recorded in a results file (replayed by
        config-keyed resume; keeps the winner computation over ALL
        records, not just the new extras)."""
        import json
        prior, seen = [], set()
        if os.path.exists(path):
            for line in open(path):
                r = json.loads(line)
                key = autotune.Autotuner._cfg_key(r["config"])
                if key not in seen:
                    seen.add(key)
                    prior.append(GemmConfig.from_dict(r["config"]))
        return prior

    for (m, n, k), extra in targets.items():
        a = jnp.asarray(golden.gen_heavy_tail((m, k), seed=0), jnp.bfloat16)
        b = jnp.asarray(golden.gen_heavy_tail((k, n), seed=1), jnp.bfloat16)

        def time_fn(cfg, a=a, b=b):
            f = lambda x, y: gemm_with_config(x, y, config=cfg, layout="nn")
            t = timing.time_gemm_like(f, a, b, iters=16, repeats=2,
                                      min_chain_seconds=0.25)
            return t.seconds

        # Resume the ORIGINAL r3 files: replayed prefix + new candidates.
        tag = f"gemm_{m}x{n}x{k}_r0"
        path = os.path.join(out_dir, f"{tag}.jsonl")
        prior = load_prior(path)
        cands = prior + [c for c in extra if c not in prior]
        tuner = autotune.Autotuner(
            None, time_fn, op="gemm",
            results_path=path,
            checkpoint_path=os.path.join(out_dir, f"{tag}.ckpt"),
            cache=cache)
        win = tuner.sweep_shape(m, n, k, in_dtype=jnp.bfloat16,
                                candidates=cands,
                                out_dtype=jnp.float32, verbose=True)
        print(f"[DGA-TPU] targeted {m}x{n}x{k} winner: {win}")

    from deepgemm_ascend_tpu.ops import fp8_gemm as fp8mod, quant

    for (m, n, k), extra in fp8_targets.items():
        a = golden.gen_heavy_tail((m, k), seed=0)
        b = golden.gen_heavy_tail((k, n), seed=1)
        a_q, a_s = quant.quantize_fp8_act(jnp.asarray(a))
        b_q, b_s = quant.quantize_fp8_weight(jnp.asarray(b))
        bse = fp8mod.expand_weight_scales(b_s, n)

        def time_fn(cfg, a_q=a_q, a_s=a_s, b_q=b_q, bse=bse):
            f = lambda aq, asc, bq, bs: fp8mod.fp8_gemm_with_config(
                aq, asc, bq, bs, config=cfg)
            t = timing.time_gemm_like(f, a_q, a_s, b_q, bse,
                                      iters=16, repeats=2,
                                      min_chain_seconds=0.25)
            return t.seconds

        tag = f"fp8_gemm_{m}x{n}x{k}_r0"
        path = os.path.join(out_dir, f"{tag}.jsonl")
        prior = load_prior(path)
        cands = prior + [c for c in extra if c not in prior]
        tuner = autotune.Autotuner(
            None, time_fn, op="fp8_gemm",
            results_path=path,
            checkpoint_path=os.path.join(out_dir, f"{tag}.ckpt"),
            cache=cache)
        win = tuner.sweep_shape(m, n, k, in_dtype=jnp.float8_e4m3fn,
                                candidates=cands,
                                out_dtype=jnp.bfloat16, verbose=True)
        print(f"[DGA-TPU] targeted fp8 {m}x{n}x{k} winner: {win}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
