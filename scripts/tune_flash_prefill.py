#!/usr/bin/env python
"""On-chip block-size tuner for the flash-prefill kernel.

Round-1 tuned the flash-DECODE kernel's S-block on silicon (block_s
256 → 2048 took the per-(batch, head) cache DMAs from 122 to 451 GB/s on
the single sequential TensorCore) but left prefill at its untuned
(block_q=256, block_s=256) defaults. This sweeps (block_q, block_s) on a
serving-shaped case and prints the achieved cache read bandwidth per
config so the defaults can be set from measurement.

  python scripts/tune_flash_prefill.py --batch 8 --s 512 --cache 2048
"""

import argparse
import itertools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--s", type=int, default=512, help="prompt length")
    ap.add_argument("--cache", type=int, default=2048, help="cache extent S")
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--kv-heads", type=int, default=16)
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--min-chain", type=float, default=0.25)
    ap.add_argument("--block-q", type=int, nargs="*",
                    default=[128, 256, 512])
    ap.add_argument("--block-s", type=int, nargs="*",
                    default=[256, 512, 1024, 2048])
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepgemm_ascend_tpu.bench import timing
    from deepgemm_ascend_tpu.ops.flash_prefill import flash_prefill_gqa

    b, s, S = args.batch, args.s, args.cache
    h, kvh, hd = args.heads, args.kv_heads, args.head_dim
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, s, h, hd)), jnp.bfloat16)
    k_q = jnp.asarray(rng.integers(-127, 128, (b, kvh, S, hd)), jnp.int8)
    v_q = jnp.asarray(rng.integers(-127, 128, (b, kvh, S, hd)), jnp.int8)
    k_s = jnp.asarray(rng.uniform(0.01, 0.02, (b, kvh, S)), jnp.float32)
    v_s = jnp.asarray(rng.uniform(0.01, 0.02, (b, kvh, S)), jnp.float32)
    start = jnp.full((b,), S - s, jnp.int32)
    lens = jnp.full((b,), S, jnp.int32)

    # Bytes the kernel must stream per call: both int8 caches + scales
    # (upper bound: causality skips nothing here since start = S - s).
    cache_bytes = 2 * b * kvh * S * hd + 2 * 4 * b * kvh * S

    def perturb(out, q0):
        tap = jax.lax.convert_element_type(
            jnp.sum(out[:1, :1, :1, :1]), jnp.float32) * jnp.float32(1e-30)
        return q0 + tap.astype(q0.dtype)

    rows = []
    for bq, bs in itertools.product(args.block_q, args.block_s):
        if bs > S or bq > s:
            continue

        def f(qq, *rest, bq=bq, bs=bs):
            return flash_prefill_gqa(qq, *rest, block_q=bq, block_s=bs)

        try:
            t = timing.time_fn(f, (q, k_q, k_s, v_q, v_s, start, lens),
                               iters=args.iters, repeats=2,
                               min_chain_seconds=args.min_chain)
        except Exception as e:
            print(f"bq={bq:4d} bs={bs:4d}: FAILED {str(e)[:120]}")
            continue
        gbps = cache_bytes / t.seconds / 1e9
        rows.append((t.seconds, bq, bs, gbps))
        print(f"bq={bq:4d} bs={bs:4d}: {t.seconds*1e3:7.3f} ms  "
              f"{gbps:6.1f} GB/s cache stream")
    if rows:
        rows.sort()
        sec, bq, bs, gbps = rows[0]
        print(f"[DGA-TPU] best: block_q={bq} block_s={bs} "
              f"({sec*1e3:.3f} ms, {gbps:.1f} GB/s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
