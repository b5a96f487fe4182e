#!/usr/bin/env python
"""Attack the sub-85% benchmark stragglers, or measure the floor that
binds them (VERDICT r2 item 4).

Per named row this probes, on chip:
  * the swept best config (re-measured),
  * kernel-shape variants (full-K single-tile, supertile-ish blocks),
  * an in-graph padded-K variant for ragged-K bf16 shapes (pays the pad
    cost inside the timed region),
  * the plain-XLA realization of the same math (scale-fold + dot /
    einsum) — candidate for an "XLA" kernel family where the Pallas
    per-dispatch floor dominates,
and prints each as % of the row's light-speed plus the measured Pallas
dispatch floor, giving the prologue-vs-steady-state decomposition the
verdict asked for.
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


def _envelope():
    """(peak fp8/bf16 FLOPs, HBM B/s) from the platform table — single
    source of truth (tiling/platform.py), not copied constants."""
    import jax.numpy as jnp
    from deepgemm_ascend_tpu.tiling import platform as plat
    info = plat.detect()
    return info.peak_flops(jnp.bfloat16), info.hbm_gbps * 1e9


def light_speed(m, n, k, a_i, o_i, extra_bytes=0.0):
    peak, hbm = _envelope()
    comp = 2.0 * m * n * k / peak
    mem = (m * k * a_i + k * n * a_i + m * n * o_i + extra_bytes) / hbm
    return max(comp, mem)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--min-chain", type=float, default=0.25)
    ap.add_argument("--rows", nargs="*", default=None,
                    help="subset: fp8small, masked, primes, bf16cube")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl

    from deepgemm_ascend_tpu.bench import timing
    from deepgemm_ascend_tpu.config import GemmConfig, KernelType
    from deepgemm_ascend_tpu.ops import fp8_gemm as fp8mod
    from deepgemm_ascend_tpu.ops import grouped_gemm as gg
    from deepgemm_ascend_tpu.ops import quant
    from deepgemm_ascend_tpu.ops.gemm import gemm_with_config
    from deepgemm_ascend_tpu.utils import golden
    from deepgemm_ascend_tpu.utils.common import round_up

    rows = set(args.rows or ["fp8small", "masked", "primes", "bf16cube"])
    t_kw = dict(iters=args.iters, repeats=2,
                min_chain_seconds=args.min_chain)

    # -- Pallas dispatch floor ------------------------------------------
    def _copy_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:]

    from deepgemm_ascend_tpu.ops.gemm import _interpret_default

    def tiny(x):
        return pl.pallas_call(
            _copy_kernel, out_shape=jax.ShapeDtypeStruct((8, 128),
                                                         jnp.float32),
            interpret=_interpret_default())(x)

    x0 = jnp.zeros((8, 128), jnp.float32)
    floor = timing.time_fn(tiny, (x0,), **t_kw)
    print(f"[probe] pallas dispatch floor: {floor.seconds * 1e6:.2f} us")

    def report(tag, secs, ls):
        print(f"[probe]   {tag:38s} {secs * 1e6:9.2f} us  "
              f"{ls / secs * 100:5.1f}% LS")

    def timed(tag, ls, thunk):
        """Time one variant; a compile rejection (e.g. Mosaic refusing a
        candidate block) reports FAILED instead of killing the probe."""
        try:
            t = thunk()
            report(tag, t.seconds, ls)
        except Exception as exc:      # noqa: BLE001 — probe must survive
            print(f"[probe]   {tag:38s} FAILED: {str(exc)[:90]}")

    if "fp8small" in rows:
        m, n, k = 64, 512, 2048
        print(f"[probe] fp8_gemm {m}x{n}x{k} (swept best 42.4%)")
        kb = k // quant.BLOCK
        ls = light_speed(m, n, k, 1, 2, extra_bytes=(m * kb + kb * n) * 4)
        a = golden.gen_heavy_tail((m, k), seed=0)
        b = golden.gen_heavy_tail((k, n), seed=1)
        a_q, a_s = quant.quantize_fp8_act(jnp.asarray(a))
        b_q, b_s = quant.quantize_fp8_weight(jnp.asarray(b))
        bse = fp8mod.expand_weight_scales(b_s, n)
        variants = {
            "swept best 128x512x1024": GemmConfig(128, 512, 1024),
            "full-K single tile 64x512x2048": GemmConfig(64, 512, 2048),
            "full-K 128x512x2048": GemmConfig(128, 512, 2048),
            # gate-clean XLA family (blocked einsum, accum math) — what a
            # packaged KernelType.XLA row would actually ship, vs the
            # relaxed scale-fold realization probed separately below
            "XLA family (gate-clean)": GemmConfig(
                kernel_type=KernelType.XLA),
        }
        for tag, cfg in variants.items():
            f = lambda aq, asc, bq, bs, cfg=cfg: fp8mod.fp8_gemm_with_config(
                aq, asc, bq, bs, config=cfg)
            timed(tag, ls, lambda f=f: timing.time_gemm_like(
                f, a_q, a_s, b_q, bse, **t_kw))

        def xla_fold(aq, asc, bq, bs):
            af = (aq.astype(jnp.float32)
                  * jnp.repeat(asc, quant.BLOCK, axis=1)).astype(jnp.bfloat16)
            bf = (bq.astype(jnp.float32)
                  * jnp.repeat(bs, quant.BLOCK, axis=0)).astype(jnp.bfloat16)
            return jnp.dot(af, bf, preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)

        t = timing.time_gemm_like(xla_fold, a_q, a_s, b_q, bse, **t_kw)
        report("XLA scale-fold dot", t.seconds, ls)

    if "masked" in rows:
        e, m, n, k = 8, 128, 2048, 512
        print(f"[probe] grouped_masked E{e} {m}x{n}x{k} (swept 66.5%)")
        kb = k // quant.BLOCK
        ls = e * light_speed(m, n, k, 1, 2,
                             extra_bytes=(m * kb + kb * n) * 4)
        a = golden.gen_heavy_tail((e, m, k), seed=0)
        b = golden.gen_heavy_tail((e, k, n), seed=1)
        a_q, a_s = quant.quantize_fp8_act(jnp.asarray(a))
        b_q, b_s = quant.quantize_fp8_weight(jnp.asarray(b))
        bse = jnp.repeat(b_s, quant.BLOCK, axis=2)[:, :, :n]
        mm = jnp.full((e,), m, jnp.int32)

        def perturb(out, a0):
            tap = jax.lax.convert_element_type(
                jnp.sum(out[:1, :1, :1]), jnp.float32) * jnp.float32(1e-30)
            return a0 + tap.astype(a0.dtype)

        for tag, cfg in {
            "swept best 128x2048x512": GemmConfig(128, 2048, 512),
            "full-K 128x1024x512": GemmConfig(128, 1024, 512),
            "wide 128x2048x512 nmajor": GemmConfig(
                128, 2048, 512,
                swizzle=__import__(
                    "deepgemm_ascend_tpu.config",
                    fromlist=["SwizzleDir"]).SwizzleDir.N_MAJOR),
            # Per-expert grid fusion (VERDICT r3 item 4): ec experts per
            # grid step — ec× bigger DMAs, ec× fewer steps. Bitwise-equal
            # scheduling knob (tests/test_grouped_gemm.py).
            "coalesce ec=2 128x2048x512": GemmConfig(
                128, 2048, 512, expert_coalesce=2),
            "coalesce ec=4 128x1024x512": GemmConfig(
                128, 1024, 512, expert_coalesce=4),
            "coalesce ec=8 128x512x512": GemmConfig(
                128, 512, 512, expert_coalesce=8),
        }.items():
            from deepgemm_ascend_tpu.ops.gemm import _interpret_default
            f = (lambda aq, asc, bq, bs, mm=mm, cfg=cfg:
                 gg._grouped_masked_call(mm, aq, asc, bq, bs, config=cfg,
                                         out_dtype=jnp.bfloat16,
                                         interpret=_interpret_default()))
            timed(tag, ls, lambda f=f: timing.time_fn(
                f, (a_q, a_s, b_q, bse), perturb=perturb, **t_kw))

        def xla_einsum(aq, asc, bq, bs):
            af = (aq.astype(jnp.float32)
                  * jnp.repeat(asc, quant.BLOCK, axis=2)[..., None, :]
                  .reshape(e, m, k)).astype(jnp.bfloat16)
            bf = (bq.astype(jnp.float32)
                  * jnp.repeat(bs, quant.BLOCK, axis=1)).astype(jnp.bfloat16)
            return jnp.einsum("emk,ekn->emn", af, bf,
                              preferred_element_type=jnp.float32
                              ).astype(jnp.bfloat16)

        t = timing.time_fn(xla_einsum, (a_q, a_s, b_q, bse),
                           perturb=perturb, **t_kw)
        report("XLA scale-fold einsum (batched)", t.seconds, ls)

    if "primes" in rows:
        for (m, n, k) in [(1279, 5003, 7681), (3511, 6151, 8191),
                          (5119, 6997, 9901)]:
            print(f"[probe] bf16 gemm {m}x{n}x{k} (prime, swept 77-80%)")
            ls = light_speed(m, n, k, 2, 4)
            a = jnp.asarray(golden.gen_heavy_tail((m, k), seed=0),
                            jnp.bfloat16)
            b = jnp.asarray(golden.gen_heavy_tail((k, n), seed=1),
                            jnp.bfloat16)
            from deepgemm_ascend_tpu.tiling import selector
            best = selector.select_config(m, n, k, jnp.bfloat16,
                                          jnp.float32, op="gemm")
            f = lambda x, y, c=best: gemm_with_config(x, y, config=c)
            timed(f"selected {best.block_m}x{best.block_n}x{best.block_k}"
                  f"{' padk' if best.pad_k else ''}", ls,
                  lambda f=f: timing.time_gemm_like(f, a, b, **t_kw))

            k_pad = round_up(k, 128)
            n_pad = round_up(n, 128)

            def padded(x, y, c=best):
                xp = jnp.pad(x, ((0, 0), (0, k_pad - k)))
                yp = jnp.pad(y, ((0, k_pad - k), (0, n_pad - n)))
                return gemm_with_config(xp, yp, config=c)[:, :n]

            timed("in-graph padded K,N (same cfg)", ls,
                  lambda padded=padded: timing.time_gemm_like(
                      padded, a, b, **t_kw))

            def xla_dot(x, y):
                return jnp.dot(x, y, preferred_element_type=jnp.float32)

            t = timing.time_gemm_like(xla_dot, a, b, **t_kw)
            report("XLA native dot", t.seconds, ls)

    if "bf16cube" in rows:
        m = n = k = 4096
        print(f"[probe] bf16 gemm 4096^3 (swept 84.9%)")
        ls = light_speed(m, n, k, 2, 4)
        a = jnp.asarray(golden.gen_heavy_tail((m, k), seed=0), jnp.bfloat16)
        b = jnp.asarray(golden.gen_heavy_tail((k, n), seed=1), jnp.bfloat16)
        from deepgemm_ascend_tpu.tiling import selector
        best = selector.select_config(m, n, k, jnp.bfloat16, jnp.float32,
                                      op="gemm")
        for tag, cfg in {
            f"selected {best.block_m}x{best.block_n}x{best.block_k}": best,
            "256x256x4096 full-K": GemmConfig(256, 256, 4096),
            "512x256x2048": GemmConfig(512, 256, 2048),
            "256x512x2048": GemmConfig(256, 512, 2048),
            "512x512x1024": GemmConfig(512, 512, 1024),
        }.items():
            f = lambda x, y, c=cfg: gemm_with_config(x, y, config=c)
            timed(tag, ls, lambda f=f: timing.time_gemm_like(
                f, a, b, **t_kw))

        def xla_dot(x, y):
            return jnp.dot(x, y, preferred_element_type=jnp.float32)

        t = timing.time_gemm_like(xla_dot, a, b, **t_kw)
        report("XLA native dot", t.seconds, ls)
    return 0


if __name__ == "__main__":
    sys.exit(main())
