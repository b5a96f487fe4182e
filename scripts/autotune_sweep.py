#!/usr/bin/env python
"""Autotune sweep over a shape suite on the local chip.

≙ reference ``framework/benchmark/benchmark.py`` CLI flow (rank-sharded
per-shape sweep, jsonl results, checkpoint resume) with the TPU timing
method. Winners land in the persistent tiling cache (``--cache``), which
``select_config`` loads via ``DGA_CACHE_FILE_PATH``.

Examples:
  python scripts/autotune_sweep.py --suite reference --op gemm
  python scripts/autotune_sweep.py --suite dynamic --op fp8_gemm \
      --max-candidates 24 --rank 0 --world 4
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Honor JAX_PLATFORMS explicitly (CPU smokes / debugging): this image's
# sitecustomize force-registers the TPU plugin and ignores the env var
# alone — same workaround as tests/conftest.py / scripts/serve_bench.py.
if os.environ.get("JAX_PLATFORMS"):
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", default="reference",
                    choices=["reference", "dynamic", "headline", "grouped"])
    ap.add_argument("--op", default="fp8_gemm",
                    choices=["gemm", "gemm_nt", "gemm_tn", "gemm_tt",
                             "fp8_gemm", "fp8_gemm_nt", "int8_gemm",
                             "int8_grouped_gemm_masked",
                             "grouped_gemm_masked",
                             "grouped_gemm_contiguous",
                             "grouped_gemm_masked_nt",
                             "grouped_gemm_contiguous_nt"])
    ap.add_argument("--uneven", action="store_true",
                    help="contiguous grouped: deterministic UNEVEN tokens/"
                         "expert (lognormal split of E*M tokens, layout "
                         "block_m=128) — the BASELINE.md:27 variable-"
                         "tokens-per-expert configuration")
    ap.add_argument("--inject-ksplit", action="store_true",
                    help="add KSPLIT (split-K) variants of the top analytic "
                         "candidates to the dense-gemm sweep — on-chip "
                         "evidence for/against split-K on this part "
                         "(reference stream-K family, select_kernel.cpp:303-331)")
    ap.add_argument("--out-dir", default="autotune_results")
    ap.add_argument("--cache", default=None,
                    help="persistent tiling cache path (default: "
                         "<out-dir>/tilings.jsonl)")
    ap.add_argument("--explore-extra", type=int, default=0,
                    help="stratified off-prefix candidates appended after "
                         "the analytic prefix (predictor training coverage)")
    ap.add_argument("--max-candidates", type=int, default=20,
                    help="analytically-best prefix per shape (cost control; "
                         "the reference burned 5h/shape unpruned)")
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--min-chain", type=float, default=0.25,
                    help="grow iters until the timed chain is at least this "
                         "many seconds (guards µs-kernels against RPC-floor "
                         "jitter)")
    ap.add_argument("--retry-poisoned", action="store_true",
                    help="re-run records previously marked failed (after a "
                         "systematic crash, plain resume replays them)")
    ap.add_argument("--rank", type=int, default=0)
    ap.add_argument("--world", type=int, default=1)
    ap.add_argument("--shapes", nargs="*", type=int, default=None,
                    help="explicit M N K triples (flat list; E M N K "
                         "quadruples for grouped_gemm_masked)")
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    from deepgemm_ascend_tpu.bench import shapes as shape_suites
    from deepgemm_ascend_tpu.bench import timing
    from deepgemm_ascend_tpu.ops import fp8_gemm as fp8mod
    # NB: "from ...ops import gemm" binds the re-exported FUNCTION (it
    # shadows the submodule); import the symbols directly instead.
    from deepgemm_ascend_tpu.ops.gemm import gemm as dense_gemm
    from deepgemm_ascend_tpu.ops.gemm import gemm_with_config
    from deepgemm_ascend_tpu.ops import quant
    from deepgemm_ascend_tpu.tiling import autotune
    from deepgemm_ascend_tpu.tiling.cache import TilingCache
    from deepgemm_ascend_tpu.utils import golden
    from deepgemm_ascend_tpu.utils.common import round_up

    grouped_ops = ("grouped_gemm_masked", "grouped_gemm_contiguous",
                   "grouped_gemm_masked_nt", "grouped_gemm_contiguous_nt",
                   "int8_grouped_gemm_masked")
    if args.shapes:
        flat = args.shapes
        width = 4 if args.op in grouped_ops else 3
        suite = [tuple(flat[i:i + width]) for i in range(0, len(flat), width)]
    else:
        suite = {"reference": shape_suites.REFERENCE_SUITE,
                 "dynamic": shape_suites.DYNAMIC_SWEEP,
                 "headline": [shape_suites.HEADLINE],
                 "grouped": (shape_suites.GROUPED_PREFILL
                             + shape_suites.GROUPED_DECODE)}[args.suite]

    os.makedirs(args.out_dir, exist_ok=True)
    cache = TilingCache(args.cache or os.path.join(args.out_dir,
                                                   "tilings.jsonl"))

    for shape in suite:
        if args.op.startswith("grouped_gemm_contiguous"):
            # (E, M_per_expert, N, K) — BASELINE config 3 (MoE prefill).
            # Runtime cache key: op="grouped_gemm[_nt]", m = the layout
            # block_m (ops/grouped_gemm.py), so the sweep fixes block_m to
            # the layout block and searches bn/bk only. The *_nt variant
            # times DeepGEMM's native (E, N, K) K-major weights through the
            # same private entry the wrapper uses (b_t=True; scale panel
            # pre-expanded outside the timed region, matching the 'n' rows
            # and the dense NT sweep).
            from deepgemm_ascend_tpu.ops import grouped_gemm as gg
            from deepgemm_ascend_tpu.tiling import analytic, platform as plat
            from deepgemm_ascend_tpu.config import GemmConfig
            nt = args.op.endswith("_nt")
            e, m_per, n, k = shape
            if args.uneven:
                # Deterministic lognormal split of E*M tokens (≥1 each),
                # layout block 128 — tile_ids now carry uneven group spans
                # and padding tiles, the structure BASELINE.md:27 names.
                rng = np.random.default_rng(12345)
                w = rng.lognormal(0.0, 1.0, e)
                toks = np.maximum((w / w.sum() * e * m_per).astype(int), 1)
                # Repair the rounding drift to an exact total by walking
                # the largest entries, never below 1 token/expert (a naive
                # toks[0] += deficit can go non-positive when many experts
                # clamp to 1, corrupting the contiguous layout).
                drift = e * m_per - int(toks.sum())
                order = np.argsort(-toks)
                i = 0
                while drift != 0:
                    j = order[i % e]
                    step = 1 if drift > 0 else (-1 if toks[j] > 1 else 0)
                    toks[j] += step
                    drift -= step
                    i += 1
                bm_layout = min(128, m_per)
            else:
                toks = [m_per] * e
                bm_layout = m_per
            m_total, tile_ids_np, _ = gg.make_contiguous_layout(
                [int(t) for t in toks], bm_layout)
            a = golden.gen_heavy_tail((m_total, k), seed=0)
            bshape = (e, n, k) if nt else (e, k, n)
            b = golden.gen_heavy_tail(bshape, seed=1)
            a_q, a_s = quant.quantize_fp8_act(jnp.asarray(a))
            b_q, b_s = quant.quantize_fp8_weight(jnp.asarray(b))
            bs_for_exp = jnp.swapaxes(b_s, 1, 2) if nt else b_s
            bse = jnp.repeat(bs_for_exp.astype(jnp.float32), quant.BLOCK,
                             axis=2)[:, :, :n]
            tile_ids = jnp.asarray(tile_ids_np)

            info = plat.detect()
            triples = analytic.enumerate_candidates(
                bm_layout, n, k, 1, 1, 2, info, quant.BLOCK)
            cands = sorted({(bm_layout, bn, bk) for _, bn, bk in triples})
            cands = [GemmConfig(bm, bn, bk) for bm, bn, bk in cands]
            n_tiles = len(tile_ids_np)

            def time_fn(cfg, a_q=a_q, a_s=a_s, b_q=b_q, bse=bse,
                        tile_ids=tile_ids, nt=nt):
                from deepgemm_ascend_tpu.ops.gemm import _interpret_default
                f = lambda aq, asc, bq, bs: gg._grouped_contiguous_call(
                    tile_ids, aq, asc, bq, bs, config=cfg,
                    out_dtype=jnp.bfloat16, interpret=_interpret_default(),
                    b_t=nt)
                t = timing.time_gemm_like(f, a_q, a_s, b_q, bse,
                                          iters=args.iters, repeats=2,
                                          min_chain_seconds=args.min_chain)
                return t.seconds

            op_key = "grouped_gemm_nt" if nt else "grouped_gemm"
            tag = (f"{args.op}_{e}x{m_per}x{n}x{k}"
                   + ("_uneven" if args.uneven else "") + f"_r{args.rank}")
            tuner = autotune.Autotuner(
                None, time_fn, op=op_key,
                results_path=os.path.join(args.out_dir, f"{tag}.jsonl"),
                checkpoint_path=os.path.join(args.out_dir, f"{tag}.ckpt"),
                cache=cache, rank=args.rank, world=args.world,
                retry_failed=args.retry_poisoned)
            win = tuner.sweep_shape(
                bm_layout, n, k, candidates=cands,
                in_dtype=jnp.float8_e4m3fn, out_dtype=jnp.bfloat16,
                max_candidates=args.max_candidates,
                explore_extra=args.explore_extra, verbose=True,
                flops_scale=n_tiles)
            print(f"[DGA-TPU] contiguous{'-nt' if nt else ''}"
                  f"{'-uneven' if args.uneven else ''} E{e} "
                  f"{m_per}x{n}x{k} winner: {win}")
            continue
        if args.op == "int8_grouped_gemm_masked":
            # (E, M_max, N, K) W8A8 masked grouped — the MoE-decode hot
            # path at the int8 MXU rate (models/moe.Int8ExpertWeights).
            from deepgemm_ascend_tpu.ops import int8_gemm as i8mod
            e, m, n, k = shape
            a = golden.gen_heavy_tail((e, m, k), seed=0)
            b = golden.gen_heavy_tail((e, k, n), seed=1)
            a_q, a_s = quant.quantize_int8(jnp.asarray(a), axis=-1)
            b_q, b_s = quant.quantize_int8(jnp.asarray(b), axis=1)
            masked_m = jnp.full((e,), m, jnp.int32)

            def time_fn(cfg, a_q=a_q, a_s=a_s, b_q=b_q, b_s=b_s,
                        masked_m=masked_m, i8mod=i8mod):
                from deepgemm_ascend_tpu.ops.gemm import _interpret_default
                f = lambda aq, asc, bq, bs, mm=masked_m: \
                    i8mod._int8_grouped_masked_call(
                        mm, aq, asc, bq, bs, config=cfg,
                        out_dtype=jnp.bfloat16,
                        interpret=_interpret_default())

                def perturb(out, a0):
                    import jax
                    # Chain iterations through a value-dependent (but
                    # numerically zero) tap so the scan can't be DCE'd;
                    # the f32→int8 convert still carries the dependency.
                    tap = jax.lax.convert_element_type(
                        jnp.sum(out[:1, :1, :1]),
                        jnp.float32) * jnp.float32(1e-30)
                    return a0 + tap.astype(a0.dtype)

                t = timing.time_fn(f, (a_q, a_s, b_q, b_s),
                                   iters=args.iters, repeats=2,
                                   perturb=perturb,
                                   min_chain_seconds=args.min_chain)
                return t.seconds

            tag = f"{args.op}_{e}x{m}x{n}x{k}_r{args.rank}"
            tuner = autotune.Autotuner(
                None, time_fn, op=args.op,
                results_path=os.path.join(args.out_dir, f"{tag}.jsonl"),
                checkpoint_path=os.path.join(args.out_dir, f"{tag}.ckpt"),
                cache=cache, rank=args.rank, world=args.world,
                retry_failed=args.retry_poisoned)
            win = tuner.sweep_shape(
                m, n, k, in_dtype=jnp.int8, out_dtype=jnp.bfloat16,
                max_candidates=args.max_candidates,
                explore_extra=args.explore_extra, verbose=True,
                flops_scale=e)
            print(f"[DGA-TPU] int8-masked E{e} {m}x{n}x{k} winner: {win}")
            continue
        if args.op.startswith("grouped_gemm_masked"):
            # (E, M_max, N, K) — BASELINE configs 3-4 (MoE prefill/decode).
            from deepgemm_ascend_tpu.ops import grouped_gemm as gg
            nt = args.op.endswith("_nt")
            e, m, n, k = shape
            a = golden.gen_heavy_tail((e, m, k), seed=0)
            b = golden.gen_heavy_tail((e, n, k) if nt else (e, k, n), seed=1)
            a_q, a_s = quant.quantize_fp8_act(jnp.asarray(a))
            b_q, b_s = quant.quantize_fp8_weight(jnp.asarray(b))
            bs_for_exp = jnp.swapaxes(b_s, 1, 2) if nt else b_s
            bse = jnp.repeat(bs_for_exp.astype(jnp.float32), quant.BLOCK,
                             axis=2)[:, :, :n]
            masked_m = jnp.full((e,), m, jnp.int32)

            def time_fn(cfg, a_q=a_q, a_s=a_s, b_q=b_q, bse=bse,
                        masked_m=masked_m, nt=nt):
                from deepgemm_ascend_tpu.ops.gemm import _interpret_default
                f = lambda aq, asc, bq, bs, mm=masked_m: gg._grouped_masked_call(
                    mm, aq, asc, bq, bs, config=cfg,
                    out_dtype=jnp.bfloat16, interpret=_interpret_default(),
                    b_t=nt)

                def perturb(out, a0):
                    import jax
                    tap = jax.lax.convert_element_type(
                        jnp.sum(out[:1, :1, :1]), jnp.float32) * jnp.float32(1e-30)
                    return a0 + tap.astype(a0.dtype)

                t = timing.time_fn(f, (a_q, a_s, b_q, bse),
                                   iters=args.iters, repeats=2,
                                   perturb=perturb,
                                   min_chain_seconds=args.min_chain)
                return t.seconds

            tag = f"{args.op}_{e}x{m}x{n}x{k}_r{args.rank}"
            tuner = autotune.Autotuner(
                None, time_fn, op=args.op,
                results_path=os.path.join(args.out_dir, f"{tag}.jsonl"),
                checkpoint_path=os.path.join(args.out_dir, f"{tag}.ckpt"),
                cache=cache, rank=args.rank, world=args.world,
                retry_failed=args.retry_poisoned)
            win = tuner.sweep_shape(
                m, n, k, in_dtype=jnp.float8_e4m3fn, out_dtype=jnp.bfloat16,
                max_candidates=args.max_candidates,
                explore_extra=args.explore_extra, verbose=True,
                flops_scale=e)
            print(f"[DGA-TPU] grouped{'-nt' if nt else ''} E{e} "
                  f"{m}x{n}x{k} winner: {win}")
            continue
        m, n, k = shape
        candidates = None
        if args.op == "fp8_gemm_nt":
            # DeepGEMM's native NT layout: B stored (n, k) with
            # (n/128, k/128) scales; tiling cached under op=fp8_gemm_nt.
            n2, k2 = round_up(n, 128), round_up(k, 128)
            a = golden.gen_heavy_tail((m, k2), seed=0)
            bt = golden.gen_heavy_tail((n2, k2), seed=1)
            a_q, a_s = quant.quantize_fp8_act(jnp.asarray(a))
            bt_q, bt_s = quant.quantize_fp8_weight(jnp.asarray(bt))
            bse = fp8mod.expand_weight_scales(jnp.swapaxes(bt_s, 0, 1), n2)

            def time_fn(cfg, a_q=a_q, a_s=a_s, bt_q=bt_q, bse=bse):
                f = lambda aq, asc, bq, bs: fp8mod.fp8_gemm_with_config(
                    aq, asc, bq, bs, config=cfg, b_layout="t")
                t = timing.time_gemm_like(f, a_q, a_s, bt_q, bse,
                                          iters=args.iters, repeats=2,
                                          min_chain_seconds=args.min_chain)
                return t.seconds

            in_dtype, m2 = jnp.float8_e4m3fn, m
        elif args.op == "fp8_gemm":
            # fp8 contract: n, k multiples of 128 — pad the sweep shape.
            n2, k2 = round_up(n, 128), round_up(k, 128)
            a = golden.gen_heavy_tail((m, k2), seed=0)
            b = golden.gen_heavy_tail((k2, n2), seed=1)
            a_q, a_s = quant.quantize_fp8_act(jnp.asarray(a))
            b_q, b_s = quant.quantize_fp8_weight(jnp.asarray(b))
            bse = fp8mod.expand_weight_scales(b_s, n2)

            def time_fn(cfg, a_q=a_q, a_s=a_s, b_q=b_q, bse=bse):
                f = lambda aq, asc, bq, bs: fp8mod.fp8_gemm_with_config(
                    aq, asc, bq, bs, config=cfg)
                t = timing.time_gemm_like(f, a_q, a_s, b_q, bse,
                                          iters=args.iters, repeats=2,
                                          min_chain_seconds=args.min_chain)
                return t.seconds

            in_dtype, m2 = jnp.float8_e4m3fn, m
        elif args.op == "int8_gemm":
            # W8A8: per-token × per-channel scales (ops/int8_gemm.py) —
            # the MXU's 394-TOPS int8 path, 2× the bf16/fp8 rate.
            from deepgemm_ascend_tpu.ops import int8_gemm as i8mod
            n2, k2 = round_up(n, 128), round_up(k, 128)
            a = golden.gen_heavy_tail((m, k2), seed=0)
            b = golden.gen_heavy_tail((k2, n2), seed=1)
            a_q, a_s = quant.quantize_int8(jnp.asarray(a), axis=-1)
            b_q, b_s = quant.quantize_int8(jnp.asarray(b), axis=0)

            def time_fn(cfg, a_q=a_q, a_s=a_s, b_q=b_q, b_s=b_s,
                        i8mod=i8mod):
                f = lambda aq, asc, bq, bs: i8mod.int8_gemm_with_config(
                    aq, asc, bq, bs, config=cfg)
                t = timing.time_gemm_like(f, a_q, a_s, b_q, b_s,
                                          iters=args.iters, repeats=2,
                                          min_chain_seconds=args.min_chain)
                return t.seconds

            in_dtype, m2 = jnp.int8, m
        else:
            # Dense bf16 in any storage layout: op "gemm" / "gemm_nt" /
            # "gemm_tn" / "gemm_tt" (≙ the reference's 4-way layout
            # dispatch, do_tiling.h:24-26 — each layout gets its own sweep
            # records, cache keys, and calibration entry).
            layout = args.op[5:] if args.op.startswith("gemm_") else "nn"
            a_shape = (k, m) if layout[0] == "t" else (m, k)
            b_shape = (n, k) if layout[1] == "t" else (k, n)
            a = jnp.asarray(golden.gen_heavy_tail(a_shape, seed=0),
                            jnp.bfloat16)
            b = jnp.asarray(golden.gen_heavy_tail(b_shape, seed=1),
                            jnp.bfloat16)

            def time_fn(cfg, a=a, b=b, layout=layout):
                f = lambda x, y: gemm_with_config(x, y, config=cfg,
                                                  layout=layout)
                t = timing.time_gemm_like(f, a, b, iters=args.iters,
                                          repeats=2,
                                          min_chain_seconds=args.min_chain)
                return t.seconds

            in_dtype, m2, n2, k2 = jnp.bfloat16, m, n, k
            if args.inject_ksplit:
                # Split-K evidence run: append KSPLIT variants of the top
                # analytic candidates so the sweep records on-chip numbers
                # for the family (v5e has ONE sequential TensorCore —
                # expectation is that split-K only adds reduce traffic; this
                # sweep turns that expectation into jsonl evidence).
                from deepgemm_ascend_tpu.config import (GemmConfig,
                                                        KernelType)
                from deepgemm_ascend_tpu.tiling import (analytic,
                                                        platform as plat)
                info = plat.detect()
                triples = analytic.enumerate_candidates(m, n, k, 2, 2, 4,
                                                        info, 128)
                triples.sort(key=lambda t: analytic.estimate_time(
                    m, n, k, *t, 2, 2, 4, info, jnp.bfloat16,
                    op="gemm").time_s)
                candidates = [GemmConfig(bm, bn, bk)
                              for bm, bn, bk in triples[:6]]
                for bm, bn, bk in triples[:3]:
                    for s in (2, 4, 8):
                        from deepgemm_ascend_tpu.utils.common import ceil_div
                        if ceil_div(k, bk) >= s:
                            candidates.append(GemmConfig(
                                bm, bn, bk, kernel_type=KernelType.KSPLIT,
                                k_split=s))

        tag = f"{args.op}_{m}x{n}x{k}_r{args.rank}"
        tuner = autotune.Autotuner(
            None, time_fn, op=args.op,
            results_path=os.path.join(args.out_dir, f"{tag}.jsonl"),
            checkpoint_path=os.path.join(args.out_dir, f"{tag}.ckpt"),
            cache=cache, rank=args.rank, world=args.world,
                retry_failed=args.retry_poisoned)
        win = tuner.sweep_shape(
            m2, n2, k2, in_dtype=in_dtype, candidates=candidates,
            out_dtype=(jnp.bfloat16
                       if args.op.startswith(("fp8_gemm", "int8_gemm"))
                       else jnp.float32),
            # The ksplit-evidence list is hand-ordered — don't let the
            # analytic re-sort (which can't price the reduce epilogue)
            # truncate it.
            max_candidates=(None if candidates is not None
                            else args.max_candidates),
            explore_extra=(0 if candidates is not None
                           else args.explore_extra),
            verbose=True)
        print(f"[DGA-TPU] {m}x{n}x{k} winner: {win}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
