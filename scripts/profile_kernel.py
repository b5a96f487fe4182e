#!/usr/bin/env python
"""Standalone single-kernel profiling CLI.

≙ the reference's ``benchmark_msprof`` bbit binary + ``msprof op`` wrapping
(``benchmark_msprof/main.cpp:20-94``, ``benchmark.py:400-418``): run exactly
one GEMM configuration, report its kernel time / TFLOP/s / roofline
fraction, and optionally dump a ``jax.profiler`` trace (the TPU replacement
for msprof's kernel-duration parse — open the trace in Perfetto/TensorBoard
for pipe-level detail, ≙ ``--aic-metrics=PipeUtilization``).

Examples:
  python scripts/profile_kernel.py --op fp8_gemm -m 4096 -n 4096 -k 4096 \
      --block 512 512 4096 --iters 256
  python scripts/profile_kernel.py --op gemm -m 5119 -n 6997 -k 9901 \
      --trace-dir /tmp/dga_trace
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--op", default="fp8_gemm",
                    choices=["gemm", "fp8_gemm"])
    ap.add_argument("-m", type=int, required=True)
    ap.add_argument("-n", type=int, required=True)
    ap.add_argument("-k", type=int, required=True)
    ap.add_argument("--block", nargs=3, type=int, default=None,
                    metavar=("BM", "BN", "BK"),
                    help="explicit tile (default: selector decision)")
    ap.add_argument("--k-split", type=int, default=1)
    ap.add_argument("--iters", type=int, default=128)
    ap.add_argument("--min-chain", type=float, default=0.25,
                    help="grow iters until the timed chain is at least this "
                         "many seconds (µs-kernels vs RPC-floor jitter)")
    ap.add_argument("--trace-dir", default=None,
                    help="dump a jax.profiler trace here (one timed rep)")
    ap.add_argument("--check", action="store_true",
                    help="gate against the golden model first")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepgemm_ascend_tpu.config import GemmConfig, KernelType
    from deepgemm_ascend_tpu.bench import timing
    from deepgemm_ascend_tpu.ops import fp8_gemm as fp8mod
    # NB: "from ...ops import gemm" binds the re-exported FUNCTION (it
    # shadows the submodule); import the symbols directly instead.
    from deepgemm_ascend_tpu.ops.gemm import gemm as dense_gemm
    from deepgemm_ascend_tpu.ops.gemm import gemm_with_config
    from deepgemm_ascend_tpu.ops import quant, reference
    from deepgemm_ascend_tpu.tiling import platform as plat
    from deepgemm_ascend_tpu.utils import golden, verify

    m, n, k = args.m, args.n, args.k
    info = plat.detect()
    print(f"[profile] backend={jax.default_backend()} "
          f"device={info.device_kind}")

    cfg = None
    if args.block:
        bm, bn, bk = args.block
        cfg = GemmConfig(bm, bn, bk,
                         kernel_type=(KernelType.KSPLIT if args.k_split > 1
                                      else KernelType.COMMON),
                         k_split=args.k_split)

    if args.op == "fp8_gemm":
        a = golden.gen_heavy_tail((m, k), seed=0)
        b = golden.gen_heavy_tail((k, n), seed=1)
        a_q, a_s = quant.quantize_fp8_act(jnp.asarray(a))
        b_q, b_s = quant.quantize_fp8_weight(jnp.asarray(b))
        bse = fp8mod.expand_weight_scales(b_s, n)
        fn = (lambda aq, asc, bq, bs: fp8mod.fp8_gemm(
            aq, asc, bq, bs, config=cfg, b_scales_expanded=True))
        call_args = (a_q, a_s, b_q, bse)
        if args.check:
            rows = min(m, 512)
            out = fn(a_q[:rows], a_s[:rows], b_q, bse)
            ref = reference.fp8_gemm_reference(
                np.asarray(a_q[:rows]), np.asarray(a_s[:rows]),
                np.asarray(b_q), np.asarray(b_s))
            res = verify.verify(np.asarray(out, np.float32), ref,
                                rtol=1e-2, atol=1e-2, max_ratio=1e-4)
            print(f"[profile] correctness: ok={res.ok} "
                  f"ratio={res.mismatch_ratio:.2e}")
            if not res.ok:
                return 1
    else:
        a = jnp.asarray(golden.gen_heavy_tail((m, k), seed=0), jnp.bfloat16)
        b = jnp.asarray(golden.gen_heavy_tail((k, n), seed=1), jnp.bfloat16)
        fn = lambda x, y: dense_gemm(x, y, config=cfg)
        call_args = (a, b)
        if args.check:
            ref = jnp.matmul(a, b, preferred_element_type=jnp.float32)
            res = verify.verify(np.asarray(fn(a, b), np.float32),
                                np.asarray(ref), rtol=1e-3, atol=1e-2,
                                max_ratio=1e-4)
            print(f"[profile] correctness: ok={res.ok} "
                  f"ratio={res.mismatch_ratio:.2e}")
            if not res.ok:
                return 1

    t = timing.time_gemm_like(fn, *call_args, iters=args.iters, repeats=3,
                              min_chain_seconds=args.min_chain)
    flops = 2.0 * m * n * k
    peak = info.peak_flops(call_args[0].dtype) / 1e12
    tf = t.tflops(flops)
    print(f"[profile] {args.op} {m}x{n}x{k} cfg={cfg or 'auto'}: "
          f"{t.seconds*1e6:.1f} us  {tf:.1f} TF/s  "
          f"({100 * tf / peak:.1f}% of {peak:.0f} TF/s peak)")

    if args.trace_dir:
        with jax.profiler.trace(args.trace_dir):
            out = fn(*call_args)
            np.asarray(out[:1, :1])  # readback forces completion
        print(f"[profile] trace written to {args.trace_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
