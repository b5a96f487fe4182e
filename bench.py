#!/usr/bin/env python
"""Headline benchmark: FP8 blockwise-scaled GEMM at 4096³ on one chip.

Prints ONE JSON line:
  {"metric": "fp8_gemm_4096_tflops", "value": <TFLOP/s>, "unit": "TFLOP/s",
   "vs_baseline": <fraction of the v5e MXU bf16 roofline (197 TF/s)>}

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is the
roofline fraction the north star targets (≥ 0.85). Timing uses the
readback-safe scan-chain method (deepgemm_ascend_tpu/bench/timing.py);
correctness is gated first against the emulated-dequant golden with the
reference's outlier-ratio acceptance. Diagnostics go to stderr; stdout gets
exactly one line.
"""

import json
import os
import signal
import sys


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _watchdog(seconds: int = 1500) -> None:
    """Emit the one JSON line and exit instead of hanging forever if the
    TPU tunnel is down (backend init/compute blocks indefinitely there —
    a structured failure beats a silent stall for the driver)."""

    def fire(signum, frame):
        print(json.dumps({"metric": "fp8_gemm_4096_tflops", "value": 0.0,
                          "unit": "TFLOP/s", "vs_baseline": 0.0,
                          "error": f"watchdog: no result in {seconds}s "
                                   f"(TPU tunnel down?)"}), flush=True)
        os._exit(2)

    signal.signal(signal.SIGALRM, fire)
    signal.alarm(seconds)


def main() -> int:
    _watchdog()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepgemm_ascend_tpu.config import GemmConfig
    from deepgemm_ascend_tpu.bench import timing
    from deepgemm_ascend_tpu.jit import compile_cache

    try:  # kernels persist across runs (≙ the reference's on-disk fatbins)
        compile_cache.enable_persistent_cache()
    except Exception as e:
        log(f"[bench] persistent cache unavailable: {e}")
    from deepgemm_ascend_tpu.ops import fp8_gemm as fp8mod
    from deepgemm_ascend_tpu.ops import quant, reference
    from deepgemm_ascend_tpu.tiling import platform as plat
    from deepgemm_ascend_tpu.utils import golden, verify

    info = plat.detect()
    log(f"[bench] backend={jax.default_backend()} device={info.device_kind} "
        f"peak_bf16={info.peak_bf16_tflops} TF/s")

    M = N = K = 4096
    a = golden.gen_heavy_tail((M, K), seed=0)
    b = golden.gen_heavy_tail((K, N), seed=1)
    a_q, a_s = quant.quantize_fp8_act(jnp.asarray(a))
    b_q, b_s = quant.quantize_fp8_weight(jnp.asarray(b))
    bse = fp8mod.expand_weight_scales(b_s, N)

    # Correctness gate (reference acceptance form: outlier ratio ≤ 1e-4)
    # on a slice to keep the f64 golden cheap.
    rows = 512
    out = fp8mod.fp8_gemm_with_config(
        a_q[:rows], a_s[:rows], b_q, bse, config=GemmConfig(256, 512, 1024))
    ref = reference.fp8_gemm_reference(
        np.asarray(a_q[:rows]), np.asarray(a_s[:rows]),
        np.asarray(b_q), np.asarray(b_s))
    res = verify.verify(np.asarray(out, np.float32), ref,
                        rtol=1e-2, atol=1e-2, max_ratio=1e-4)
    log(f"[bench] correctness: ok={res.ok} ratio={res.mismatch_ratio:.2e}")
    if not res.ok:
        print(json.dumps({"metric": "fp8_gemm_4096_tflops", "value": 0.0,
                          "unit": "TFLOP/s", "vs_baseline": 0.0,
                          "error": "correctness gate failed"}))
        return 1

    flops = 2 * M * N * K
    # Winners of the on-chip autotune sweeps (autotune_results_r2*/);
    # block_k = K lands on the static-scale-slice kernel. iters=256 keeps
    # the ~30 ms RPC floor under 15% of the measured chain (at iters=32 the
    # floor noise dominated and inflated results by up to +30%).
    candidates = [GemmConfig(1024, 256, 4096), GemmConfig(512, 512, 4096),
                  GemmConfig(256, 1024, 4096), GemmConfig(512, 1024, 2048)]
    best_tf = 0.0
    for cfg in candidates:
        try:
            fn = lambda aq, asc, bq, bs, c=cfg: fp8mod.fp8_gemm_with_config(
                aq, asc, bq, bs, config=c)
            t = timing.time_gemm_like(fn, a_q, a_s, b_q, bse, iters=256)
            tf = t.tflops(flops)
            log(f"[bench] {cfg.block_m}x{cfg.block_n}x{cfg.block_k}: "
                f"{t.seconds*1e3:.3f} ms = {tf:.1f} TF/s")
            best_tf = max(best_tf, tf)
        except Exception as e:  # config failed to compile — skip
            log(f"[bench] {cfg.block_m}x{cfg.block_n}x{cfg.block_k}: "
                f"FAILED {str(e)[:100]}")
    peak = info.peak_bf16_tflops
    print(json.dumps({
        "metric": "fp8_gemm_4096_tflops",
        "value": round(best_tf, 2),
        "unit": "TFLOP/s",
        "vs_baseline": round(best_tf / peak, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
