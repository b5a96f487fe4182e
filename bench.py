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

Transport-flap hardening (VERDICT r3 item 8): a dead backend produces the
structured failure line within ~4 minutes (short probe watchdog) instead of
hanging; a flap AFTER the correctness gate degrades to the best timing
measured so far (partial-but-real number, rc 0 with a "note") instead of
0.0; each timing call gets one bounded retry with a backend re-init.
"""

import json
import os
import sys
import threading

METRIC = "fp8_gemm_4096_tflops"
PROBE_TIMEOUT_S = 240      # backend init + tiny probe must finish in this
TOTAL_BUDGET_S = 1500      # hard wall for the whole bench
# Mutated as the run progresses; the watchdog emits whatever is here.
STATE = {"value": 0.0, "vs_baseline": 0.0, "gate_ok": False, "configs": 0}
_WATCHDOG = {"timer": None}


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _emit(error: str | None = None, note: str | None = None) -> None:
    line = {"metric": METRIC, "value": round(STATE["value"], 2),
            "unit": "TFLOP/s",
            "vs_baseline": round(STATE["vs_baseline"], 4)}
    if error:
        line["error"] = error
    if note:
        line["note"] = note
    print(json.dumps(line), flush=True)


def _watchdog(seconds: int) -> None:
    """Emit the one JSON line and exit instead of hanging forever if the
    TPU tunnel is down (backend init/compute blocks indefinitely there —
    a structured failure beats a silent stall for the driver). If the
    correctness gate already passed and ≥1 config was timed, the partial
    result is REAL — report it with rc 0 and a note.

    Runs on a daemon THREAD, not SIGALRM: a dead-tunnel RPC blocks the
    main thread inside a C call that never returns to the interpreter, so
    a Python-level signal handler starves forever (measured: an alarm(240)
    never fired in 6+ minutes against the downed tunnel); a timer thread
    fires regardless because the blocked RPC releases the GIL."""

    def fire():
        if STATE["gate_ok"] and STATE["value"] > 0:
            _emit(note=f"partial: watchdog fired after "
                       f"{STATE['configs']} configs (transport flap?)")
            os._exit(0)
        _emit(error=f"watchdog: no result in {seconds}s (TPU tunnel down?)")
        os._exit(2)

    if _WATCHDOG["timer"] is not None:
        _WATCHDOG["timer"].cancel()
    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    _WATCHDOG["timer"] = t


def _is_transport(e: Exception) -> bool:
    """Transport-class error (re-init + retry) vs deterministic rejection
    (skip the config, keep the backend)."""
    s = str(e)
    return any(tok in s for tok in
               ("UNAVAILABLE", "DEADLINE_EXCEEDED", "Connection",
                "connection", "socket", "Socket", "has been deleted"))


def _reinit_backend() -> None:
    """Best-effort backend re-init between retry attempts."""
    import jax
    clears = []
    try:
        clears.append(jax.extend.backend.clear_backends)
    except AttributeError:
        pass
    if getattr(jax, "clear_backends", None):
        clears.append(jax.clear_backends)
    for clear in clears:
        try:
            clear()
            return
        except Exception as e:  # pragma: no cover - version-dependent
            log(f"[bench] backend clear failed: {e}")


def main() -> int:
    _watchdog(PROBE_TIMEOUT_S)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepgemm_ascend_tpu.config import GemmConfig
    from deepgemm_ascend_tpu.bench import timing
    from deepgemm_ascend_tpu.jit import compile_cache

    # Tiny probe with a forced readback: if the tunnel is down this hangs
    # and the short watchdog produces the structured failure in <5 min.
    probe = float(np.asarray(jnp.sum(jnp.ones((8, 128), jnp.float32))))
    log(f"[bench] probe ok ({probe:.0f}); extending watchdog to "
        f"{TOTAL_BUDGET_S}s")
    _watchdog(TOTAL_BUDGET_S - PROBE_TIMEOUT_S
              if TOTAL_BUDGET_S > PROBE_TIMEOUT_S else TOTAL_BUDGET_S)

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
        _emit(error="correctness gate failed")
        return 1
    STATE["gate_ok"] = True

    flops = 2 * M * N * K
    peak = info.peak_bf16_tflops
    # Winners of the on-chip autotune sweeps (autotune_results_r2*/);
    # block_k = K lands on the static-scale-slice kernel. iters=256 keeps
    # the ~30 ms RPC floor under 15% of the measured chain (at iters=32 the
    # floor noise dominated and inflated results by up to +30%).
    # Round-5 targeted sweep: the N_MAJOR swizzle twins of the full-K
    # winners measure ~3% faster (181.7 TF/s = 92.2% at 1024x256x4096
    # N-major, autotune_results_r3) — lead with them, keep the proven
    # M-major winners as fallback.
    from deepgemm_ascend_tpu.config import SwizzleDir
    NM = SwizzleDir.N_MAJOR
    candidates = [GemmConfig(1024, 256, 4096, swizzle=NM),
                  GemmConfig(512, 512, 4096, swizzle=NM),
                  GemmConfig(1024, 256, 4096), GemmConfig(512, 512, 4096),
                  GemmConfig(256, 1024, 4096), GemmConfig(512, 1024, 2048)]
    # Host-side copies: clear_backends() invalidates every device array,
    # so the retry path must re-upload from host data, not reuse handles
    # created on the destroyed backend (self-review r4).
    host = tuple(np.asarray(x) for x in (a_q, a_s, b_q, bse))

    def time_one(cfg, inputs):
        aq, asc, bq, bs = inputs
        fn = lambda a, s_, b, bse_, c=cfg: fp8mod.fp8_gemm_with_config(
            a, s_, b, bse_, config=c)
        t = timing.time_gemm_like(fn, aq, asc, bq, bs, iters=256)
        return t.tflops(flops)

    def reinit_and_reupload(inputs):
        _reinit_backend()
        try:
            return tuple(jnp.asarray(x) for x in host)
        except Exception as up_err:
            log(f"[bench] re-upload failed: {str(up_err)[:80]}")
            return inputs

    rc = _run_candidates(candidates, (a_q, a_s, b_q, bse), time_one,
                         reinit_and_reupload, peak)
    return rc


def _run_candidates(candidates, inputs, time_one, reinit, peak) -> int:
    """Retry/partial-result policy, separated from device plumbing so the
    flap paths are unit-testable (tests/test_scripts.py): per config, one
    bounded retry with backend re-init on TRANSPORT-class errors only;
    deterministic rejections skip the config and keep the live backend;
    a dead transport stops early; any timed result beats reporting 0.0."""
    last_err = None
    for cfg in candidates:
        for attempt in (1, 2):
            try:
                tf = time_one(cfg, inputs)
                log(f"[bench] {cfg.block_m}x{cfg.block_n}x{cfg.block_k}: "
                    f"{tf:.1f} TF/s")
                if tf > STATE["value"]:
                    STATE["value"] = tf
                    STATE["vs_baseline"] = tf / peak
                STATE["configs"] += 1
                last_err = None
                break
            except Exception as e:
                log(f"[bench] {cfg.block_m}x{cfg.block_n}x{cfg.block_k}: "
                    f"attempt {attempt} FAILED {str(e)[:120]}")
                last_err = e
                if not _is_transport(e):
                    # Deterministic compile/shape rejection: skip the
                    # config, keep the live backend and its compiled
                    # kernels (re-init would force recompiling everything
                    # through the tunnel for nothing).
                    break
                if attempt == 1:
                    inputs = reinit(inputs)
        if last_err is not None and _is_transport(last_err):
            log("[bench] transport looks dead after retry — stopping early "
                "with partial results")
            break
    note = None
    if last_err is not None and STATE["value"] > 0:
        kind = ("transport failure" if _is_transport(last_err)
                else "last-config failure")
        note = (f"partial: {STATE['configs']}/{len(candidates)} configs "
                f"timed before {kind}")
    if STATE["value"] <= 0:
        _emit(error=f"all configs failed: {str(last_err)[:120]}")
        return 1
    _emit(note=note)
    return 0


if __name__ == "__main__":
    sys.exit(main())
