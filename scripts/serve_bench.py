#!/usr/bin/env python
"""Serving throughput benchmark: MoE decode tokens/s (+ scaling harness).

Covers the BASELINE serving config's measurement side:

* ``--mode scan``   — device-side greedy decode loop (one dispatch for N
  steps via ``lax.scan``): peak decode throughput of the compiled model.
* ``--mode engine`` — the continuous-batching engine end-to-end (host
  scheduling + per-step dispatch): serving-realistic tokens/s.
* ``--mode scaling`` — tokens/s of the sharded dp/ep/tp decode step at
  1 device vs N devices and the scaling efficiency. On this rig it runs on
  a virtual CPU mesh (no multi-chip hardware) — numerically meaningless for
  absolute throughput but it IS the measurement harness a real pod runs,
  and it validates that sharded tokens/s accounting works end-to-end.

Prints ONE JSON line per mode.

Examples:
  python scripts/serve_bench.py --mode scan --model v2_lite --batch 64 --steps 64
  python scripts/serve_bench.py --mode engine --model tiny
  python scripts/serve_bench.py --mode scaling --devices 8
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _params_for(args, cfg):
    """init_params + optional W8A8 expert conversion (--expert-quant)."""
    import jax

    from deepgemm_ascend_tpu.models import (init_params,
                                            params_with_int8_experts)
    params = init_params(jax.random.PRNGKey(0), cfg)
    if getattr(args, "expert_quant", "fp8") == "int8":
        params = params_with_int8_experts(params)
    return params


def _scan_mode(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepgemm_ascend_tpu.bench.timing import _rpc_floor
    from deepgemm_ascend_tpu.models import (TINY, V2_LITE,
                                            generate_greedy_scan,
                                            init_cache, init_params)

    cfg = {"tiny": TINY, "v2_lite": V2_LITE}[args.model]
    params = _params_for(args, cfg)
    caches = init_cache(cfg, args.batch,
                        max_seq=args.max_seq or args.steps + 8)
    toks = jnp.zeros((args.batch,), jnp.int32)
    lens = jnp.zeros((args.batch,), jnp.int32)

    @jax.jit
    def run(params, toks, caches, lens):
        out, _ = generate_greedy_scan(params, toks, caches, lens, cfg,
                                      steps=args.steps)
        return jnp.sum(out)

    float(run(params, toks, caches, lens))  # compile + warm
    floor = _rpc_floor()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(params, toks, caches, lens))  # readback forces completion
        best = min(best, time.perf_counter() - t0)
    secs = max(best - floor, 1e-9)
    tps = args.batch * args.steps / secs
    print(json.dumps({
        "metric": "moe_decode_tokens_per_s", "mode": "scan",
        "expert_quant": args.expert_quant,
        "model": args.model, "batch": args.batch, "steps": args.steps,
        "max_seq": args.max_seq or args.steps + 8,
        "flash_decode": cfg.use_flash_decode,
        "tokens_per_s": round(tps, 1),
        "ms_per_step": round(secs / args.steps * 1e3, 3),
    }))


def _engine_mode(args):
    import jax

    from deepgemm_ascend_tpu.models import TINY, V2_LITE, init_params
    from deepgemm_ascend_tpu.serving import Engine

    cfg = {"tiny": TINY, "v2_lite": V2_LITE}[args.model]
    params = _params_for(args, cfg)
    prompts = [[1, 2, 3]] * args.batch
    draft_fn = None
    if args.speculative_k and args.spec_oracle:
        # ORACLE drafting: record each slot's greedy continuation with a
        # SPEC engine first (so the recording is the verify program's OWN
        # argmaxes — recording with the plain engine instead measures
        # 0.17 accept on chip, because the plain flash-decode kernel and
        # the verify prefill-window kernel round near-ties differently on
        # a random-weight model's flat logits), then draft exactly those
        # tokens. This measures the CEILING of the verify machinery:
        # tokens/s at best-achievable drafting, independent of the
        # text-dependent accept rate that prompt-lookup gets (meaningless
        # on random weights).
        rec = Engine(params, cfg, max_slots=args.batch,
                     max_seq_len=args.steps + 16,
                     speculative_k=args.speculative_k)
        recorded = rec.generate(prompts, max_new_tokens=args.steps)
        del rec

        def draft_fn(slot, hist, k, _rec=recorded, _plen=len(prompts[0])):
            seq = _rec[slot % len(_rec)]
            pos = len(hist) - _plen
            cont = list(seq[max(pos, 0):pos + k])
            pad = cont[-1] if cont else (hist[-1] if hist else 0)
            return (cont + [pad] * k)[:k]

    eng = Engine(params, cfg, max_slots=args.batch,
                 max_seq_len=args.steps + 16,
                 decode_chunk=args.decode_chunk,
                 speculative_k=args.speculative_k,
                 draft_fn=draft_fn)
    from deepgemm_ascend_tpu.utils.logging import metrics as _metrics
    eng.generate(prompts, max_new_tokens=8)   # warm compiles
    # Full reset: a missed decode_tokens here inflates tokens_per_s (the
    # warmup's tokens divided by only the measured run's time), and the
    # global metrics carry the warmup's spec proposals.
    eng.stats.update(decode_steps=0, tokens_out=0, decode_time_s=0.0,
                     decode_tokens=0, decode_slot_steps=0)
    _metrics.reset()
    eng.generate(prompts, max_new_tokens=args.steps)
    snap = _metrics.snapshot()
    print(json.dumps({
        "metric": "moe_decode_tokens_per_s", "mode": "engine",
        "expert_quant": args.expert_quant,
        "speculative_k": args.speculative_k,
        "spec_drafting": (("oracle" if args.spec_oracle else "prompt_lookup")
                          if args.speculative_k else None),
        "spec_accept_rate": (
            round(snap.get("engine.spec_accepted", 0)
                  / max(snap.get("engine.spec_proposed", 0), 1), 3)
            if args.speculative_k else None),
        "model": args.model, "slots": args.batch,
        "decode_chunk": args.decode_chunk,
        "tokens_per_s": round(eng.tokens_per_second, 1),
        "decode_steps": eng.stats["decode_steps"],
    }))


def _chunksweep_mode(args):
    """Quantify the decode_chunk tradeoff (VERDICT r2 weak #8): staggered
    request lengths expose the ≤N−1 wasted steps per finished request and
    the ≤N-step admission latency. Utilization = decode tokens emitted
    over decode slot-steps executed."""
    import jax

    from deepgemm_ascend_tpu.models import TINY, V2_LITE, init_params
    from deepgemm_ascend_tpu.serving import Engine

    cfg = {"tiny": TINY, "v2_lite": V2_LITE}[args.model]
    params = init_params(jax.random.PRNGKey(0), cfg)
    for chunk in (1, 2, 4, 8, 16):
        eng = Engine(params, cfg, max_slots=args.batch,
                     max_seq_len=args.steps + 24, decode_chunk=chunk)
        prompts = [[1, 2, 3]] * args.batch
        # Staggered lengths: request i stops after steps/2 + i·Δ tokens.
        lens = [args.steps // 2
                + (i * (args.steps // 2)) // max(args.batch - 1, 1)
                for i in range(args.batch)]
        eng.generate(prompts, max_new_tokens=8)   # warm compiles
        eng.stats.update(decode_steps=0, tokens_out=0, decode_tokens=0,
                         decode_time_s=0.0, decode_slot_steps=0)
        ids = [eng.scheduler.submit(p, n) for p, n in zip(prompts, lens)]
        t0 = time.perf_counter()
        while eng.scheduler.has_work:
            eng.step()
        wall = time.perf_counter() - t0
        for i in ids:
            eng.scheduler.pop_result(i)
        print(json.dumps({
            "metric": "decode_chunk_tradeoff", "mode": "chunksweep",
            "model": args.model, "slots": args.batch,
            "decode_chunk": chunk,
            "tokens_per_s_decode": round(eng.tokens_per_second, 1),
            "tokens_per_s_wall": round(sum(lens) / wall, 1),
            "utilization": round(
                eng.stats["decode_tokens"]
                / max(eng.stats["decode_slot_steps"], 1), 3),
            "decode_steps": eng.stats["decode_steps"],
        }))


def _mixed_mode(args):
    """Mixed prefill+decode throughput with ≥4 concurrent admissions per
    step (VERDICT r2 item 6 done-criterion): 2×slots requests so slots
    recycle mid-run; batched admission keeps dispatches O(buckets)."""
    import jax

    from deepgemm_ascend_tpu.models import TINY, V2_LITE, init_params
    from deepgemm_ascend_tpu.serving import Engine
    from deepgemm_ascend_tpu.utils.logging import metrics

    cfg = {"tiny": TINY, "v2_lite": V2_LITE}[args.model]
    params = init_params(jax.random.PRNGKey(0), cfg)
    eng = Engine(params, cfg, max_slots=args.batch,
                 max_seq_len=args.steps + 40,
                 decode_chunk=args.decode_chunk)
    n_req = 2 * args.batch
    prompts = [[(i * 3 + j) % cfg.vocab_size for j in range(24)]
               for i in range(n_req)]                   # one bucket (32)
    eng.generate(prompts[:args.batch], max_new_tokens=4)   # warm
    eng.stats.update(decode_steps=0, tokens_out=0, decode_tokens=0,
                     decode_time_s=0.0, prefills=0)
    metrics.reset()
    ids = [eng.scheduler.submit(p, args.steps) for p in prompts]
    t0 = time.perf_counter()
    while eng.scheduler.has_work:
        eng.step()
    wall = time.perf_counter() - t0
    total = sum(len(eng.scheduler.pop_result(i).output) for i in ids)
    snap = metrics.snapshot()
    print(json.dumps({
        "metric": "mixed_prefill_decode_tokens_per_s", "mode": "mixed",
        "model": args.model, "slots": args.batch, "requests": n_req,
        "decode_chunk": args.decode_chunk,
        "tokens_per_s_wall": round(total / wall, 1),
        "prefills": eng.stats["prefills"],
        "prefill_dispatches": int(snap.get("engine.prefill_dispatches", 0)),
    }))


def _prefix_mode(args):
    """Prefix-caching admission latency: R requests sharing a long system
    prompt, admitted in ONE batched step, cold engine vs warm
    (prefix_cache_slots). The warm engine prefills only the per-request
    suffix window (16 tokens here) instead of the full prompt bucket —
    the wall gap is the shared-prefix compute saved; tokens_reused is the
    exact accounting. The warm wave costs one prefill dispatch plus ONE
    batched row-copy dispatch (all hits in a group share it) vs the cold
    wave's single prefill dispatch — at chip-scale prompts the saved
    prefill compute dwarfs the one extra RPC round trip, but the
    reported speedup is conservative by that constant."""
    import jax

    from deepgemm_ascend_tpu.models import TINY, V2_LITE, init_params
    from deepgemm_ascend_tpu.serving import Engine
    from deepgemm_ascend_tpu.utils.logging import metrics

    cfg = {"tiny": TINY, "v2_lite": V2_LITE}[args.model]
    params = init_params(jax.random.PRNGKey(0), cfg)
    sys_len = (max(32, min((args.max_seq or 512) - 32, 992)) // 16) * 16
    system = [(i * 7 + 1) % cfg.vocab_size for i in range(sys_len)]
    n_req = args.batch
    prompts = [system + [(i * 13 + j) % cfg.vocab_size for j in range(4)]
               for i in range(n_req)]

    def run(prefix_slots):
        eng = Engine(params, cfg, max_slots=n_req,
                     max_seq_len=sys_len + 64,
                     prefix_cache_slots=prefix_slots)
        eng.generate([prompts[0]], max_new_tokens=1)   # compile + seed

        def wave():
            metrics.reset()
            ids = [eng.scheduler.submit(p, 1) for p in prompts]
            t0 = time.perf_counter()
            eng.step()                  # ONE batched admission dispatch
            wall = time.perf_counter() - t0
            while eng.scheduler.has_work:   # max_new=1: usually done
                eng.step()
            for i in ids:
                eng.scheduler.pop_result(i)
            return wall, metrics.snapshot()

        wave()                          # compiles the (bucket, S) program
        return wave()                   # measured: steady-state

    cold_wall, _ = run(0)
    warm_wall, snap = run(4)
    print(json.dumps({
        "metric": "prefix_cache_admission_speedup", "mode": "prefix",
        "model": args.model, "requests": n_req, "system_tokens": sys_len,
        "cold_admission_s": round(cold_wall, 4),
        "warm_admission_s": round(warm_wall, 4),
        "speedup": round(cold_wall / max(warm_wall, 1e-9), 2),
        "prefix_hits": int(snap.get("engine.prefix_hits", 0)),
        "tokens_reused": int(snap.get("engine.prefix_tokens_reused", 0)),
    }))


def _scaling_mode(args):
    # Force a CPU mesh BEFORE jax initializes a backend.
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count="
                                 f"{args.devices}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from deepgemm_ascend_tpu.models import TINY, init_cache, init_params
    from deepgemm_ascend_tpu.parallel import (make_mesh,
                                              make_sharded_decode_step,
                                              shard_caches, shard_params)

    cfg = TINY
    params = init_params(jax.random.PRNGKey(0), cfg)

    def tps_at(ndev: int) -> float:
        batch = max(args.batch, ndev)
        mesh = make_mesh(dp=ndev, ep=1, tp=1, devices=jax.devices()[:ndev])
        p = shard_params(mesh, params, cfg)
        c = shard_caches(mesh, init_cache(cfg, batch, max_seq=args.steps + 8))
        step = make_sharded_decode_step(mesh, cfg, params)
        toks = jnp.zeros((batch,), jnp.int32)
        lens = jnp.zeros((batch,), jnp.int32)
        logits, c = step(p, toks, c, lens)  # compile
        logits.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(args.steps):
            logits, c = step(p, toks, c, lens)
            lens = lens + 1
        logits.block_until_ready()
        return batch * args.steps / (time.perf_counter() - t0)

    t1 = tps_at(1)
    tn = tps_at(args.devices)
    eff = tn / (t1 * args.devices)
    print(json.dumps({
        "metric": "decode_scaling_efficiency", "mode": "scaling",
        "devices": args.devices, "backend": "cpu-virtual",
        "tokens_per_s_1dev": round(t1, 1),
        "tokens_per_s_ndev": round(tn, 1),
        "efficiency": round(eff, 3),
        "note": ("virtual CPU mesh — harness validation, not ICI "
                 "performance; run on a pod for the real number"),
    }))


def main(argv=None) -> int:
    # Honor JAX_PLATFORMS explicitly: this image's sitecustomize
    # force-registers the TPU plugin and ignores the env var alone
    # (same workaround as tests/conftest.py / scripts/xla_matmul.py).
    if os.environ.get("JAX_PLATFORMS"):
        import jax
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="scan",
                    choices=["scan", "engine", "scaling", "chunksweep",
                             "mixed", "prefix"])
    ap.add_argument("--model", default="v2_lite", choices=["tiny", "v2_lite"])
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--decode-chunk", type=int, default=1,
                    help="engine mode: decode N tokens per dispatch")
    ap.add_argument("--max-seq", type=int, default=0,
                    help="KV cache length (scan mode; 0 = steps+8). Use a "
                         "realistic value (2048/4096) to expose attention "
                         "cache-bandwidth cost")
    ap.add_argument("--expert-quant", choices=["fp8", "int8"], default="fp8",
                    help="scan/engine modes: run the MoE experts as W8A8 "
                         "int8 (2x MXU rate; models.params_with_int8_experts)")
    ap.add_argument("--speculative-k", type=int, default=0,
                    help="engine mode: greedy speculative decoding with k "
                         "prompt-lookup drafts per dispatch (lossless)")
    ap.add_argument("--spec-oracle", action="store_true",
                    help="engine mode with --speculative-k: draft the "
                         "recorded greedy continuation instead of prompt "
                         "lookup — measures the verify machinery's ceiling "
                         "(accept rate bounded only by cross-kernel "
                         "rounding), not the text-dependent accept rate")
    args = ap.parse_args(argv)
    {"scan": _scan_mode, "engine": _engine_mode,
     "scaling": _scaling_mode, "chunksweep": _chunksweep_mode,
     "mixed": _mixed_mode, "prefix": _prefix_mode}[args.mode](args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
