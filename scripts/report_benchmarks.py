#!/usr/bin/env python
"""Render autotune sweep results into a benchmark report.

≙ the reference's missing results story (it ships benchmark infrastructure
but publishes no numbers — BASELINE.md): this tool turns the sweep jsonl
records (tiling/autotune.py SweepResult lines) into a markdown table of
best-config throughput per shape vs the device roofline.

  python scripts/report_benchmarks.py autotune_results/*.jsonl \
      --out docs/BENCHMARKS.md --device "tpu v5e"
"""

import argparse
import glob
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="+")
    ap.add_argument("--out", default=None, help="write markdown here")
    ap.add_argument("--device", default=None,
                    help="device label (default: detected)")
    args = ap.parse_args(argv)

    if args.device:
        os.environ.setdefault("DGA_DEVICE", args.device)
    from deepgemm_ascend_tpu.bench import records as recmod
    from deepgemm_ascend_tpu.bench.roofline import gemm_roofline
    from deepgemm_ascend_tpu.tiling import platform as plat

    info = plat.detect()
    device = args.device or info.device_kind
    op_dtypes = {"gemm": ("bfloat16", "float32"),
                 "int8_gemm": ("int8", "bfloat16"),
                 "int8_grouped_gemm": ("int8", "bfloat16"),
                 "int8_grouped_gemm_masked": ("int8", "bfloat16"),
                 "gemm_nt": ("bfloat16", "float32"),
                 "gemm_tn": ("bfloat16", "float32"),
                 "gemm_tt": ("bfloat16", "float32"),
                 "fp8_gemm": ("float8_e4m3fn", "bfloat16"),
                 "fp8_gemm_nt": ("float8_e4m3fn", "bfloat16"),
                 "grouped_gemm": ("float8_e4m3fn", "bfloat16"),
                 "grouped_gemm_masked": ("float8_e4m3fn", "bfloat16"),
                 "grouped_masked": ("float8_e4m3fn", "bfloat16"),
                 "grouped_gemm_nt": ("float8_e4m3fn", "bfloat16"),
                 "grouped_gemm_masked_nt": ("float8_e4m3fn", "bfloat16")}

    best = {}
    by_key = defaultdict(list)   # key -> all plausible records
    counts = defaultdict(int)
    for pattern in args.files:
        for path in sorted(glob.glob(pattern)):
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        r = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    if "m" not in r or "config" not in r:
                        continue  # tiling-cache lines share the dir
                    key = (r.get("op", "gemm"), r["m"], r["n"], r["k"])
                    counts[key] += 1
                    ok = recmod.plausible(r, info)  # screens corrupt timing
                    if ok:
                        by_key[key].append(r)
                    if ok and (key not in best
                               or r["time_s"] < best[key]["time_s"]):
                        best[key] = r

    # The analytic tier's choice, RECOMPUTED with the current (calibrated)
    # cost model and matched against the swept records by config — the
    # historical idx field goes stale under config-keyed resume and
    # cost-model refits that reorder the candidate sort (advisor r3).
    import jax.numpy as jnp
    from deepgemm_ascend_tpu.tiling import analytic
    analytic_pick = {}
    for key, recs in by_key.items():
        op, m, n, k = key
        in_dt, out_dt = op_dtypes.get(op, ("bfloat16", "float32"))
        a_i = jnp.dtype(in_dt).itemsize
        o_i = jnp.dtype(out_dt).itemsize
        try:
            if op in ("grouped_gemm", "grouped_gemm_nt"):
                # Contiguous grouped pins block_m = layout block (= the
                # record's m) — mirror the sweep/predictor pinning
                # (autotune_sweep.py / predictor.py), else the unpinned
                # pick can never match a swept record.
                cands = analytic.enumerate_candidates(m, n, k, a_i, a_i,
                                                      o_i, info)
                pool = sorted({(m, bn, bk) for _, bn, bk in cands
                               if analytic.judge_space(m, bn, bk, a_i, a_i,
                                                       o_i, info)})
                if not pool:
                    continue
                bm, bn, bk = min(pool, key=lambda t: analytic.estimate_time(
                    m, n, k, *t, a_i, a_i, o_i, info, jnp.dtype(in_dt),
                    op=op).time_s)
                nat_blocks, nat_ks = (bm, bn, bk), 1
            else:
                nat = analytic.get_best_config(m, n, k, a_i, a_i, o_i,
                                               op=op)
                nat_blocks = (nat.block_m, nat.block_n, nat.block_k)
                nat_ks = nat.k_split
        except Exception:
            continue
        blocks = lambda r: (r["config"]["block_m"], r["config"]["block_n"],
                            r["config"]["block_k"])
        # XLA-family records ignore their block fields — never credit one
        # to the analytic tier even when the stored blocks coincide.
        not_xla = lambda r: not recmod.is_xla(r["config"])
        matches = [r for r in recs if blocks(r) == nat_blocks
                   and r["config"].get("k_split", 1) == nat_ks
                   and r["config"].get("expert_coalesce", 1) == 1
                   and not_xla(r)]
        # k_split variants were never swept; fall back to a k_split-
        # agnostic match rather than dropping the baseline column — but
        # NEVER to an ec>1 record (a scheduling variant the analytic tier
        # cannot choose; crediting its time to "analytic" would skew the
        # learned-vs-analytic comparison this column exists for).
        if not matches:
            matches = [r for r in recs if blocks(r) == nat_blocks
                       and r["config"].get("expert_coalesce", 1) == 1
                       and not_xla(r)]
        if matches:
            analytic_pick[key] = min(matches, key=lambda r: r["time_s"])

    lines = [
        f"# Benchmarks — {device}",
        "",
        "Best measured configuration per shape from the autotune sweeps "
        "(readback-safe scan-chain timing with adaptive chain length, "
        "`bench/timing.py`). "
        f"Light-speed = max(compute, memory) roofline per shape "
        f"({info.peak_bf16_tflops:.0f} TF/s MXU peak, "
        f"{info.hbm_gbps:.0f} GB/s HBM); memory-bound shapes (small M) are "
        "scored against the bandwidth bound, not the MXU peak.",
        "",
        "| op | M | N | K | best (bm,bn,bk) | time | TF/s | % light-speed "
        "| vs analytic | configs tried |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for key in sorted(best, key=lambda t: (t[0], t[1], t[2], t[3])):
        r = best[key]
        op, m, n, k = key
        c = r["config"]
        tf = r["tflops"]
        in_dt, out_dt = op_dtypes.get(op, ("bfloat16", "float32"))
        # Grouped records store per-expert (m, n, k) with E-scaled tflops;
        # the per-expert roofline fraction uses the per-expert time share.
        rl = gemm_roofline(m, n, k, in_dt, out_dt, info)
        scale = tf * 1e12 * r["time_s"] / (2.0 * m * n * k)  # E for grouped
        pct = 100.0 * rl.fraction(r["time_s"] / max(scale, 1.0))
        t_us = r["time_s"] * 1e6
        t_str = f"{t_us/1000:.3f} ms" if t_us >= 1000 else f"{t_us:.1f} us"
        ana = analytic_pick.get(key)
        speedup = (f"{ana['time_s'] / r['time_s']:.2f}×" if ana else "—")
        cfg_str = ("XLA" if recmod.is_xla(c) else
                   f"{c['block_m']}×{c['block_n']}×{c['block_k']}")
        lines.append(
            f"| {op} | {m} | {n} | {k} "
            f"| {cfg_str} "
            f"| {t_str} | {tf:.1f} | {pct:.1f}% | {speedup} "
            f"| {counts[key]} |")
    text = "\n".join(lines) + "\n"
    if args.out:
        os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
        # Preserve hand-maintained sections (serving numbers etc.): keep
        # everything from the first second-level heading of the existing
        # file — the generator owns only the sweep table above it.
        if os.path.exists(args.out):
            old = open(args.out).read()
            idx = old.find("\n## ")
            if idx != -1:
                text = text.rstrip("\n") + "\n" + old[idx:]
        with open(args.out, "w") as f:
            f.write(text)
        print(f"wrote {args.out} ({len(best)} shapes)")
    else:
        print(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
