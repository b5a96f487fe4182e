#!/usr/bin/env python
"""Publish autotune sweep winners as a packaged per-device tiling table.

Reads sweep jsonl records, keeps the fastest correct config per
(op, m, n, k), reconstructs the selector cache keys (sweep records don't
carry dtypes; the op determines them), and writes
``deepgemm_ascend_tpu/data/tilings_<device>.jsonl`` — which the global
TilingCache preloads (tiling/cache.py:packaged_tilings_path).

  python scripts/publish_tilings.py "autotune_results_r2/*_r0.jsonl" \
      --device tpu_v5e
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# op → (in_dtype, out_dtype, k_granularity) as the selector keys them.
OP_KEYING = {
    "fp8_gemm": ("float8_e4m3fn", "bfloat16", 128),
    "fp8_gemm_nt": ("float8_e4m3fn", "bfloat16", 128),
    "gemm": ("bfloat16", "float32", 128),
    "gemm_nt": ("bfloat16", "float32", 128),
    "gemm_tn": ("bfloat16", "float32", 128),
    "gemm_tt": ("bfloat16", "float32", 128),
    # MoE prefill sweeps record under the runtime key (m = layout block_m)
    "grouped_gemm": ("float8_e4m3fn", "bfloat16", 128),
    "grouped_gemm_masked": ("float8_e4m3fn", "bfloat16", 128),
    # K-major (DeepGEMM-native) grouped weights — separate runtime keys
    "grouped_gemm_nt": ("float8_e4m3fn", "bfloat16", 128),
    "grouped_gemm_masked_nt": ("float8_e4m3fn", "bfloat16", 128),
    # W8A8 int8 (per-token × per-channel scales, ops/int8_gemm.py)
    "int8_gemm": ("int8", "bfloat16", 128),
    "int8_grouped_gemm": ("int8", "bfloat16", 128),
    "int8_grouped_gemm_masked": ("int8", "bfloat16", 128),
    # legacy sweep records written before the op-key fix
    "grouped_masked": ("float8_e4m3fn", "bfloat16", 128),
}
OP_ALIAS = {"grouped_masked": "grouped_gemm_masked"}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="+")
    ap.add_argument("--device", default=None,
                    help="device tag (default: detected, spaces → _)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    if args.device:
        # Let detection answer for the target device even off-accelerator
        # (harvest runs while the chip is busy/down).
        os.environ.setdefault("DGA_DEVICE", args.device.replace("_", " "))
    from deepgemm_ascend_tpu.bench import records as recmod
    from deepgemm_ascend_tpu.tiling import platform as plat
    from deepgemm_ascend_tpu.tiling.cache import cache_key

    info = plat.detect()
    device = args.device or plat.detect().device_kind.replace(" ", "_")
    out = args.out or os.path.join(
        os.path.dirname(__file__), "..", "deepgemm_ascend_tpu", "data",
        f"tilings_{device}.jsonl")

    best: dict = {}
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
                    if "m" not in r or not recmod.plausible(r, info):
                        continue  # failed / faster-than-light (degraded rig)
                    op = OP_ALIAS.get(r.get("op", "gemm"),
                                      r.get("op", "gemm"))
                    if op not in OP_KEYING:
                        continue
                    kk = (op, r["m"], r["n"], r["k"])
                    if kk not in best or r["time_s"] < best[kk]["time_s"]:
                        best[kk] = r

    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    with open(out, "w") as f:
        for (op, m, n, k), r in sorted(best.items()):
            in_dt, out_dt, gran = OP_KEYING[op]
            key = cache_key(op, m, n, k, in_dt, out_dt, f"g{gran}")
            f.write(json.dumps({"key": key, "config": r["config"]}) + "\n")
    print(f"published {len(best)} tilings → {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
