#!/usr/bin/env python
"""Verify a GEMM output file against a golden file.

≙ reference ``scripts/verify.py:14-35``: length check, bounded diff dump,
outlier-ratio acceptance (≤ max-ratio elements outside rtol/atol).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from deepgemm_ascend_tpu.utils import verify  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("output_bin")
    ap.add_argument("golden_bin")
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--rtol", type=float, default=verify.DEFAULT_RTOL)
    ap.add_argument("--atol", type=float, default=verify.DEFAULT_ATOL)
    ap.add_argument("--max-ratio", type=float, default=verify.DEFAULT_MAX_RATIO)
    ap.add_argument("--print-diffs", type=int, default=10)
    args = ap.parse_args(argv)

    dt = np.dtype(args.dtype)
    out = np.fromfile(args.output_bin, dtype=dt)
    gold = np.fromfile(args.golden_bin, dtype=np.float32)
    if out.size != gold.size:
        print(f"[DGA-TPU] size mismatch: output {out.size} vs golden "
              f"{gold.size}")
        return 2
    res = verify.verify(out, gold, rtol=args.rtol, atol=args.atol,
                        max_ratio=args.max_ratio, name=args.output_bin,
                        print_diffs=args.print_diffs)
    status = "PASS" if res.ok else "FAIL"
    print(f"[DGA-TPU] {status}: mismatch_ratio={res.mismatch_ratio:.3e} "
          f"({res.num_mismatched}/{res.num_total}), "
          f"max_abs={res.max_abs_err:.4g} max_rel={res.max_rel_err:.4g}")
    return 0 if res.ok else 1


if __name__ == "__main__":
    sys.exit(main())
