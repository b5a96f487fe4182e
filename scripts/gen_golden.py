#!/usr/bin/env python
"""Generate GEMM golden data files.

≙ reference ``deep_gemm_ascend/scripts/gen_golden.py:10-23`` (CLI M N K →
``input/x1_gm.bin``, ``input/x2_gm.bin``, ``output/golden.bin``): inputs in
the chosen dtype, golden = wide-precision matmul of the *rounded* inputs.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from deepgemm_ascend_tpu.utils import golden  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("m", type=int)
    ap.add_argument("n", type=int)
    ap.add_argument("k", type=int)
    ap.add_argument("--dtype", default="float16",
                    choices=["float16", "bfloat16", "float32"])
    ap.add_argument("--heavy-tail", action="store_true",
                    help="lognormal inputs (device-test style) instead of "
                         "uniform [1,10)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out-dir", default=".")
    args = ap.parse_args(argv)

    if args.dtype == "bfloat16":
        import jax.numpy as jnp
        cast = lambda x: np.asarray(jnp.asarray(x, jnp.bfloat16), np.float32)
        store_dtype = np.float32  # bf16 has no portable npy dtype; store f32
    else:
        dt = np.dtype(args.dtype)
        cast = lambda x: x.astype(dt)
        store_dtype = dt

    gen = golden.gen_heavy_tail if args.heavy_tail else golden.gen_uniform
    a = cast(gen((args.m, args.k), seed=args.seed))
    b = cast(gen((args.k, args.n), seed=args.seed + 1))
    gold = (a.astype(np.float64) @ b.astype(np.float64)).astype(np.float32)

    os.makedirs(os.path.join(args.out_dir, "input"), exist_ok=True)
    os.makedirs(os.path.join(args.out_dir, "output"), exist_ok=True)
    a.astype(store_dtype).tofile(os.path.join(args.out_dir, "input", "x1_gm.bin"))
    b.astype(store_dtype).tofile(os.path.join(args.out_dir, "input", "x2_gm.bin"))
    gold.tofile(os.path.join(args.out_dir, "output", "golden.bin"))
    print(f"wrote input/x1_gm.bin ({a.nbytes}B) input/x2_gm.bin ({b.nbytes}B) "
          f"output/golden.bin ({gold.nbytes}B)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
