#!/usr/bin/env python
"""Cross-check: run the same GEMM through plain XLA on the local accelerator.

≙ reference ``scripts/torch_matmul.py:14-39`` (torch.matmul on NPU as an
independent calibration baseline): reads the bins written by gen_golden.py,
multiplies with ``jnp.matmul``, writes ``output/xla_out.bin``.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("m", type=int)
    ap.add_argument("n", type=int)
    ap.add_argument("k", type=int)
    ap.add_argument("--dtype", default="float16")
    ap.add_argument("--dir", default=".")
    args = ap.parse_args(argv)

    # Honor JAX_PLATFORMS explicitly: this image's sitecustomize
    # force-registers the TPU plugin and ignores the env var alone
    # (same workaround as tests/conftest.py).
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    dt = np.dtype(args.dtype)
    a = np.fromfile(os.path.join(args.dir, "input", "x1_gm.bin"),
                    dtype=dt).reshape(args.m, args.k)
    b = np.fromfile(os.path.join(args.dir, "input", "x2_gm.bin"),
                    dtype=dt).reshape(args.k, args.n)
    out = jnp.matmul(jnp.asarray(a), jnp.asarray(b),
                     preferred_element_type=jnp.float32)
    np.asarray(out, np.float32).tofile(
        os.path.join(args.dir, "output", "xla_out.bin"))
    print(f"wrote output/xla_out.bin ({args.m}x{args.n} f32)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
