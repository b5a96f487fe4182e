#!/usr/bin/env python
"""Train the tiling cost MLP from autotune sweep JSONL.

≙ the reference's (unshipped) predictor-training pipeline feeding
``get_best_config``'s ``TimePredictMLP``: our trainer consumes the
autotuner's jsonl records (scripts/autotune_sweep.py) and emits a portable
``.npz`` loaded by ``tiling.predictor.MLPWeights``.
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sweep_glob", help="glob of sweep jsonl files")
    ap.add_argument("--out", default="data/tiling_mlp.npz")
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--hidden", type=int, nargs="*", default=[64, 128, 64])
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")  # tiny MLP; never contend for the chip
    from deepgemm_ascend_tpu.tiling import predictor

    paths = sorted(glob.glob(args.sweep_glob))
    if not paths:
        print(f"[DGA-TPU] no files match {args.sweep_glob}")
        return 1
    feats, log_t = predictor.load_sweep_records(paths)
    if len(feats) < 10:
        print(f"[DGA-TPU] only {len(feats)} usable records — need more sweeps")
        return 1
    w = predictor.train(feats, log_t, hidden=tuple(args.hidden),
                        epochs=args.epochs)
    import numpy as np
    pred = w.forward(feats)
    corr = float(np.corrcoef(pred, log_t)[0, 1])
    w.save(args.out)
    print(f"[DGA-TPU] trained on {len(feats)} records; train corr {corr:.3f}; "
          f"saved {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
