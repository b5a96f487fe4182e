#!/usr/bin/env python
"""Fit the analytic cost model's constants from on-chip sweep records.

≙ the reference's empirically-fitted DMA bandwidth polynomial
(``aclnn_.../op_host/op_tiling/select_kernel.cpp:22-114`` — a 6th-degree
GB/s fit from measurements): instead of nominal datasheet constants, fit
(effective HBM bandwidth, accumulator-RMW bandwidth, dispatch startup,
per-step overhead, effective compute fraction) PER OP from the autotuner's
jsonl records (scripts/autotune_sweep.py), and package the result as
``deepgemm_ascend_tpu/data/cost_model.json`` which
``tiling.analytic.get_cost_params`` loads at selection time.

The fit model is exactly ``analytic.estimate_time``:

    pred = E * max(flops/(peak*cf) + rmw, bytes/hbm) + s0 + s1*E*steps

(E = expert count for grouped records, recovered from the stored tflops
field; 1 for dense). Loss = mean |log(pred) - log(measured)| — scale-free,
robust to the 1000× time range across the suite.

Usage:
  python scripts/calibrate_cost_model.py 'autotune_results*/*.jsonl' \
      --device 'tpu v5e' --out deepgemm_ascend_tpu/data/cost_model.json
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# (a_itemsize, out_itemsize, peak_flops) per op on v5e — fp8 feeds the MXU
# at the bf16 rate (tiling/platform.py peak_flops).
V5E_PEAK = 197e12
OP_META = {
    "gemm": (2, 4, V5E_PEAK),
    "gemm_nt": (2, 4, V5E_PEAK),
    "gemm_tn": (2, 4, V5E_PEAK),
    "gemm_tt": (2, 4, V5E_PEAK),
    "fp8_gemm": (1, 2, V5E_PEAK),
    "fp8_gemm_nt": (1, 2, V5E_PEAK),
    "grouped_gemm": (1, 2, V5E_PEAK),
    "grouped_gemm_masked": (1, 2, V5E_PEAK),
    "grouped_gemm_nt": (1, 2, V5E_PEAK),
    "grouped_gemm_masked_nt": (1, 2, V5E_PEAK),
    # int8 feeds the MXU at the full int8 rate (2× bf16/fp8).
    "int8_gemm": (1, 2, 394e12),
    "int8_grouped_gemm": (1, 2, 394e12),
    "int8_grouped_gemm_masked": (1, 2, 394e12),
}
OP_ALIASES = {"grouped_masked": "grouped_gemm_masked"}

NOMINAL = dict(hbm_gbps=819.0, vmem_gbps=1300.0, startup0=3e-6,
               startup1=1e-7, compute_factor=1.0)


def load_records(paths):
    from deepgemm_ascend_tpu.bench import records as recmod
    from deepgemm_ascend_tpu.tiling import platform as plat
    info = plat.detect()
    recs = {}
    for path in paths:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    r = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if not recmod.plausible(r, info):
                    continue  # failed or corrupt-timing record
                op = OP_ALIASES.get(r.get("op", "gemm"), r.get("op", "gemm"))
                if op not in OP_META:
                    continue
                c = r["config"]
                if recmod.is_xla(c):
                    # XLA-family records ignore their block fields; fitting
                    # the block-based cost model to them poisons the fit.
                    continue
                m, n, k, t = r["m"], r["n"], r["k"], r["time_s"]
                scale = recmod.flops_scale(r)  # grouped work multiplier E
                recs.setdefault(op, []).append(
                    (m, n, k, c["block_m"], c["block_n"], c["block_k"],
                     t, scale))
    return recs


def model_terms(rows, a_i, o_i, peak):
    """Per-record fixed quantities for the fit (numpy arrays)."""
    import numpy as np
    arr = np.asarray(rows, np.float64)
    m, n, k = arr[:, 0], arr[:, 1], arr[:, 2]
    bm, bn, bk = arr[:, 3], arr[:, 4], arr[:, 5]
    t, e = arr[:, 6], arr[:, 7]
    nm, nn, nk = np.ceil(m / bm), np.ceil(n / bn), np.ceil(k / bk)
    flops = 2.0 * (nm * bm) * (nn * bn) * (nk * bk)
    a_b = nn * (nm * bm) * (nk * bk) * a_i
    b_b = nm * (nk * bk) * (nn * bn) * a_i
    c_b = (nm * bm) * (nn * bn) * o_i
    steps = nm * nn * nk
    rmw_bytes = np.where(nk > 1, steps * 2.0 * bm * bn * 4, 0.0)
    return dict(flops=flops / peak, bytes=a_b + b_b + c_b,
                rmw_bytes=rmw_bytes, steps=steps, scale=e, t=t)


def predict(params, terms):
    import numpy as np
    cf, hbm, vbw, s0, s1 = (params["compute_factor"], params["hbm_gbps"],
                            params["vmem_gbps"], params["startup0"],
                            params["startup1"])
    comp = terms["flops"] / cf + terms["rmw_bytes"] / (vbw * 1e9)
    mem = terms["bytes"] / (hbm * 1e9)
    return (terms["scale"] * np.maximum(comp, mem)
            + s0 + s1 * terms["scale"] * terms["steps"])


def mae_log(params, terms):
    import numpy as np
    return float(np.mean(np.abs(np.log(predict(params, terms))
                                - np.log(terms["t"]))))


def fit(terms, *, steps=4000, lr=0.02, seed=0):
    """Adam in log-parameter space; compute_factor sigmoid-bounded to
    (0.5, 1.05) so it cannot absorb bandwidth effects unphysically."""
    import jax
    import jax.numpy as jnp
    import optax

    tj = {k: jnp.asarray(v) for k, v in terms.items()}

    def unpack(p):
        return dict(
            compute_factor=0.5 + 0.55 * jax.nn.sigmoid(p[0]),
            hbm_gbps=jnp.exp(p[1]),
            vmem_gbps=jnp.exp(p[2]),
            startup0=jnp.exp(p[3]),
            startup1=jnp.exp(p[4]),
        )

    def loss(p):
        q = unpack(p)
        comp = tj["flops"] / q["compute_factor"] + tj["rmw_bytes"] / (
            q["vmem_gbps"] * 1e9)
        mem = tj["bytes"] / (q["hbm_gbps"] * 1e9)
        pred = (tj["scale"] * jnp.maximum(comp, mem)
                + q["startup0"] + q["startup1"] * tj["scale"] * tj["steps"])
        return jnp.mean(jnp.abs(jnp.log(pred) - jnp.log(tj["t"])))

    import numpy as np
    p = jnp.asarray([2.0, np.log(NOMINAL["hbm_gbps"]),
                     np.log(NOMINAL["vmem_gbps"]),
                     np.log(NOMINAL["startup0"]), np.log(NOMINAL["startup1"])])
    opt = optax.adam(lr)
    state = opt.init(p)
    step_fn = jax.jit(lambda p, s: (lambda g: (
        optax.apply_updates(p, opt.update(g, s)[0]),
        opt.update(g, s)[1]))(jax.grad(loss)(p)))
    for _ in range(steps):
        p, state = step_fn(p, state)
    q = {k: float(v) for k, v in unpack(p).items()}
    return q


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sweep_glob")
    ap.add_argument("--device", default="tpu v5e")
    ap.add_argument("--out",
                    default="deepgemm_ascend_tpu/data/cost_model.json")
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--min-records", type=int, default=40)
    args = ap.parse_args(argv)
    # Screen records against the TARGET device's roofline even though the
    # fit itself runs on CPU (and must not touch a busy/down chip).
    os.environ.setdefault("DGA_DEVICE", args.device)

    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    paths = sorted(glob.glob(args.sweep_glob))
    recs = load_records(paths)
    out = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            out = json.load(f)
    dev = out.setdefault(args.device, {})
    for op, rows in sorted(recs.items()):
        if len(rows) < args.min_records:
            print(f"[DGA-TPU] {op}: {len(rows)} records < {args.min_records},"
                  " skipped")
            continue
        a_i, o_i, peak = OP_META[op]
        terms = model_terms(rows, a_i, o_i, peak)
        before = mae_log(NOMINAL, terms)
        fitted = fit(terms, steps=args.steps)
        after = mae_log(fitted, terms)
        dev[op] = {**{k: round(v, 6) if k == "compute_factor" else v
                      for k, v in fitted.items()},
                   "records": len(rows),
                   "mae_log_before": round(before, 4),
                   "mae_log_after": round(after, 4)}
        print(f"[DGA-TPU] {op}: {len(rows)} records | MAE(log) "
              f"{before:.3f} -> {after:.3f} "
              f"({100 * (np.exp(before) - 1):.0f}% -> "
              f"{100 * (np.exp(after) - 1):.0f}% typical error) | "
              f"hbm {fitted['hbm_gbps']:.0f} GB/s, "
              f"cf {fitted['compute_factor']:.3f}, "
              f"vmem {fitted['vmem_gbps']:.0f} GB/s, "
              f"s0 {fitted['startup0'] * 1e6:.2f} us, "
              f"s1 {fitted['startup1'] * 1e9:.1f} ns/step")
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"[DGA-TPU] wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
