"""Three-tier tiling selection front door.

Same decision shape as the reference's ``SelectKernelWithCache`` →
(predictor) → analytic chain (``op_tiling/select_kernel.cpp:333-388``,
predictor bridge ``op_tiling/predictor.cpp:36-157``):

    persistent/autotuned cache  →  learned predictor (optional)  →  analytic.

The winning config is written back to the in-memory cache so repeat shapes
are O(1) — exactly the reference cache discipline (`cache.cpp:69-101`).
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp

from ..config import GemmConfig
from . import analytic
from .cache import TilingCache, cache_key, global_cache

# Optional learned predictors, one per op (≙ the reference's three
# per-operator-type MLPs routed in ``get_best_config.py:718-723`` —
# small/common/padding there; per-op here since each op is its own swept
# kernel family). Registered lazily to keep the model stack off the
# serving hot path.
_predictors: dict = {}
_default_predictor_tried = False

# Ops with packaged on-chip-swept weights (data/predictor_<op>.npz).
PREDICTOR_OPS = ("fp8_gemm", "fp8_gemm_nt", "gemm", "grouped_gemm",
                 "grouped_gemm_masked")


def register_predictor(predictor) -> None:
    """Install a learned cost predictor (tier 2) for ``predictor.op``.

    ≙ ``Predictor::UsePredictApi`` gating (`predictor.h:21-44`) — presence of
    the predictor is optional and the analytic tier is always the fallback.
    """
    global _default_predictor_tried
    _predictors[predictor.op] = predictor
    _default_predictor_tried = True   # explicit registration wins


def clear_predictors() -> None:
    """Drop all registered predictors (test hook)."""
    global _default_predictor_tried
    _predictors.clear()
    _default_predictor_tried = True


def _maybe_enable_default_predictor() -> None:
    """Tier-2 auto-wiring (on by default, ≙ the reference's live predictor
    mode — `custom_catlass/code_backup/dynamic_tiling_matmul.cpp:16-21`
    mode 2): on the first cache miss, install every packaged per-op
    predictor when the training device matches the detected one. The
    packaged weights were swept on v5e; ``DGA_PREDICTOR_PATH`` overrides
    (single op, no device gate), and ``DGA_DISABLE_PREDICTOR=1`` opts out.
    The decline policy (min candidates + 3% margin vs analytic + roofline
    guardrail) still guards every selection."""
    global _default_predictor_tried
    if _default_predictor_tried:
        return
    _default_predictor_tried = True
    if os.environ.get("DGA_DISABLE_PREDICTOR") == "1":
        return
    from . import platform as plat
    from .predictor import DEFAULT_WEIGHTS_ENV, enable_default_predictor
    if os.environ.get(DEFAULT_WEIGHTS_ENV):
        # Explicit weights path overrides the fp8_gemm model (no device
        # gate) — the OTHER packaged per-op predictors still install below
        # when the device matches, instead of silently downgrading to
        # analytic for every non-fp8 op.
        enable_default_predictor(op="fp8_gemm", strategy="topk_median")
        if plat.detect().device_kind != "tpu v5e":
            return
        for op in PREDICTOR_OPS:
            if op not in _predictors:
                enable_default_predictor(op=op, strategy="topk_median")
        return
    if plat.detect().device_kind != "tpu v5e":
        return   # packaged weights are v5e-swept; wrong device → stay tier-3
    # topk_median: best held-out metrics on the round-2 training set
    # (scripts/train_predictor.py --holdout; per-op tables in
    # docs/BENCHMARKS.md "Learned predictor" section).
    for op in PREDICTOR_OPS:
        enable_default_predictor(op=op, strategy="topk_median")


def select_config(
    m: int, n: int, k: int,
    in_dtype=jnp.bfloat16,
    out_dtype=jnp.float32,
    *,
    op: str = "gemm",
    k_granularity: int = 128,
    cache: Optional[TilingCache] = None,
    override: Optional[GemmConfig] = None,
) -> GemmConfig:
    """Resolve the tile config for a GEMM problem.

    ``override`` short-circuits everything (≙ the bench path where tiling
    knobs come from the caller, `gemm_bench.hpp:49-113`).
    """
    if override is not None:
        return override
    in_dt, out_dt = jnp.dtype(in_dtype), jnp.dtype(out_dtype)
    key = cache_key(op, m, n, k, in_dt.name, out_dt.name, f"g{k_granularity}")
    cache = cache if cache is not None else global_cache()

    from ..utils.logging import metrics

    hit = cache.get(key)
    if hit is not None:
        metrics.inc("tiling.cache_hit")
        return hit
    metrics.inc("tiling.cache_miss")

    _maybe_enable_default_predictor()
    pred = _predictors.get(op)
    if pred is not None:
        cfg = pred.predict(m, n, k, in_dt, out_dt, op=op)
        if cfg is not None:
            metrics.inc("tiling.predictor_pick")
            metrics.inc(f"tiling.predictor_pick.{op}")
            cache.set(key, cfg, persist=False)
            return cfg
        metrics.inc("tiling.predictor_decline")
        metrics.inc(f"tiling.predictor_decline.{op}")

    metrics.inc("tiling.analytic_pick")
    cfg = analytic.get_best_config(
        m, n, k,
        a_itemsize=in_dt.itemsize, b_itemsize=in_dt.itemsize,
        out_itemsize=out_dt.itemsize,
        k_granularity=k_granularity,
        op=op,
    )
    cache.set(key, cfg, persist=False)  # analytic results are re-derivable
    return cfg
