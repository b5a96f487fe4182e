"""Learned predictor tests.

Fixture strategy mirrors the reference (`test_get_best_config.py:28-37`):
no shipped weights — tests fabricate a tiny real MLP checkpoint (here:
trained on a synthetic analytic-cost dataset) and exercise the full predict
path including the decline/fallback policy.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from deepgemm_ascend_tpu.config import GemmConfig
from deepgemm_ascend_tpu.tiling import analytic, cache, platform, predictor, selector


def test_mlp_save_load_roundtrip(tmp_path):
    w = predictor.MLPWeights.init(hidden=(8, 8), seed=1)
    x = np.random.default_rng(0).normal(size=(5, predictor.FEATURES))
    y1 = w.forward(x)
    p = str(tmp_path / "mlp.npz")
    w.save(p)
    w2 = predictor.MLPWeights.load(p)
    np.testing.assert_allclose(w2.forward(x), y1)


def test_mlp_meta_roundtrip_and_evidence_margin(tmp_path):
    w = predictor.MLPWeights.init(hidden=(8, 8), seed=1)
    p = str(tmp_path / "mlp.npz")
    meta = {"holdout_pick_oracle": 1.3, "holdout_winrate": 0.1, "op": "x"}
    w.save(p, meta=meta)
    w2 = predictor.MLPWeights.load(p)
    assert w2.meta["holdout_pick_oracle"] == 1.3
    # A model with a demonstrated held-out regression and no win over
    # analytic must predict at least that regression before overriding.
    tp = predictor.TilingPredictor(w2)
    assert tp.margin == pytest.approx(0.3)
    # A demonstrated win keeps the standard margin.
    w2.meta = {"holdout_pick_oracle": 1.05, "holdout_winrate": 0.8}
    assert (predictor.TilingPredictor(w2).margin
            == predictor.NATIVE_MARGIN)
    # No meta (older checkpoints): unchanged.
    w2.meta = {}
    assert (predictor.TilingPredictor(w2).margin
            == predictor.NATIVE_MARGIN)


def test_training_learns_analytic_cost():
    # synthetic dataset: label = analytic roofline estimate (log time)
    info = platform.detect()
    rng = np.random.default_rng(0)
    rows, times = [], []
    for _ in range(400):
        m, n, k = (int(rng.integers(64, 4096)) for _ in range(3))
        cands = analytic.enumerate_candidates(m, n, k, 2, 2, 4, info)
        bm, bn, bk = cands[rng.integers(len(cands))]
        rows.append([m, n, k, bm, bn, bk])
        times.append(analytic.estimate_time(
            m, n, k, bm, bn, bk, 2, 2, 4, info, jnp.bfloat16).time_s)
    arr = np.asarray(rows, np.float64)
    feats = predictor._features(1, 1, 1, arr[:, 3:])
    feats[:, :3] = np.log2(arr[:, :3] + 1.0)
    log_t = np.log(np.asarray(times))
    w = predictor.train(feats, log_t, hidden=(64, 64), epochs=200, seed=0)
    pred = w.forward(feats)
    corr = np.corrcoef(pred, log_t)[0, 1]
    assert corr > 0.9, corr


def test_predictor_declines_on_few_candidates():
    w = predictor.MLPWeights.init(hidden=(8,), seed=0)
    p = predictor.TilingPredictor(w, min_candidates=10**6)
    assert p.predict(256, 256, 256, jnp.bfloat16, jnp.float32) is None


def test_predictor_declines_when_not_better_than_native():
    # Constant-output MLP: predicted winner == predicted native → margin
    # rule declines (≙ `get_best_config.py:587-621`).
    w = predictor.MLPWeights.init(hidden=(8,), seed=0)
    for ww in w.ws:
        ww[:] = 0.0
    p = predictor.TilingPredictor(w, min_candidates=1)
    assert p.predict(4096, 4096, 4096, jnp.bfloat16, jnp.float32) is None


def test_predictor_selects_when_confident():
    # MLP scoring = +sum(log2 tiles): smallest tiles predicted fastest —
    # clearly "faster" than the analytic pick (large tiles) → must select.
    w = predictor.MLPWeights.init(hidden=(8,), seed=0)
    w.ws = [np.zeros((predictor.FEATURES, 1))]
    w.bs = [np.zeros((1,))]
    w.ws[0][3:, 0] = 1.0  # larger tiles → higher predicted time
    w.mean[:] = 0.0
    w.std[:] = 1.0
    p = predictor.TilingPredictor(w, min_candidates=1)
    cfg = p.predict(4096, 4096, 4096, jnp.bfloat16, jnp.float32)
    assert isinstance(cfg, GemmConfig)
    assert cfg.block_n % 128 == 0
    # it must have picked the minimal tile volume among candidates
    assert cfg.block_m <= 32


def test_selector_integration_and_fallback(tmp_path):
    w = predictor.MLPWeights.init(hidden=(8,), seed=0)
    p = predictor.TilingPredictor(w, min_candidates=10**6)  # always declines
    selector.register_predictor(p)
    try:
        c = cache.TilingCache(str(tmp_path / "t.jsonl"))
        cfg = selector.select_config(512, 512, 512, jnp.bfloat16,
                                     jnp.float32, cache=c)
        assert isinstance(cfg, GemmConfig)  # analytic fallback engaged
    finally:
        selector.clear_predictors()


def test_load_sweep_records(tmp_path):
    import json
    path = tmp_path / "sweep.jsonl"
    recs = [
        {"m": 128, "n": 256, "k": 512, "op": "gemm", "idx": 0,
         "config": GemmConfig(128, 256, 256).to_dict(),
         "time_s": 1e-4, "tflops": 1.0, "correct": True},
        {"m": 128, "n": 256, "k": 512, "op": "gemm", "idx": 1,
         "config": GemmConfig(64, 128, 128).to_dict(),
         "time_s": -1.0, "tflops": 0.0, "correct": False},  # poisoned
    ]
    with open(path, "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")
    feats, logt = predictor.load_sweep_records([str(path)])
    assert feats.shape == (1, predictor.FEATURES)
    np.testing.assert_allclose(logt[0], np.log(1e-4))


def test_packaged_default_predictor_loads_and_registers():
    """The repo ships sweep-trained weights (deepgemm_ascend_tpu/data/);
    enable_default_predictor must find them, register tier 2, and the
    registered predictor must produce legal configs or decline cleanly."""
    path = predictor.default_weights_path("fp8_gemm")
    assert path is not None and path.endswith("predictor_fp8_gemm.npz")
    try:
        assert predictor.enable_default_predictor("fp8_gemm")
        import jax.numpy as jnp
        from deepgemm_ascend_tpu.tiling.cache import TilingCache
        cfg = selector.select_config(4096, 4096, 4096,
                                     jnp.float8_e4m3fn, jnp.bfloat16,
                                     op="fp8_gemm", cache=TilingCache(None))
        assert cfg.block_n % 128 == 0 and cfg.block_k % 128 == 0
    finally:
        selector.clear_predictors()


def test_default_predictor_env_override(tmp_path, monkeypatch):
    w = predictor.MLPWeights.init()
    p = str(tmp_path / "custom.npz")
    w.save(p)
    monkeypatch.setenv(predictor.DEFAULT_WEIGHTS_ENV, p)
    assert predictor.default_weights_path("fp8_gemm") == p


def test_tier2_autowires_on_first_miss(monkeypatch):
    """VERDICT r1 #5: a fresh process must consult the predictor for
    uncached fp8 shapes without anyone calling enable_default_predictor —
    the selector wires tier 2 on the first cache miss (device-gated for the
    packaged weights; env path taken here to bypass the CPU gate)."""
    import jax.numpy as jnp
    from deepgemm_ascend_tpu.tiling.cache import TilingCache
    from deepgemm_ascend_tpu.utils.logging import metrics
    monkeypatch.setenv(predictor.DEFAULT_WEIGHTS_ENV,
                       predictor.default_weights_path("fp8_gemm"))
    monkeypatch.setattr(selector, "_predictors", {})
    monkeypatch.setattr(selector, "_default_predictor_tried", False)
    metrics.reset()
    try:
        selector.select_config(4096, 4096, 4096, jnp.float8_e4m3fn,
                               jnp.bfloat16, op="fp8_gemm",
                               cache=TilingCache(None))
        assert selector._predictors.get("fp8_gemm") is not None
        snap = metrics.snapshot()
        assert (snap.get("tiling.predictor_pick", 0)
                + snap.get("tiling.predictor_decline", 0)) == 1, snap
    finally:
        selector.clear_predictors()


def test_tier2_autowire_respects_disable_env(monkeypatch):
    import jax.numpy as jnp
    from deepgemm_ascend_tpu.tiling.cache import TilingCache
    monkeypatch.setenv("DGA_DISABLE_PREDICTOR", "1")
    monkeypatch.setattr(selector, "_predictors", {})
    monkeypatch.setattr(selector, "_default_predictor_tried", False)
    try:
        selector.select_config(4096, 4096, 4096, jnp.float8_e4m3fn,
                               jnp.bfloat16, op="fp8_gemm",
                               cache=TilingCache(None))
        assert not selector._predictors
    finally:
        selector.clear_predictors()


def test_per_op_packaged_weights_exist():
    """Every op in selector.PREDICTOR_OPS ships trained weights — the
    per-op routing analogue of the reference's three-MLP scheme
    (`get_best_config.py:673-748`, routing at 718-723)."""
    for op in selector.PREDICTOR_OPS:
        path = predictor.default_weights_path(op)
        assert path is not None and path.endswith(f"predictor_{op}.npz"), op
        w = predictor.MLPWeights.load(path)
        assert w.mean.shape[0] == predictor.FEATURES, op


def test_per_op_routing_consults_matching_predictor(monkeypatch):
    """select_config must route each op to ITS registered predictor and
    never consult a mismatched one."""
    from deepgemm_ascend_tpu.tiling.cache import TilingCache
    from deepgemm_ascend_tpu.utils.logging import metrics
    calls = []

    class Spy:
        def __init__(self, op):
            self.op = op

        def predict(self, m, n, k, in_dt, out_dt, *, op):
            calls.append((self.op, op))
            return None   # decline → analytic fallback

    monkeypatch.setattr(selector, "_predictors", {})
    monkeypatch.setattr(selector, "_default_predictor_tried", False)
    selector.register_predictor(Spy("gemm"))
    selector.register_predictor(Spy("grouped_gemm_masked"))
    metrics.reset()
    try:
        selector.select_config(256, 256, 256, jnp.bfloat16, jnp.float32,
                               op="gemm", cache=TilingCache(None))
        selector.select_config(128, 1408, 2048, jnp.float8_e4m3fn,
                               jnp.bfloat16, op="grouped_gemm_masked",
                               cache=TilingCache(None))
        # fp8_gemm has no registered predictor here → straight to analytic
        selector.select_config(256, 256, 256, jnp.float8_e4m3fn,
                               jnp.bfloat16, op="fp8_gemm",
                               cache=TilingCache(None))
        assert calls == [("gemm", "gemm"),
                         ("grouped_gemm_masked", "grouped_gemm_masked")]
        snap = metrics.snapshot()
        assert snap.get("tiling.predictor_decline.gemm", 0) == 1
        assert snap.get(
            "tiling.predictor_decline.grouped_gemm_masked", 0) == 1
    finally:
        selector.clear_predictors()


def test_grouped_contiguous_pool_pins_block_m():
    """op='grouped_gemm' candidates must keep block_m == m (the layout
    fixes it — ops/grouped_gemm.py); a confident MLP therefore returns a
    config with block_m == m."""
    w = predictor.MLPWeights.init(hidden=(8,), seed=0)
    w.ws = [np.zeros((predictor.FEATURES, 1))]
    w.bs = [np.zeros((1,))]
    w.ws[0][3:6, 0] = 1.0  # larger tiles → higher predicted time
    w.mean[:] = 0.0
    w.std[:] = 1.0
    p = predictor.TilingPredictor(w, min_candidates=1, op="grouped_gemm")
    cfg = p.predict(512, 1408, 2048, jnp.float8_e4m3fn, jnp.bfloat16,
                    op="grouped_gemm")
    assert cfg is None or cfg.block_m == 512


def test_grouped_contiguous_pool_is_vmem_legal():
    """Re-pinning bm=m must re-judge VMEM: a (bn, bk) pair legal at small
    bm can blow VMEM at bm=m (review r3 finding — the predictor could
    select an infeasible tile that OOMs at Mosaic compile)."""
    from deepgemm_ascend_tpu.tiling import analytic, platform as plat
    m, n, k = 512, 2048, 1408
    info = plat.detect()
    cands = analytic.enumerate_candidates(m, n, k, 1, 1, 2, info)
    pinned = sorted({(m, bn, bk) for _, bn, bk in cands
                     if analytic.judge_space(m, bn, bk, 1, 1, 2, info)})
    assert pinned, "pinned pool empty"
    # The unfiltered re-pair would contain illegal triples at this shape;
    # the filtered pool must not.
    for bm, bn, bk in pinned:
        assert analytic.judge_space(bm, bn, bk, 1, 1, 2, info), (bm, bn, bk)
    unfiltered = {(m, bn, bk) for _, bn, bk in cands}
    assert any(not analytic.judge_space(bm, bn, bk, 1, 1, 2, info)
               for bm, bn, bk in unfiltered), \
        "shape no longer exercises the VMEM cliff; pick a bigger one"
