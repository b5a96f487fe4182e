"""Script CLI tests — mirrors the reference scripts test tier
(``scripts/tests/test_all_scripts.py``, 23 pytest cases, tempdir-isolated):
golden generation/verification round trips, corrupted outputs fail, size
mismatches detected, byte-exact file sizes.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.join(ROOT, "scripts")
ENV = {**os.environ, "JAX_PLATFORMS": "cpu"}


def run(script, *args, cwd):
    return subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, script), *map(str, args)],
        cwd=cwd, env=ENV, capture_output=True, text=True, timeout=300)


def test_gen_golden_files_and_sizes(tmp_path):
    r = run("gen_golden.py", 16, 24, 32, "--out-dir", str(tmp_path), cwd=ROOT)
    assert r.returncode == 0, r.stderr
    a = np.fromfile(tmp_path / "input" / "x1_gm.bin", np.float16)
    b = np.fromfile(tmp_path / "input" / "x2_gm.bin", np.float16)
    g = np.fromfile(tmp_path / "output" / "golden.bin", np.float32)
    assert a.size == 16 * 32 and b.size == 32 * 24 and g.size == 16 * 24
    want = a.reshape(16, 32).astype(np.float64) @ b.reshape(32, 24).astype(np.float64)
    np.testing.assert_allclose(g.reshape(16, 24), want.astype(np.float32),
                               rtol=1e-6)


def test_verify_passes_identical(tmp_path):
    run("gen_golden.py", 8, 8, 8, "--out-dir", str(tmp_path), cwd=ROOT)
    g = tmp_path / "output" / "golden.bin"
    r = run("verify_output.py", str(g), str(g), cwd=ROOT)
    assert r.returncode == 0 and "PASS" in r.stdout


def test_verify_fails_on_2x_error(tmp_path):
    run("gen_golden.py", 8, 8, 8, "--out-dir", str(tmp_path), cwd=ROOT)
    g = tmp_path / "output" / "golden.bin"
    bad = np.fromfile(g, np.float32) * 2.0
    badf = tmp_path / "bad.bin"
    bad.tofile(badf)
    r = run("verify_output.py", str(badf), str(g), cwd=ROOT)
    assert r.returncode == 1 and "FAIL" in r.stdout


def test_verify_detects_size_mismatch(tmp_path):
    run("gen_golden.py", 8, 8, 8, "--out-dir", str(tmp_path), cwd=ROOT)
    g = tmp_path / "output" / "golden.bin"
    short = np.fromfile(g, np.float32)[:-1]
    sf = tmp_path / "short.bin"
    short.tofile(sf)
    r = run("verify_output.py", str(sf), str(g), cwd=ROOT)
    assert r.returncode == 2 and "size mismatch" in r.stdout


def test_verify_tolerates_small_outlier_fraction(tmp_path):
    run("gen_golden.py", 64, 64, 16, "--out-dir", str(tmp_path), cwd=ROOT)
    g = tmp_path / "output" / "golden.bin"
    arr = np.fromfile(g, np.float32)
    arr[0] *= 100.0  # 1/4096 outliers < default 1e-4? no: 2.4e-4 > 1e-4
    f = tmp_path / "one_bad.bin"
    arr.tofile(f)
    r = run("verify_output.py", str(f), str(g), "--max-ratio", "1e-3",
            cwd=ROOT)
    assert r.returncode == 0, r.stdout


def test_xla_matmul_cross_check(tmp_path):
    run("gen_golden.py", 16, 24, 32, "--out-dir", str(tmp_path), cwd=ROOT)
    r = run("xla_matmul.py", 16, 24, 32, "--dir", str(tmp_path), cwd=ROOT)
    assert r.returncode == 0, r.stderr
    out = np.fromfile(tmp_path / "output" / "xla_out.bin", np.float32)
    gold = np.fromfile(tmp_path / "output" / "golden.bin", np.float32)
    np.testing.assert_allclose(out, gold, rtol=1e-2, atol=1e-2)


def test_heavy_tail_flag(tmp_path):
    r = run("gen_golden.py", 32, 32, 32, "--heavy-tail", "--out-dir",
            str(tmp_path), cwd=ROOT)
    assert r.returncode == 0
    a = np.fromfile(tmp_path / "input" / "x1_gm.bin", np.float16)
    assert (a < 0).any()  # heavy-tail has signs; uniform [1,10) does not


@pytest.mark.slow  # subprocess + full engine compile (~30 s on this 1-CPU
# rig); the mixed mode's dispatch-count property is also asserted by
# test_serving.test_batched_admission_* — run via `pytest -m slow`.
def test_serve_bench_mixed_smoke(tmp_path):
    """Smoke the batched-admission mixed prefill+decode bench mode on CPU:
    valid JSON line, O(buckets) prefill dispatches for 2x-slots requests."""
    import json
    r = run("serve_bench.py", "--mode", "mixed", "--model", "tiny",
            "--batch", "2", "--steps", "3", cwd=ROOT)
    assert r.returncode == 0, r.stderr
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["metric"] == "mixed_prefill_decode_tokens_per_s"
    assert rec["prefills"] == 4          # 2x slots requests all served
    assert rec["prefill_dispatches"] <= rec["prefills"]


def test_publish_tilings_screens_implausible_records(tmp_path):
    # A record claiming a time below the shape's roofline light-speed
    # (corrupted relay timing) must never win the packaged table, even
    # when it is the fastest "time" in the jsonl.
    import json
    good = {"m": 4096, "n": 4096, "k": 4096, "op": "fp8_gemm",
            "config": {"block_m": 512, "block_n": 512, "block_k": 1024,
                       "kernel_type": 1, "k_split": 1, "swizzle": 0,
                       "vmem_limit_bytes": 0, "pad_k": False},
            "time_s": 780e-6, "tflops": 176.2, "correct": True, "idx": 0}
    bad = dict(good, config=dict(good["config"], block_m=64),
               time_s=1e-9, tflops=2.1e6, idx=1)
    src = tmp_path / "fp8_gemm_4096x4096x4096_r0.jsonl"
    src.write_text(json.dumps(good) + "\n" + json.dumps(bad) + "\n")
    out = tmp_path / "tilings.jsonl"
    r = run("publish_tilings.py", str(src), "--device", "tpu_v5e",
            "--out", str(out), cwd=ROOT)
    assert r.returncode == 0, r.stderr
    rows = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(rows) == 1
    assert rows[0]["config"]["block_m"] == 512  # the plausible winner


def _bench_mod():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench_module", os.path.join(ROOT, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_retry_policy_partial_on_transport_flap(capsys):
    """bench.py VERDICT r3 item 8 'done' criterion: a flap AFTER the
    correctness gate degrades to the best PARTIAL timing (rc 0 + note),
    never 0.0; transport errors get ONE re-init+retry; deterministic
    rejections skip the config without touching the backend."""
    from deepgemm_ascend_tpu.config import GemmConfig
    b = _bench_mod()
    cfgs = [GemmConfig(128, 128, 128), GemmConfig(256, 256, 256),
            GemmConfig(512, 512, 512)]
    calls, reinits = [], []

    def time_one(cfg, inputs):
        calls.append(cfg.block_m)
        if cfg.block_m == 128:
            return 100.0
        if cfg.block_m == 256:
            raise RuntimeError("Mosaic failed to compile")   # deterministic
        raise RuntimeError("UNAVAILABLE: socket closed")      # transport

    def reinit(inputs):
        reinits.append(1)
        return inputs

    b.STATE.update(value=0.0, vs_baseline=0.0, gate_ok=True, configs=0)
    rc = b._run_candidates(cfgs, None, time_one, reinit, peak=200.0)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    import json as _json
    line = _json.loads(out)
    assert rc == 0
    assert line["value"] == 100.0 and line["vs_baseline"] == 0.5
    assert "partial: 1/3" in line["note"] and "transport" in line["note"]
    # deterministic rejection: NO retry, NO re-init; transport: ONE retry
    assert calls == [128, 256, 512, 512], calls
    assert reinits == [1], reinits


def test_bench_retry_policy_all_failed_is_structured(capsys):
    from deepgemm_ascend_tpu.config import GemmConfig
    b = _bench_mod()
    b.STATE.update(value=0.0, vs_baseline=0.0, gate_ok=True, configs=0)

    def time_one(cfg, inputs):
        raise RuntimeError("Mosaic failed to compile")

    rc = b._run_candidates([GemmConfig(128, 128, 128)], None, time_one,
                           lambda i: i, peak=200.0)
    import json as _json
    line = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1 and line["value"] == 0.0 and "error" in line


def test_instruments_to_md_idempotent(tmp_path):
    """The BENCHMARKS instrument block must render PENDING without logs
    and rewrite in place (exactly one marker pair) on re-runs."""
    import importlib.util as ilu
    spec = ilu.spec_from_file_location(
        "instruments_to_md",
        os.path.join(SCRIPTS, "instruments_to_md.py"))
    mod = ilu.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = tmp_path / "B.md"
    out.write_text("# header\n\nbody\n")
    mod.main(["--out", str(out)])
    txt1 = out.read_text()
    assert txt1.count(mod.START) == 1 and txt1.count(mod.END) == 1
    assert "PENDING" in txt1 and txt1.startswith("# header")
    mod.main(["--out", str(out)])
    txt2 = out.read_text()
    assert txt2.count(mod.START) == 1 and txt2.count(mod.END) == 1


def test_instruments_merge_prior_keeps_history_and_sentinels(tmp_path):
    """merge_prior invariants (review round 5): (1) a measured prior
    block survives a PENDING re-render — including the LAST block, whose
    substitution used to drop the END sentinel and corrupt the marker
    pair for every later fold; (2) a block with fresh measured rows keeps
    them even when a sibling sub-table in the same block is PENDING."""
    import importlib.util as ilu
    spec = ilu.spec_from_file_location(
        "instruments_to_md",
        os.path.join(SCRIPTS, "instruments_to_md.py"))
    mod = ilu.module_from_spec(spec)
    spec.loader.exec_module(mod)
    S, E = mod.START, mod.END
    prior = "\n".join([
        S, "## Instruments", "",
        "### Alpha", "", "| a |", "|---|", "| 1 |", "",
        "### Omega", "", "| z |", "|---|", "| 9 |", "",
        E])
    # fresh render: Alpha has a real table + a PENDING sub-table; Omega
    # (the LAST block) is fully PENDING
    fresh = "\n".join([
        S, "## Instruments", "",
        "### Alpha", "", "| a |", "|---|", "| 2 |", "",
        "PENDING (no oracle log)", "",
        "### Omega", "", "PENDING (no log)", "",
        E])
    merged = mod.merge_prior(fresh, prior)
    assert merged.count(E) == 1 and merged.rstrip().endswith(E)
    assert "| 2 |" in merged          # fresh rows kept despite PENDING sibling
    assert "| 9 |" in merged          # last block backfilled from prior
    assert "PENDING (no log)" not in merged
    # re-merging the merged doc is stable and keeps exactly one pair
    again = mod.merge_prior(merged, merged)
    assert again.count(E) == 1 and again.count(S) == 1
