"""Profiled grid-search autotuner — tier 1.5 of the tiling system.

TPU re-design of the reference's benchmark-driven tuner
(``framework/benchmark/benchmark.py`` — ``Parameter`` candidate generators
under hardware constraints, per-shape ``benchmark_shape`` loop with a
correctness gate, ``msprof op`` timing, jsonl results, and per-rank
checkpoint files enabling crash resume with poisoned-config skipping,
`benchmark.py:244-298`). Differences born of the platform:

* timing uses the readback-safe scan-chain method (bench/timing.py) instead
  of an external profiler binary — no msprof subprocess, no generic
  params-in-GM kernel (re-specializing per config is a cached jit compile);
* candidates come from the same analytic generator the selector uses
  (`tiling/analytic.py:enumerate_candidates` ≙ `Parameter.filter_parameters`),
  so the sweep space is already VMEM-legal;
* winners are written into the persistent tiling cache (tiling/cache.py),
  closing the loop: the next ``select_config`` call for that shape hits the
  autotuned entry (the reference stored winners in the tiling CSV via
  `SelectKernelWithCache`, `select_kernel.cpp:371-388`).

Failure containment mirrors the reference: a config that crashes/compile-
fails is recorded with ``time_s < 0`` (≙ ``negative=True`` records,
`benchmark.py:281-298`) and skipped on resume.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Callable, Iterable, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..config import GemmConfig, KernelType
from ..utils.common import ceil_div
from . import analytic
from . import platform as plat
from .cache import TilingCache, cache_key, global_cache


@dataclasses.dataclass
class SweepResult:
    """One (shape, config) measurement — ≙ ``Result`` (`benchmark.py:195-225`)."""

    m: int
    n: int
    k: int
    op: str
    config: dict
    time_s: float          # < 0 => failed/poisoned config
    tflops: float
    correct: bool
    idx: int = -1

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))

    @classmethod
    def from_json(cls, line: str) -> "SweepResult":
        return cls(**json.loads(line))


_XLA_FLOPS_CEILING = 3e10            # ~150 µs at v5e peak — beyond this the
                                     # Pallas dispatch floor is noise
_XLA_PARTIAL_BYTES_CEILING = 128e6   # fp8 XLA materializes a (kb, m, n) f32


def xla_candidate_ok(op: str, m: int, n: int, k: int,
                     flops_scale: float = 1.0) -> bool:
    """Admit the XLA-family candidate (config.py ``KernelType.XLA``)?

    Only ops with an XLA realization (dense + masked grouped; the ragged
    contiguous layout has none). For the BLOCK-SCALED ops (fp8, masked
    grouped) the XLA realization materializes a (kb, m, n) f32 partial,
    so it is admitted only in the dispatch-floor-bound small-shape regime
    while that partial stays modest. For the PLAIN dense family (bf16 any
    layout, W8A8 int8 — no blocked-scale plumbing, the XLA dot is the
    identical contraction) it is admitted at EVERY size: round 5's fixed
    timing chain measured XLA's native bf16 emitter at 98.1% of peak on
    4096^3 and 85-92% on the prime-shape stragglers — ahead of the best
    Pallas configs — so it must always compete as the one extra candidate.
    """
    if "grouped" in op and "masked" not in op:
        # contiguous layout (runtime keys grouped_gemm / grouped_gemm_nt,
        # sweep-script names grouped_gemm_contiguous*) — no XLA realization
        return False
    if op.startswith(("fp8_gemm", "grouped_gemm_masked")):
        if 2.0 * m * n * k * flops_scale > _XLA_FLOPS_CEILING:
            return False
        return (flops_scale * (k // 128) * m * n * 4
                <= _XLA_PARTIAL_BYTES_CEILING)
    return True


class Autotuner:
    """Per-shape profiled sweep with jsonl logging + crash resume."""

    def __init__(
        self,
        run_fn: Callable[..., "jnp.ndarray"],
        time_fn: Callable[[GemmConfig], float],
        *,
        op: str = "gemm",
        results_path: Optional[str] = None,
        checkpoint_path: Optional[str] = None,
        cache: Optional[TilingCache] = None,
        rank: int = 0,
        world: int = 1,
        retry_failed: bool = False,
    ):
        """``time_fn(config) -> seconds`` (may raise → poisoned config).

        ``rank``/``world`` shard the candidate list across independent
        processes — ≙ the reference's rank-sliced sweeps
        (`benchmark.py:249-253`, `bench_sub.py:57,90`).

        ``retry_failed``: re-run previously-poisoned records instead of
        replaying them. Poisoning exists to skip the one config that
        crashed a process (≙ `benchmark.py:256-298`); after a *systematic*
        failure (driver bug, missing import) every record is poisoned and
        plain resume would make the whole sweep permanently empty.
        """
        del run_fn  # timing callback owns execution; kept for API clarity
        self._time = time_fn
        self._op = op
        self._results_path = results_path
        self._ckpt_path = checkpoint_path
        self._cache = cache if cache is not None else global_cache()
        self._rank, self._world = rank, world
        self._retry_failed = retry_failed

    def _timed_with_watchdog(self, cfg: GemmConfig) -> float:
        """Run the timing callback under a wall-clock watchdog.

        A hung candidate (observed round 5: one remote compile wedged for
        18+ minutes and BLOCKED THE DEVICE QUEUE for every other client on
        the tunnel — killing the process freed it instantly) cannot be
        cancelled from Python: the thread is blocked inside a C RPC. The
        only way to release the device is to die, so on timeout the
        process logs and hard-exits. The in-flight checkpoint was already
        written (``_mark_in_flight``), so the next resume records this
        candidate as poisoned and moves on — same discipline as a crashed
        process (reference ``benchmark.py:256-298``). Queue scripts wrap
        sweep invocations in a bounded retry for exactly this exit.
        """
        import threading

        # Default 1800s, not 900: a healthy-but-congested tunnel measures
        # 145s for a trivial dispatch, and a large-shape candidate's
        # compile + adaptive-chain growth + repeats can legitimately run
        # long — a too-tight watchdog permanently poisons a potentially
        # winning config (resume records time_s=-1; --retry-poisoned is
        # the recovery path). 1800s still bounds a genuine wedge to half
        # an hour instead of a lost chip day.
        tmo = float(os.environ.get("DGA_CANDIDATE_TIMEOUT_S", "1800"))
        if tmo <= 0:
            return self._time(cfg)
        result: list = []

        def work():
            try:
                result.append(("ok", self._time(cfg)))
            except BaseException as e:  # noqa: BLE001 — re-raised below
                result.append(("err", e))

        t = threading.Thread(target=work, daemon=True)
        t.start()
        t.join(tmo)
        if not result:
            print(f"[DGA-TPU] autotune: candidate {cfg} exceeded "
                  f"{tmo:.0f}s watchdog — exiting to free the device "
                  f"queue (resume marks it poisoned)", flush=True)
            os._exit(17)
        kind, val = result[0]
        if kind == "err":
            raise val
        return val

    # -- persistence ------------------------------------------------------
    @staticmethod
    def _cfg_key(config: dict) -> str:
        """Canonical config key, NORMALIZED through GemmConfig so records
        written before a config-schema extension (e.g. expert_coalesce,
        round 4) still key-match their candidates after it: from_dict
        drops unknown keys and fills new fields with defaults, so old and
        new serializations of the same config hash identically. Without
        this, every schema change would silently void config-keyed resume
        (full re-measurement of completed sweeps) and the poisoned-config
        marker (crash loop on the poisoned candidate)."""
        try:
            norm = GemmConfig.from_dict(config).to_dict()
            # Forward-compat: keys from a NEWER schema than this checkout
            # must stay in the key — dropping them would alias genuinely
            # different configs onto one record (self-review r4).
            norm.update({k: v for k, v in config.items() if k not in norm})
            config = norm
        except (TypeError, ValueError):
            pass  # unparseable legacy record: key it as-is
        return json.dumps(config, sort_keys=True)

    def _load_done(self) -> dict[str, SweepResult]:
        """Completed records keyed by CONFIG (canonical json), not index:
        the candidate ordering is an ``estimate_time`` sort, which changes
        whenever the calibrated cost model is refit — index-keyed resume
        would silently pair old records with different configs. Later
        lines override earlier ones (a retried config keeps its newest
        record)."""
        done: dict[str, SweepResult] = {}
        if self._results_path and os.path.exists(self._results_path):
            with open(self._results_path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        r = SweepResult.from_json(line)
                        done[self._cfg_key(r.config)] = r
                    except (json.JSONDecodeError, TypeError):
                        continue
        return done

    def _poisoned_marker(self) -> tuple[Optional[str], Optional[int]]:
        """(config-key, legacy index) in flight when a previous process
        died (≙ `last_process_idx` checkpoint, `benchmark.py:256-298`).
        Older checkpoints recorded only the index; it is honored
        positionally for backward compatibility."""
        if self._ckpt_path and os.path.exists(self._ckpt_path):
            try:
                with open(self._ckpt_path) as f:
                    d = json.load(f)
                cfg = d.get("in_flight_cfg")
                if cfg is not None:
                    # Re-normalize markers written under an older config
                    # schema (see _cfg_key) so they still match.
                    try:
                        cfg = self._cfg_key(json.loads(cfg))
                    except (json.JSONDecodeError, TypeError):
                        pass
                return cfg, d.get("in_flight_idx")
            except (json.JSONDecodeError, OSError):
                return None, None
        return None, None

    def _mark_in_flight(self, idx: Optional[int],
                        config: Optional[dict] = None) -> None:
        if self._ckpt_path:
            os.makedirs(os.path.dirname(os.path.abspath(self._ckpt_path)),
                        exist_ok=True)
            cfg_key = self._cfg_key(config) if config is not None else None
            with open(self._ckpt_path, "w") as f:
                json.dump({"in_flight_idx": idx, "in_flight_cfg": cfg_key,
                           "ts": time.time()}, f)

    def _append(self, r: SweepResult) -> None:
        if self._results_path:
            os.makedirs(os.path.dirname(os.path.abspath(self._results_path)),
                        exist_ok=True)
            with open(self._results_path, "a") as f:
                f.write(r.to_json() + "\n")

    # -- sweep ------------------------------------------------------------
    def sweep_shape(
        self,
        m: int, n: int, k: int,
        candidates: Optional[Sequence[GemmConfig]] = None,
        *,
        in_dtype=jnp.bfloat16,
        out_dtype=jnp.float32,
        k_granularity: int = 128,
        max_candidates: Optional[int] = None,
        explore_extra: int = 0,
        verbose: bool = False,
        flops_scale: float = 1.0,
    ) -> Optional[GemmConfig]:
        """Sweep one shape; returns the winning config (None if all failed)."""
        if candidates is None:
            info = plat.detect()
            isz = jnp.dtype(in_dtype).itemsize
            osz = jnp.dtype(out_dtype).itemsize
            triples = analytic.enumerate_candidates(
                m, n, k, isz, isz, osz, info, k_granularity)
            candidates = [GemmConfig(bm, bn, bk) for bm, bn, bk in triples]
        candidates = list(candidates)[self._rank::self._world]
        if max_candidates:
            # Cost control (`benchmark.py` burned "5h/shape"): keep the
            # analytically-best prefix — but always admit the best full-K
            # candidates too: block_k == K selects the fp8 kernel's
            # static-scale-slice fast path (ops/fp8_gemm.py), whose win the
            # analytic roofline cannot see (it models traffic, not the
            # one-hot scale-selection VPU cost).
            isz = jnp.dtype(in_dtype).itemsize
            osz = jnp.dtype(out_dtype).itemsize
            info = plat.detect()
            candidates.sort(key=lambda c: analytic.estimate_time(
                m, n, k, c.block_m, c.block_n, c.block_k,
                isz, isz, osz, info, in_dtype, op=self._op).time_s)
            full_k = [c for c in candidates if c.block_k >= k][:2]
            head = candidates[:max_candidates]
            pruned = head + [c for c in full_k if c not in head]
            if explore_extra > 0:
                # Stratified sample of the off-prefix tail. The prefix-only
                # sweep records teach a predictor nothing beyond what the
                # analytic sort already knew (every training row IS the
                # analytic shortlist); these extras give the learned tier
                # off-policy coverage — appended AFTER the prefix so a
                # resumed sweep's record indices stay aligned.
                tail = [c for c in candidates[max_candidates:]
                        if c not in pruned]
                step = max(1, len(tail) // explore_extra)
                pruned += tail[::step][:explore_extra]
            if self._op.startswith("grouped_gemm_masked"):
                # Per-expert grid fusion variants of the analytic head
                # (expert_coalesce — ops/grouped_gemm.py): a bitwise-equal
                # scheduling knob the traffic roofline cannot rank, so the
                # sweep must measure it. The kernel silently runs ec=1
                # when E % ec != 0 (duplicate measurement, never wrong).
                ecs = [c.replace(expert_coalesce=ec)
                       for c in pruned[:3] for ec in (2, 4)]
                pruned += [c for c in ecs if c not in pruned]
            candidates = pruned

        # XLA-family candidate: measured like any other config (appended
        # LAST so resumed sweeps' record indices stay aligned); the publish
        # path packages it per shape when it wins. Rank 0 only — the append
        # happens after the rank/world slice, so without the guard every
        # rank would re-measure the identical config (and harvest only
        # reads the *_r0 files anyway).
        if self._rank == 0 and xla_candidate_ok(self._op, m, n, k,
                                                flops_scale):
            xcfg = GemmConfig(kernel_type=KernelType.XLA)
            if xcfg not in candidates:
                candidates = list(candidates) + [xcfg]

        done = self._load_done()
        poisoned_cfg, poisoned_idx = self._poisoned_marker()
        best: Optional[SweepResult] = None
        # flops_scale: e.g. the expert count for grouped problems (the
        # (m, n, k) key is per-expert; real work is E× that).
        flops = 2 * m * n * k * flops_scale
        # Admission gate: a measurement faster than the shape's roofline
        # light-speed is corrupted timing (RPC-floor subtraction collapsing
        # under transport degradation), not a fast kernel. Re-measure once;
        # if still impossible, record as failed (time_s < 0) so no
        # downstream argmin can crown it (≙ msprof trust, benchmark.py:400).
        from ..bench import records as _records
        _ls = _records.light_speed_floor_s(self._op, m, n, k, in_dtype,
                                           out_dtype, flops_scale,
                                           plat.detect())
        floor_s = _ls / 1.05

        for idx, cfg in enumerate(candidates):
            cfg_dict = cfg.to_dict()
            ckey = self._cfg_key(cfg_dict)
            prev = done.get(ckey)
            hit_poison = (ckey == poisoned_cfg if poisoned_cfg is not None
                          else idx == poisoned_idx)
            if prev is not None and (prev.time_s > 0
                                     or not self._retry_failed):
                r = prev
            elif hit_poison and not self._retry_failed:
                r = SweepResult(m, n, k, self._op, cfg_dict,
                                time_s=-1.0, tflops=0.0, correct=False,
                                idx=idx)
                self._append(r)
            else:
                self._mark_in_flight(idx, cfg_dict)
                try:
                    secs = self._timed_with_watchdog(cfg)
                    if secs < floor_s:
                        # transient glitch? once more
                        secs = self._timed_with_watchdog(cfg)
                    if secs < floor_s:
                        raise RuntimeError(
                            f"implausible timing {secs:.3e}s < light-speed "
                            f"{_ls:.3e}s — degraded transport, rejecting "
                            f"measurement")
                    r = SweepResult(m, n, k, self._op, cfg.to_dict(),
                                    time_s=secs, tflops=flops / secs / 1e12,
                                    correct=True, idx=idx)
                except Exception as e:  # compile/runtime failure → poisoned
                    if verbose:
                        print(f"[DGA-TPU] autotune: config {cfg} failed: "
                              f"{str(e)[:120]}")
                    r = SweepResult(m, n, k, self._op, cfg.to_dict(),
                                    time_s=-1.0, tflops=0.0, correct=False,
                                    idx=idx)
                self._append(r)
                self._mark_in_flight(None)
            if verbose and r.time_s > 0:
                print(f"[DGA-TPU] autotune {m}x{n}x{k} #{idx} "
                      f"{cfg.block_m}x{cfg.block_n}x{cfg.block_k}: "
                      f"{r.time_s*1e3:.3f} ms ({r.tflops:.1f} TF/s)")
            if r.time_s > 0 and (best is None or r.time_s < best.time_s):
                best = r

        if best is None:
            return None
        win = GemmConfig.from_dict(best.config)
        key = cache_key(self._op, m, n, k, jnp.dtype(in_dtype).name,
                        jnp.dtype(out_dtype).name, f"g{k_granularity}")
        self._cache.set(key, win, persist=True)
        return win
