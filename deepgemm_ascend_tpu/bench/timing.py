"""Kernel timing that is correct through async/relayed TPU runtimes.

Role of the reference's ``msprof op`` wrapping (``benchmark.py:400-418``:
kernel ``Task Duration(us)`` parsed from the profiler because host wall-clock
around a launch measures dispatch, not the kernel). On this TPU runtime the
equivalent hazard is stronger: ``block_until_ready`` can be acked by the
transport before device execution, so *only a device→host readback blocks*.

Methodology: run ``iters`` dependent invocations inside one ``lax.scan``
under a single jit, return a scalar (forces the readback), subtract the
measured RPC floor, divide by iters. Chaining makes iterations data-dependent
so no scheduler can overlap or elide them.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Timing:
    seconds: float          # per-iteration device time (floor-corrected)
    total_seconds: float
    rpc_floor_seconds: float
    iters: int

    def tflops(self, flops: float) -> float:
        return flops / self.seconds / 1e12 if self.seconds > 0 else float("inf")

    def gbps(self, nbytes: float) -> float:
        return nbytes / self.seconds / 1e9 if self.seconds > 0 else float("inf")


@functools.cache
def _rpc_floor() -> float:
    """Round-trip latency of a trivial dispatch+readback (median of 5)."""
    x = jnp.zeros((8, 128), jnp.float32)

    @jax.jit
    def trivial(v):
        return jnp.sum(v)

    float(trivial(x))  # warm compile
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(trivial(x))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def build_chain(fn: Callable, perturb: Callable, n: int) -> Callable:
    """The jitted n-iteration dependent chain ``time_fn`` measures.

    Exposed so tests can compile it and assert the compiled cost: every
    perturb taps a tiny slice of the output, and for a TRANSPARENT fn
    (the XLA kernel family, ``jnp.dot`` baselines) XLA's algebraic
    simplifier would otherwise push the slice into the dot —
    ``slice(dot(a, b)) → dot(a[:1], b[:, :1])`` — timing a 1-element
    GEMM (observed: bf16 prime-shape XLA dot reported "5795% of light
    speed"). The ``optimization_barrier`` pins fn's FULL output before
    the tap; Pallas calls are opaque so their timings are unchanged, and
    the barrier is free either way.
    """
    @jax.jit
    def run(*a):
        x0 = a[0]

        def body(x, _):
            out = jax.lax.optimization_barrier(fn(x, *a[1:]))
            return perturb(out, x0), jnp.float32(0)

        x_final, _ = jax.lax.scan(body, x0, None, length=n)
        return jnp.sum(jnp.asarray(x_final, jnp.float32))
    return run


def time_fn(
    fn: Callable,
    args: Sequence[jax.Array],
    iters: int = 32,
    repeats: int = 3,
    perturb: Callable | None = None,
    min_chain_seconds: float = 0.0,
    max_iters: int = 65536,
) -> Timing:
    """Time ``fn(*args)`` per-invocation.

    ``fn``'s first argument is chained: each scan step feeds a perturbation
    of the previous output (cast back to the input's dtype/shape via
    ``perturb``; default: scale-and-cast, assumes output[..] broadcastable).
    If chaining is impossible (shapes differ), pass ``perturb=None`` and the
    same args are re-used — iterations are then independent but still inside
    one jit so device work is enqueued back-to-back.

    ``min_chain_seconds``: adaptive-length guard for fast kernels. The
    measured quantity is (chain − RPC floor); when the chain is comparable
    to the ~30 ms floor, floor jitter dominates and per-iter times are junk
    (observed: µs-scale kernels reporting >100% of roofline). If the pilot
    chain comes in below this target, the scan is rebuilt with
    proportionally more iterations (one extra compile) and re-measured.
    """
    first = args[0]

    if perturb is None:
        def perturb_default(out, x0):
            # Keep iterations dependent: fold a scalar of the output back in.
            s = jnp.sum(out).astype(x0.dtype) * jnp.asarray(1e-30, x0.dtype)
            return x0 + s
        perturb = perturb_default

    def build(n):
        return build_chain(fn, perturb, n)

    run = build(iters)
    float(run(*args))  # warm: compile + first execution
    floor = _rpc_floor()

    # Growth loop, not one shot: the pilot's (chain − floor) is clamped from
    # below by floor jitter, so one rescale can undershoot badly for µs-scale
    # kernels (observed: 16 → 2604 iters still a 3 ms chain).
    for _ in range(4):
        if not (min_chain_seconds > 0 and iters < max_iters):
            break
        t0 = time.perf_counter()
        float(run(*args))
        chain = max(time.perf_counter() - t0 - floor, floor * 0.02)
        if chain >= min_chain_seconds:
            break
        scale = min_chain_seconds / chain
        iters = int(min(max_iters, max(iters + 1, iters * scale)))
        run = build(iters)
        float(run(*args))  # recompile + warm

    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, time.perf_counter() - t0)
    per = max((best - floor) / iters, 1e-9)
    return Timing(seconds=per, total_seconds=best, rpc_floor_seconds=floor,
                  iters=iters)


def _gemm_tap_perturb(out: jax.Array, a0: jax.Array) -> jax.Array:
    """The corner tap ``time_gemm_like`` chains iterations with.

    Module-level (not a closure) so tests exercising the timing path can
    compile the REAL tap rather than a copy that could drift.
    """
    tap = jax.lax.convert_element_type(
        jnp.sum(out[:1, :1]), jnp.float32) * jnp.float32(1e-30)
    return a0 + tap.astype(a0.dtype)


def time_gemm_like(
    fn: Callable,
    a: jax.Array,
    *rest: jax.Array,
    iters: int = 32,
    repeats: int = 3,
    min_chain_seconds: float = 0.0,
) -> Timing:
    """Time a GEMM-shaped ``fn(a, *rest) -> (m, n)`` by chaining a scalar
    tap of the output back into ``a`` (keeps dtype/shape of ``a``)."""
    return time_fn(fn, (a, *rest), iters=iters, repeats=repeats,
                   perturb=_gemm_tap_perturb,
                   min_chain_seconds=min_chain_seconds)
