"""Device mesh construction and multi-host initialization.

The reference has no distributed layer (SURVEY.md §2.7: no collectives
anywhere; its only multi-device mechanism is rank-sharded parameter sweeps).
The TPU-native serving slice needs one: a named mesh over ICI with
explicit-axis sharding — data (batch), expert (MoE experts), model (attention
heads / tensor dims) — and XLA collectives inserted by ``shard_map``.

Axis conventions:
  "data"   — batch / sequence-group parallelism (dp)
  "expert" — MoE expert parallelism (ep)
  "model"  — tensor parallelism over heads/vocab (tp)
Sequence parallelism (sp) is not needed for decode (s = 1); pipeline
parallelism is deliberately absent for this model scale — both documented
extensions, not gaps in mechanism (the mesh/axis machinery is general).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("data", "expert", "model")


def init_distributed() -> None:
    """Multi-host init (no-op single-host). ≙ torch.npu.set_device(rank)
    process pinning (`bench_sub.py:90`), but for a real collective runtime.

    Gated on ``JAX_COORDINATOR_ADDRESS``; when ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID`` are also set they are passed explicitly (generic
    hosts — e.g. the 2-process CPU smoke test, tests/test_distributed.py);
    otherwise jax's cluster auto-detection runs (TPU pods)."""
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return
    kw = {}
    if os.environ.get("JAX_NUM_PROCESSES"):
        kw = dict(coordinator_address=addr,
                  num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                  process_id=int(os.environ["JAX_PROCESS_ID"]))
    jax.distributed.initialize(**kw)


def make_mesh(
    dp: Optional[int] = None,
    ep: Optional[int] = None,
    tp: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, expert, model) mesh. Unspecified axes default so that
    dp·ep·tp == #devices (greedy: fill tp, then ep, then dp)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    known = [a for a in (dp, ep, tp) if a]
    rem = n
    for a in known:
        if rem % a:
            raise ValueError(f"axis sizes {dp, ep, tp} do not divide {n}")
        rem //= a
    if tp is None:
        tp = rem
        rem = 1
    if ep is None:
        ep = rem
        rem = 1
    if dp is None:
        dp = rem
        rem = 1
    if dp * ep * tp != n:
        raise ValueError(f"dp*ep*tp = {dp*ep*tp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, ep, tp)
    return Mesh(arr, AXES)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))
