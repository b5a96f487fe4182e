"""Two-process jax.distributed smoke test (VERDICT r1 #9).

Exercises the REAL multi-host init path — ``init_distributed`` +
``make_mesh`` over devices spanning two OS processes — on CPU, no TPUs:
each subprocess hosts 4 virtual CPU devices, the coordinator glues them
into one 8-device runtime, and a jitted global reduction over a
process-spanning sharded array forces a cross-process collective.

The reference's only multi-process mode was rank-per-process sweep
sharding with no collective runtime (`framework/benchmark/bench_sub.py:57,90`).
"""

import os
import socket
import subprocess
import sys

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.pop("PYTHONSTARTUP", None)
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["DGA_REPO"])
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from deepgemm_ascend_tpu.parallel import init_distributed, make_mesh

init_distributed()
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

mesh = make_mesh(dp=2, ep=2, tp=2)
sharding = NamedSharding(mesh, P("data"))
global_shape = (16, 128)

def fill(index):
    # Deterministic content per global position: row-major index value.
    base = np.arange(np.prod(global_shape), dtype=np.float32)
    return base.reshape(global_shape)[index]

x = jax.make_array_from_callback(global_shape, sharding, fill)
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(x)
expect = float(np.arange(np.prod(global_shape), dtype=np.float64).sum())
got = float(total.addressable_data(0))
assert abs(got - expect) < 1e-3, (got, expect)
print(f"OK rank={jax.process_index()} sum={got}", flush=True)
"""


def test_two_process_distributed_mesh():
    port = _free_port()
    env_common = {
        **os.environ,
        "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
        "JAX_NUM_PROCESSES": "2",
        "DGA_REPO": os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    }
    procs = []
    for rank in range(2):
        env = {**env_common, "JAX_PROCESS_ID": str(rank)}
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-3000:]}"
        assert f"OK rank={rank}" in out, out[-3000:]


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port
