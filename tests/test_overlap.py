"""Decomposed collective GEMMs (parallel/overlap.py) on the 8-device mesh.

Parity targets: the monolithic-collective forms they replace —
``reduce_scatter(psum-partials)`` and ``all_gather(x) @ w`` — up to f32
summation order (the ring adds partials in rank order; psum's tree order
differs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepgemm_ascend_tpu.parallel import make_mesh
from deepgemm_ascend_tpu.parallel.overlap import (all_gather_gemm,
                                                  gemm_reduce_scatter)
from deepgemm_ascend_tpu.parallel.sharded import shard_map

P = jax.sharding.PartitionSpec


def _mats(m, k, n, seed=0, dtype=jnp.bfloat16):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((m, k)), dtype)
    w = jnp.asarray(rng.standard_normal((k, n)), dtype)
    return x, w


@pytest.mark.parametrize("tp", [2, 8])
def test_gemm_reduce_scatter_matches_psum(tp):
    m, k, n = 32, 64 * tp, 48
    x, w = _mats(m, k, n, seed=1)
    mesh = make_mesh(tp=tp)

    def ring(xl, wl):
        return gemm_reduce_scatter(xl, wl, axis_name="model", tp=tp)

    y = jax.jit(shard_map(
        ring, mesh,
        in_specs=(P(None, "model"), P("model", None)),
        out_specs=P("model", None)))(x, w)
    assert y.shape == (m, n)
    ref = jnp.dot(x.astype(jnp.float32), w.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=5e-2, atol=5e-2)


@pytest.mark.parametrize("tp", [2, 8])
def test_all_gather_gemm_matches_gather(tp):
    m, k, n = 16, 32 * tp, 64
    x, w = _mats(m, k, n, seed=2)
    mesh = make_mesh(tp=tp)

    def ring(xl, wl):
        return all_gather_gemm(xl, wl, axis_name="model", tp=tp)

    y = jax.jit(shard_map(
        ring, mesh,
        in_specs=(P(None, "model"), P(None, "model")),
        out_specs=P(None, "model")))(x, w)
    assert y.shape == (m, n)
    ref = jnp.dot(x.astype(jnp.float32), w.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=5e-2, atol=5e-2)


def test_gemm_reduce_scatter_tp1_plain_dot():
    m, k, n = 8, 16, 24
    x, w = _mats(m, k, n, seed=3, dtype=jnp.float32)
    y = gemm_reduce_scatter(x, w, axis_name="model", tp=1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(jnp.dot(x, w)),
                               rtol=1e-6)


def test_all_gather_gemm_tp1_plain_dot():
    m, k, n = 8, 16, 24
    x, w = _mats(m, k, n, seed=9, dtype=jnp.float32)
    y = all_gather_gemm(x, w, axis_name="model", tp=1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(jnp.dot(x, w)),
                               rtol=1e-6)


def test_gemm_reduce_scatter_rejects_ragged_m():
    x, w = _mats(10, 16, 8, seed=4)
    with pytest.raises(ValueError, match="divisible"):
        gemm_reduce_scatter(x, w, axis_name="model", tp=4)


def test_all_gather_gemm_rejects_bad_w_rows():
    x, _ = _mats(8, 16, 8, seed=5)
    w_bad = jnp.zeros((16, 8), jnp.bfloat16)  # needs 16*tp rows
    with pytest.raises(ValueError, match="rows"):
        all_gather_gemm(x, w_bad, axis_name="model", tp=4)


def test_ring_uses_collective_permute_not_allreduce():
    """The decomposition must lower to collective-permute hops (overlappable
    point-to-point ICI traffic), not an all-reduce/all-gather epilogue."""
    tp = 8
    m, k, n = 16, 32 * tp, 32
    x, w = _mats(m, k, n, seed=6)
    mesh = make_mesh(tp=tp)
    f = jax.jit(shard_map(
        lambda xl, wl: gemm_reduce_scatter(xl, wl, axis_name="model", tp=tp),
        mesh,
        in_specs=(P(None, "model"), P("model", None)),
        out_specs=P("model", None)))
    hlo = f.lower(x, w).compile().as_text()
    assert "collective-permute" in hlo
    assert "all-reduce" not in hlo
    # tp-1 hops, each a distinct instruction the scheduler can overlap
    assert hlo.count("collective-permute-start") >= tp - 1 or \
        hlo.count("collective-permute(") >= tp - 1
