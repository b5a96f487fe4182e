"""Decomposed collective GEMMs — compute/communication overlap on the ICI ring.

SURVEY §7 hard-part (c): the reference has no distributed layer at all; on
TPU the canonical mechanism (scaling-book recipe) is to DECOMPOSE the
collective around a sharded matmul into a ring of ``lax.ppermute`` steps
interleaved with per-chunk partial dots, so XLA's latency-hiding scheduler
overlaps each step's collective-permute with the next step's MXU work.
A monolithic ``psum``/``all_gather`` epilogue serializes: all FLOPs, then
all bytes. The decomposed forms below hide up to (tp-1)/tp of the
collective time behind compute for large GEMMs.

Both are written for use INSIDE :func:`shard_map` (they use a named mesh
axis), with a static ring size — the per-step dots are distinct HLO
instructions, which is exactly what lets the scheduler interleave them.

* :func:`gemm_reduce_scatter` — row-parallel linear (weights sharded on K):
  each rank owns ``x_local (m, k/tp) @ w_local (k/tp, n)``; instead of
  ``psum`` (full (m, n) partial exchanged tp times) the partial sums ride a
  reduce-scatter ring and each rank finishes with the fully-summed M-chunk
  it owns. Exchanged bytes: (tp-1)/tp of ONE (m, n) buffer — tp× less than
  psum — and each hop overlaps the next chunk's dot.

* :func:`all_gather_gemm` — column-parallel linear consuming a K-sharded
  activation: rotate the activation shard around the ring and accumulate
  ``x_chunk @ w[rows(chunk)]`` per hop, so the full activation is never
  materialized and each hop's transfer overlaps the previous chunk's dot.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["gemm_reduce_scatter", "all_gather_gemm"]


def _ring_perm(tp: int, reverse: bool = False):
    """Nearest-neighbor ring permutation (rides ICI links, never DCN)."""
    if reverse:
        return [((i + 1) % tp, i) for i in range(tp)]
    return [(i, (i + 1) % tp) for i in range(tp)]


def gemm_reduce_scatter(x_local: jax.Array, w_local: jax.Array, *,
                        axis_name: str, tp: int,
                        preferred_element_type=jnp.float32) -> jax.Array:
    """Row-parallel GEMM with a reduce-scatter ring epilogue.

    Args:
      x_local: (m, k_local) activation shard (K sharded over ``axis_name``).
      w_local: (k_local, n) weight shard.
      tp: static ring size (``mesh.shape[axis_name]``); m % tp must be 0.

    Returns:
      (m // tp, n): the fully-summed output rows owned by this rank
      (row-chunk ``axis_index``), i.e. the result is M-sharded over
      ``axis_name`` — ``reduce_scatter(psum_partials, dim=0)``.

    Ring schedule (tp-1 hops): start with the partial M-chunk owned by the
    rank tp-1 hops downstream, then alternate (ppermute acc forward, add the
    next chunk's local partial). Each hop's collective-permute overlaps the
    next chunk's dot under XLA's latency-hiding scheduler.
    """
    m, _ = x_local.shape
    if m % tp:
        raise ValueError(f"m={m} must be divisible by the ring size tp={tp}")
    if tp == 1:
        return lax.dot_general(
            x_local, w_local, (((1,), (0,)), ((), ())),
            preferred_element_type=preferred_element_type)
    mc = m // tp
    idx = lax.axis_index(axis_name)

    def chunk_partial(c):
        # Partial rows for global chunk c: x rows [c*mc, (c+1)*mc).
        xc = lax.dynamic_slice_in_dim(x_local, c * mc, mc, axis=0)
        return lax.dot_general(
            xc, w_local, (((1,), (0,)), ((), ())),
            preferred_element_type=preferred_element_type)

    # After s of the tp-1 hops the accumulator holds the chunk that is
    # (tp-1-s) hops downstream of this rank; it arrives home fully summed.
    acc = chunk_partial((idx + tp - 1) % tp)
    for s in range(1, tp):
        acc = lax.ppermute(acc, axis_name, _ring_perm(tp))
        acc = acc + chunk_partial((idx + tp - 1 - s) % tp)
    return acc


def all_gather_gemm(x_local: jax.Array, w_rows: jax.Array, *,
                    axis_name: str, tp: int,
                    preferred_element_type=jnp.float32) -> jax.Array:
    """Column-parallel GEMM over a K-sharded activation, gather decomposed.

    Args:
      x_local: (m, k_local) activation shard (K sharded over ``axis_name``).
      w_rows: (k_local * tp, n_local) — this rank's weight COLUMNS with all
        K rows resident (the standard column-parallel layout).
      tp: static ring size.

    Returns:
      (m, n_local) = full_x @ w_rows, without ever materializing full_x:
      the activation shard rotates around the ring and each arriving chunk
      multiplies the matching K-rows of ``w_rows``, so each hop's transfer
      overlaps the previous chunk's dot. Equivalent to
      ``all_gather(x, axis) @ w_rows`` up to f32 summation order.
    """
    m, k_local = x_local.shape
    if w_rows.shape[0] != k_local * tp:
        raise ValueError(f"w_rows must have {k_local * tp} rows "
                         f"(k_local={k_local} × tp={tp}), got {w_rows.shape}")
    if tp == 1:
        return lax.dot_general(
            x_local, w_rows, (((1,), (0,)), ((), ())),
            preferred_element_type=preferred_element_type)
    idx = lax.axis_index(axis_name)

    def rows_dot(chunk_owner, xc):
        wr = lax.dynamic_slice_in_dim(w_rows, chunk_owner * k_local,
                                      k_local, axis=0)
        return lax.dot_general(
            xc, wr, (((1,), (0,)), ((), ())),
            preferred_element_type=preferred_element_type)

    buf = x_local
    y = rows_dot(idx, buf)
    for s in range(1, tp):
        # Reverse ring: after s hops this rank holds the shard of rank
        # (idx + s) % tp.
        buf = lax.ppermute(buf, axis_name, _ring_perm(tp, reverse=True))
        y = y + rows_dot((idx + s) % tp, buf)
    return y
