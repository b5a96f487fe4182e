"""Flash prefill: chunked causal GQA attention over the INT8 KV cache.

Companion to ops/flash_decode.py for s > 1 (prompt ingestion). The XLA
prefill path materializes a (b, s, heads, S) f32 logits tensor — 128 MB per
layer at a 512-token bucket against a 4096-slot cache. This kernel streams
K/V blocks with online softmax per query block instead; K/V stay int8 until
the MXU (exact bf16 conversion), with per-token scales folded into the
(rows, block_s) score/probability matrices exactly as in flash decode.

Contract: query positions are CONSECUTIVE — row i of batch b sits at
absolute position ``start[b] + i`` (true for prompt ingestion; the engine
and ``forward`` always write prompts contiguously). ``start`` rides as a
scalar-prefetch argument so causal masking and block skipping stay
data-dependent without a positions tensor.

Grid (b, kvh, nq, ns), ns innermost ("arbitrary"): each query block keeps
(m, l, acc) online-softmax state in VMEM scratch, reset at ns step 0.
Causality prunes future S blocks: their index maps clamp onto the last
needed block (no dead DMAs) and compute is skipped.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_common import (NEG_INF, finalize, online_softmax_update,
                           pick_block_s, select_scale_row)
from .gemm import _interpret_default

__all__ = ["flash_prefill_gqa"]


def _kernel(start_ref, len_ref, q_ref, kq_ref, ks_ref, vq_ref, vs_ref,
            o_ref, *outs, block_q: int, block_s: int, ns: int, g: int,
            scale: float, return_stats: bool = False):
    if return_stats:
        mo_ref, lo_ref, m_ref, l_ref, acc_ref = outs
    else:
        m_ref, l_ref, acc_ref = outs
    b = pl.program_id(0)
    kvi = pl.program_id(1)
    qi = pl.program_id(2)
    si = pl.program_id(3)
    start = start_ref[b]
    seq_len = len_ref[b]

    @pl.when(si == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # This S block is needed iff it contains keys at or before the last
    # query position of the block, and within the valid cache length.
    q_hi = start + qi * block_q + block_q - 1     # last query position
    needed = (si * block_s <= q_hi) & (si * block_s < seq_len)

    @pl.when(needed)
    def _compute():
        rows = g * block_q
        q = q_ref[0, 0].reshape(rows, q_ref.shape[-1])   # (g·bq, hd) bf16
        k = kq_ref[0, 0].astype(jnp.bfloat16)            # (bs, hd)
        v = vq_ref[0, 0].astype(jnp.bfloat16)
        k_s = select_scale_row(ks_ref, kvi)              # (1, bs)
        v_s = select_scale_row(vs_ref, kvi)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # (rows, bs)
        s = s * (k_s * scale)
        # Causal + validity mask. Row r = head-group gh·block_q + local qi:
        # its token position is start + qi·block_q + (r mod block_q).
        r_iota = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        c_iota = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        pos = start + qi * block_q + jax.lax.rem(r_iota, block_q)
        t = si * block_s + c_iota
        s = jnp.where((t <= pos) & (t < seq_len), s, NEG_INF)
        online_softmax_update(s, v, v_s, m_ref, l_ref, acc_ref)

    @pl.when(si == ns - 1)
    def _store():
        if return_stats:
            # Raw online-softmax state for cross-chunk merging (ring
            # attention): unnormalized acc + per-row (m, l).
            hd = o_ref.shape[-1]
            o_ref[0, 0] = acc_ref[:].reshape(g, block_q, hd)
            mo_ref[0, 0] = m_ref[:, 0:1].reshape(g, block_q, 1)
            lo_ref[0, 0] = l_ref[:, 0:1].reshape(g, block_q, 1)
        else:
            out = finalize(l_ref, acc_ref, o_ref.dtype)
            o_ref[0, 0] = out.reshape(g, block_q, o_ref.shape[-1])


@functools.partial(jax.jit,
                   static_argnames=("block_q", "block_s", "interpret",
                                    "return_stats"))
def _call(start, seq_lens, q, k_q, k_s, v_q, v_s, *,
          block_q, block_s, interpret, return_stats=False):
    b, kvh, g, s, hd = q.shape
    s_max = k_q.shape[2]
    nq = s // block_q
    ns = s_max // block_s
    scale = 1.0 / math.sqrt(hd)
    kernel = functools.partial(_kernel, block_q=block_q, block_s=block_s,
                               ns=ns, g=g, scale=scale,
                               return_stats=return_stats)

    def kv_map(bi, kvi, qi, si, start, lens):
        # Clamp unneeded S blocks (future of this q block / past seq_len)
        # onto the last needed one → their DMAs hit the resident block.
        q_hi = start[bi] + qi * block_q + block_q - 1
        last = jnp.minimum(q_hi // block_s,
                           jnp.maximum(pl.cdiv(lens[bi], block_s) - 1, 0))
        last = jnp.maximum(last, 0)
        return (bi, kvi, jnp.minimum(si, last), 0)

    def kv_map3(bi, kvi, qi, si, start, lens):
        idx = kv_map(bi, kvi, qi, si, start, lens)
        return (bi, 0, idx[2])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, kvh, nq, ns),
        in_specs=[
            pl.BlockSpec((1, 1, g, block_q, hd),
                         lambda bi, kvi, qi, si, st, ln: (bi, kvi, 0, qi, 0)),
            pl.BlockSpec((1, 1, block_s, hd), kv_map),
            pl.BlockSpec((1, kvh, block_s), kv_map3),
            pl.BlockSpec((1, 1, block_s, hd), kv_map),
            pl.BlockSpec((1, kvh, block_s), kv_map3),
        ],
        out_specs=(
            (pl.BlockSpec((1, 1, g, block_q, hd),
                          lambda bi, kvi, qi, si, st, ln: (bi, kvi, 0, qi, 0)),
             pl.BlockSpec((1, 1, g, block_q, 1),
                          lambda bi, kvi, qi, si, st, ln: (bi, kvi, 0, qi, 0)),
             pl.BlockSpec((1, 1, g, block_q, 1),
                          lambda bi, kvi, qi, si, st, ln: (bi, kvi, 0, qi, 0)))
            if return_stats else
            pl.BlockSpec((1, 1, g, block_q, hd),
                         lambda bi, kvi, qi, si, st, ln: (bi, kvi, 0, qi, 0))),
        scratch_shapes=[
            pltpu.VMEM((g * block_q, 128), jnp.float32),
            pltpu.VMEM((g * block_q, 128), jnp.float32),
            pltpu.VMEM((g * block_q, hd), jnp.float32),
        ],
    )
    params = {}
    if not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"))
    out_shape = (
        (jax.ShapeDtypeStruct((b, kvh, g, s, hd), jnp.float32),
         jax.ShapeDtypeStruct((b, kvh, g, s, 1), jnp.float32),
         jax.ShapeDtypeStruct((b, kvh, g, s, 1), jnp.float32))
        if return_stats else
        jax.ShapeDtypeStruct((b, kvh, g, s, hd), jnp.float32))
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        **params,
    )(start, seq_lens, q, k_q, k_s, v_q, v_s)


def flash_prefill_gqa(
    q: jax.Array,          # (b, s, heads, hd) bf16/f32
    k_q: jax.Array,        # (b, kvh, S, hd) int8
    k_s: jax.Array,        # (b, kvh, S) f32
    v_q: jax.Array,
    v_s: jax.Array,
    start: jax.Array,      # (b,) int32 — absolute position of q row 0
    seq_lens: jax.Array,   # (b,) int32 — valid cache length (incl. prompt)
    *,
    block_q: int = 512,
    block_s: int = 2048,
    interpret: Optional[bool] = None,
    return_stats: bool = False,
):
    """Causal GQA prefill over the int8 cache. Returns (b, s, heads, hd) f32
    (or the 3-tuple described under ``return_stats``).

    Query row i of batch b is at absolute position start[b] + i and attends
    cache positions t with ``t <= start[b] + i`` and ``t < seq_lens[b]``.
    ``start`` may be NEGATIVE (ring-attention hops use a relative offset):
    rows before position 0 see nothing and report the empty state.

    ``return_stats``: return the raw online-softmax state instead of the
    normalized output — (acc (b, s, heads, hd) f32 unnormalized,
    m (b, s, heads) f32 row max with NEG_INF = empty, l (b, s, heads) f32
    exp-sum) — for cross-chunk merging (parallel/ring_attention.py).

    Default blocks are on-chip-tuned (scripts/tune_flash_prefill.py, v5e,
    b=8 s=512 S=2048): like the decode kernel, per-(batch, head) cache DMAs
    must be LARGE to reach HBM bandwidth on the single sequential
    TensorCore — (512, 2048) streams at 101 GB/s vs 28.9 for the previous
    (256, 256) default (3.5× faster end-to-end on that case). Both degrade
    gracefully: block_q falls to the largest 16-multiple dividing s,
    block_s to the largest 128-multiple dividing S.
    """
    b, s, heads, hd = q.shape
    _, kvh, s_max, _ = k_q.shape
    if heads % kvh:
        raise ValueError(f"heads={heads} not a multiple of kv_heads={kvh}")
    g = heads // kvh
    if interpret is None:
        interpret = _interpret_default()

    # Legal q blocks: a multiple of 16 dividing s (the in-kernel
    # (g, bq, hd) → (g·bq, hd) collapse must land on bf16 sublane-tile
    # boundaries — bq % 16 keeps every group's rows tile-aligned and
    # guarantees ≥ 16 rows). No such block → the caller must use the XLA
    # path (attention() gates on s % 16 == 0 and never hits this).
    #
    # GQA VMEM clamp: the kernel's scoped VMEM scales with the COLLAPSED
    # row count g·bq (acc/m/l scratch, q and out blocks all carry g·bq
    # rows). The tuned (512, 2048) default was measured at g=1; at g=4 it
    # compiles to an 18.1 MB scoped allocation against the 16 MB budget
    # (measured round 5: serve_bench --mode prefix, V2_LITE GQA). Cap
    # g·bq·hd at 1024·128 f32-rows — the largest empirically-compiling
    # point — so grouped-head geometries degrade to smaller q blocks
    # instead of failing to compile.
    row_cap = max(16, (1024 * 128 // hd) // g)
    bq = 0
    for cand in range(min((block_q // 16) * 16, (s // 16) * 16,
                          (row_cap // 16) * 16), 0, -16):
        if s % cand == 0:
            bq = cand
            break
    if bq == 0:
        raise ValueError(
            f"flash_prefill_gqa needs a q-block that is a multiple of 16 "
            f"dividing s={s}; use the XLA attention path for ragged prompts")
    bs = pick_block_s(s_max, block_s)
    # (g, block_q, hd) collapses to (g·block_q, hd) rows in-kernel; bf16
    # wants ≥16 sublanes — guaranteed when g·bq ≥ 16, else grow bq.
    qg = (q.astype(jnp.bfloat16)
          .reshape(b, s, kvh, g, hd).transpose(0, 2, 3, 1, 4))
    out = _call(jnp.asarray(start, jnp.int32),
                jnp.asarray(seq_lens, jnp.int32), qg, k_q,
                k_s.astype(jnp.float32), v_q, v_s.astype(jnp.float32),
                block_q=bq, block_s=bs, interpret=interpret,
                return_stats=return_stats)
    unpack = lambda x: (x.transpose(0, 3, 1, 2, 4)
                        .reshape(b, s, heads, x.shape[-1]))
    if return_stats:
        acc, m, l = out
        return unpack(acc), unpack(m)[..., 0], unpack(l)[..., 0]
    return unpack(out)
