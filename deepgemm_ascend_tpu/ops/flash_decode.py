"""Flash-decode GQA attention over the INT8 KV cache (Pallas).

Serving-path hot kernel (the reference is GEMM-only — SURVEY.md §5 "no
attention of any kind"; this exists for the north-star decode slice). The
XLA fallback (models/attention.py) dequantizes the whole cache to f32 in
HBM every step — fine for tiny benches, catastrophic at real sequence
lengths (batch·S·kvh·hd·4 bytes/layer/step). This kernel streams the int8
cache through VMEM once with online softmax, and **never dequantizes K/V**:

* scores  = (q_bf16 · k_i8→bf16ᵀ) ⊙ k_scale_row — the per-token K scale is
  a free row broadcast on the tiny (group, block_s) score matrix (int8
  values ≤ 127 are exact in bf16);
* out    += (probs ⊙ v_scale_row)_bf16 · v_i8→bf16 — V's scale folds into
  the probability matrix the same way.

So per block the VPU does O(group·block_s) scale/softmax work while the MXU
does the two (group×hd×block_s) dots — the same dequant-in-the-small-matrix
trick as the fp8 GEMM's dequant-in-accumulator.

Blocks past a sequence's length are skipped (`@pl.when`) and their DMAs
avoided by clamping the index map to the last valid block (scalar-prefetch
``seq_lens``, ≙ the grouped GEMM's masked grid).

Layout contract: caches are (batch, kv_heads, S, head_dim) int8 with scales
(batch, kv_heads, S) f32 — S in the sublane dim so int8 blocks tile
natively. q is (batch, kv_heads, group_pad, head_dim) with group_pad ≥ the
dtype's min sublane count (pad + slice handled by :func:`flash_decode_gqa`).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_common import NEG_INF, finalize, online_softmax_update, select_scale_row
from .gemm import _interpret_default

__all__ = ["flash_decode_gqa"]


def _kernel(len_ref, q_ref, kq_ref, ks_ref, vq_ref, vs_ref, o_ref,
            m_ref, l_ref, acc_ref, *, block_s: int, ns: int, scale: float):
    b = pl.program_id(0)
    kvi = pl.program_id(1)
    si = pl.program_id(2)
    seq_len = len_ref[b]

    @pl.when(si == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(si * block_s < seq_len)
    def _compute():
        q = q_ref[0, 0]                       # (g_pad, hd) bf16
        k = kq_ref[0, 0].astype(jnp.bfloat16)  # (bs, hd) int8 → exact bf16
        v = vq_ref[0, 0].astype(jnp.bfloat16)
        k_s = select_scale_row(ks_ref, kvi)   # (1, bs)
        v_s = select_scale_row(vs_ref, kvi)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (g_pad, bs)
        s = s * (k_s * scale)                 # fold K scale + 1/√hd, free
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col + si * block_s < seq_len, s, NEG_INF)
        online_softmax_update(s, v, v_s, m_ref, l_ref, acc_ref)

    @pl.when(si == ns - 1)
    def _store():
        o_ref[0, 0] = finalize(l_ref, acc_ref, o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_s", "interpret"))
def _call(seq_lens, q, k_q, k_s, v_q, v_s, *, block_s, interpret):
    b, kvh, g_pad, hd = q.shape
    ns = k_q.shape[2] // block_s
    scale = 1.0 / math.sqrt(hd)
    kernel = functools.partial(_kernel, block_s=block_s, ns=ns, scale=scale)

    def kv_map(bi, kvi, si, lens):
        # Clamp skipped blocks onto the last valid one → their DMA re-uses
        # the resident block instead of fetching dead cache lines.
        last = jnp.maximum(pl.cdiv(lens[bi], block_s) - 1, 0)
        return (bi, kvi, jnp.minimum(si, last), 0)

    def kv_map3(bi, kvi, si, lens):
        last = jnp.maximum(pl.cdiv(lens[bi], block_s) - 1, 0)
        return (bi, 0, jnp.minimum(si, last))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, kvh, ns),
        in_specs=[
            pl.BlockSpec((1, 1, g_pad, hd), lambda bi, kvi, si, lens: (bi, kvi, 0, 0)),
            pl.BlockSpec((1, 1, block_s, hd), kv_map),
            pl.BlockSpec((1, kvh, block_s), kv_map3),
            pl.BlockSpec((1, 1, block_s, hd), kv_map),
            pl.BlockSpec((1, kvh, block_s), kv_map3),
        ],
        out_specs=pl.BlockSpec((1, 1, g_pad, hd),
                               lambda bi, kvi, si, lens: (bi, kvi, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((g_pad, 128), jnp.float32),   # running max
            pltpu.VMEM((g_pad, 128), jnp.float32),   # running denom
            pltpu.VMEM((g_pad, hd), jnp.float32),    # output accumulator
        ],
    )
    params = {}
    if not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"))
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kvh, g_pad, hd), jnp.float32),
        interpret=interpret,
        **params,
    )(seq_lens, q, k_q, k_s, v_q, v_s)


def flash_decode_gqa(
    q: jax.Array,        # (b, heads, hd) bf16/f32
    k_q: jax.Array,      # (b, kvh, S, hd) int8
    k_s: jax.Array,      # (b, kvh, S) f32
    v_q: jax.Array,
    v_s: jax.Array,
    seq_lens: jax.Array,  # (b,) int32 — tokens [0, len) are attended
    *,
    block_s: int = 256,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Single-token GQA attention over the int8 cache. Returns (b, heads, hd) f32."""
    b, heads, hd = q.shape
    _, kvh, s_max, _ = k_q.shape
    if heads % kvh:
        raise ValueError(f"heads={heads} not a multiple of kv_heads={kvh}")
    g = heads // kvh
    if interpret is None:
        interpret = _interpret_default()
    # Legal S blocks: a multiple of 128 dividing S (lane-dim tiling of the
    # scale panels), or the whole length.
    bs = s_max
    if s_max > block_s:
        for cand in range((block_s // 128) * 128, 0, -128):
            if s_max % cand == 0:
                bs = cand
                break
    g_pad = max(g, 16)  # bf16 q sublane minimum
    qg = q.astype(jnp.bfloat16).reshape(b, kvh, g, hd)
    if g_pad != g:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, g_pad - g), (0, 0)))
    out = _call(jnp.asarray(seq_lens, jnp.int32), qg, k_q,
                k_s.astype(jnp.float32), v_q, v_s.astype(jnp.float32),
                block_s=bs, interpret=interpret)
    return out[:, :, :g, :].reshape(b, heads, hd)
