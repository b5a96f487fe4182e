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

from .flash_common import (NEG_INF, finalize, online_softmax_update,
                           pick_block_s, select_scale_row)
from .gemm import _interpret_default

__all__ = ["flash_decode_gqa", "flash_decode_gqa_inplace",
           "flash_decode_gqa_state"]


def _kernel(len_ref, q_ref, kq_ref, ks_ref, vq_ref, vs_ref, o_ref,
            m_ref, l_ref, acc_ref, *, block_s: int, ns: int, scale: float):
    _kernel_compute_only(len_ref, q_ref, kq_ref, ks_ref, vq_ref, vs_ref,
                         m_ref, l_ref, acc_ref, block_s=block_s,
                         scale=scale)

    @pl.when(pl.program_id(2) == ns - 1)
    def _store():
        o_ref[0, 0] = finalize(l_ref, acc_ref, o_ref.dtype)


def _kernel_state(len_ref, q_ref, kq_ref, ks_ref, vq_ref, vs_ref,
                  oa_ref, om_ref, ol_ref, m_ref, l_ref, acc_ref, *,
                  block_s: int, ns: int, scale: float):
    """State-returning variant: emits the UNNORMALIZED accumulator plus the
    online-softmax (m, l) state instead of acc/l — lets the caller merge
    extra terms (e.g. the current decode token, models/attention.py)."""
    _kernel_compute_only(len_ref, q_ref, kq_ref, ks_ref, vq_ref, vs_ref,
                         m_ref, l_ref, acc_ref, block_s=block_s,
                         scale=scale)

    @pl.when(pl.program_id(2) == ns - 1)
    def _store():
        oa_ref[0, 0] = acc_ref[:]
        om_ref[0, 0] = m_ref[:]
        ol_ref[0, 0] = l_ref[:]


def _kernel_compute_only(len_ref, q_ref, kq_ref, ks_ref, vq_ref, vs_ref,
                         m_ref, l_ref, acc_ref, *, block_s: int,
                         scale: float):
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
        q = q_ref[0, 0]
        k = kq_ref[0, 0].astype(jnp.bfloat16)
        v = vq_ref[0, 0].astype(jnp.bfloat16)
        k_s = select_scale_row(ks_ref, kvi)
        v_s = select_scale_row(vs_ref, kvi)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = s * (k_s * scale)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col + si * block_s < seq_len, s, NEG_INF)
        online_softmax_update(s, v, v_s, m_ref, l_ref, acc_ref)


def _decode_kv_maps(block_s: int):
    """Clamped index maps shared by all decode-call variants: blocks past a
    sequence's last valid one re-use the resident block (no dead DMAs)."""

    def kv_map(bi, kvi, si, lens):
        last = jnp.maximum(pl.cdiv(lens[bi], block_s) - 1, 0)
        return (bi, kvi, jnp.minimum(si, last), 0)

    def kv_map3(bi, kvi, si, lens):
        last = jnp.maximum(pl.cdiv(lens[bi], block_s) - 1, 0)
        return (bi, 0, jnp.minimum(si, last))

    return kv_map, kv_map3


@functools.partial(jax.jit, static_argnames=("block_s", "interpret"))
def _call(seq_lens, q, k_q, k_s, v_q, v_s, *, block_s, interpret):
    b, kvh, g_pad, hd = q.shape
    ns = k_q.shape[2] // block_s
    scale = 1.0 / math.sqrt(hd)
    kernel = functools.partial(_kernel, block_s=block_s, ns=ns, scale=scale)

    kv_map, kv_map3 = _decode_kv_maps(block_s)

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


@functools.partial(jax.jit, static_argnames=("block_s", "interpret"))
def _call_state(seq_lens, q, k_q, k_s, v_q, v_s, *, block_s, interpret):
    b, kvh, g_pad, hd = q.shape
    ns = k_q.shape[2] // block_s
    scale = 1.0 / math.sqrt(hd)
    kernel = functools.partial(_kernel_state, block_s=block_s, ns=ns,
                               scale=scale)

    kv_map, kv_map3 = _decode_kv_maps(block_s)

    out_map = lambda bi, kvi, si, lens: (bi, kvi, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, kvh, ns),
        in_specs=[
            pl.BlockSpec((1, 1, g_pad, hd), out_map),
            pl.BlockSpec((1, 1, block_s, hd), kv_map),
            pl.BlockSpec((1, kvh, block_s), kv_map3),
            pl.BlockSpec((1, 1, block_s, hd), kv_map),
            pl.BlockSpec((1, kvh, block_s), kv_map3),
        ],
        out_specs=(pl.BlockSpec((1, 1, g_pad, hd), out_map),
                   pl.BlockSpec((1, 1, g_pad, 128), out_map),
                   pl.BlockSpec((1, 1, g_pad, 128), out_map)),
        scratch_shapes=[
            pltpu.VMEM((g_pad, 128), jnp.float32),
            pltpu.VMEM((g_pad, 128), jnp.float32),
            pltpu.VMEM((g_pad, hd), jnp.float32),
        ],
    )
    params = {}
    if not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"))
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((b, kvh, g_pad, hd), jnp.float32),
                   jax.ShapeDtypeStruct((b, kvh, g_pad, 128), jnp.float32),
                   jax.ShapeDtypeStruct((b, kvh, g_pad, 128), jnp.float32)),
        interpret=interpret,
        **params,
    )(seq_lens, q, k_q, k_s, v_q, v_s)


def flash_decode_gqa_state(
    q: jax.Array,        # (b, heads, hd)
    k_q: jax.Array,      # (b, kvh, S, hd) int8
    k_s: jax.Array,      # (b, kvh, S) f32
    v_q: jax.Array,
    v_s: jax.Array,
    seq_lens: jax.Array,
    *,
    block_s: int = 1024,
    interpret: Optional[bool] = None,
):
    """Like :func:`flash_decode_gqa` but returns the raw online-softmax
    state ``(acc, m, l)`` — acc (b, heads, hd) UNNORMALIZED, m/l (b, heads)
    — so callers can merge additional attention terms exactly:

        M = max(m, s_extra); α = e^(m−M); β = e^(s_extra−M)
        out = (acc·α + β·v_extra) / (l·α + β)

    Empty sequences yield m = −1e30, l = 0 → the merge degenerates to the
    extra term alone. Used by the decode path to fold in the current token
    without routing the freshly-scattered cache through the kernel (which
    would force XLA to materialize a copy of the whole cache per step)."""
    b, heads, hd = q.shape
    _, kvh, s_max, _ = k_q.shape
    if heads % kvh:
        raise ValueError(f"heads={heads} not a multiple of kv_heads={kvh}")
    g = heads // kvh
    if interpret is None:
        interpret = _interpret_default()
    bs = pick_block_s(s_max, block_s)
    g_pad = max(g, 16)
    qg = q.astype(jnp.bfloat16).reshape(b, kvh, g, hd)
    if g_pad != g:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, g_pad - g), (0, 0)))
    acc, m, l = _call_state(
        jnp.minimum(jnp.asarray(seq_lens, jnp.int32), s_max), qg, k_q,
        k_s.astype(jnp.float32), v_q, v_s.astype(jnp.float32),
        block_s=bs, interpret=interpret)
    acc = acc[:, :, :g, :].reshape(b, heads, hd)
    m = m[:, :, :g, 0].reshape(b, heads)
    l = l[:, :, :g, 0].reshape(b, heads)
    return acc, m, l


def _kernel_inplace(len_ref, q_ref, kq_ref, ks_ref, vq_ref, vs_ref,
                    kn_ref, vn_ref, ksn_ref, vsn_ref,
                    o_ref, okq_ref, ovq_ref, oks_ref, ovs_ref,
                    m_ref, l_ref, acc_ref, *,
                    block_s: int, ns: int, scale: float, tile: int):
    """Cache-writing variant: the current token's quantized K/V rows AND
    scale entries ride as tiny inputs, are spliced into the resident
    blocks for the attention math, and the cache tiles containing the new
    entries are written back through aliased outputs. This keeps the whole
    cache update INSIDE the kernel: scattering it in XLA while the kernel
    reads the same buffers makes the compiler materialize full cache
    copies every decode step (measured ~9 ms for V2_LITE at batch 64 /
    S 2048 for the int8 values; the scale panels cost another ~1 ms at
    long caches).

    ksn/vsn: (1, kvh, 1) f32 blocks — every program of a batch row writes
    the same spliced (kvh, tile) scale slab, so the kvh-indexed writes are
    idempotent (no cross-program race on the sequential core).
    """
    b = pl.program_id(0)
    kvi = pl.program_id(1)
    si = pl.program_id(2)
    seq_len = len_ref[b]          # length INCLUDING the current token
    pos = seq_len - 1             # the current token's slot

    @pl.when(si == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def spliced(blk_ref, new_ref):
        blk = blk_ref[0, 0]                                  # (bs, hd) int8
        row = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 0)
        # Clamped index maps fetch the pos block for si ≥ pos // bs, so
        # compare against the CLAMPED global index of what was fetched.
        last = jnp.maximum(pl.cdiv(seq_len, block_s) - 1, 0)
        t = jnp.minimum(si, last) * block_s + row
        return jnp.where(t == pos, new_ref[0, 0], blk)

    def new_scale_scalar(sn_ref):
        # This kv head's new scale: one-hot row select over (kvh, 1).
        kvh = sn_ref.shape[1]
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (1, kvh), 1)
                  == kvi).astype(jnp.float32)
        return jnp.dot(onehot, sn_ref[0],
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)    # (1, 1)

    def spliced_scale_row(sc_ref, sn_ref):
        row = select_scale_row(sc_ref, kvi)                    # (1, bs)
        col = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
        last = jnp.maximum(pl.cdiv(seq_len, block_s) - 1, 0)
        t = jnp.minimum(si, last) * block_s + col
        return jnp.where(t == pos, new_scale_scalar(sn_ref), row)

    @pl.when(si * block_s < seq_len)
    def _compute():
        q = q_ref[0, 0]
        k = spliced(kq_ref, kn_ref).astype(jnp.bfloat16)
        v = spliced(vq_ref, vn_ref).astype(jnp.bfloat16)
        k_s = spliced_scale_row(ks_ref, ksn_ref)
        v_s = spliced_scale_row(vs_ref, vsn_ref)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = s * (k_s * scale)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col + si * block_s < seq_len, s, NEG_INF)
        online_softmax_update(s, v, v_s, m_ref, l_ref, acc_ref)

    @pl.when(si == ns - 1)
    def _store():
        o_ref[0, 0] = finalize(l_ref, acc_ref, o_ref.dtype)
        # Write back the cache tiles containing the new entries (tile =
        # 128 when S divides; whole-S otherwise). The resident input
        # blocks at si == ns-1 are the clamped (pos-containing) ones;
        # slice the REFS at provably tile-aligned offsets (value-level
        # dynamic_slice has no Mosaic lowering).
        # tile == block_s ⇒ the offset is identically 0; make that STATIC.
        # (Mosaic only accepts dynamic lane-dim slice starts it can prove
        # are 128-aligned — with tile < 128, e.g. small test caches where
        # S % 128 != 0, the traced `rem//tile*tile` form is rejected even
        # though its value is 0. Caught by the v5e:2x4 topology AOT compile.)
        if tile == block_s:
            off = 0
        else:
            off = pl.multiple_of(
                (jax.lax.rem(pos, block_s) // tile) * tile, tile)
        last = jnp.maximum(pl.cdiv(seq_len, block_s) - 1, 0)
        row = jax.lax.broadcasted_iota(jnp.int32, (tile, kn_ref.shape[-1]), 0)
        t = last * block_s + off + row
        okq_ref[0, 0] = jnp.where(t == pos, kn_ref[0, 0],
                                  kq_ref[0, 0, pl.ds(off, tile), :])
        ovq_ref[0, 0] = jnp.where(t == pos, vn_ref[0, 0],
                                  vq_ref[0, 0, pl.ds(off, tile), :])
        # Scale tiles: (kvh, tile) slabs spliced with ALL kv heads' new
        # scales — identical content from every kvi program (idempotent).
        kvh = ks_ref.shape[1]
        tcol = jax.lax.broadcasted_iota(jnp.int32, (kvh, tile), 1)
        tglob = last * block_s + off + tcol
        oks_ref[0] = jnp.where(tglob == pos, ksn_ref[0],
                               ks_ref[0, :, pl.ds(off, tile)])
        ovs_ref[0] = jnp.where(tglob == pos, vsn_ref[0],
                               vs_ref[0, :, pl.ds(off, tile)])


@functools.partial(jax.jit, static_argnames=("block_s", "interpret"))
def _call_inplace(seq_lens, q, k_q, k_s, v_q, v_s, k_new, v_new,
                  k_snew, v_snew, *, block_s, interpret):
    b, kvh, g_pad, hd = q.shape
    ns = k_q.shape[2] // block_s
    scale = 1.0 / math.sqrt(hd)
    tile = 128 if k_q.shape[2] % 128 == 0 else k_q.shape[2]
    kernel = functools.partial(_kernel_inplace, block_s=block_s, ns=ns,
                               scale=scale, tile=tile)

    kv_map, kv_map3 = _decode_kv_maps(block_s)

    def tile_map(bi, kvi, si, lens):
        # Cache tile holding the new token (constant in si → one writeback
        # per (b, kv head)).
        return (bi, kvi, jnp.maximum(lens[bi] - 1, 0) // tile, 0)

    def scale_tile_map(bi, kvi, si, lens):
        return (bi, 0, jnp.maximum(lens[bi] - 1, 0) // tile)

    q_map = lambda bi, kvi, si, lens: (bi, kvi, 0, 0)
    new_map = lambda bi, kvi, si, lens: (bi, kvi, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, kvh, ns),
        in_specs=[
            pl.BlockSpec((1, 1, g_pad, hd), q_map),
            pl.BlockSpec((1, 1, block_s, hd), kv_map),
            pl.BlockSpec((1, kvh, block_s), kv_map3),
            pl.BlockSpec((1, 1, block_s, hd), kv_map),
            pl.BlockSpec((1, kvh, block_s), kv_map3),
            pl.BlockSpec((1, 1, 1, hd), new_map),
            pl.BlockSpec((1, 1, 1, hd), new_map),
            pl.BlockSpec((1, kvh, 1), lambda bi, kvi, si, lens: (bi, 0, 0)),
            pl.BlockSpec((1, kvh, 1), lambda bi, kvi, si, lens: (bi, 0, 0)),
        ],
        out_specs=(pl.BlockSpec((1, 1, g_pad, hd), q_map),
                   pl.BlockSpec((1, 1, tile, hd), tile_map),
                   pl.BlockSpec((1, 1, tile, hd), tile_map),
                   pl.BlockSpec((1, kvh, tile), scale_tile_map),
                   pl.BlockSpec((1, kvh, tile), scale_tile_map)),
        scratch_shapes=[
            pltpu.VMEM((g_pad, 128), jnp.float32),
            pltpu.VMEM((g_pad, 128), jnp.float32),
            pltpu.VMEM((g_pad, hd), jnp.float32),
        ],
    )
    params = {}
    if not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"))
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((b, kvh, g_pad, hd), jnp.float32),
                   jax.ShapeDtypeStruct(k_q.shape, k_q.dtype),
                   jax.ShapeDtypeStruct(v_q.shape, v_q.dtype),
                   jax.ShapeDtypeStruct(k_s.shape, jnp.float32),
                   jax.ShapeDtypeStruct(v_s.shape, jnp.float32)),
        # Operand indices include the scalar-prefetch arg: seq_lens=0, q=1,
        # k_q=2, k_s=3, v_q=4, v_s=5, k_new=6, v_new=7, k_snew=8, v_snew=9.
        input_output_aliases={2: 1, 4: 2, 3: 3, 5: 4},
        interpret=interpret,
        **params,
    )(seq_lens, q, k_q, k_s, v_q, v_s, k_new, v_new, k_snew, v_snew)


def flash_decode_gqa_inplace(
    q: jax.Array,         # (b, heads, hd)
    k_q: jax.Array,       # (b, kvh, S, hd) int8 — rows [0, len-1) valid
    k_s: jax.Array,       # (b, kvh, S) f32 — rows [0, len-1) valid
    v_q: jax.Array,
    v_s: jax.Array,
    k_new: jax.Array,     # (b, kvh, hd) int8 — the current token's row
    v_new: jax.Array,
    k_snew: jax.Array,    # (b, kvh) f32 — the current token's scales
    v_snew: jax.Array,
    seq_lens: jax.Array,  # (b,) int32 — length INCLUDING the current token
    *,
    block_s: int = 1024,
    interpret: Optional[bool] = None,
):
    """Fused decode attention + full cache write.

    Attends tokens [0, seq_lens) where the last row comes from
    ``k_new``/``v_new``/``k_snew``/``v_snew`` (not yet in the caches), and
    returns ``(out (b, heads, hd) f32, k_q', v_q', k_s', v_s')`` with the
    new entries written into all four (aliased, in-place) cache arrays —
    nothing about the cache ever passes through an XLA scatter.
    """
    b, heads, hd = q.shape
    _, kvh, s_max, _ = k_q.shape
    if heads % kvh:
        raise ValueError(f"heads={heads} not a multiple of kv_heads={kvh}")
    g = heads // kvh
    if interpret is None:
        interpret = _interpret_default()
    bs = pick_block_s(s_max, block_s)
    g_pad = max(g, 16)
    qg = q.astype(jnp.bfloat16).reshape(b, kvh, g, hd)
    if g_pad != g:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, g_pad - g), (0, 0)))
    # Clamp to the cache extent: the engine decodes ALL slots, so a freed
    # slot whose device seq_len already equals S would otherwise derive
    # pos = S and overrun the tile/kv index maps (XLA clamps the writeback
    # onto the wrong cache tile). Clamped, its (meaningless) output stays
    # in-range and a reused slot is rewritten by prefill before attending.
    seq_lens = jnp.minimum(jnp.asarray(seq_lens, jnp.int32), s_max)
    out, kq2, vq2, ks2, vs2 = _call_inplace(
        seq_lens, qg, k_q,
        k_s.astype(jnp.float32), v_q, v_s.astype(jnp.float32),
        k_new[:, :, None, :], v_new[:, :, None, :],
        k_snew[:, :, None].astype(jnp.float32),
        v_snew[:, :, None].astype(jnp.float32),
        block_s=bs, interpret=interpret)
    return (out[:, :, :g, :].reshape(b, heads, hd), kq2, vq2, ks2, vs2)


def flash_decode_gqa(
    q: jax.Array,        # (b, heads, hd) bf16/f32
    k_q: jax.Array,      # (b, kvh, S, hd) int8
    k_s: jax.Array,      # (b, kvh, S) f32
    v_q: jax.Array,
    v_s: jax.Array,
    seq_lens: jax.Array,  # (b,) int32 — tokens [0, len) are attended
    *,
    block_s: int = 1024,
    interpret: Optional[bool] = None,
) -> jax.Array:
    # block_s default: measured on v5e at (b=64, kvh=4, S=2048, hd=128,
    # full lens): 256→122 GB/s, 512→199, 1024→321, 2048→451 — each program
    # is one (batch, kv-head) whose K/V DMAs must be large to approach HBM
    # bandwidth on the single sequential TensorCore. 1024 trades ~30% of
    # that win for bounded skip-waste on short sequences (fetch rounds up
    # to one block).
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
    bs = pick_block_s(s_max, block_s)
    g_pad = max(g, 16)  # bf16 q sublane minimum
    qg = q.astype(jnp.bfloat16).reshape(b, kvh, g, hd)
    if g_pad != g:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, g_pad - g), (0, 0)))
    out = _call(jnp.minimum(jnp.asarray(seq_lens, jnp.int32), s_max), qg, k_q,
                k_s.astype(jnp.float32), v_q, v_s.astype(jnp.float32),
                block_s=bs, interpret=interpret)
    return out[:, :, :g, :].reshape(b, heads, hd)
