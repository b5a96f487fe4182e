"""Ring attention — context-parallel (CP) prefill over a KV ring.

Long-context prefill splits the SEQUENCE over a mesh axis: each shard holds
S/cp query rows and S/cp KV rows. KV shards rotate around the ICI ring
(``lax.ppermute``), and each hop's partial attention merges into a running
online-softmax state — the sequence dimension scales with the mesh without
any shard ever materializing the full K/V (memory per chip stays S/cp), and
each hop's permute overlaps the previous chunk's attention math under XLA's
latency-hiding scheduler (same decomposition discipline as
``parallel/overlap.py``).

The reference has no long-context/CP story at all (SURVEY §5); this is the
TPU-native mechanism for it. Three entry points:

* :func:`ring_attention_prefill` — bf16 q/k/v, XLA einsum chunks; supports
  the contiguous schedule AND the load-balanced zigzag schedule.
* :func:`ring_flash_prefill` — the production form over the INT8 KV cache:
  each hop runs the Pallas flash-prefill kernel (``return_stats``) and the
  raw (acc, m, l) states merge across hops.
* :func:`zigzag_order` / :func:`zigzag_inverse` — zigzag layout helpers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .overlap import _ring_perm

__all__ = ["ring_attention_prefill", "ring_flash_prefill",
           "zigzag_order", "zigzag_inverse"]


def zigzag_order(cp: int, s_total: int):
    """Row permutation for the zigzag schedule: rank r owns sequence
    chunks r and 2cp-1-r (of 2cp equal chunks), so causal work balances —
    every off-diagonal hop costs exactly half a full hop on every rank.
    Apply to the sequence axis BEFORE sharding with P(..., axis, ...);
    invert the OUTPUT rows with :func:`zigzag_inverse`.
    """
    if s_total % (2 * cp):
        raise ValueError(f"s_total={s_total} must divide into 2*cp={2*cp} "
                         f"equal chunks")
    sc = s_total // (2 * cp)
    order = []
    for r in range(cp):
        order += list(range(r * sc, (r + 1) * sc))
        order += list(range((2 * cp - 1 - r) * sc, (2 * cp - r) * sc))
    import numpy as np
    return np.asarray(order)


def zigzag_inverse(cp: int, s_total: int):
    import numpy as np
    inv = np.empty(s_total, np.int64)
    inv[zigzag_order(cp, s_total)] = np.arange(s_total)
    return inv


def _chunk_attn(q, k, v, mask, scale):
    """One (q-chunk × kv-chunk) attention partial in f32.

    q: (b, sq, h, d); k/v: (b, sk, h, d); mask: (sq, sk) bool (True = keep).
    Returns (acc (b, sq, h, d) f32 — exp-weighted V sum, m (b, sq, h) f32
    row max, l (b, sq, h) f32 exp sum).
    """
    s = jnp.einsum("bqhd,bkhd->bqhk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    s = jnp.where(mask[None, :, None, :], s, -jnp.inf)
    m = jnp.max(s, axis=-1)                                 # (b, sq, h)
    # fully-masked rows (m = -inf): exp(-inf - -inf) = nan → guard to 0
    safe_m = jnp.where(jnp.isfinite(m), m, 0.0)
    p = jnp.exp(s - safe_m[..., None])
    p = jnp.where(mask[None, :, None, :], p, 0.0)
    l = jnp.sum(p, axis=-1)
    acc = jnp.einsum("bqhk,bkhd->bqhd", p, v.astype(jnp.float32))
    return acc, jnp.where(jnp.isfinite(m), m, -jnp.inf), l


def _merge(state, new):
    """Online-softmax merge of two (acc, m, l) partial states."""
    acc0, m0, l0 = state
    acc1, m1, l1 = new
    m = jnp.maximum(m0, m1)
    safe = lambda mm: jnp.where(jnp.isfinite(mm), mm, 0.0)
    c0 = jnp.where(jnp.isfinite(m0), jnp.exp(safe(m0) - safe(m)), 0.0)
    c1 = jnp.where(jnp.isfinite(m1), jnp.exp(safe(m1) - safe(m)), 0.0)
    return (acc0 * c0[..., None] + acc1 * c1[..., None],
            m, l0 * c0 + l1 * c1)


def ring_attention_prefill(q, k, v, *, axis_name: str, cp: int,
                           causal: bool = True,
                           schedule: str = "contiguous",
                           out_dtype=jnp.bfloat16) -> jax.Array:
    """Context-parallel attention over sequence-sharded q/k/v.

    Call INSIDE :func:`shard_map` with q, k, v sharded on the sequence dim
    over ``axis_name`` (each shard: (b, s_local, heads, head_dim); global
    row of local row r on shard i is ``i * s_local + r``). ``cp`` is the
    static ring size. Returns the (b, s_local, heads, head_dim) attention
    output for the local query rows — numerically the same online-softmax
    math as flash attention, so it matches full-sequence attention to f32
    rounding. GQA is native: k/v may carry fewer heads (h % hk == 0); the
    ring rotates the small KV and expands it locally per hop.

    ``schedule``:
    * ``"contiguous"`` — shard i holds rows [i·s_local, (i+1)·s_local);
      simple, but causal hops above the diagonal are fully masked, so
      rank 0 wastes (cp-1)/cp of its hop compute (classic unbalanced ring).
    * ``"zigzag"`` — shard i holds chunks i and 2cp-1-i of 2cp chunks
      (pre-permute rows with :func:`zigzag_order`, un-permute the output
      with :func:`zigzag_inverse`). Every off-diagonal hop then computes
      EXACTLY half a hop on every rank — one unmasked (s_local × s_local/2)
      block chosen by a rank-order ``lax.cond`` (equal cost both branches)
      — so causal work is load-balanced across the ring.
    """
    b, s_local, h, d = q.shape
    if k.shape != v.shape:
        raise ValueError(f"k/v shards must match, got {k.shape} / {v.shape}")
    hk = k.shape[2]
    if (k.shape[0], k.shape[1], k.shape[3]) != (b, s_local, d) or h % hk:
        raise ValueError(f"q/k/v shards must match, got {q.shape} / "
                         f"{k.shape} / {v.shape} (q heads must be a "
                         f"multiple of kv heads)")
    # GQA: the ring rotates the SMALL (hk-head) KV — ICI traffic shrinks by
    # the GQA ratio — and each hop expands it locally for the dot.
    expand = ((lambda x: jnp.repeat(x, h // hk, axis=2)) if hk != h
              else (lambda x: x))
    scale = 1.0 / (d ** 0.5)
    if schedule not in ("contiguous", "zigzag"):
        raise ValueError(f"schedule must be contiguous|zigzag, "
                         f"got {schedule!r}")
    if cp == 1:
        mask = (jnp.tril(jnp.ones((s_local, s_local), bool)) if causal
                else jnp.ones((s_local, s_local), bool))
        acc, m, l = _chunk_attn(q, expand(k), expand(v), mask, scale)
        return (acc / jnp.maximum(l, 1e-30)[..., None]).astype(out_dtype)

    zig = schedule == "zigzag"
    if zig and s_local % 2:
        raise ValueError("zigzag needs an even local row count (two chunks)")
    idx = lax.axis_index(axis_name)
    sc = s_local // 2
    if zig:
        ar = jnp.arange(sc)
        pos_of = lambda r: jnp.concatenate([r * sc + ar,
                                            (2 * cp - 1 - r) * sc + ar])
    else:
        pos_of = lambda r: r * s_local + jnp.arange(s_local)
    q_pos = pos_of(idx)                                # (s_local,) global

    def hop_mask(kv_owner):
        if not causal:
            return jnp.ones((s_local, s_local), bool)
        return q_pos[:, None] >= pos_of(kv_owner)[None, :]

    # Reverse ring: after s hops this rank holds the KV shard of rank
    # (idx + s) % cp (same convention as overlap.all_gather_gemm).
    perm = _ring_perm(cp, reverse=True)
    kv = (k, v)
    state = _chunk_attn(q, expand(k), expand(v), hop_mask(idx), scale)
    for s in range(1, cp):
        kv = (lax.ppermute(kv[0], axis_name, perm),
              lax.ppermute(kv[1], axis_name, perm))
        owner = (idx + s) % cp
        if zig and causal:
            # Balanced hop: exactly HALF a hop of unmasked work, either
            # way (equal-cost cond branches; see docstring).
            def gt_case(kv0=kv[0], kv1=kv[1]):
                # idx > owner: both local q chunks attend the owner's LOW
                # chunk (global id = owner < idx) — fully visible.
                return _chunk_attn(q, expand(kv0[:, :sc]),
                                   expand(kv1[:, :sc]),
                                   jnp.ones((s_local, sc), bool), scale)

            def lt_case(kv0=kv[0], kv1=kv[1]):
                # idx < owner: only the local HIGH chunk (global id
                # 2cp-1-idx > both owner chunk ids) attends — both owner
                # chunks fully visible; pad the low-chunk rows with the
                # empty softmax state so shapes match the other branch.
                acc, m, l = _chunk_attn(q[:, sc:], expand(kv0),
                                        expand(kv1),
                                        jnp.ones((sc, s_local), bool),
                                        scale)
                zacc = jnp.zeros((b, sc) + acc.shape[2:], acc.dtype)
                zm = jnp.full((b, sc) + m.shape[2:], -jnp.inf, m.dtype)
                zl = jnp.zeros((b, sc) + l.shape[2:], l.dtype)
                return (jnp.concatenate([zacc, acc], axis=1),
                        jnp.concatenate([zm, m], axis=1),
                        jnp.concatenate([zl, l], axis=1))

            state = _merge(state, lax.cond(idx > owner, gt_case, lt_case))
        else:
            state = _merge(state, _chunk_attn(
                q, expand(kv[0]), expand(kv[1]), hop_mask(owner), scale))
    acc, _, l = state
    return (acc / jnp.maximum(l, 1e-30)[..., None]).astype(out_dtype)


def ring_flash_prefill(q, k_q, k_s, v_q, v_s, *, axis_name: str, cp: int,
                       block_q: int = 512, block_s: int = 2048,
                       out_dtype=jnp.bfloat16) -> jax.Array:
    """CP prefill over the INT8 KV cache with Pallas flash chunks.

    The production form of :func:`ring_attention_prefill` (contiguous
    schedule, causal): the per-hop chunk attention runs the flash-prefill
    kernel (``ops/flash_prefill.py`` — K/V stay int8 until the MXU, online
    softmax in VMEM) with ``return_stats``, and the raw (acc, m, l) states
    merge across hops. Causality across shards rides the kernel's own
    ``start`` offset: the arriving chunk of ``owner`` is presented at
    relative start ``(idx - owner) * s_local`` — negative → future chunk,
    fully masked inside the kernel; ≥ s_local → fully visible.

    Per shard: q (b, s_local, heads, hd); k_q/v_q (b, kvh, s_local, hd)
    int8 with (b, kvh, s_local) f32 per-token scales — the serving cache
    layout, sharded on the sequence dim over ``axis_name``.
    """
    from ..ops.flash_prefill import flash_prefill_gqa

    b, s_local, heads, hd = q.shape
    seq = jnp.full((b,), s_local, jnp.int32)

    def hop(owner_off, kq, ks, vq, vs):
        start = jnp.full((b,), owner_off * s_local, jnp.int32)
        return flash_prefill_gqa(q, kq, ks, vq, vs, start, seq,
                                 block_q=block_q, block_s=block_s,
                                 return_stats=True)

    if cp == 1:
        acc, _, l = hop(0, k_q, k_s, v_q, v_s)
        return (acc / jnp.maximum(l[..., None], 1e-30)).astype(out_dtype)

    idx = lax.axis_index(axis_name)
    perm = _ring_perm(cp, reverse=True)
    kv = (k_q, k_s, v_q, v_s)
    state = hop(0, *kv)                              # own chunk: diagonal
    for s in range(1, cp):
        kv = tuple(lax.ppermute(x, axis_name, perm) for x in kv)
        owner = (idx + s) % cp
        state = _merge(state, hop(idx - owner, *kv))
    acc, _, l = state
    return (acc / jnp.maximum(l[..., None], 1e-30)).astype(out_dtype)
