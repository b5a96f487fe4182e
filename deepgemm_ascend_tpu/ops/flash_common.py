"""Shared pieces of the flash attention kernels (decode + prefill).

Both kernels stream int8 K/V blocks with online softmax and fold the
per-token scales into the small score/probability matrices; these helpers
keep that numerics/DMA logic in ONE place so a fix in either kernel cannot
silently miss the other.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def select_scale_row(scale_ref, kvi) -> jax.Array:
    """Pick kv-head ``kvi``'s row from a (1, kvh, bs) scale block → (1, bs).

    A (1, 1, bs) block would need an illegal sublane-1 tile, so the block
    carries all kv heads and the row is selected with a one-hot mini-dot
    (kvh·bs MACs, negligible; a dynamic sublane slice would need a provably
    8-aligned start).
    """
    kvh = scale_ref.shape[1]
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (1, kvh), 1)
              == kvi).astype(jnp.float32)
    return jnp.dot(onehot, scale_ref[0],
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def online_softmax_update(s, v, v_s, m_ref, l_ref, acc_ref) -> None:
    """One flash step: fold masked scores ``s`` (rows, bs) and the V block
    ``v`` (bs, hd) bf16 with row scales ``v_s`` (1, bs) into the running
    (m, l, acc) state. V's per-token scale multiplies the probability
    matrix (rows·bs VPU ops), never V itself."""
    m_prev = m_ref[:, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    # Rows with NO unmasked score yet (m_new still at the NEG_INF init):
    # exp(NEG_INF - NEG_INF) = 1 would pollute l/acc with a full block of
    # garbage — e.g. a prefill q-block straddling position 0 under a
    # negative ring start, or an empty cache in decode. Keep them empty.
    p = jnp.where(m_new > NEG_INF * 0.5, p, 0.0)
    l_ref[:, 0:1] = l_ref[:, 0:1] * alpha + jnp.sum(p, axis=1, keepdims=True)
    m_ref[:, 0:1] = m_new
    pv = jnp.dot((p * v_s).astype(jnp.bfloat16), v,
                 preferred_element_type=jnp.float32)
    acc_ref[:] = acc_ref[:] * alpha + pv


def finalize(l_ref, acc_ref, out_dtype):
    """acc / l with the empty-sequence (l == 0) guard → zeros, not NaN."""
    l = l_ref[:, 0:1]
    safe = jnp.where(l > 0, l, 1.0)
    return (acc_ref[:] / safe).astype(out_dtype)


def pick_block_s(s_max: int, block_s: int) -> int:
    """Largest legal S block ≤ ``block_s``: a multiple of 128 dividing the
    cache length, else the whole length (block == array dim is always
    legal). Shared by the decode and prefill kernels."""
    if s_max > block_s:
        for cand in range((block_s // 128) * 128, 0, -128):
            if s_max % cand == 0:
                return cand
    return s_max
