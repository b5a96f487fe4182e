"""Reference-compatible API shims.

Gives users of ``deep_gemm_ascend`` (the reference's Python surface,
``framework/deep_gemm_ascend/__init__.py:1-5`` re-exporting
``run_mmad_custom`` / ``run_mmad_rtc`` / ``run_mmad_bench`` from
``python_api.cpp:30-36``) a drop-in TPU equivalent. Semantics:

* ``run_mmad_custom(x, y, z)`` — the reference's AOT static-kernel path
  (`gemm.hpp:15-26`): here simply the default-config GEMM.
* ``run_mmad_rtc(x, y, z)`` — the JIT shape-specialized path
  (`gemm.hpp:68-111`): heuristic config + shape-specialized compile.
* ``run_mmad_bench(x, y, z, params)`` — caller-supplied tiling knobs
  (`gemm_bench.hpp:49-113`): params[0:6] = (m_sections, n_sections,
  m_sec_blocks, n_sec_blocks, k_iter_blocks, db_blocks) in 16-element cube
  blocks; mapped onto (block_m, block_n, block_k) on TPU. Remaining params
  slots are ignored (they were kernel-derived scratch in the reference).

All three write into ``z`` logically. Inputs may be JAX arrays, numpy
arrays, or torch tensors (the reference's binding takes ``at::Tensor``,
`python_api.cpp:30-36`); torch tensors are converted losslessly. When ``z``
is a torch tensor the result is **copied into it** (true drop-in in-place
semantics) and ``z`` is returned; for immutable JAX arrays the result is
returned and ``z`` only fixes the output dtype/shape contract.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import GemmConfig
from ..ops import bgemm, gemm
from ..utils.common import round_up


def _is_torch(x) -> bool:
    return type(x).__module__.split(".")[0] == "torch"


def _to_jax(x):
    if x is None or isinstance(x, jnp.ndarray):
        return x
    if _is_torch(x):
        import torch
        t = x.detach().cpu()
        # torch's .numpy() rejects fp8/bf16 ("unsupported ScalarType");
        # bridge losslessly through a same-width integer view + bitcast.
        if t.dtype == torch.float8_e4m3fn:
            return jnp.asarray(t.view(torch.uint8).numpy()).view(
                jnp.float8_e4m3fn)
        if t.dtype == torch.bfloat16:
            return jnp.asarray(t.view(torch.uint16).numpy()).view(
                jnp.bfloat16)
        return jnp.asarray(t.numpy())
    return jnp.asarray(x)


def _check_out(out, z):
    if z is not None and tuple(z.shape) != tuple(out.shape):
        raise ValueError(f"output buffer shape {z.shape} != result {out.shape}")
    if z is None:
        return out
    if _is_torch(z):
        import torch
        with torch.no_grad():
            z.copy_(torch.from_numpy(
                np.asarray(out).astype(_np_dtype_of(z))))
        return z
    return out.astype(z.dtype)


def _np_dtype_of(t):
    import torch
    return {torch.float32: np.float32, torch.float16: np.float16,
            torch.bfloat16: np.float32,  # staged through f32; torch casts
            torch.float64: np.float64}.get(t.dtype, np.float32)


def run_mmad_custom(x, y, z=None):
    """Static-kernel path (≙ `python_api.cpp:13`, AOT mmad.cpp kernel)."""
    x, y = _to_jax(x), _to_jax(y)
    out = bgemm(x, y) if x.ndim == 3 else gemm(x, y)
    return _check_out(out, z)


def run_mmad_rtc(x, y, z=None):
    """JIT shape-specialized path (≙ `python_api.cpp:18` → mmad_rtc)."""
    x, y = _to_jax(x), _to_jax(y)
    out = bgemm(x, y) if x.ndim == 3 else gemm(x, y)
    return _check_out(out, z)


def run_mmad_bench(x, y, z=None, params=None):
    """Parameterized bench path (≙ `python_api.cpp:25` → mmad_bench).

    params[0:6] mirror the reference knobs (`gemm_bench.hpp:52-57`); the
    per-core-section knobs map to TPU blocks as
    block_m = m_sec_blocks·16, block_n = n_sec_blocks·16,
    block_k = k_iter_blocks·16 (cube block = 16, `generate_code.hpp:11-12`).
    """
    if params is None:
        return run_mmad_rtc(x, y, z)
    x, y = _to_jax(x), _to_jax(y)
    if _is_torch(params):
        params = params.detach().cpu().numpy()
    p = [int(v) for v in list(params)[:6]]
    while len(p) < 6:
        p.append(1)
    _, _, m_sec, n_sec, k_iter, _db = p
    cfg = GemmConfig(
        block_m=max(round_up(m_sec * 16, 8), 8),
        block_n=max(round_up(n_sec * 16, 128), 128),
        block_k=max(round_up(k_iter * 16, 128), 128),
    )
    out = (bgemm(x, y, config=cfg) if x.ndim == 3
           else gemm(x, y, config=cfg))
    return _check_out(out, z)
