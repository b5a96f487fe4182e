"""Golden-model verification with the reference's outlier-ratio metric.

Re-implements the acceptance discipline of the reference verifiers
(``deep_gemm_ascend/scripts/verify.py:14-35``, ``verify_result.py:20-41``,
``framework/tests/test.py:40-64``): pass/fail is the *fraction of elements*
outside ``isclose(rtol, atol)`` — up to ``max_ratio`` (default 1e-4) outliers
are tolerated, rather than a max-abs-err bound. This tolerates isolated
rounding outliers from heavy-tailed inputs while catching systematic error.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

# Reference tolerances: rtol 2e-4 for bf16 device tests (`test.py:19-21`),
# 1.5e-6 for fp32-accum bench gating (`benchmark.py:20-22`).
DEFAULT_MAX_RATIO = 1e-4
DEFAULT_RTOL = 2e-4
DEFAULT_ATOL = 1e-9


@dataclasses.dataclass(frozen=True)
class VerifyResult:
    ok: bool
    mismatch_ratio: float
    num_mismatched: int
    num_total: int
    max_abs_err: float
    max_rel_err: float

    def __bool__(self) -> bool:
        return self.ok


def mismatch_ratio(out, ref, rtol: float = DEFAULT_RTOL,
                   atol: float = DEFAULT_ATOL) -> float:
    out = np.asarray(out, dtype=np.float64)
    ref = np.asarray(ref, dtype=np.float64)
    if out.shape != ref.shape:
        raise ValueError(f"shape mismatch: {out.shape} vs {ref.shape}")
    close = np.isclose(out, ref, rtol=rtol, atol=atol, equal_nan=True)
    return float((~close).sum()) / max(out.size, 1)


def verify(
    out,
    ref,
    rtol: float = DEFAULT_RTOL,
    atol: float = DEFAULT_ATOL,
    max_ratio: float = DEFAULT_MAX_RATIO,
    name: str = "",
    print_diffs: int = 0,
) -> VerifyResult:
    """≙ ``verify_result`` (`scripts/verify.py:14-35`): length/shape check,
    optional bounded diff dump, outlier-ratio acceptance."""
    out = np.asarray(out, dtype=np.float64)
    ref = np.asarray(ref, dtype=np.float64)
    if out.shape != ref.shape:
        raise ValueError(f"{name}: shape mismatch {out.shape} vs {ref.shape}")
    close = np.isclose(out, ref, rtol=rtol, atol=atol, equal_nan=True)
    bad = ~close
    n_bad = int(bad.sum())
    ratio = n_bad / max(out.size, 1)
    abs_err = np.abs(out - ref)
    denom = np.maximum(np.abs(ref), 1e-30)
    res = VerifyResult(
        ok=ratio <= max_ratio,
        mismatch_ratio=ratio,
        num_mismatched=n_bad,
        num_total=int(out.size),
        max_abs_err=float(abs_err.max(initial=0.0)),
        max_rel_err=float((abs_err / denom).max(initial=0.0)),
    )
    if print_diffs and n_bad:
        idx = np.argwhere(bad)[:print_diffs]
        for i in idx:
            t = tuple(int(v) for v in i)
            print(f"[DGA-TPU] {name} diff at {t}: out={out[t]:.6g} ref={ref[t]:.6g}")
    return res


def relative_l2_error(out, ref) -> float:
    """Global relative L2 error — the DeepGEMM-style summary metric."""
    out = np.asarray(out, dtype=np.float64)
    ref = np.asarray(ref, dtype=np.float64)
    denom = np.linalg.norm(ref)
    return float(np.linalg.norm(out - ref) / max(denom, 1e-30))
