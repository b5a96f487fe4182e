"""Small numeric helpers shared across the package.

Mirrors the role of the reference's ``get_best_config/utils/common.py:6-31``
(`ceil_div`, `round_up` with validation) — same semantics, new home.
"""

from __future__ import annotations


def ceil_div(a: int, b: int) -> int:
    """Ceiling division. Raises on non-positive divisor."""
    if b <= 0:
        raise ValueError(f"ceil_div divisor must be positive, got {b}")
    if a < 0:
        raise ValueError(f"ceil_div dividend must be non-negative, got {a}")
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    """Round ``x`` up to the nearest multiple of ``m``."""
    if m <= 0:
        raise ValueError(f"round_up multiple must be positive, got {m}")
    if x < 0:
        raise ValueError(f"round_up value must be non-negative, got {x}")
    return ceil_div(x, m) * m


def round_down(x: int, m: int) -> int:
    """Round ``x`` down to the nearest multiple of ``m`` (at least 0)."""
    if m <= 0:
        raise ValueError(f"round_down multiple must be positive, got {m}")
    return (x // m) * m


def is_power_of_two(x: int) -> bool:
    return x > 0 and (x & (x - 1)) == 0
