"""Structured logging + lightweight metrics.

Upgrades the reference's ad-hoc ``[DGA] [ERROR]`` stderr prints
(``exception.hpp:35-43``, ``catlass_dynamic_matmul_tiling.cpp:44``) to a
stdlib logger with a stable prefix, plus a process-local counter registry
(the reference had "no metrics registry, no structured logging" —
SURVEY.md §5).
"""

from __future__ import annotations

import collections
import logging
import os
import threading
import time
from typing import Dict

_LOGGER_NAME = "dga_tpu"


def get_logger() -> logging.Logger:
    logger = logging.getLogger(_LOGGER_NAME)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(
            "[DGA-TPU] [%(levelname)s] %(asctime)s %(message)s",
            datefmt="%H:%M:%S"))
        logger.addHandler(handler)
        logger.setLevel(os.environ.get("DGA_LOG_LEVEL", "WARNING").upper())
        logger.propagate = False
    return logger


class Metrics:
    """Thread-safe counters/gauges for engine & tiling observability."""

    def __init__(self):
        self._lock = threading.Lock()
        self._counters: Dict[str, float] = collections.defaultdict(float)
        self._gauges: Dict[str, float] = {}
        self._t0 = time.time()

    def inc(self, name: str, value: float = 1.0) -> None:
        with self._lock:
            self._counters[name] += value

    def gauge(self, name: str, value: float) -> None:
        with self._lock:
            self._gauges[name] = value

    def snapshot(self) -> Dict[str, float]:
        with self._lock:
            out = dict(self._counters)
            out.update(self._gauges)
            out["uptime_s"] = time.time() - self._t0
            return out

    def reset(self) -> None:
        with self._lock:
            self._counters.clear()
            self._gauges.clear()


metrics = Metrics()
