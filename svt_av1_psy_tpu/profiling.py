"""Per-stage wall-clock timers (the SVT_LOG/perf-context analog.

The reference exposes per-channel fps + wall-clock through its app
performance context (app_main.c:454) and nothing finer; here every pipeline
stage brackets itself with `stage(...)` so callers (bench.py, tests) can
read a breakdown, notably the device-time fraction the TPU build is judged
on. Zero overhead concerns: one perf_counter pair per stage call.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager

_TIMERS: dict = defaultdict(float)
_COUNTS: dict = defaultdict(int)


@contextmanager
def stage(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _TIMERS[name] += time.perf_counter() - t0
        _COUNTS[name] += 1


def reset():
    _TIMERS.clear()
    _COUNTS.clear()


def snapshot() -> dict:
    """{stage: {"s": seconds, "n": calls}} for all stages since reset()."""
    return {k: {"s": _TIMERS[k], "n": _COUNTS[k]} for k in _TIMERS}


def device_fraction() -> float:
    """Fraction of total bracketed time spent in device-dispatch stages."""
    dev = sum(v for k, v in _TIMERS.items() if k.startswith("device:"))
    total = sum(_TIMERS.values())
    return dev / total if total > 0 else 0.0
