"""Per-stage wall-clock timers (the SVT_LOG/perf-context analog.

The reference exposes per-channel fps + wall-clock through its app
performance context (app_main.c:454) and nothing finer; here every pipeline
stage brackets itself with `stage(...)` so callers (bench.py, tests) can
read a breakdown, notably the device-time fraction the TPU build is judged
on.

Accounting is EXCLUSIVE: a stage's recorded time is its own wall-clock
minus any nested stage() spans opened on the same thread, so the snapshot
rows sum to (at most) the true wall time even when brackets nest
(host:encode_pass wrapping device:commit_* for example). Stages on
different threads (the inter-search pipeline worker) accumulate
independently — their sum exceeding wall time indicates host/device
overlap, which is the point.
"""

from __future__ import annotations

import threading
import time
from collections import defaultdict
from contextlib import contextmanager

_TIMERS: dict = defaultdict(float)
_COUNTS: dict = defaultdict(int)
_LOCK = threading.Lock()
_TLS = threading.local()


@contextmanager
def stage(name: str):
    stack = getattr(_TLS, "stack", None)
    if stack is None:
        stack = _TLS.stack = []
    frame = [0.0]  # child time accumulated under this span
    stack.append(frame)
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        stack.pop()
        if stack:
            stack[-1][0] += dt
        with _LOCK:
            _TIMERS[name] += dt - frame[0]
            _COUNTS[name] += 1


def reset():
    with _LOCK:
        _TIMERS.clear()
        _COUNTS.clear()


def snapshot() -> dict:
    """{stage: {"s": seconds, "n": calls}} for all stages since reset()."""
    with _LOCK:
        return {k: {"s": _TIMERS[k], "n": _COUNTS[k]} for k in _TIMERS}


def device_fraction() -> float:
    """Fraction of total bracketed time spent in device-dispatch stages."""
    with _LOCK:
        dev = sum(v for k, v in _TIMERS.items() if k.startswith("device:"))
        total = sum(_TIMERS.values())
    return dev / total if total > 0 else 0.0
