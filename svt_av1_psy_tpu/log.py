"""SVT_LOG-analog leveled logging (reference: svt_log.c / svt_log.h).

Level and sink come from the environment exactly like the reference:
  SVT_LOG       = -1 (all off) .. 4 (debug); default 3 (info)
  SVT_LOG_FILE  = path to append to instead of stderr

Library code calls svt_error/svt_warn/svt_info/svt_debug; the functions
are no-ops above the configured level (svt_log.c:31-38 getenv handling).
"""

from __future__ import annotations

import os
import sys
import threading

SVT_LOG_ALL = -1
SVT_LOG_FATAL = 0
SVT_LOG_ERROR = 1
SVT_LOG_WARN = 2
SVT_LOG_INFO = 3
SVT_LOG_DEBUG = 4

_TAG = {SVT_LOG_FATAL: "FATAL", SVT_LOG_ERROR: "ERROR",
        SVT_LOG_WARN: "WARN", SVT_LOG_INFO: "INFO", SVT_LOG_DEBUG: "DEBUG"}

_lock = threading.Lock()
_level = None
_sink = None


def _init():
    global _level, _sink
    if _level is not None:
        return
    try:
        _level = int(os.environ.get("SVT_LOG", SVT_LOG_INFO))
    except ValueError:
        _level = SVT_LOG_INFO
    path = os.environ.get("SVT_LOG_FILE")
    if path:
        try:
            _sink = open(path, "a")
        except OSError:
            _sink = None
    else:
        # None = resolve sys.stderr at call time (it may be replaced,
        # e.g. by test harness capture)
        _sink = None


def set_level(level: int):
    """Programmatic override (tests; the reference is env-only)."""
    global _level
    _init()
    _level = int(level)


def svt_log(level: int, fmt: str, *args):
    _init()
    if level > _level:
        return
    msg = (fmt % args) if args else fmt
    with _lock:
        sink = _sink if _sink is not None else sys.stderr
        try:
            print(f"Svt[{_TAG.get(level, '?')}]: {msg}", file=sink,
                  flush=True)
        except ValueError:
            pass   # sink closed (interpreter teardown)


def svt_error(fmt: str, *args):
    svt_log(SVT_LOG_ERROR, fmt, *args)


def svt_warn(fmt: str, *args):
    svt_log(SVT_LOG_WARN, fmt, *args)


def svt_info(fmt: str, *args):
    svt_log(SVT_LOG_INFO, fmt, *args)


def svt_debug(fmt: str, *args):
    svt_log(SVT_LOG_DEBUG, fmt, *args)
