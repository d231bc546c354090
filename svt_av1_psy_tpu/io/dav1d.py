"""ctypes wrapper for the dav1d decoder shim (conformance oracle).

The reference validates encodes by decoding with libaom
(test/e2e_test/RefDecoder.cc); we use dav1d via native/dav1d_shim.c.
Auto-builds the shim on first use if gcc + libdav1d are present.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_NATIVE = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE / "build" / "libdav1dshim.so"

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.is_file():
        try:
            _LIB_PATH.parent.mkdir(exist_ok=True)
            subprocess.run(
                ["gcc", "-O2", "-shared", "-fPIC", "-o", str(_LIB_PATH),
                 str(_NATIVE / "dav1d_shim.c"), "-l:libdav1d.so.6"],
                check=True, capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.dav1d_shim_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, u8, u8, u8,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
    ]
    lib.dav1d_shim_decode.restype = ctypes.c_int
    lib.dav1d_shim_decode_seq.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, u8, u8, u8,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
    ]
    lib.dav1d_shim_decode_seq.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def decode(obu_stream: bytes, max_w: int, max_h: int
           ) -> Tuple[np.ndarray, Optional[np.ndarray], Optional[np.ndarray]]:
    """Decode one temporal unit; returns (y, u, v) planes (u/v None for mono).

    Raises RuntimeError on decoder error (the stream is non-conformant)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("dav1d shim unavailable")
    n = max_w * max_h * 2
    dy = np.zeros(n, np.uint8)
    du = np.zeros(n, np.uint8)
    dv = np.zeros(n, np.uint8)
    meta = np.zeros(4, np.int32)
    res = lib.dav1d_shim_decode(obu_stream, len(obu_stream), dy, du, dv, meta)
    if res != 0:
        raise RuntimeError(f"dav1d decode error {res}")
    w, h, layout, bpc = (int(x) for x in meta)
    itemsize = 2 if bpc > 8 else 1
    dt = np.uint16 if bpc > 8 else np.uint8
    y = dy[: w * h * itemsize].view(dt).reshape(h, w)
    if layout == 0:
        return y, None, None
    ss_x = 1 if layout != 3 else 0
    ss_y = 1 if layout == 1 else 0
    cw, ch = (w + ss_x) >> ss_x, (h + ss_y) >> ss_y
    u = du[: cw * ch * itemsize].view(dt).reshape(ch, cw)
    v = dv[: cw * ch * itemsize].view(dt).reshape(ch, cw)
    return y, u, v


def decode_nth(obu_stream: bytes, frame_index: int, max_w: int, max_h: int):
    """Decode a multi-TU stream; return planes of the frame_index-th picture."""
    lib = _load()
    if lib is None:
        raise RuntimeError("dav1d shim unavailable")
    n = max_w * max_h * 2
    dy = np.zeros(n, np.uint8)
    du = np.zeros(n, np.uint8)
    dv = np.zeros(n, np.uint8)
    meta = np.zeros(4, np.int32)
    res = lib.dav1d_shim_decode_seq(obu_stream, len(obu_stream), frame_index,
                                    dy, du, dv, meta)
    if res != 0:
        raise RuntimeError(f"dav1d decode error {res}")
    w, h, layout, bpc = (int(x) for x in meta)
    itemsize = 2 if bpc > 8 else 1
    dt = np.uint16 if bpc > 8 else np.uint8
    y = dy[: w * h * itemsize].view(dt).reshape(h, w)
    if layout == 0:
        return y, None, None
    ss_x = 1 if layout != 3 else 0
    ss_y = 1 if layout == 1 else 0
    cw, ch = (w + ss_x) >> ss_x, (h + ss_y) >> ss_y
    u = du[: cw * ch * itemsize].view(dt).reshape(ch, cw)
    v = dv[: cw * ch * itemsize].view(dt).reshape(ch, cw)
    return y, u, v
