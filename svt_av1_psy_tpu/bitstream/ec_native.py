"""ctypes wrapper for the native entropy coder (native/ec_native.c).

Drop-in replacement for range_coder.RangeEncoder (bit-identical output,
verified by tests/test_ec_native.py) plus a one-call-per-txb coefficient
writer that keeps CDF adaptation state inside the shared FrameContext
numpy arrays.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE / "build" / "libecnative.so"

_U16P = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.is_file():
        try:
            _LIB_PATH.parent.mkdir(exist_ok=True)
            subprocess.run(
                ["gcc", "-O3", "-march=native", "-funroll-loops", "-shared", "-fPIC", "-o", str(_LIB_PATH),
                 str(_NATIVE / "ec_native.c")],
                check=True, capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.ec_create.restype = ctypes.c_void_p
    lib.ec_free.argtypes = [ctypes.c_void_p]
    lib.ec_reset.argtypes = [ctypes.c_void_p]
    lib.ec_bool.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_uint]
    lib.ec_literal.argtypes = [ctypes.c_void_p, ctypes.c_uint32, ctypes.c_int]
    # cdf passed as a raw pointer: ndpointer validation costs ~4us per call
    # and this is the hottest ctypes crossing in the encoder
    lib.ec_symbol.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    lib.ec_tell.argtypes = [ctypes.c_void_p]
    lib.ec_tell.restype = ctypes.c_int64
    lib.ec_done.argtypes = [ctypes.c_void_p,
                            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
                            ctypes.c_int64]
    lib.ec_done.restype = ctypes.c_int64
    # all raw pointers: this is the hottest crossing after ec_symbol and
    # ndpointer validation costs ~4us per arg (callers guarantee contiguity)
    lib.ec_write_coeffs_txb.argtypes = [
        ctypes.c_void_p,
        ctypes.c_void_p,                                          # qcoeff i32
        ctypes.c_int, ctypes.c_int,                               # n, eob
        ctypes.c_void_p,                                          # scan i16
        ctypes.c_void_p,                                          # coeff_ctxs i8
        ctypes.c_void_p,                                          # br_ctx_map i8
        ctypes.c_int,                                             # adapt
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int,
    ]
    lib.ec_write_coeffs_txb.restype = ctypes.c_int32
    _I32P = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    _I64P = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    _I8P = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
    # raw pointers: this is called 4x per transform block and ndpointer
    # validation dominates the crossing cost
    lib.txfm_eval_graph.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
    ]
    lib.txfm_eval_graph.restype = None
    lib.ec_write_coeffs_txb_full.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p,                         # enc, qcoeff
        ctypes.c_int, ctypes.c_int, ctypes.c_int,                 # w, h, eob
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p,           # scan, class, off2d
        ctypes.c_int,                                             # adapt
        ctypes.c_void_p, ctypes.c_int,                            # eob_multi
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p]
    lib.ec_write_coeffs_txb_full.restype = ctypes.c_int32
    _V, _I = ctypes.c_void_p, ctypes.c_int
    lib.txfm2d_fwd.argtypes = (
        [_V, _I, _I, _I]
        + [_I] + [_V] * 5 + [_I] * 2          # col 1d spec
        + [_I] + [_V] * 5 + [_I] * 2          # row 1d spec
        + [_I] * 6 + [_V])
    lib.txfm2d_fwd.restype = None
    lib.txfm2d_inv_add.argtypes = (
        [_V, _V, _I, _I, _I]
        + [_I] + [_V] * 5 + [_I] * 2          # row 1d spec
        + [_I] + [_V] * 5 + [_I] * 2          # col 1d spec
        + [_I] * 8 + [_V])
    lib.txfm2d_inv_add.restype = None
    lib.txfm2d_fwd_p.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                 ctypes.c_int, ctypes.c_void_p]
    lib.txfm2d_fwd_p.restype = None
    lib.txfm2d_inv_add_p.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_void_p, ctypes.c_int,
                                     ctypes.c_void_p]
    lib.txfm2d_inv_add_p.restype = None
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


class NativeRangeEncoder:
    """Same interface as range_coder.RangeEncoder, C-backed."""

    def __init__(self):
        self._lib = _load()
        if self._lib is None:
            raise RuntimeError("native EC unavailable")
        self._h = self._lib.ec_create()

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.ec_free(self._h)
            self._h = None

    def reset(self):
        self._lib.ec_reset(self._h)

    def encode_symbol(self, s: int, icdf, nsyms: int):
        # no adaptation here (mirror of the pure-Python encoder's contract)
        icdf = np.ascontiguousarray(icdf, np.uint16)
        self._lib.ec_symbol(self._h, s, icdf.ctypes.data, nsyms, 0)

    def encode_symbol_adapt(self, s: int, icdf: np.ndarray, nsyms: int):
        """icdf must be a C-contiguous uint16 view into the FrameContext."""
        self._lib.ec_symbol(self._h, s, icdf.ctypes.data, nsyms, 1)

    def encode_bool(self, val: int, f: int):
        self._lib.ec_bool(self._h, val, f)

    def encode_literal(self, value: int, bits: int):
        self._lib.ec_literal(self._h, value, bits)

    def tell(self) -> int:
        return int(self._lib.ec_tell(self._h))

    def done(self) -> bytes:
        cap = self.tell() // 8 + 64
        out = np.zeros(cap, np.uint8)
        n = int(self._lib.ec_done(self._h, out, cap))
        assert n >= 0
        return out[:n].tobytes()

    def write_coeffs_txb_full(self, qcoeff, w, h, eob, scan, tx_class, off2d,
                              adapt, eob_multi_row, eob_multi_nsyms,
                              eob_extra_rows, base_eob_rows, base_rows,
                              br_rows, dc_sign_row) -> int:
        """C writer that derives base/BR contexts internally. off2d: int8
        nz-map offset table for TX_CLASS_2D (anything for 1-D classes)."""
        return int(self._lib.ec_write_coeffs_txb_full(
            self._h, qcoeff.ctypes.data, w, h, eob, scan.ctypes.data,
            tx_class, (off2d.ctypes.data if off2d is not None else None),
            adapt, eob_multi_row.ctypes.data, eob_multi_nsyms,
            eob_extra_rows.ctypes.data, base_eob_rows.ctypes.data,
            base_rows.ctypes.data, br_rows.ctypes.data,
            dc_sign_row.ctypes.data))

    def write_coeffs_txb(self, qcoeff, eob, scan, coeff_ctxs, br_ctx_map, adapt,
                         txb_skip_row, eob_multi_row, eob_multi_nsyms,
                         eob_extra_rows, base_eob_rows, base_rows, br_rows,
                         dc_sign_row, include_skip=True) -> int:
        # args hold references for the duration of the call, so the raw
        # .ctypes.data pointers stay valid; callers guarantee contiguity
        return int(self._lib.ec_write_coeffs_txb(
            self._h, qcoeff.ctypes.data, len(qcoeff), eob, scan.ctypes.data,
            coeff_ctxs.ctypes.data, br_ctx_map.ctypes.data,
            adapt, txb_skip_row.ctypes.data, eob_multi_row.ctypes.data,
            eob_multi_nsyms, eob_extra_rows.ctypes.data,
            base_eob_rows.ctypes.data, base_rows.ctypes.data,
            br_rows.ctypes.data, dc_sign_row.ctypes.data,
            int(include_skip)))
