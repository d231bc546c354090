"""ctypes bindings to the reference C kernels ("liboracle.so") for
golden-vector equivalence testing — the reference's own test strategy
(SURVEY.md §4: SvtAv1UnitTests compares C vs optimized kernels; here we
compare C vs our TPU-native implementations).

Build the oracle with tools/build_oracle.sh (requires /root/reference).
Tests import this module and skip gracefully when the oracle is absent.
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path

import numpy as np

ORACLE_PATHS = [
    Path(os.environ.get("SVT_ORACLE_LIB", "")),
    Path("/tmp/refbin/liboracle.so"),
]

_lib = None
for p in ORACLE_PATHS:
    if p and p.is_file():
        try:
            _lib = ctypes.CDLL(str(p))
            break
        except OSError:
            pass

if _lib is not None:
    # bind the RTCD function-pointer tables (C-only build -> all _c kernels);
    # many kernels call through globals like svt_memcpy that live in BSS
    for setup in ("svt_aom_setup_common_rtcd_internal", "svt_aom_setup_rtcd_internal"):
        fn = getattr(_lib, setup, None)
        if fn is not None:
            fn.argtypes = [ctypes.c_uint64]
            fn.restype = None
            fn(0)

available = _lib is not None

_I16P = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
_I32P = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_U16P = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
_U8P = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


def fwd_txfm2d(residual: np.ndarray, tx_type: int, bd: int = 8) -> np.ndarray:
    """residual (H, W) int16 -> coeffs (H, W) int32 via the reference C kernel."""
    H, W = residual.shape
    fn = getattr(_lib, f"svt_av1_fwd_txfm2d_{W}x{H}_c", None)
    if fn is None:  # squares use the transform_two_d naming
        fn = getattr(_lib, f"svt_av1_transform_two_d_{W}x{H}_c")
    fn.argtypes = [_I16P, _I32P, ctypes.c_uint32, ctypes.c_int, ctypes.c_uint8]
    fn.restype = None
    out = np.zeros(H * W, dtype=np.int32)
    fn(np.ascontiguousarray(residual, np.int16), out, W, tx_type, bd)
    return out.reshape(H, W)


# TxSize enum value by (W, H), matching definitions.h / our constants.TxSize
_TX_SIZE_BY_WH = {
    (4, 4): 0, (8, 8): 1, (16, 16): 2, (32, 32): 3, (64, 64): 4,
    (4, 8): 5, (8, 4): 6, (8, 16): 7, (16, 8): 8, (16, 32): 9,
    (32, 16): 10, (32, 64): 11, (64, 32): 12, (4, 16): 13, (16, 4): 14,
    (8, 32): 15, (32, 8): 16, (16, 64): 17, (64, 16): 18,
}
# signature families (common_dsp_rtcd.h:105-137): squares take (tx_type, bd);
# small rects add tx_size; large rects add (tx_size, eob)
_SQUARE = {(4, 4), (8, 8), (16, 16), (32, 32), (64, 64)}
_SMALL_RECT = {(4, 8), (8, 4), (4, 16), (16, 4)}


def inv_txfm2d_add(coeffs: np.ndarray, pred: np.ndarray, tx_type: int, bd: int = 8) -> np.ndarray:
    """coeffs (H, W) int32 (64-dims packed to 32), pred (H, W) uint16 -> recon."""
    H, W = pred.shape
    fn = getattr(_lib, f"svt_av1_inv_txfm2d_add_{W}x{H}_c")
    cw, ch = min(W, 32), min(H, 32)
    packed = np.ascontiguousarray(coeffs[:ch, :cw], np.int32).reshape(-1)
    recon = np.ascontiguousarray(pred, np.uint16).copy()
    base = [_I32P, _U16P, ctypes.c_int32, _U16P, ctypes.c_int32, ctypes.c_int]
    args = [packed, recon, W, recon, W, tx_type]
    if (W, H) not in _SQUARE:
        base.append(ctypes.c_int)
        args.append(_TX_SIZE_BY_WH[(W, H)])
        if (W, H) not in _SMALL_RECT:
            base.append(ctypes.c_int32)
            args.append(cw * ch)  # eob = full block
    base.append(ctypes.c_int32)
    args.append(bd)
    fn.argtypes = base
    fn.restype = None
    fn(*args)
    return recon.reshape(H, W)


def intra_pred(name: str, above_with_tl: np.ndarray, left: np.ndarray, size_wh) -> np.ndarray:
    """Call svt_aom_{name}_predictor_{W}x{H}_c (8-bit).

    above_with_tl: W+1 entries [top_left, above0..aboveW-1] — the C predictors
    index above[-1] for the corner (paeth), so we pass an offset pointer."""
    W, H = size_wh
    fn = getattr(_lib, f"svt_aom_{name}_predictor_{W}x{H}_c")
    fn.argtypes = [_U8P, ctypes.c_ssize_t, _U8P, _U8P]
    fn.restype = None
    dst = np.zeros((H, W), dtype=np.uint8)
    buf = np.ascontiguousarray(above_with_tl, np.uint8)
    fn(dst, W, buf[1:], np.ascontiguousarray(left, np.uint8))
    return dst
