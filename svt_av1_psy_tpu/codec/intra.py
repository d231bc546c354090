"""AV1 intra predictors, batched over blocks (bit-exact, spec §7.11.2).

Behavior reference: Source/Lib/Codec/intra_prediction.c (dc/v/h/smooth/paeth
predictors; smooth weights :26, smooth math :1094-1160).

All functions take batched neighbor arrays:
  above: (B, W) pixels of the row above (above[-1] unused here)
  left:  (B, H) pixels of the column to the left
and return (B, H, W) predictions. Pixel dtype is uint16 for 8- and 10-bit
uniformly (the math is bit-depth agnostic; DC_128 uses 1 << (bd-1)).

Directional modes (D45..D203), filter-intra, and CfL live in intra_dir.py
(added with the full mode-decision layer).
"""

from __future__ import annotations

import numpy as np

from .constants import PredictionMode

SM_WEIGHT_LOG2 = 8

# sm_weight_arrays (intra_prediction.c:26): indexed by block dim, offset = dim
_SM_WEIGHTS = {
    4: np.array([255, 149, 85, 64], np.uint16),
    8: np.array([255, 197, 146, 105, 73, 50, 37, 32], np.uint16),
    16: np.array([255, 225, 196, 170, 145, 123, 102, 84, 68, 54, 43, 33, 26, 20, 17, 16], np.uint16),
    32: np.array([255, 240, 225, 210, 196, 182, 169, 157, 145, 133, 122, 111, 101, 92, 83, 74,
                  66, 59, 52, 45, 39, 34, 29, 25, 21, 17, 14, 12, 10, 9, 8, 8], np.uint16),
    64: np.array([255, 248, 240, 233, 225, 218, 210, 203, 196, 189, 182, 176, 169, 163, 156,
                  150, 144, 138, 133, 127, 121, 116, 111, 106, 101, 96, 91, 86, 82, 77, 73, 69,
                  65, 61, 57, 54, 50, 47, 44, 41, 38, 35, 32, 29, 27, 25, 22, 20, 18, 16, 15,
                  13, 12, 10, 9, 8, 7, 6, 6, 5, 5, 4, 4, 4], np.uint16),
}


def _divide_round(v, n):
    return (v + (1 << (n - 1))) >> n


def dc_pred(above, left, have_above: bool, have_left: bool, bd: int = 8):
    B, W = above.shape
    H = left.shape[1]
    a = above.astype(np.int64)
    l = left.astype(np.int64)
    if have_above and have_left:
        s = a.sum(axis=1) + l.sum(axis=1)
        count = W + H
        dc = (s + (count >> 1)) // count
    elif have_above:
        dc = (a.sum(axis=1) + (W >> 1)) >> int(np.log2(W))
    elif have_left:
        dc = (l.sum(axis=1) + (H >> 1)) >> int(np.log2(H))
    else:
        dc = np.full(B, 1 << (bd - 1), np.int64)
    return np.broadcast_to(dc[:, None, None], (B, H, W)).astype(np.uint16)


def v_pred(above, left):
    B, W = above.shape
    H = left.shape[1]
    return np.broadcast_to(above[:, None, :], (B, H, W)).astype(np.uint16)


def h_pred(above, left):
    B, W = above.shape
    H = left.shape[1]
    return np.broadcast_to(left[:, :, None], (B, H, W)).astype(np.uint16)


def smooth_pred(above, left):
    B, W = above.shape
    H = left.shape[1]
    a = above.astype(np.uint32)
    l = left.astype(np.uint32)
    below = l[:, H - 1]
    right = a[:, W - 1]
    ww = _SM_WEIGHTS[W].astype(np.uint32)
    wh = _SM_WEIGHTS[H].astype(np.uint32)
    scale = 1 << SM_WEIGHT_LOG2
    pred = (
        wh[None, :, None] * a[:, None, :]
        + (scale - wh)[None, :, None] * below[:, None, None]
        + ww[None, None, :] * l[:, :, None]
        + (scale - ww)[None, None, :] * right[:, None, None]
    )
    return _divide_round(pred, SM_WEIGHT_LOG2 + 1).astype(np.uint16)


def smooth_v_pred(above, left):
    B, W = above.shape
    H = left.shape[1]
    a = above.astype(np.uint32)
    below = left.astype(np.uint32)[:, H - 1]
    wh = _SM_WEIGHTS[H].astype(np.uint32)
    scale = 1 << SM_WEIGHT_LOG2
    pred = wh[None, :, None] * a[:, None, :] + (scale - wh)[None, :, None] * below[:, None, None]
    return _divide_round(pred, SM_WEIGHT_LOG2).astype(np.uint16)


def smooth_h_pred(above, left):
    B, W = above.shape
    H = left.shape[1]
    l = left.astype(np.uint32)
    right = above.astype(np.uint32)[:, W - 1]
    ww = _SM_WEIGHTS[W].astype(np.uint32)
    scale = 1 << SM_WEIGHT_LOG2
    pred = ww[None, None, :] * l[:, :, None] + (scale - ww)[None, None, :] * right[:, None, None]
    return _divide_round(pred, SM_WEIGHT_LOG2).astype(np.uint16)


def paeth_pred(above, left, above_left):
    """above_left: (B,) the corner pixel."""
    B, W = above.shape
    H = left.shape[1]
    t = above.astype(np.int64)[:, None, :]
    l = left.astype(np.int64)[:, :, None]
    tl = above_left.astype(np.int64)[:, None, None]
    base = t + l - tl
    p_l = np.abs(base - l)
    p_t = np.abs(base - t)
    p_tl = np.abs(base - tl)
    lt = np.broadcast_to(l, (B, H, W))
    tt = np.broadcast_to(t, (B, H, W))
    tlt = np.broadcast_to(tl, (B, H, W))
    out = np.where((p_l <= p_t) & (p_l <= p_tl), lt, np.where(p_t <= p_tl, tt, tlt))
    return out.astype(np.uint16)


# PredictionMode -> C intra_pred_block mode index
_NATIVE_MODE = {
    PredictionMode.DC_PRED: 0, PredictionMode.V_PRED: 1,
    PredictionMode.H_PRED: 2, PredictionMode.SMOOTH_PRED: 3,
    PredictionMode.SMOOTH_V_PRED: 4, PredictionMode.SMOOTH_H_PRED: 5,
    PredictionMode.PAETH_PRED: 6,
}


def predict(mode: int, above, left, above_left, have_above: bool, have_left: bool, bd: int = 8):
    """Dispatch for the non-directional intra modes.

    Neighbor substitution for missing edges follows the spec: callers must
    pre-fill `above`/`left` with the substituted rows (see recon loop);
    DC handles availability itself."""
    mode = PredictionMode(mode)
    nm = _NATIVE_MODE.get(mode)
    if nm is not None and above.shape[0] == 1:
        from . import mc_native

        a32 = np.ascontiguousarray(above[0], np.int32)
        l32 = np.ascontiguousarray(left[0], np.int32)
        corner = int(above_left[0]) if above_left is not None else 0
        out = mc_native.intra_pred_block(nm, a32, l32, corner, have_above,
                                         have_left, a32.shape[0],
                                         l32.shape[0], bd)
        if out is not None:
            return out[None]
    if mode == PredictionMode.DC_PRED:
        return dc_pred(above, left, have_above, have_left, bd)
    if mode == PredictionMode.V_PRED:
        return v_pred(above, left)
    if mode == PredictionMode.H_PRED:
        return h_pred(above, left)
    if mode == PredictionMode.SMOOTH_PRED:
        return smooth_pred(above, left)
    if mode == PredictionMode.SMOOTH_V_PRED:
        return smooth_v_pred(above, left)
    if mode == PredictionMode.SMOOTH_H_PRED:
        return smooth_h_pred(above, left)
    if mode == PredictionMode.PAETH_PRED:
        return paeth_pred(above, left, above_left)
    raise NotImplementedError(f"mode {mode.name} lives in intra_dir.py")


_FI_TAPS = None


def _filter_intra_taps():
    global _FI_TAPS
    if _FI_TAPS is None:
        from pathlib import Path

        path = Path(__file__).resolve().parent / "tables" / "av1_filter_intra.npz"
        _FI_TAPS = np.load(path)["filter_intra_taps"].astype(np.int32)
    return _FI_TAPS


# fimode_to_intradir: tx-type context mode substitution (definitions.h)
# DC, V, H, D157, and FILTER_PAETH -> DC (common_utils.h:108; the spec's
# Filter_Intra_Mode_To_Intra_Dir maps FILTER_PAETH to DC_PRED, not PAETH)
# filter-intra mode -> equivalent intra direction for the tx-type cdf
# context: {DC, V, H, D157, DC} (fimode_to_intradir, common_utils.h:108)
FIMODE_TO_INTRADIR = (0, 1, 2, 6, 0)


def filter_intra_predict(above_buf, left_buf, w: int, h: int, mode: int,
                         bd: int = 8) -> np.ndarray:
    """Filter-intra prediction (spec 7.11.2.3; filterintra_c.c:70): recursive
    4x2 patches, 7 taps each. above_buf/left_buf follow _gather_neighbors
    layout ([0] = top-left corner)."""
    taps = _filter_intra_taps()[mode]
    if w <= 32 and h <= 32:
        from . import mc_native

        above32 = np.ascontiguousarray(above_buf[: w + 1], np.int32)
        left32 = np.ascontiguousarray(left_buf[: h + 1], np.int32)
        out = mc_native.filter_intra_pred(above32, left32, w, h, taps, bd)
        if out is not None:
            return out
    peak = (1 << bd) - 1
    buf = np.zeros((h + 1, w + 1), np.int32)
    buf[0, : w + 1] = above_buf[: w + 1]
    buf[1:, 0] = left_buf[1 : h + 1]
    for r in range(1, h + 1, 2):
        for c in range(1, w + 1, 4):
            p = np.array([buf[r - 1, c - 1], buf[r - 1, c], buf[r - 1, c + 1],
                          buf[r - 1, c + 2], buf[r - 1, c + 3], buf[r, c - 1],
                          buf[r + 1, c - 1]], np.int32)
            acc = taps[:, :7] @ p                      # (8,) signed sums
            out = np.where(acc < 0, -((-acc + 8) >> 4), (acc + 8) >> 4)
            out = np.clip(out, 0, peak)
            for k in range(8):
                buf[r + (k >> 2), c + (k & 3)] = out[k]
    return buf[1 : h + 1, 1 : w + 1].astype(np.uint16)
