"""Directional intra prediction (zones 1/2/3), bit-exact.

Behavior reference: svt_av1_dr_prediction_z{1,2,3}_c + svt_aom_dr_predictor
(intra_prediction.c:314-440, :2273); derivative table :245 (spec constants).
The sequence header disables intra edge filtering/upsampling in this build
(enable_intra_edge_filter=0), so upsample is always 0 here.

Neighbor buffers carry the corner at index 0: buf[0] = top-left,
buf[1:] = above row (w+h entries) / left column (w+h entries).
"""

from __future__ import annotations

import numpy as np

from .constants import PredictionMode

# eb_dr_intra_derivative (intra_prediction.c:245): index = angle in degrees
_D = np.zeros(90, np.int32)
for _a, _v in zip(
    (3, 6, 9, 14, 17, 20, 23, 26, 29, 32, 36, 39, 42, 45, 48, 51, 54, 58,
     61, 64, 67, 70, 73, 76, 81, 84, 87),
    (1023, 547, 372, 273, 215, 178, 151, 132, 116, 102, 90, 80, 71, 64, 57,
     51, 45, 40, 35, 31, 27, 23, 19, 15, 11, 7, 3),
):
    _D[_a] = _v

MODE_TO_ANGLE = {
    PredictionMode.V_PRED: 90, PredictionMode.H_PRED: 180,
    PredictionMode.D45_PRED: 45, PredictionMode.D135_PRED: 135,
    PredictionMode.D113_PRED: 113, PredictionMode.D157_PRED: 157,
    PredictionMode.D203_PRED: 203, PredictionMode.D67_PRED: 67,
}


def get_dx(angle: int) -> int:
    if 0 < angle < 90:
        return int(_D[angle])
    if 90 < angle < 180:
        return int(_D[180 - angle])
    return 1


def get_dy(angle: int) -> int:
    if 90 < angle < 180:
        return int(_D[angle - 90])
    if 180 < angle < 270:
        return int(_D[270 - angle])
    return 1


def _round5(v):
    return (v + 16) >> 5


def _z1(above, W, H, dx, bd):
    """above: length >= 1+W+H with corner at [0] (unused here)."""
    a = above[1:].astype(np.int32)
    max_base_x = W + H - 1
    r = np.arange(1, H + 1)[:, None]
    c = np.arange(W)[None, :]
    x = r * dx
    base = (x >> 6) + c
    shift = (x & 0x3F) >> 1
    base_c = np.minimum(base, max_base_x)
    val = _round5(a[base_c] * (32 - shift) + a[np.minimum(base_c + 1, max_base_x)] * shift)
    out = np.where(base >= max_base_x, int(a[max_base_x]), val)
    return np.clip(out, 0, (1 << bd) - 1).astype(np.uint16)


def _z3(left, W, H, dy, bd):
    l = left[1:].astype(np.int32)
    max_base_y = W + H - 1
    c = np.arange(1, W + 1)[None, :]
    r = np.arange(H)[:, None]
    y = c * dy
    base = (y >> 6) + r
    shift = (y & 0x3F) >> 1
    base_c = np.minimum(base, max_base_y)
    val = _round5(l[base_c] * (32 - shift) + l[np.minimum(base_c + 1, max_base_y)] * shift)
    out = np.where(base >= max_base_y, int(l[max_base_y]), val)
    return np.clip(out, 0, (1 << bd) - 1).astype(np.uint16)


def _z2(above, left, W, H, dx, dy, bd):
    a = above.astype(np.int32)  # a[0] = corner, a[1+i] = above[i]
    l = left.astype(np.int32)
    r = np.arange(H)[:, None]
    c = np.arange(W)[None, :]
    x = -(r + 1) * dx + (c << 6)
    base1 = x >> 6
    shift1 = (x & 0x3F) >> 1
    i1 = np.clip(base1 + 1, 0, len(a) - 2)  # lanes with base1 < -1 use vl
    va = _round5(a[i1] * (32 - shift1) + a[i1 + 1] * shift1)
    y = (r << 6) - (c + 1) * dy
    base2 = y >> 6
    shift2 = (y & 0x3F) >> 1
    i2 = np.clip(base2 + 1, 0, len(l) - 2)  # lanes with base1 >= -1 use va
    vl = _round5(l[i2] * (32 - shift2) + l[i2 + 1] * shift2)
    out = np.where(base1 >= -1, va, vl)
    return np.clip(out, 0, (1 << bd) - 1).astype(np.uint16)


def dr_pred(mode: int, angle_delta: int, above_buf: np.ndarray, left_buf: np.ndarray,
            W: int, H: int, bd: int = 8) -> np.ndarray:
    """Directional prediction for one block.

    above_buf/left_buf: length 1+W+H, [0] = top-left corner, already prepared
    with the spec availability substitutions and extensions."""
    angle = MODE_TO_ANGLE[PredictionMode(mode)] + 3 * angle_delta
    if angle == 90:
        return np.broadcast_to(above_buf[1 : 1 + W], (H, W)).astype(np.uint16)
    if angle == 180:
        return np.broadcast_to(left_buf[1 : 1 + H][:, None], (H, W)).astype(np.uint16)
    from . import mc_native

    zone = 1 if angle < 90 else (2 if angle < 180 else 3)
    a32 = np.ascontiguousarray(above_buf, np.int32)
    l32 = np.ascontiguousarray(left_buf, np.int32)
    out = mc_native.intra_dr_pred(a32, l32, W, H, get_dx(angle),
                                  get_dy(angle), zone, bd)
    if out is not None:
        return out
    if angle < 90:
        return _z1(above_buf, W, H, get_dx(angle), bd)
    if angle < 180:
        return _z2(above_buf, left_buf, W, H, get_dx(angle), get_dy(angle), bd)
    return _z3(left_buf, W, H, get_dy(angle), bd)
