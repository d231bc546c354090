"""Compound (two-reference average) motion-compensated prediction.

Behavior reference: svt_av1_jnt_convolve_{2d,x,y,2d_copy}_c and the highbd
variants (inter_prediction.c:494-700), with get_conv_params_no_round
(convolve.h:40): round_0 = 3, round_1 = COMPOUND_ROUND1_BITS = 7 for
bd <= 10. The first prediction lands in the intermediate ConvBuf domain
(offset by 2^(offset_bits - round_1) + 2^(offset_bits - round_1 - 1)); the
second averages ((p0 + p1) >> 1, COMPOUND_AVERAGE / compound_idx = 1),
removes the offset and applies the final rounding. Bit-exact vs the
reference oracle (tests/test_compound.py).
"""

from __future__ import annotations

import numpy as np

FILTER_BITS = 7
ROUND_0 = 3
ROUND_1 = 7          # COMPOUND_ROUND1_BITS (bd <= 10 keeps round_0 = 3)


def _rpot(x, n):
    return (x + (1 << (n - 1))) >> n


def jnt_conv(patch: np.ndarray, w: int, h: int, fx: np.ndarray,
             fy: np.ndarray, sx: int, sy: int, bd: int) -> np.ndarray:
    """One reference's compound prediction in the ConvBuf domain (int32
    (h, w)). patch: (h+7, w+7) int source window whose [3, 3] pixel is the
    block's full-pel top-left; fx/fy: 8-tap kernels; sx/sy: nonzero-subpel
    flags."""
    x = patch.astype(np.int64)
    offset_bits = bd + 2 * FILTER_BITS - ROUND_0
    round_offset = (1 << (offset_bits - ROUND_1)) \
        + (1 << (offset_bits - ROUND_1 - 1))
    fx = fx.astype(np.int64)
    fy = fy.astype(np.int64)
    if sx and sy:
        # jnt_convolve_2d: horizontal into im_block (round_0), vertical
        # with the offset_bits bias (round_1)
        im = np.zeros((h + 7, w), np.int64)
        acc = np.zeros((h + 7, w), np.int64) + (1 << (bd + FILTER_BITS - 1))
        for k in range(8):
            acc += fx[k] * x[:, k : k + w]
        im = _rpot(acc, ROUND_0)
        out = np.zeros((h, w), np.int64) + (1 << offset_bits)
        for k in range(8):
            out += fy[k] * im[k : k + h]
        return _rpot(out, ROUND_1)
    if sx:
        # jnt_convolve_x
        bits = FILTER_BITS - ROUND_1
        acc = np.zeros((h, w), np.int64)
        for k in range(8):
            acc += fx[k] * x[3 : 3 + h, k : k + w]
        res = (1 << bits) * _rpot(acc, ROUND_0)
        return res + round_offset
    if sy:
        # jnt_convolve_y
        bits = FILTER_BITS - ROUND_0
        acc = np.zeros((h, w), np.int64)
        for k in range(8):
            acc += fy[k] * x[k : k + h, 3 : 3 + w]
        res = _rpot(acc * (1 << bits), ROUND_1)
        return res + round_offset
    # jnt_convolve_2d_copy
    bits = 2 * FILTER_BITS - ROUND_1 - ROUND_0
    return (x[3 : 3 + h, 3 : 3 + w] << bits) + round_offset


def dist_wtd_weights(order_hint_bits: int, cur: int, hint0: int,
                     hint1: int):
    """(fwd_offset, bck_offset) distance weights for a compound pair with
    compound_idx == 0 — the prediction skip-mode blocks use (spec
    7.11.3.15; behavior reference: svt_av1_dist_wtd_comp_weight_assign,
    inter_prediction.c:273).  hint0/hint1 are RefOrderHint of ref0/ref1;
    fwd_offset multiplies the LIST-0 (ref0) conv buffer."""

    def rel(a, b):
        diff = a - b
        m = 1 << (order_hint_bits - 1)
        return (diff & (m - 1)) - (diff & m)

    MAXD = 31   # MAX_FRAME_DISTANCE
    d0 = min(abs(rel(hint1, cur)), MAXD)
    d1 = min(abs(rel(cur, hint0)), MAXD)
    order = int(d0 <= d1)
    lut = ((9, 7), (11, 5), (12, 4), (13, 3))
    qw = ((2, 3), (2, 5), (2, 7), (1, MAXD))
    if d0 == 0 or d1 == 0:
        i = 3
    else:
        for i in range(3):
            c0, c1 = qw[i][order], qw[i][1 - order]
            if ((d0 > d1 and d0 * c0 < d1 * c1)
                    or (d0 <= d1 and d0 * c0 > d1 * c1)):
                break
        else:
            i = 3
    return lut[i][order], lut[i][1 - order]


def compound_dist_weighted(p0: np.ndarray, p1: np.ndarray, fwd: int,
                           bck: int, bd: int) -> np.ndarray:
    """Distance-weighted compound of two ConvBuf-domain predictions
    (use_dist_wtd_comp_avg tail, inter_prediction.c:470)."""
    offset_bits = bd + 2 * FILTER_BITS - ROUND_0
    round_offset = (1 << (offset_bits - ROUND_1)) \
        + (1 << (offset_bits - ROUND_1 - 1))
    round_bits = 2 * FILTER_BITS - ROUND_0 - ROUND_1
    tmp = (p0 * fwd + p1 * bck) >> 4   # DIST_PRECISION_BITS
    tmp = tmp - round_offset
    out = _rpot(tmp, round_bits)
    return np.clip(out, 0, (1 << bd) - 1).astype(np.uint16)


def compound_average(p0: np.ndarray, p1: np.ndarray, bd: int) -> np.ndarray:
    """COMPOUND_AVERAGE of two ConvBuf-domain predictions -> (h, w) uint16
    pixels (the do_average tail of the jnt convolve kernels)."""
    offset_bits = bd + 2 * FILTER_BITS - ROUND_0
    round_offset = (1 << (offset_bits - ROUND_1)) \
        + (1 << (offset_bits - ROUND_1 - 1))
    round_bits = 2 * FILTER_BITS - ROUND_0 - ROUND_1
    tmp = (p0 + p1) >> 1
    tmp = tmp - round_offset
    out = _rpot(tmp, round_bits)
    return np.clip(out, 0, (1 << bd) - 1).astype(np.uint16)
