"""Inter-prediction subpel convolution (normative MC; spec §7.11.3.4).

Behavior reference: svt_av1_convolve_2d_sr_c (inter_prediction.c:311) and the
x/y/copy specializations; filter kernels are spec constants (extracted).
Single-reference ("sr", non-compound) path; round_0=3, round_1=11 at 8-bit.

Batched over blocks: inputs are (B, h + taps - 1, w + taps - 1) source
patches already gathered at the full-pel MV positions.
"""

from __future__ import annotations

import numpy as np

from .spec_tables import get_tables

FILTER_BITS = 7
SUBPEL_BITS = 4
SUBPEL_MASK = 15

# InterpFilter enum: EIGHTTAP_REGULAR=0, EIGHTTAP_SMOOTH=1, MULTITAP_SHARP=2, BILINEAR=3
_FILTER_KEY = {0: "interp_sub_pel_filters_8", 1: "interp_sub_pel_filters_8smooth",
               2: "interp_sub_pel_filters_8sharp", 3: "interp_bilinear_filters"}
# short (4-tap) variants used when block dim <= 4 (spec 7.11.3.10:
# REGULAR and SHARP both map to the 4-tap regular set, SMOOTH to 4smooth)
_FILTER_KEY_W4 = {0: "interp_sub_pel_filters_4", 1: "interp_sub_pel_filters_4smooth",
                  2: "interp_sub_pel_filters_4", 3: "interp_bilinear_filters"}


def get_filter_kernel(interp_filter: int, subpel_q4: int, dim: int) -> np.ndarray:
    t = get_tables()
    key = _FILTER_KEY[interp_filter] if dim > 4 else _FILTER_KEY_W4[interp_filter]
    return t._raw[key][subpel_q4 & SUBPEL_MASK].astype(np.int32)


def convolve_2d_sr(patches: np.ndarray, w: int, h: int, subpel_x_q4: int,
                   subpel_y_q4: int, interp_x: int = 0, interp_y: int = 0,
                   bd: int = 8) -> np.ndarray:
    """patches: (B, h+7, w+7) source windows whose [3, 3] pixel corresponds to
    the full-pel position of the block's top-left. Returns (B, h, w) uint16.

    Handles all four subpel cases with the normative rounding for each
    (2d / x-only / y-only / copy)."""
    x = patches.astype(np.int32)
    if subpel_x_q4 == 0 and subpel_y_q4 == 0:
        return x[:, 3 : 3 + h, 3 : 3 + w].astype(np.uint16)

    round_0, round_1 = 3, 11
    if subpel_x_q4 and subpel_y_q4:
        fx = get_filter_kernel(interp_x, subpel_x_q4, w)
        fy = get_filter_kernel(interp_y, subpel_y_q4, h)
        # horizontal over rows [0, h+6]
        im = np.zeros((x.shape[0], h + 7, w), np.int32)
        off = 1 << (bd + FILTER_BITS - 1)
        for k in range(8):
            im += fx[k] * x[:, :, k : k + w]
        im = (im + off + (1 << (round_0 - 1))) >> round_0
        # vertical
        offset_bits = bd + 2 * FILTER_BITS - round_0
        out = np.zeros((x.shape[0], h, w), np.int32)
        for k in range(8):
            out += fy[k] * im[:, k : k + h, :]
        out = ((out + (1 << offset_bits) + (1 << (round_1 - 1))) >> round_1) - (
            (1 << (offset_bits - round_1)) + (1 << (offset_bits - round_1 - 1))
        )
        bits = 2 * FILTER_BITS - round_0 - round_1
        out = (out + ((1 << (bits - 1)) if bits > 0 else 0)) >> bits if bits > 0 else out
        return np.clip(out, 0, (1 << bd) - 1).astype(np.uint16)

    if subpel_x_q4:  # x only (convolve_x_sr: single pass, round FILTER_BITS - round_0 then round_0)
        fx = get_filter_kernel(interp_x, subpel_x_q4, w)
        src = x[:, 3 : 3 + h, :]
        out = np.zeros((x.shape[0], h, w), np.int32)
        for k in range(8):
            out += fx[k] * src[:, :, k : k + w]
        bits = FILTER_BITS - round_0
        out = (out + (1 << (round_0 - 1))) >> round_0
        out = (out + (1 << (bits - 1))) >> bits
        return np.clip(out, 0, (1 << bd) - 1).astype(np.uint16)

    # y only (convolve_y_sr: single pass, round FILTER_BITS)
    fy = get_filter_kernel(interp_y, subpel_y_q4, h)
    src = x[:, :, 3 : 3 + w]
    out = np.zeros((x.shape[0], h, w), np.int32)
    for k in range(8):
        out += fy[k] * src[:, k : k + h, :]
    out = (out + (1 << (FILTER_BITS - 1))) >> FILTER_BITS
    return np.clip(out, 0, (1 << bd) - 1).astype(np.uint16)
