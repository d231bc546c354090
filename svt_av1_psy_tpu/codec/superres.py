"""Super-resolution: the normative horizontal upscaler (spec 7.16) and the
encoder-side downscaler.

Behavior references: super_res.c:43 (av1_get_upscale_convolve_step), :47
(get_upscale_convolve_x0), :54 (av1_convolve_horiz_rs: 64-phase 8-tap
polyphase with edge clamping), :94 (upscale_normative_rect border
replication), resize.c:277 (svt_av1_interpolate_core: the non-normative
low-pass downscaler, table chosen by ratio :262), :22
(calculate_scaled_size_helper). Both directions here are vectorized
gathers: per-output-column tap indices and phase filters are precomputed
once, then one batched multiply-accumulate covers the whole plane.
"""

from __future__ import annotations

import functools
from pathlib import Path

import numpy as np

RS_SUBPEL_BITS = 6
RS_SUBPEL_MASK = (1 << RS_SUBPEL_BITS) - 1
RS_SCALE_SUBPEL_BITS = 14
RS_SCALE_SUBPEL_MASK = (1 << RS_SCALE_SUBPEL_BITS) - 1
RS_SCALE_EXTRA_BITS = RS_SCALE_SUBPEL_BITS - RS_SUBPEL_BITS
RS_SCALE_EXTRA_OFF = 1 << (RS_SCALE_EXTRA_BITS - 1)
FILTER_BITS = 7
TAPS = 8
SCALE_NUMERATOR = 8


@functools.lru_cache(maxsize=1)
def _filters():
    f = np.load(Path(__file__).parent / "tables" / "av1_resize_filters.npz")
    return {k: f[k].astype(np.int32) for k in f.files}


def _idiv(a: int, b: int) -> int:
    """C-style integer division (truncation toward zero)."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def scaled_width(upscaled: int, denom: int) -> int:
    """calculate_scaled_size_helper (super_res.c:22), min-16 clamp."""
    if denom == SCALE_NUMERATOR:
        return upscaled
    w = (upscaled * SCALE_NUMERATOR + denom // 2) // denom
    return max(w, min(16, upscaled))


def upscale_plane(plane: np.ndarray, out_w: int, bd: int = 8,
                  visible_w: int | None = None) -> np.ndarray:
    """Normative horizontal superres upscale of (H, in_w) -> (H, out_w)
    (av1_convolve_horiz_rs + upscale_normative_rect). step/x0 derive from
    the VISIBLE downscaled width, but the taps read (and edge-replicate
    beyond) the mi-aligned extent: the decoder reconstructs real pixels out
    to MiCols*4, and svt_av1_upscale_normative_rows samples them
    (downscaled_x1 = mi_col_end << MI_SIZE_LOG2, super_res.c:233)."""
    H, in_w = plane.shape
    vw = in_w if visible_w is None else int(visible_w)
    step = ((vw << RS_SCALE_SUBPEL_BITS) + out_w // 2) // out_w
    err = out_w * step - (vw << RS_SCALE_SUBPEL_BITS)
    # C truncating division both times (get_upscale_convolve_x0)
    x0 = (_idiv(-((out_w - vw) << (RS_SCALE_SUBPEL_BITS - 1)) + out_w // 2,
                out_w)
          + RS_SCALE_EXTRA_OFF - _idiv(err, 2)) & RS_SCALE_SUBPEL_MASK
    xqn = x0 + step * np.arange(out_w, dtype=np.int64)
    # src pointer starts at input-1 - (TAPS/2 - 1) = input - 4
    base = (xqn >> RS_SCALE_SUBPEL_BITS).astype(np.int64) - 4
    phase = ((xqn & RS_SCALE_SUBPEL_MASK) >> RS_SCALE_EXTRA_BITS).astype(np.int64)
    taps = _filters()["normative"][phase]                    # (out_w, 8)
    idx = np.clip(base[:, None] + np.arange(TAPS)[None, :], 0, in_w - 1)
    src = plane.astype(np.int32)
    acc = np.einsum("hwk,wk->hw", src[:, idx], taps, dtype=np.int64)
    out = (acc + (1 << (FILTER_BITS - 1))) >> FILTER_BITS
    return np.clip(out, 0, (1 << bd) - 1).astype(plane.dtype)


def _down_filter(in_len: int, out_len: int) -> np.ndarray:
    """choose_interp_filter (resize.c:262)."""
    f = _filters()
    r16 = out_len * 16
    if r16 >= in_len * 16:
        return f["normative"]
    if r16 >= in_len * 13:
        return f["down875"]
    if r16 >= in_len * 11:
        return f["down750"]
    if r16 >= in_len * 9:
        return f["down625"]
    return f["down500"]


def downscale_plane(plane: np.ndarray, out_w: int, bd: int = 8) -> np.ndarray:
    """Encoder-side horizontal downscale (svt_av1_interpolate_core as one
    vectorized gather; non-normative, quality-only)."""
    H, in_w = plane.shape
    if out_w == in_w:
        return plane.copy()
    taps_tab = _down_filter(in_w, out_w)
    delta = ((in_w << RS_SCALE_SUBPEL_BITS) + out_w // 2) // out_w
    if in_w > out_w:
        offset = _idiv(((in_w - out_w) << (RS_SCALE_SUBPEL_BITS - 1))
                       + out_w // 2, out_w)
    else:
        offset = _idiv(-(((out_w - in_w) << (RS_SCALE_SUBPEL_BITS - 1))
                         + out_w // 2), out_w)
    y = offset + RS_SCALE_EXTRA_OFF + delta * np.arange(out_w, dtype=np.int64)
    int_pel = y >> RS_SCALE_SUBPEL_BITS
    phase = ((y >> RS_SCALE_EXTRA_BITS) & RS_SUBPEL_MASK).astype(np.int64)
    taps = taps_tab[phase]
    idx = np.clip(int_pel[:, None] - TAPS // 2 + 1
                  + np.arange(TAPS)[None, :], 0, in_w - 1)
    src = plane.astype(np.int32)
    acc = np.einsum("hwk,wk->hw", src[:, idx], taps, dtype=np.int64)
    out = (acc + (1 << (FILTER_BITS - 1))) >> FILTER_BITS
    return np.clip(out, 0, (1 << bd) - 1).astype(plane.dtype)
