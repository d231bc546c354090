"""Wedge compound masks (spec 7.11.3.11 wedge mask process).

Behavior references: inter_prediction.c:1439 (the precomputed primary rows
Wedge_Master_Oblique_Even/Odd/Vertical, identical to the spec tables),
:1983 init_wedge_primary_masks (shift-copy assembly of the 6 directional
primary planes and their complements), :1855-1935 (the 16-entry codebooks
and per-size lookup), :2038 init_wedge_signs (first row+column average
rule), blend_a64_mask.c (d16-domain masked blend).  All masks are
reconstructed from the three 64-entry spec rows + the codebook geometry —
nothing is copied beyond the normative tables themselves.
"""

from __future__ import annotations

import numpy as np

MASK_PRIMARY = 64

# spec: Wedge_Master_Oblique_Even / Odd / Vertical
_OBLIQUE_EVEN = np.array([
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 1, 4, 11, 27, 46, 58, 62, 63, 64, 64, 64, 64, 64,
    64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64,
    64, 64, 64, 64, 64, 64], np.int32)
_OBLIQUE_ODD = np.array([
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 1, 2, 6, 18, 37, 53, 60, 63, 64, 64, 64, 64, 64,
    64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64,
    64, 64, 64, 64, 64, 64], np.int32)
_VERTICAL = np.array([
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 2, 7, 21, 43, 57, 62, 64, 64, 64, 64, 64, 64,
    64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64,
    64, 64, 64, 64, 64, 64], np.int32)

# WedgeDirectionType (inter_prediction.h:75)
HORIZONTAL, VERTICAL, OBLIQUE27, OBLIQUE63, OBLIQUE117, OBLIQUE153 = range(6)

# 16-entry codebook for square blocks (wedge_codebook_16_heqw):
# (direction, x_offset, y_offset) with offsets in 1/8 block units
CODEBOOK_HEQW = (
    (OBLIQUE27, 4, 4), (OBLIQUE63, 4, 4), (OBLIQUE117, 4, 4),
    (OBLIQUE153, 4, 4), (HORIZONTAL, 4, 2), (HORIZONTAL, 4, 6),
    (VERTICAL, 2, 4), (VERTICAL, 6, 4), (OBLIQUE27, 4, 2),
    (OBLIQUE27, 4, 6), (OBLIQUE153, 4, 2), (OBLIQUE153, 4, 6),
    (OBLIQUE63, 2, 4), (OBLIQUE63, 6, 4), (OBLIQUE117, 2, 4),
    (OBLIQUE117, 6, 4),
)

_master = None          # [neg][direction] -> (64, 64) int32
_mask_cache = {}        # (size, index, sign) -> (size, size) mask
_signflip_cache = {}    # size -> [16] bools


def _shift_copy(src, shift):
    out = np.empty(MASK_PRIMARY, np.int32)
    if shift >= 0:
        out[shift:] = src[: MASK_PRIMARY - shift]
        out[:shift] = src[0]
    else:
        k = -shift
        out[: MASK_PRIMARY - k] = src[k:]
        out[MASK_PRIMARY - k :] = src[-1]
    return out


def _build_master():
    global _master
    if _master is not None:
        return _master
    w = h = MASK_PRIMARY
    obl63 = np.zeros((h, w), np.int32)
    vert = np.zeros((h, w), np.int32)
    shift = h // 4
    for i in range(0, h, 2):
        obl63[i] = _shift_copy(_OBLIQUE_EVEN, shift)
        shift -= 1
        obl63[i + 1] = _shift_copy(_OBLIQUE_ODD, shift)
        vert[i] = _VERTICAL
        vert[i + 1] = _VERTICAL
    m = [[None] * 6 for _ in range(2)]
    m[0][OBLIQUE63] = obl63
    m[0][OBLIQUE27] = obl63.T.copy()
    m[0][OBLIQUE117] = (64 - obl63)[:, ::-1].copy()
    m[0][OBLIQUE153] = m[0][OBLIQUE117].T.copy()
    m[0][VERTICAL] = vert
    m[0][HORIZONTAL] = vert.T.copy()
    for d in range(6):
        m[1][d] = 64 - m[0][d]
    _master = m
    return m


def _mask_primary(index, neg, size):
    """Slice the primary plane for a size x size block at codebook offsets
    (get_wedge_mask_inplace, signflip already applied by the caller)."""
    d, xo, yo = CODEBOOK_HEQW[index]
    m = _build_master()[neg][d]
    woff = (xo * size) >> 3
    hoff = (yo * size) >> 3
    r0 = MASK_PRIMARY // 2 - hoff
    c0 = MASK_PRIMARY // 2 - woff
    return m[r0 : r0 + size, c0 : c0 + size]


def _signflips(size):
    fl = _signflip_cache.get(size)
    if fl is None:
        fl = []
        for widx in range(16):
            msk = _mask_primary(widx, 0, size)
            s = int(msk[0, :].sum()) + int(msk[1:, 0].sum())
            avg = (s + (2 * size - 1) // 2) // (2 * size - 1)
            fl.append(avg < 32)
        _signflip_cache[size] = fl
    return fl


def wedge_mask(size: int, index: int, sign: int) -> np.ndarray:
    """Luma mask (size x size, weights for prediction 0) for a square block;
    sizes 8/16/32, index 0..15, sign 0/1."""
    key = (size, index, sign)
    m = _mask_cache.get(key)
    if m is None:
        neg = sign ^ _signflips(size)[index]
        m = np.ascontiguousarray(_mask_primary(index, neg, size))
        _mask_cache[key] = m
    return m


def wedge_mask_chroma(size: int, index: int, sign: int) -> np.ndarray:
    """4:2:0 chroma mask: 2x2 average of the luma mask (spec 7.11.3.11)."""
    m = wedge_mask(size, index, sign)
    return (m[0::2, 0::2] + m[0::2, 1::2] + m[1::2, 0::2]
            + m[1::2, 1::2] + 2) >> 2


def blend_d16(p0: np.ndarray, p1: np.ndarray, mask: np.ndarray,
              bd: int) -> np.ndarray:
    """aom_lowbd/highbd_blend_a64_d16_mask: blend two ConvBuf-domain
    compound predictions under `mask` (weights p0) and round to pixels."""
    from .compound import FILTER_BITS, ROUND_0, ROUND_1, _rpot

    offset_bits = bd + 2 * FILTER_BITS - ROUND_0
    round_offset = ((1 << (offset_bits - ROUND_1))
                    + (1 << (offset_bits - ROUND_1 - 1)))
    round_bits = 2 * FILTER_BITS - ROUND_0 - ROUND_1
    res = (mask * p0 + (64 - mask) * p1) >> 6
    res = res - round_offset
    return np.clip(_rpot(res, round_bits), 0, (1 << bd) - 1).astype(np.uint16)


def diffwtd_masks(p0: np.ndarray, p1: np.ndarray, bd: int):
    """COMPOUND_DIFFWTD masks from the pair's ConvBuf-domain predictions
    (av1_build_compound_diffwtd_mask_d16: base 38, diff/16, and the
    inverse). Returns (mask_38, mask_38_inv) int32 arrays."""
    from .compound import FILTER_BITS, ROUND_0, ROUND_1, _rpot

    rnd = 2 * FILTER_BITS - ROUND_0 - ROUND_1 + (bd - 8)
    diff = _rpot(np.abs(p0 - p1), rnd)
    m = np.clip(38 + diff // 16, 0, 64).astype(np.int32)
    return m, 64 - m


def subsample_mask(m: np.ndarray) -> np.ndarray:
    """4:2:0 chroma mask from a luma-plane mask (2x2 average)."""
    return (m[0::2, 0::2] + m[0::2, 1::2] + m[1::2, 0::2]
            + m[1::2, 1::2] + 2) >> 2
