"""Screen-content detection (behavioral ref: pic_analysis_process.c:1974
svt_aom_is_screen_content_psy — the PSY fork's anti-aliased-glyph-robust
variant, and :2087 svt_aom_is_screen_content).

Per 16x16 block the detector counts distinct luma colors; "simple" blocks
(<=4 colors) vote directly, "complex" blocks (<=40 colors) are first dilated
with the locally dominant color to strip anti-aliased edge pixels and vote
if the dilated palette is <=6 colors. Photo-like blocks (>40 colors) weigh
against. Classes:
  sc_class0 - palette tools worthwhile
  sc_class1 - class0 + high-variance palettizable blocks (IntraBC-grade)
"""

from __future__ import annotations

import numpy as np

_SIMPLE_COLOR_THRESH = 4
_COMPLEX_INITIAL_COLOR_THRESH = 40
_COMPLEX_FINAL_COLOR_THRESH = 6
_VAR_THRESH = 5
_BLK = 16


def _block_view(y8: np.ndarray):
    h, w = y8.shape
    rb, cb = h // _BLK, w // _BLK
    v = y8[: rb * _BLK, : cb * _BLK].reshape(rb, _BLK, cb, _BLK)
    return v.transpose(0, 2, 1, 3).reshape(rb * cb, _BLK * _BLK)


def _color_counts(flat_blocks: np.ndarray) -> np.ndarray:
    s = np.sort(flat_blocks, axis=1)
    return 1 + (s[:, 1:] != s[:, :-1]).sum(axis=1)


def _dominant_dilate(block: np.ndarray) -> np.ndarray:
    """Replace each pixel with its 3x3-neighborhood dominant color
    (dilate_block analog, pic_analysis_process.c:1916): strips single-pixel
    anti-aliasing rims so the palette count reflects the glyph colors."""
    b = block.reshape(_BLK, _BLK)
    pad = np.pad(b, 1, mode="edge")
    neigh = np.stack([pad[r : r + _BLK, c : c + _BLK]
                      for r in range(3) for c in range(3)], axis=0)
    # per-pixel mode over the 9 neighbors
    sn = np.sort(neigh, axis=0)
    runs = np.ones_like(sn)
    for k in range(1, 9):
        runs[k] = np.where(sn[k] == sn[k - 1], runs[k - 1] + 1, 1)
    best = runs.argmax(axis=0)
    ii, jj = np.meshgrid(np.arange(_BLK), np.arange(_BLK), indexing="ij")
    return sn[best, ii, jj].reshape(-1)


def detect_screen_content(y: np.ndarray, bd: int = 8) -> tuple:
    """Returns (sc_class0, sc_class1) for one frame's luma plane."""
    y8 = (np.asarray(y) >> (bd - 8)).astype(np.uint8)
    h, w = y8.shape
    if h < _BLK or w < _BLK:
        return False, False
    blocks = _block_view(y8)
    ncolors = _color_counts(blocks)
    m = blocks.astype(np.int64)
    var = (m * m).mean(axis=1) - m.mean(axis=1) ** 2

    # solid (1-color) blocks vote for neither class (the reference's
    # is_valid_palette_nb_colors rejects single-color blocks)
    simple = (ncolors > 1) & (ncolors <= _SIMPLE_COLOR_THRESH)
    complex_cand = (ncolors > _SIMPLE_COLOR_THRESH) & (ncolors <= _COMPLEX_INITIAL_COLOR_THRESH)
    photo = ncolors > _COMPLEX_INITIAL_COLOR_THRESH

    counts_1 = int(simple.sum())
    counts_2 = int((simple & (var > _VAR_THRESH)).sum())
    for i in np.nonzero(complex_cand)[0]:
        if _color_counts(_dominant_dilate(blocks[i])[None])[0] <= _COMPLEX_FINAL_COLOR_THRESH:
            counts_1 += 1
            if var[i] > _VAR_THRESH:
                counts_2 += 1
    counts_photo = int(photo.sum())

    area = w * h
    sc0 = (counts_1 - counts_photo // 24) * _BLK * _BLK * 10 > area
    sc1 = sc0 and (counts_2 - counts_photo // 24) * _BLK * _BLK * 12 > area
    return bool(sc0), bool(sc1)
