"""OBMC (overlapped block motion compensation).

Behavior references: enc_inter_prediction.c:673 (foreach_overlappable_nb_*
neighbor iteration with the 4-wide pair adjustment), :1430/:1478 (blend
region geometry: above overlap = bh/2 rows with a vertical mask, left
overlap = bw/2 cols with a horizontal mask), inter_prediction.c:2406 (the
obmc_mask_N tables), :2282 (chroma sub-8 skip rule), blend_a64_mask.c:302
(AOM_BLEND_A64 rounding), entropy_coding.c:1234 (motion_mode_allowed).
"""

from __future__ import annotations

import numpy as np

from .mv_pred import LAST_FRAME

OBMC_MASKS = {
    1: np.array([64], np.int32),
    2: np.array([45, 64], np.int32),
    4: np.array([39, 50, 59, 64], np.int32),
    8: np.array([36, 42, 48, 53, 57, 61, 64, 64], np.int32),
    16: np.array([34, 37, 40, 43, 46, 49, 52, 54, 56, 58, 60, 61,
                  64, 64, 64, 64], np.int32),
    32: np.array([33, 35, 36, 38, 40, 41, 43, 44, 45, 47, 48, 50, 51, 52,
                  53, 55, 56, 57, 58, 59, 60, 60, 61, 62, 64, 64, 64, 64,
                  64, 64, 64, 64], np.int32),
}

# max_neighbor_obmc[mi_size_wide_log2] (enc_inter_prediction.c:668)
MAX_NEIGHBOR_OBMC = (0, 1, 2, 3, 4, 4)


def _above_neighbors(enc, mi_row, mi_col, n4_w, nb_max):
    """[(origin_mi_col, width_mi, nb_mi_col)] of overlappable above
    neighbors (foreach_overlappable_nb_above)."""
    t_r0, _, t_c0, _ = enc.tile_mi
    if mi_row <= t_r0:
        return []
    out = []
    g = enc.grid
    end_col = min(mi_col + n4_w, enc.mi_cols)
    c = mi_col
    count = 0
    while c < end_col and count < nb_max:
        nbc = c
        step = min(int(g.bw4[mi_row - 1, c]), 16)
        if step == 1:
            c &= ~1
            nbc = c + 1
            step = 2
        if int(g.ref_frame[mi_row - 1, nbc]) > 0:
            count += 1
            out.append((c, min(n4_w, step), nbc))
        c += step
    return out


def _left_neighbors(enc, mi_row, mi_col, n4_h, nb_max):
    t_r0, _, t_c0, _ = enc.tile_mi
    if mi_col <= t_c0:
        return []
    out = []
    g = enc.grid
    end_row = min(mi_row + n4_h, enc.mi_rows)
    r = mi_row
    count = 0
    while r < end_row and count < nb_max:
        nbr = r
        step = min(int(g.bh4[r, mi_col - 1]), 16)
        if step == 1:
            r &= ~1
            nbr = r + 1
            step = 2
        if int(g.ref_frame[r, mi_col - 1]) > 0:
            count += 1
            out.append((r, min(n4_h, step), nbr))
        r += step
    return out


def overlappable_count(enc, mi_row, mi_col, n4_w, n4_h) -> int:
    """Total overlappable neighbors (the allowed-rule's == 0 test)."""
    na = _above_neighbors(enc, mi_row, mi_col, n4_w,
                          MAX_NEIGHBOR_OBMC[int(np.log2(n4_w))])
    nl = _left_neighbors(enc, mi_row, mi_col, n4_h,
                         MAX_NEIGHBOR_OBMC[int(np.log2(n4_h))])
    return len(na) + len(nl)


def _skip_chroma_above(W, H) -> bool:
    """svt_av1_skip_u4x4_pred_in_obmc: the ABOVE pass (dir 0) skips chroma
    when the chroma plane block is 4x4/8x4/4x8; the left pass never skips."""
    cw, ch = max(W >> 1, 4), max(H >> 1, 4)
    return (cw, ch) in ((4, 4), (8, 4), (4, 8))


def build_obmc_preds(enc, mi_row, mi_col, W, H, preds):
    """Blend neighbor-motion predictions into `preds` (dict plane -> array,
    modified in place; arrays are the block's own predictions). Mirrors
    av1_build_obmc_inter_prediction: above pass fully, then left pass."""
    n4_w, n4_h = W >> 2, H >> 2
    g = enc.grid
    luma = [0] if 0 in preds else []
    has_uv = not enc.mono and 1 in preds
    planes_above = luma + ([1, 2] if has_uv and not _skip_chroma_above(W, H)
                           else [])
    planes_left = luma + ([1, 2] if has_uv else [])

    def blend(plane, px, py, bw, bh, mv, ref_const, filt, vertical):
        tmp = enc._mc_pred(plane, px, py, bw, bh, mv, ref_const,
                           filt=filt).astype(np.int32)
        ss = 0 if plane == 0 else 1
        ox = px - ((mi_col * 4) >> ss)
        oy = py - ((mi_row * 4) >> ss)
        dst = preds[plane]
        reg = dst[oy : oy + bh, ox : ox + bw].astype(np.int32)
        if vertical:
            m = OBMC_MASKS[bh][:, None]
        else:
            m = OBMC_MASKS[bw][None, :]
        out = (m * reg + (64 - m) * tmp + 32) >> 6
        dst[oy : oy + bh, ox : ox + bw] = out.astype(dst.dtype)

    overlap_v = min(H, 64) >> 1
    for (c0, width_mi, nbc) in _above_neighbors(
            enc, mi_row, mi_col, n4_w,
            MAX_NEIGHBOR_OBMC[int(np.log2(n4_w))]):
        mv = (int(g.mv_row[mi_row - 1, nbc]), int(g.mv_col[mi_row - 1, nbc]))
        ref = int(g.ref_frame[mi_row - 1, nbc])
        nf = int(g.filt[mi_row - 1, nbc])   # neighbor's interp filter
        nf = nf if nf < 3 else 0
        for plane in planes_above:
            ss = 0 if plane == 0 else 1
            bw = (width_mi * 4) >> ss
            bh = overlap_v >> ss
            px = (c0 * 4) >> ss
            py = (mi_row * 4) >> ss
            blend(plane, px, py, bw, bh, mv, ref, nf, vertical=True)

    overlap_h = min(W, 64) >> 1
    for (r0, height_mi, nbr) in _left_neighbors(
            enc, mi_row, mi_col, n4_h,
            MAX_NEIGHBOR_OBMC[int(np.log2(n4_h))]):
        mv = (int(g.mv_row[nbr, mi_col - 1]), int(g.mv_col[nbr, mi_col - 1]))
        ref = int(g.ref_frame[nbr, mi_col - 1])
        nf = int(g.filt[nbr, mi_col - 1])
        nf = nf if nf < 3 else 0
        for plane in planes_left:
            ss = 0 if plane == 0 else 1
            bw = overlap_h >> ss
            bh = (height_mi * 4) >> ss
            px = (mi_col * 4) >> ss
            py = (r0 * 4) >> ss
            blend(plane, px, py, bw, bh, mv, ref, nf, vertical=False)
    return preds
