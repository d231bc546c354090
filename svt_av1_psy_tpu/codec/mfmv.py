"""Temporal MV projection (MFMV / use_ref_frame_mvs).

Normative motion-field storage + projection, spec 7.9 / 7.20; behavior
references: av1_copy_frame_mvs (coding_loop.c:1209), av1_setup_motion_field
+ motion_field_projection + get_block_position (md_config_process.c:413-583),
get_mv_projection / lower_mv_precision (inter_prediction.h:232-254).

Per coded inter frame the encoder saves one (ref_frame, mv) per 8x8 unit
— the last-coded reference of the unit's bottom-right mi that points to a
non-future reference and fits REFMVS_LIMIT.  Before coding a frame with
use_ref_frame_mvs, the saved fields of up to MFMV_STACK_SIZE references
are projected through frame-distance ratios onto the current frame's 8x8
grid (`tpl_mvs`); the MV-stack temporal scan (mv_pred.setup_ref_mv_list)
then rescales these per target reference.  The decoder runs the identical
process, so every step here is bit-exact integer math.

Everything is numpy-vectorized: the per-frame projection is a handful of
whole-grid integer ops + one scatter (raster order = the reference's loop
order, so duplicate landing positions keep the last writer, matching the
C loop).
"""

from __future__ import annotations

import numpy as np

# inter_prediction.h:204 (spec div table for mv projection)
DIV_MULT = np.array(
    [0, 16384, 8192, 5461, 4096, 3276, 2730, 2340, 2048, 1820, 1638,
     1489, 1365, 1260, 1170, 1092, 1024, 963, 910, 862, 819, 780,
     744, 712, 682, 655, 630, 606, 585, 564, 546, 528], np.int64)

MAX_FRAME_DISTANCE = 31          # (1 << FRAME_OFFSET_BITS) - 1
REFMVS_LIMIT = (1 << 12) - 1     # coding_loop.c:1206
MV_CLAMP = (1 << 14) - 1         # MV_UPP - 1
MFMV_STACK_SIZE = 3

# ref-frame roles (mv_pred constants)
LAST, LAST2, LAST3, GOLDEN, BWDREF, ALTREF2, ALTREF = 1, 2, 3, 4, 5, 6, 7


def rel_dist(a: int, b: int, bits: int) -> int:
    """get_relative_dist (spec 5.9.3): signed wrap-around hint distance."""
    m = 1 << (bits - 1)
    diff = a - b
    return (diff & (m - 1)) - (diff & m)


def mv_projection(mv_r, mv_c, num, den):
    """get_mv_projection (inter_prediction.h:245): scale mv by num/den in
    Q14 with symmetric rounding.  Array- or scalar-valued; `den > 0`."""
    den = np.minimum(den, MAX_FRAME_DISTANCE)
    num = int(np.clip(num, -MAX_FRAME_DISTANCE, MAX_FRAME_DISTANCE))
    mul = DIV_MULT[den]
    pr = np.asarray(mv_r, np.int64) * num * mul
    pc = np.asarray(mv_c, np.int64) * num * mul
    # ROUND_POWER_OF_TWO_SIGNED(x, 14)
    out_r = np.where(pr >= 0, (pr + 8192) >> 14, -((-pr + 8192) >> 14))
    out_c = np.where(pc >= 0, (pc + 8192) >> 14, -((-pc + 8192) >> 14))
    return (np.clip(out_r, -MV_CLAMP, MV_CLAMP),
            np.clip(out_c, -MV_CLAMP, MV_CLAMP))


def lower_mv_precision(r: int, c: int, allow_hp: bool, force_int: bool):
    """lower_mv_precision (inter_prediction.h:232): round toward zero to
    full-pel (force_int) or even (1/4-pel grid) when hp is off."""
    if force_int:
        # integer_mv_precision: drop the sub-pel remainder (C % truncates
        # toward zero), rounding away from zero when |remainder| > 4
        def _int8(v):
            mod = int(np.fmod(v, 8))
            if mod != 0:
                v -= mod
                if abs(mod) > 4:
                    v += 8 if mod > 0 else -8
            return v
        return _int8(r), _int8(c)
    if not allow_hp:
        if r & 1:
            r += -1 if r > 0 else 1
        if c & 1:
            c += -1 if c > 0 else 1
    return r, c


def save_motion_field(grid, side, mi_rows: int, mi_cols: int):
    """av1_copy_frame_mvs from the final coded mi grid (coding_loop.c:1209).

    grid: codec.mv_pred.MiGrid with the frame's final coded state.
    side: (8,) int8 — ref_frame_side of THIS frame's references (1 future,
    -1 same-hint, 0 past); only side==0 references are stored.

    Returns (mf_ref int8, mf_row int16, mf_col int16), each
    ((mi_rows+1)//2, (mi_cols+1)//2).  Per 8x8 unit the reference's
    per-block loop stores ref idx 0 then idx 1 (idx 1 wins) of the
    last-coded mi covering the unit — in z-order coding that is the
    bottom-right 4x4, so sampling the grid at (2r+1, 2c+1) (clamped)
    reproduces it exactly.
    """
    rows8 = (mi_rows + 1) >> 1
    cols8 = (mi_cols + 1) >> 1
    rr = np.minimum(np.arange(rows8) * 2 + 1, mi_rows - 1)
    cc = np.minimum(np.arange(cols8) * 2 + 1, mi_cols - 1)
    side = np.asarray(side, np.int8)

    mf_ref = np.zeros((rows8, cols8), np.int8)
    mf_row = np.zeros((rows8, cols8), np.int16)
    mf_col = np.zeros((rows8, cols8), np.int16)
    for rf_arr, mr_arr, mc_arr in (
            (grid.ref_frame, grid.mv_row, grid.mv_col),
            (grid.ref_frame2, grid.mv2_row, grid.mv2_col)):
        rf = rf_arr[np.ix_(rr, cc)]
        mr = mr_arr[np.ix_(rr, cc)].astype(np.int16)
        mc = mc_arr[np.ix_(rr, cc)].astype(np.int16)
        ok = ((rf > 0) & (side[np.clip(rf, 0, 7)] == 0)
              & (np.abs(mr.astype(np.int32)) <= REFMVS_LIMIT)
              & (np.abs(mc.astype(np.int32)) <= REFMVS_LIMIT))
        mf_ref = np.where(ok, rf, mf_ref)
        mf_row = np.where(ok, mr, mf_row)
        mf_col = np.where(ok, mc, mf_col)
    return mf_ref, mf_row, mf_col


def _project_one(tpl_row, tpl_col, tpl_off, entry, cur_hint: int, bits: int,
                 dir_: int, mi_rows: int, mi_cols: int) -> int:
    """motion_field_projection (md_config_process.c:445) for one start
    frame.  Scatters (saved mv, ref offset) onto the current frame's 8x8
    grid at the position each saved MV projects to.  Returns 1 if the
    start frame participated (even if nothing landed), else 0."""
    if entry is None or entry.get("is_intra", True):
        return 0
    if entry["mi_rows"] != mi_rows or entry["mi_cols"] != mi_cols:
        return 0   # spec 7.9.2: no MFMV across spatial resolutions
    mf_ref, mf_row, mf_col = entry["mf"]
    start_hint = int(entry["hint"])
    start_to_cur = rel_dist(start_hint, cur_hint, bits)
    if dir_ == 2:
        start_to_cur = -start_to_cur
    ref_off = np.zeros(8, np.int32)
    for i in range(7):
        ref_off[1 + i] = rel_dist(start_hint, int(entry["ref_hints"][i]),
                                  bits)
    rfo = ref_off[np.clip(mf_ref, 0, 7)]
    valid = ((mf_ref > 0) & (rfo > 0) & (np.abs(rfo) <= MAX_FRAME_DISTANCE)
             & (abs(start_to_cur) <= MAX_FRAME_DISTANCE))
    if not valid.any():
        return 1
    prj_r, prj_c = mv_projection(mf_row, mf_col, start_to_cur,
                                 np.maximum(rfo, 1))
    # get_block_position: offsets in 8x8 units (>> 6 toward zero)
    ro = np.where(prj_r >= 0, prj_r >> 6, -((-prj_r) >> 6))
    co = np.where(prj_c >= 0, prj_c >> 6, -((-prj_c) >> 6))
    rows8, cols8 = mf_ref.shape
    blk_r = np.arange(rows8, dtype=np.int64)[:, None]
    blk_c = np.arange(cols8, dtype=np.int64)[None, :]
    sign = dir_ >> 1
    row = blk_r - ro if sign == 1 else blk_r + ro
    col = blk_c - co if sign == 1 else blk_c + co
    base_r = (blk_r >> 3) << 3
    base_c = (blk_c >> 3) << 3
    ok = (valid
          & (row >= 0) & (row < (mi_rows >> 1))
          & (col >= 0) & (col < (mi_cols >> 1))
          & (row >= base_r) & (row < base_r + 8)         # MAX_OFFSET_HEIGHT 0
          & (col >= base_c - 8) & (col < base_c + 16))   # MAX_OFFSET_WIDTH 64
    idx = np.flatnonzero(ok)       # raster order = reference loop order;
    if idx.size:                   # duplicate targets keep the last writer
        rowf = np.broadcast_to(row, (rows8, cols8)).ravel()[idx]
        colf = np.broadcast_to(col, (rows8, cols8)).ravel()[idx]
        flat = rowf * tpl_off.shape[1] + colf
        tpl_row.ravel()[flat] = mf_row.ravel()[idx]
        tpl_col.ravel()[flat] = mf_col.ravel()[idx]
        tpl_off.ravel()[flat] = rfo.ravel()[idx].astype(np.uint8)
    return 1


def setup_motion_field(mi_rows: int, mi_cols: int, cur_hint: int, bits: int,
                       refs: dict):
    """av1_setup_motion_field (md_config_process.c:513): project up to
    MFMV_STACK_SIZE reference motion fields onto the current frame.

    refs: role (1..7) -> entry dict(hint, ref_hints, is_intra, mf,
    mi_rows, mi_cols) or None — the DPB side data of the frame currently
    serving that role.  Returns (tpl_row i16, tpl_col i16, tpl_off u8),
    each ((mi_rows+1)//2, (mi_cols+1)//2); tpl_off == 0 marks INVALID.
    """
    rows8 = (mi_rows + 1) >> 1
    cols8 = (mi_cols + 1) >> 1
    tpl_row = np.zeros((rows8, cols8), np.int16)
    tpl_col = np.zeros((rows8, cols8), np.int16)
    tpl_off = np.zeros((rows8, cols8), np.uint8)

    def hint_of(role):
        e = refs.get(role)
        return int(e["hint"]) if e is not None else 0

    ref_stamp = MFMV_STACK_SIZE - 1
    last = refs.get(LAST)
    if last is not None:
        # is_lst_overlay: LAST is the overlay of the GOLDEN-slot ALTREF
        alt_of_lst = int(last["ref_hints"][ALTREF - 1])
        if alt_of_lst != hint_of(GOLDEN):
            _project_one(tpl_row, tpl_col, tpl_off, last, cur_hint, bits, 2,
                         mi_rows, mi_cols)
        ref_stamp -= 1
    if rel_dist(hint_of(BWDREF), cur_hint, bits) > 0:
        if _project_one(tpl_row, tpl_col, tpl_off, refs.get(BWDREF),
                        cur_hint, bits, 0, mi_rows, mi_cols):
            ref_stamp -= 1
    if rel_dist(hint_of(ALTREF2), cur_hint, bits) > 0:
        if _project_one(tpl_row, tpl_col, tpl_off, refs.get(ALTREF2),
                        cur_hint, bits, 0, mi_rows, mi_cols):
            ref_stamp -= 1
    if rel_dist(hint_of(ALTREF), cur_hint, bits) > 0 and ref_stamp >= 0:
        if _project_one(tpl_row, tpl_col, tpl_off, refs.get(ALTREF),
                        cur_hint, bits, 0, mi_rows, mi_cols):
            ref_stamp -= 1
    if ref_stamp >= 0:
        _project_one(tpl_row, tpl_col, tpl_off, refs.get(LAST2), cur_hint,
                     bits, 2, mi_rows, mi_cols)
    return tpl_row, tpl_col, tpl_off
