"""Normative reference-MV stack construction (spec §7.10.2; behavior
reference: adaptive_mv_pred.c setup_ref_mv_list :637-942).

Single-reference path, temporal MVs (use_ref_frame_mvs) off, no compound —
matching the v0 inter configuration (order hints disabled). The decoder runs
the identical process, so the stack (and the derived mode contexts) must be
exact for NEWMV/NEARESTMV/NEARMV/GLOBALMV coding to stay in sync.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

MAX_REF_MV_STACK_SIZE = 8
MAX_MV_REF_CANDIDATES = 2
MVREF_ROWS = 3
MVREF_COLS = 3
REF_CAT_LEVEL = 640
MV_BORDER = 16 << 3
GLOBALMV_OFFSET = 3
REFMV_OFFSET = 4

# inter prediction modes (single ref)
NEARESTMV, NEARMV, GLOBALMV, NEWMV = 13, 14, 15, 16

INTRA_FRAME = 0
LAST_FRAME = 1
GOLDEN_FRAME = 4
ALTREF_FRAME = 7


@dataclass
class MiGrid:
    """Per-4x4 mode info needed by MV prediction (full-frame arrays)."""

    rows: int
    cols: int
    ref_frame: np.ndarray = None   # int8, 0 = intra
    mv_row: np.ndarray = None      # int16, 1/8 pel
    mv_col: np.ndarray = None
    mode: np.ndarray = None        # uint8 PredictionMode/inter mode
    bw4: np.ndarray = None         # block width in mi units at this mi
    bh4: np.ndarray = None

    def __post_init__(self):
        shape = (self.rows, self.cols)
        self.ref_frame = np.zeros(shape, np.int8)
        self.mv_row = np.zeros(shape, np.int16)
        self.mv_col = np.zeros(shape, np.int16)
        self.mode = np.zeros(shape, np.uint8)
        self.bw4 = np.ones(shape, np.uint8)
        self.bh4 = np.ones(shape, np.uint8)

    def set_block(self, mi_row, mi_col, bw4, bh4, ref_frame, mv, mode):
        r1 = min(mi_row + bh4, self.rows)
        c1 = min(mi_col + bw4, self.cols)
        self.ref_frame[mi_row:r1, mi_col:c1] = ref_frame
        self.mv_row[mi_row:r1, mi_col:c1] = mv[0]
        self.mv_col[mi_row:r1, mi_col:c1] = mv[1]
        self.mode[mi_row:r1, mi_col:c1] = mode
        self.bw4[mi_row:r1, mi_col:c1] = bw4
        self.bh4[mi_row:r1, mi_col:c1] = bh4


def _has_top_right(sb_mi: int, mi_row, mi_col, n8_w, n8_h, mi_rows, mi_cols, tile) -> bool:
    bs = max(n8_w, n8_h)
    if bs > 16:  # mi_size_wide[BLOCK_64X64]
        return False
    # (two-rect second-half rules don't arise: we only emit NONE/SPLIT and
    # HORZ/VERT halves where the second half is out of frame)
    mask_row = mi_row & (sb_mi - 1)
    mask_col = mi_col & (sb_mi - 1)
    has_tr = not ((mask_row & bs) and (mask_col & bs))
    b = bs
    while b < sb_mi:
        if mask_col & b:
            if (mask_col & (2 * b)) and (mask_row & (2 * b)):
                has_tr = False
                break
        else:
            break
        b <<= 1
    return bool(has_tr)


class _Ctx:
    __slots__ = ("stack", "weights", "count", "newmv_count", "row_match", "col_match")

    def __init__(self):
        self.stack = []
        self.weights = []
        self.count = 0
        self.newmv_count = 0
        self.row_match = 0
        self.col_match = 0


def _add_candidate(ctx: _Ctx, grid: MiGrid, r, c, ref_frame, gm_mv, length, weight, count_matches=True):
    if grid.ref_frame[r, c] == INTRA_FRAME and grid.mode[r, c] < NEARESTMV:
        return
    if grid.ref_frame[r, c] != ref_frame:
        return
    if grid.mode[r, c] == GLOBALMV:
        mv = gm_mv
    else:
        mv = (int(grid.mv_row[r, c]), int(grid.mv_col[r, c]))
    for i, s in enumerate(ctx.stack):
        if s == mv:
            ctx.weights[i] += weight * length
            break
    else:
        if ctx.count < MAX_REF_MV_STACK_SIZE:
            ctx.stack.append(mv)
            ctx.weights.append(weight * length)
            ctx.count += 1
    if count_matches:
        if grid.mode[r, c] == NEWMV:
            ctx.newmv_count += 1


def setup_ref_mv_list(grid: MiGrid, mi_row, mi_col, n8_w, n8_h, ref_frame,
                      tile, sb_mi=16, gm_mv=(0, 0)):
    """Returns (stack [(mvrow, mvcol)...], mode_context, refmv_count).

    tile: (mi_row_start, mi_row_end, mi_col_start, mi_col_end)."""
    t_r0, t_r1, t_c0, t_c1 = tile
    mode_ctx = 0
    ctx = _Ctx()

    up_available = mi_row > t_r0
    left_available = mi_col > t_c0
    row_adj = (n8_h < 2) and (mi_row & 1)
    col_adj = (n8_w < 2) and (mi_col & 1)
    max_row_offset = 0
    max_col_offset = 0
    if up_available:
        max_row_offset = -(MVREF_ROWS << 1) + row_adj
        if n8_h < 2:
            max_row_offset = -(2 << 1) + row_adj
        max_row_offset = int(np.clip(max_row_offset, t_r0 - mi_row, t_r1 - mi_row - 1))
    if left_available:
        max_col_offset = -(MVREF_COLS << 1) + col_adj
        if n8_w < 2:
            max_col_offset = -(2 << 1) + col_adj
        max_col_offset = int(np.clip(max_col_offset, t_c0 - mi_col, t_c1 - mi_col - 1))

    processed_rows = 0
    processed_cols = 0

    def scan_row(row_offset):
        nonlocal processed_rows
        end_mi = min(n8_w, grid.cols - mi_col, 16)
        col_off = 0
        if abs(row_offset) > 1:
            col_off = 1
            if (mi_col & 1) and n8_w < 2:
                col_off -= 1
        use_step_16 = n8_w >= 16
        i = 0
        matched_before = ctx.row_match
        found = [0]
        while i < end_mi:
            r, c = mi_row + row_offset, mi_col + col_off + i
            cand_w = int(grid.bw4[r, c])
            length = min(n8_w, cand_w)
            if use_step_16:
                length = max(4, length)
            elif abs(row_offset) > 1:
                length = max(length, 2)
            weight = 2
            if n8_w >= 2 and n8_w <= cand_w:
                inc = min(-max_row_offset + row_offset + 1, int(grid.bh4[r, c]))
                weight = max(weight, inc)
                processed_rows = inc - row_offset - 1
            if grid.ref_frame[r, c] == ref_frame:
                found[0] = 1
            _add_candidate(ctx, grid, r, c, ref_frame, gm_mv, length, weight)
            i += length
        if found[0]:
            ctx.row_match += 1

    def scan_col(col_offset):
        nonlocal processed_cols
        end_mi = min(n8_h, grid.rows - mi_row, 16)
        row_off = 0
        if abs(col_offset) > 1:
            row_off = 1
            if (mi_row & 1) and n8_h < 2:
                row_off -= 1
        use_step_16 = n8_h >= 16
        i = 0
        found = [0]
        while i < end_mi:
            r, c = mi_row + row_off + i, mi_col + col_offset
            cand_h = int(grid.bh4[r, c])
            length = min(n8_h, cand_h)
            if use_step_16:
                length = max(4, length)
            elif abs(col_offset) > 1:
                length = max(length, 2)
            weight = 2
            if n8_h >= 2 and n8_h <= cand_h:
                inc = min(-max_col_offset + col_offset + 1, int(grid.bw4[r, c]))
                weight = max(weight, inc)
                processed_cols = inc - col_offset - 1
            if grid.ref_frame[r, c] == ref_frame:
                found[0] = 1
            _add_candidate(ctx, grid, r, c, ref_frame, gm_mv, length, weight)
            i += length
        if found[0]:
            ctx.col_match += 1

    def scan_blk(row_offset, col_offset, count_row_match=True):
        r = mi_row + row_offset
        c = mi_col + col_offset
        if r < t_r0 or c < t_c0 or r >= t_r1 or c >= t_c1:
            return
        found = grid.ref_frame[r, c] == ref_frame
        _add_candidate(ctx, grid, r, c, ref_frame, gm_mv, 2, 2)
        if found and count_row_match:
            ctx.row_match += 1

    # the scan functions above count row/col matches once per scan like the
    # reference's ref_match_count counters
    if abs(max_row_offset) >= 1:
        scan_row(-1)
    if abs(max_col_offset) >= 1:
        scan_col(-1)
    if _has_top_right(sb_mi, mi_row, mi_col, n8_w, n8_h, grid.rows, grid.cols, tile):
        scan_blk(-1, n8_w)

    nearest_match = (ctx.row_match > 0) + (ctx.col_match > 0)
    nearest_newmv_count = ctx.newmv_count
    for i in range(ctx.count):
        ctx.weights[i] += REF_CAT_LEVEL

    # (temporal MVs disabled: use_ref_frame_mvs = 0)

    # top-left + outer rows/cols
    newmv_before = ctx.newmv_count
    scan_blk(-1, -1)
    for idx in range(2, MVREF_ROWS + 1):
        row_offset = -(idx << 1) + 1 + row_adj
        col_offset = -(idx << 1) + 1 + col_adj
        if abs(row_offset) <= abs(max_row_offset) and abs(row_offset) > processed_rows:
            scan_row(row_offset)
        if abs(col_offset) <= abs(max_col_offset) and abs(col_offset) > processed_cols:
            scan_col(col_offset)
    ctx.newmv_count = nearest_newmv_count  # outer scans use a dummy counter

    ref_match_count = (ctx.row_match > 0) + (ctx.col_match > 0)
    if nearest_match == 0:
        if ref_match_count >= 1:
            mode_ctx |= 1
        if ref_match_count == 1:
            mode_ctx |= 1 << REFMV_OFFSET
        elif ref_match_count >= 2:
            mode_ctx |= 2 << REFMV_OFFSET
    elif nearest_match == 1:
        mode_ctx |= 2 if nearest_newmv_count > 0 else 3
        if ref_match_count == 1:
            mode_ctx |= 3 << REFMV_OFFSET
        elif ref_match_count >= 2:
            mode_ctx |= 4 << REFMV_OFFSET
    else:
        mode_ctx |= 4 if nearest_newmv_count >= 1 else 5
        mode_ctx |= 5 << REFMV_OFFSET

    # stable sort by weight (the reference's bubble pass preserves order)
    order = sorted(range(ctx.count), key=lambda i: -ctx.weights[i])
    stack = [ctx.stack[i] for i in order]
    weights = [ctx.weights[i] for i in order]

    # extension scan (single-ref): relaxed ROW-1 / COL-1 until 2 candidates;
    # gm padding fills stack slots WITHOUT growing refmv_count (scan_row_col_light)
    refmv_count = ctx.count
    if refmv_count < MAX_MV_REF_CANDIDATES:
        mi_width = min(min(16, n8_w), grid.cols - mi_col)
        mi_height = min(min(16, n8_h), grid.rows - mi_row)
        mi_size = min(mi_width, mi_height)

        def relaxed(offs_row: bool):
            nonlocal refmv_count
            i = 0
            while i < mi_size and refmv_count < MAX_MV_REF_CANDIDATES:
                if offs_row:
                    r, c = mi_row - 1, mi_col + i
                    step = int(grid.bw4[r, c])
                else:
                    r, c = mi_row + i, mi_col - 1
                    step = int(grid.bh4[r, c])
                # add_extra_mv_candidate (spec 7.10.2.14): for single
                # prediction, ANY inter candidate's MV may enter the
                # extension scan (no ref-frame match required)
                if grid.ref_frame[r, c] > INTRA_FRAME:
                    mv = (int(grid.mv_row[r, c]), int(grid.mv_col[r, c]))
                    if mv not in stack[:refmv_count]:
                        if refmv_count < len(stack):
                            stack[refmv_count] = mv
                            weights[refmv_count] = 2
                        else:
                            stack.append(mv)
                            weights.append(2)
                        refmv_count += 1
                i += step

        if abs(max_row_offset) >= 1:
            relaxed(True)
        if abs(max_col_offset) >= 1:
            relaxed(False)
        for idx in range(refmv_count, MAX_MV_REF_CANDIDATES):
            if idx < len(stack):
                stack[idx] = gm_mv
            else:
                stack.append(gm_mv)
                weights.append(2)

    # clamp
    bw = n8_w * 4
    bh = n8_h * 4
    to_left = -(mi_col * 4) * 8
    to_right = (grid.cols - n8_w - mi_col) * 4 * 8
    to_top = -(mi_row * 4) * 8
    to_bottom = (grid.rows - n8_h - mi_row) * 4 * 8
    lo_c = to_left - bw * 8 - MV_BORDER
    hi_c = to_right + bw * 8 + MV_BORDER
    lo_r = to_top - bh * 8 - MV_BORDER
    hi_r = to_bottom + bh * 8 + MV_BORDER
    stack = [(int(np.clip(m[0], lo_r, hi_r)), int(np.clip(m[1], lo_c, hi_c))) for m in stack]
    return stack, weights, mode_ctx, refmv_count
