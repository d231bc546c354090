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
# compound modes (NEAREST_NEARESTMV .. NEW_NEWMV; spec PredictionMode order)
NEAREST_NEARESTMV, NEAR_NEARMV = 17, 18
NEAREST_NEWMV, NEW_NEARESTMV, NEAR_NEWMV, NEW_NEARMV = 19, 20, 21, 22
GLOBAL_GLOBALMV, NEW_NEWMV = 23, 24
NEWMV_MODES = frozenset((NEWMV, NEAREST_NEWMV, NEW_NEARESTMV, NEAR_NEWMV,
                         NEW_NEARMV, NEW_NEWMV))
GLOBAL_MODES = frozenset((GLOBALMV, GLOBAL_GLOBALMV))

INTRA_FRAME = 0
LAST_FRAME = 1
LAST2_FRAME = 2
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
    ref_frame2: np.ndarray = None  # int8, 0 = single-ref block
    mv2_row: np.ndarray = None
    mv2_col: np.ndarray = None
    mode: np.ndarray = None        # uint8 PredictionMode/inter mode
    bw4: np.ndarray = None         # block width in mi units at this mi
    bh4: np.ndarray = None

    def __post_init__(self):
        shape = (self.rows, self.cols)
        self.ref_frame = np.zeros(shape, np.int8)
        self.mv_row = np.zeros(shape, np.int16)
        self.mv_col = np.zeros(shape, np.int16)
        self.ref_frame2 = np.zeros(shape, np.int8)
        self.mv2_row = np.zeros(shape, np.int16)
        self.mv2_col = np.zeros(shape, np.int16)
        self.mode = np.zeros(shape, np.uint8)
        self.bw4 = np.ones(shape, np.uint8)
        self.bh4 = np.ones(shape, np.uint8)
        # comp_group_idx of coded compound blocks (masked-compound ctx)
        self.comp_group = np.zeros(shape, np.uint8)
        # interp filter of coded inter blocks (switchable-filter ctx);
        # 3 = none/SWITCHABLE sentinel
        self.filt = np.full(shape, 3, np.uint8)

    def set_block(self, mi_row, mi_col, bw4, bh4, ref_frame, mv, mode,
                  ref_frame2=0, mv2=(0, 0)):
        r1 = min(mi_row + bh4, self.rows)
        c1 = min(mi_col + bw4, self.cols)
        self.ref_frame[mi_row:r1, mi_col:c1] = ref_frame
        self.mv_row[mi_row:r1, mi_col:c1] = mv[0]
        self.mv_col[mi_row:r1, mi_col:c1] = mv[1]
        self.ref_frame2[mi_row:r1, mi_col:c1] = ref_frame2
        self.mv2_row[mi_row:r1, mi_col:c1] = mv2[0]
        self.mv2_col[mi_row:r1, mi_col:c1] = mv2[1]
        self.mode[mi_row:r1, mi_col:c1] = mode
        self.bw4[mi_row:r1, mi_col:c1] = bw4
        self.bh4[mi_row:r1, mi_col:c1] = bh4


def _has_top_right(sb_mi: int, mi_row, mi_col, n8_w, n8_h, mi_rows, mi_cols, tile) -> bool:
    bs = max(n8_w, n8_h)
    if bs > 16:  # mi_size_wide[BLOCK_64X64]
        return False
    # two-rect rules (has_top_right, adaptive_mv_pred.c:270-281): the
    # bottom of a HORZ pair never has a top-right; the left of a VERT
    # pair always does (is_sec_rect, adaptive_mv_pred.c:1030-1041)
    if n8_w > n8_h and (mi_row & (n8_w - 1)):
        return False
    if n8_w < n8_h and ((mi_col + n8_w) & (n8_h - 1)) != 0:
        return True
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
    """Single-ref candidate add (add_ref_mv_candidate single branch,
    adaptive_mv_pred.c): scan BOTH references of the neighbor."""
    if grid.ref_frame[r, c] == INTRA_FRAME and grid.mode[r, c] < NEARESTMV:
        return
    md = int(grid.mode[r, c])
    for rf, mr, mc in ((int(grid.ref_frame[r, c]), int(grid.mv_row[r, c]),
                        int(grid.mv_col[r, c])),
                       (int(grid.ref_frame2[r, c]), int(grid.mv2_row[r, c]),
                        int(grid.mv2_col[r, c]))):
        if rf != ref_frame:
            continue
        mv = gm_mv if md in GLOBAL_MODES else (mr, mc)
        for i, s in enumerate(ctx.stack):
            if s == mv:
                ctx.weights[i] += weight * length
                break
        else:
            if ctx.count < MAX_REF_MV_STACK_SIZE:
                ctx.stack.append(mv)
                ctx.weights.append(weight * length)
                ctx.count += 1
        if count_matches and md in NEWMV_MODES:
            ctx.newmv_count += 1


def _temporal_scan(tpl, mi_row, mi_col, n8_w, n8_h, tile, gm, rf, add_cand):
    """Temporal MV-stack scan (spec 7.10.2.5; add_tpl_ref_mv,
    adaptive_mv_pred.c:337): sample the projected motion field at the
    block's 8x8 positions (+3 extension samples inside the 64x64), rescale
    each hit by cur/ref frame distance, and dedupe into the stack via
    add_cand(mr, mc, m2r, m2c).  Returns the ZeroMvContext bit: set when
    the co-located sample is missing or >= 2px from the global MV."""
    from .mfmv import lower_mv_precision, mv_projection

    t_r0, t_r1, t_c0, t_c1 = tile
    row_arr, col_arr, off_arr = tpl["row"], tpl["col"], tpl["off"]
    cur0 = int(tpl["cur_off"][rf[0]])
    cur1 = int(tpl["cur_off"][rf[1]]) if rf[1] else 0
    allow_hp = bool(tpl["allow_hp"])
    force_int = bool(tpl.get("force_int", False))
    zero_bit = False

    def sample(blk_row, blk_col):
        nonlocal zero_bit
        pr = blk_row if (mi_row & 1) else blk_row + 1
        pc = blk_col if (mi_col & 1) else blk_col + 1
        r, c = mi_row + pr, mi_col + pc
        if r < t_r0 or r >= t_r1 or c < t_c0 or c >= t_c1:
            return 0
        off = int(off_arr[r >> 1, c >> 1])
        if off == 0:                       # INVALID_MV sentinel
            return 0
        fr = int(row_arr[r >> 1, c >> 1])
        fc = int(col_arr[r >> 1, c >> 1])
        mr, mc = mv_projection(fr, fc, cur0, off)
        mr, mc = lower_mv_precision(int(mr), int(mc), allow_hp, force_int)
        at00 = blk_row == 0 and blk_col == 0
        if rf[1]:
            m2r, m2c = mv_projection(fr, fc, cur1, off)
            m2r, m2c = lower_mv_precision(int(m2r), int(m2c), allow_hp,
                                          force_int)
            if at00 and (abs(mr - gm[0][0]) >= 16 or abs(mc - gm[0][1]) >= 16
                         or abs(m2r - gm[1][0]) >= 16
                         or abs(m2c - gm[1][1]) >= 16):
                zero_bit = True
            add_cand(mr, mc, m2r, m2c)
        else:
            if at00 and (abs(mr - gm[0][0]) >= 16
                         or abs(mc - gm[0][1]) >= 16):
                zero_bit = True
            add_cand(mr, mc, 0, 0)
        return 1

    step_h = 4 if n8_h >= 16 else 2
    step_w = 4 if n8_w >= 16 else 2
    avail = 0
    for br in range(0, min(n8_h, 16), step_h):
        for bc in range(0, min(n8_w, 16), step_w):
            ret = sample(br, bc)
            if br == 0 and bc == 0:
                avail = ret
    if not avail:
        zero_bit = True
    if 2 <= n8_h < 16 and 2 <= n8_w < 16:     # allow_extension
        voff = max(2, n8_h)
        hoff = max(2, n8_w)
        mrow, mcol = mi_row & 15, mi_col & 15  # check_sb_border (64x64)
        for br, bc in ((voff, -2), (voff, hoff), (voff - 2, hoff)):
            if 0 <= mrow + br < 16 and 0 <= mcol + bc < 16:
                sample(br, bc)
    return zero_bit


def setup_ref_mv_list(grid: MiGrid, mi_row, mi_col, n8_w, n8_h, ref_frame,
                      tile, sb_mi=16, gm_mv=(0, 0), sign_bias=None,
                      tpl=None):
    """Returns (stack [(mvrow, mvcol)...], mode_context, refmv_count).

    tile: (mi_row_start, mi_row_end, mi_col_start, mi_col_end).
    sign_bias: per-ref RefFrameSignBias (8,) when order hints are enabled
    (spec 7.10.2.10: extension-scan candidates with a different-signed
    reference enter negated); None = all zero (order hints off)."""
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
            if ref_frame in (grid.ref_frame[r, c], grid.ref_frame2[r, c]):
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
            if ref_frame in (grid.ref_frame[r, c], grid.ref_frame2[r, c]):
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
        found = ref_frame in (grid.ref_frame[r, c], grid.ref_frame2[r, c])
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

    # temporal candidates (use_ref_frame_mvs): projected MFMV samples enter
    # here, between the +REF_CAT_LEVEL bump and the outer spatial scans
    if tpl is not None:
        def _add_t(mr, mc, _m2r, _m2c):
            mv = (mr, mc)
            for i, s in enumerate(ctx.stack):
                if s == mv:
                    ctx.weights[i] += 2
                    return
            if ctx.count < MAX_REF_MV_STACK_SIZE:
                ctx.stack.append(mv)
                ctx.weights.append(2)
                ctx.count += 1

        if _temporal_scan(tpl, mi_row, mi_col, n8_w, n8_h, tile,
                          (gm_mv, (0, 0)), (ref_frame, 0), _add_t):
            mode_ctx |= 1 << GLOBALMV_OFFSET

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
                # prediction, ANY inter candidate's MVs (both references)
                # may enter the extension scan (no ref-frame match needed)
                for rf, mr, mc in ((int(grid.ref_frame[r, c]),
                                    int(grid.mv_row[r, c]),
                                    int(grid.mv_col[r, c])),
                                   (int(grid.ref_frame2[r, c]),
                                    int(grid.mv2_row[r, c]),
                                    int(grid.mv2_col[r, c]))):
                    if rf <= INTRA_FRAME or refmv_count >= MAX_MV_REF_CANDIDATES:
                        continue
                    if (sign_bias is not None
                            and sign_bias[rf] != sign_bias[ref_frame]):
                        mr, mc = -mr, -mc
                    mv = (mr, mc)
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


# ---------------------------------------------------------------- compound
class _CCtx:
    __slots__ = ("mv0", "mv1", "weights", "count", "newmv_count",
                 "row_match", "col_match")

    def __init__(self):
        self.mv0, self.mv1, self.weights = [], [], []
        self.count = self.newmv_count = self.row_match = self.col_match = 0


def _add_comp_candidate(ctx: _CCtx, grid: MiGrid, r, c, rf, gm, length,
                        weight):
    """Compound candidate add (add_ref_mv_candidate compound branch): the
    neighbor's reference PAIR must equal ours."""
    if grid.ref_frame[r, c] == INTRA_FRAME and grid.mode[r, c] < NEARESTMV:
        return
    if (int(grid.ref_frame[r, c]) != rf[0]
            or int(grid.ref_frame2[r, c]) != rf[1]):
        return
    md = int(grid.mode[r, c])
    if md in GLOBAL_MODES:
        m0, m1 = gm[0], gm[1]
    else:
        m0 = (int(grid.mv_row[r, c]), int(grid.mv_col[r, c]))
        m1 = (int(grid.mv2_row[r, c]), int(grid.mv2_col[r, c]))
    for i in range(ctx.count):
        if ctx.mv0[i] == m0 and ctx.mv1[i] == m1:
            ctx.weights[i] += weight * length
            break
    else:
        if ctx.count < MAX_REF_MV_STACK_SIZE:
            ctx.mv0.append(m0)
            ctx.mv1.append(m1)
            ctx.weights.append(weight * length)
            ctx.count += 1
    if md in NEWMV_MODES:
        ctx.newmv_count += 1


def setup_comp_mv_list(grid: MiGrid, mi_row, mi_col, n8_w, n8_h, rf,
                       tile, sb_mi=16, gm=((0, 0), (0, 0)),
                       sign_bias=None, tpl=None):
    """Reference-MV stack for a compound pair rf = (ref0, ref1)
    (setup_ref_mv_list compound path + scan_row_col_light,
    adaptive_mv_pred.c:470-570). Returns (stack0, stack1, weights,
    mode_context_raw, refmv_count); apply mode_context_analyzer for the
    compound-mode cdf index."""
    t_r0, t_r1, t_c0, t_c1 = tile
    ctx = _CCtx()
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
        max_row_offset = int(np.clip(max_row_offset, t_r0 - mi_row,
                                     t_r1 - mi_row - 1))
    if left_available:
        max_col_offset = -(MVREF_COLS << 1) + col_adj
        if n8_w < 2:
            max_col_offset = -(2 << 1) + col_adj
        max_col_offset = int(np.clip(max_col_offset, t_c0 - mi_col,
                                     t_c1 - mi_col - 1))
    processed_rows = 0
    processed_cols = 0

    def scan_row(row_offset):
        nonlocal processed_rows
        end_mi = min(n8_w, grid.cols - mi_col, 16)
        col_off = 1 if abs(row_offset) > 1 else 0
        if col_off and (mi_col & 1) and n8_w < 2:
            col_off -= 1
        use_step_16 = n8_w >= 16
        i = 0
        found = 0
        while i < end_mi:
            r, c = mi_row + row_offset, mi_col + col_off + i
            if c >= grid.cols:
                break
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
            if (int(grid.ref_frame[r, c]) == rf[0]
                    and int(grid.ref_frame2[r, c]) == rf[1]):
                found = 1
            _add_comp_candidate(ctx, grid, r, c, rf, gm, length, weight)
            i += length
        if found:
            ctx.row_match += 1

    def scan_col(col_offset):
        nonlocal processed_cols
        end_mi = min(n8_h, grid.rows - mi_row, 16)
        row_off = 1 if abs(col_offset) > 1 else 0
        if row_off and (mi_row & 1) and n8_h < 2:
            row_off -= 1
        use_step_16 = n8_h >= 16
        i = 0
        found = 0
        while i < end_mi:
            r, c = mi_row + row_off + i, mi_col + col_offset
            if r >= grid.rows:
                break
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
            if (int(grid.ref_frame[r, c]) == rf[0]
                    and int(grid.ref_frame2[r, c]) == rf[1]):
                found = 1
            _add_comp_candidate(ctx, grid, r, c, rf, gm, length, weight)
            i += length
        if found:
            ctx.col_match += 1

    def scan_blk(ro, co):
        r, c = mi_row + ro, mi_col + co
        if r < t_r0 or c < t_c0 or r >= t_r1 or c >= t_c1:
            return
        found = (int(grid.ref_frame[r, c]) == rf[0]
                 and int(grid.ref_frame2[r, c]) == rf[1])
        _add_comp_candidate(ctx, grid, r, c, rf, gm, 2, 2)
        if found:
            ctx.row_match += 1

    if abs(max_row_offset) >= 1:
        scan_row(-1)
    if abs(max_col_offset) >= 1:
        scan_col(-1)
    if _has_top_right(sb_mi, mi_row, mi_col, n8_w, n8_h, grid.rows,
                      grid.cols, tile):
        scan_blk(-1, n8_w)

    nearest_match = (ctx.row_match > 0) + (ctx.col_match > 0)
    nearest_newmv_count = ctx.newmv_count
    for i in range(ctx.count):
        ctx.weights[i] += REF_CAT_LEVEL

    mode_ctx = 0
    # temporal candidates (use_ref_frame_mvs), compound branch: both
    # projected MVs must match an existing pair to merge
    if tpl is not None:
        def _add_t(mr, mc, m2r, m2c):
            for i in range(ctx.count):
                if ctx.mv0[i] == (mr, mc) and ctx.mv1[i] == (m2r, m2c):
                    ctx.weights[i] += 2
                    return
            if ctx.count < MAX_REF_MV_STACK_SIZE:
                ctx.mv0.append((mr, mc))
                ctx.mv1.append((m2r, m2c))
                ctx.weights.append(2)
                ctx.count += 1

        if _temporal_scan(tpl, mi_row, mi_col, n8_w, n8_h, tile, gm,
                          rf, _add_t):
            mode_ctx |= 1 << GLOBALMV_OFFSET

    scan_blk(-1, -1)
    for idx in range(2, MVREF_ROWS + 1):
        row_offset = -(idx << 1) + 1 + row_adj
        col_offset = -(idx << 1) + 1 + col_adj
        if (abs(row_offset) <= abs(max_row_offset)
                and abs(row_offset) > processed_rows):
            scan_row(row_offset)
        if (abs(col_offset) <= abs(max_col_offset)
                and abs(col_offset) > processed_cols):
            scan_col(col_offset)
    ctx.newmv_count = nearest_newmv_count

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

    order = sorted(range(ctx.count), key=lambda i: -ctx.weights[i])
    stack0 = [ctx.mv0[i] for i in order]
    stack1 = [ctx.mv1[i] for i in order]
    weights = [ctx.weights[i] for i in order]

    refmv_count = ctx.count
    if refmv_count < MAX_MV_REF_CANDIDATES:
        # scan_row_col_light compound branch: exact-ref and any-inter MVs
        # collected per pair side, combined, gm-padded
        mi_width = min(min(16, n8_w), grid.cols - mi_col)
        mi_height = min(min(16, n8_h), grid.rows - mi_row)
        mi_size = min(mi_width, mi_height)
        ref_id = ([], [])
        ref_diff = ([], [])

        def collect(r, c):
            for can_rf, mr, mc in (
                    (int(grid.ref_frame[r, c]), int(grid.mv_row[r, c]),
                     int(grid.mv_col[r, c])),
                    (int(grid.ref_frame2[r, c]), int(grid.mv2_row[r, c]),
                     int(grid.mv2_col[r, c]))):
                for side in range(2):
                    if can_rf == rf[side] and len(ref_id[side]) < 2:
                        ref_id[side].append((mr, mc))
                    elif can_rf > INTRA_FRAME and len(ref_diff[side]) < 2:
                        # spec 7.10.2.13 add_extra: different-signed refs
                        # enter negated (no-op with order hints off)
                        if (sign_bias is not None and
                                sign_bias[can_rf] != sign_bias[rf[side]]):
                            ref_diff[side].append((-mr, -mc))
                        else:
                            ref_diff[side].append((mr, mc))

        if abs(max_row_offset) >= 1:
            i = 0
            while i < mi_size:
                r, c = mi_row - 1, mi_col + i
                collect(r, c)
                i += int(grid.bw4[r, c])
        if abs(max_col_offset) >= 1:
            i = 0
            while i < mi_size:
                r, c = mi_row + i, mi_col - 1
                collect(r, c)
                i += int(grid.bh4[r, c])

        comp_list = [[None, None] for _ in range(MAX_MV_REF_CANDIDATES + 1)]
        for side in range(2):
            k = 0
            for mv in ref_id[side]:
                if k >= MAX_MV_REF_CANDIDATES:
                    break
                comp_list[k][side] = mv
                k += 1
            for mv in ref_diff[side]:
                if k >= MAX_MV_REF_CANDIDATES:
                    break
                comp_list[k][side] = mv
                k += 1
            while k < MAX_MV_REF_CANDIDATES:
                comp_list[k][side] = gm[side]
                k += 1

        if refmv_count:   # == 1
            if (comp_list[0][0] == stack0[0] and comp_list[0][1] == stack1[0]):
                pick = comp_list[1]
            else:
                pick = comp_list[0]
            stack0.append(pick[0])
            stack1.append(pick[1])
            weights.append(2)
            refmv_count += 1
        else:
            for k in range(MAX_MV_REF_CANDIDATES):
                stack0.append(comp_list[k][0])
                stack1.append(comp_list[k][1])
                weights.append(2)
                refmv_count += 1

    # clamp both sides
    bw = n8_w * 4
    bh = n8_h * 4
    lo_c = -(mi_col * 4) * 8 - bw * 8 - MV_BORDER
    hi_c = (grid.cols - n8_w - mi_col) * 4 * 8 + bw * 8 + MV_BORDER
    lo_r = -(mi_row * 4) * 8 - bh * 8 - MV_BORDER
    hi_r = (grid.rows - n8_h - mi_row) * 4 * 8 + bh * 8 + MV_BORDER

    def clamp(s):
        return [(int(np.clip(m[0], lo_r, hi_r)),
                 int(np.clip(m[1], lo_c, hi_c))) for m in s]

    return clamp(stack0), clamp(stack1), weights, mode_ctx, refmv_count


def mode_context_analyzer(mode_context: int, is_compound: bool) -> int:
    """svt_aom_mode_context_analyzer (inter_prediction.c:2430): fold the
    single-ref new/ref mv context pair into the compound-mode cdf index."""
    if not is_compound:
        return mode_context
    _MAP = ((0, 1, 1, 1, 1), (1, 2, 3, 4, 4), (4, 4, 5, 6, 7))
    newmv_ctx = mode_context & ((1 << GLOBALMV_OFFSET) - 1)
    refmv_ctx = (mode_context >> REFMV_OFFSET) & ((1 << (8 - REFMV_OFFSET)) - 1)
    return _MAP[refmv_ctx >> 1][min(newmv_ctx, 4)]
