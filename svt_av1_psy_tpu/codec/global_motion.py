"""Global motion estimation (TRANSLATION).

Behavior reference: global_me.c / global_motion.c (the reference fits full
warp models via FAST corners + RANSAC; the TRANSLATION fallback is a global
shift). Round-1 scope: integer-pel global translation from a two-stage
full-frame search (1/4-res grid + full-res refine), accepted only when it
clearly beats the zero shift. Feeds GLOBALMV and the frame-header
global_motion_params (obu._write_global_motion).
"""

from __future__ import annotations

import numpy as np

from . import mc_native
from .me import decimate


def estimate_global_translation(ref_y: np.ndarray, cur_y: np.ndarray,
                                bd: int = 8, rad_q: int = 16):
    """(row_q3, col_q3) global translation of cur relative to ref (the MV
    points into the reference), or (0, 0) when no clear global shift."""
    ref8 = (np.asarray(ref_y) >> (bd - 8)).astype(np.int32)
    cur8 = (np.asarray(cur_y) >> (bd - 8)).astype(np.int32)
    h, w = cur8.shape
    rq = decimate(ref8.astype(np.uint8), 2).astype(np.int32)
    cq = decimate(cur8.astype(np.uint8), 2).astype(np.int32)
    qh, qw = cq.shape
    # shrink the search radius so a meaningful inner window remains
    rad_q = min(rad_q, (min(qh, qw) - 10) // 2 - 2)
    if rad_q < 2:
        return (0, 0)
    m = rad_q + 2
    inner = cq[m : qh - m, m : qw - m]
    dyq, dxq, _ = mc_native.sad_grid(inner, rq, m - rad_q, m + rad_q + 1,
                                     m - rad_q, m + rad_q + 1)
    dyq, dxq = dyq - m, dxq - m
    # half-res refine around the scaled candidate, then a full-res polish
    # (refining at half resolution first keeps the full-res grid at 3x3)
    rh = decimate(ref8.astype(np.uint8), 1).astype(np.int32)
    ch = decimate(cur8.astype(np.uint8), 1).astype(np.int32)
    hh, hw = ch.shape
    mh = 2 + 2 * max(abs(dyq), abs(dxq))
    if hh <= 2 * mh + 16 or hw <= 2 * mh + 16:
        return (0, 0)
    innh = ch[mh : hh - mh, mh : hw - mh]
    y0h, x0h = mh + dyq * 2 - 2, mh + dxq * 2 - 2
    dyh, dxh, _ = mc_native.sad_grid(innh, rh, y0h, y0h + 5, x0h, x0h + 5)
    dyh, dxh = dyh - mh, dxh - mh
    dy0, dx0 = dyh * 2, dxh * 2
    mm = 1 + max(abs(dy0), abs(dx0))
    if h <= 2 * mm + 16 or w <= 2 * mm + 16:
        return (0, 0)
    innf = cur8[mm : h - mm, mm : w - mm]
    y0, x0 = mm + dy0 - 1, mm + dx0 - 1
    dy, dx, sad = mc_native.sad_grid(innf, ref8, y0, y0 + 3, x0, x0 + 3)
    dy, dx = dy - mm, dx - mm
    if dy == 0 and dx == 0:
        return (0, 0)
    # accept only if clearly better than the zero shift
    zsad = int(np.abs(innf - ref8[mm : h - mm, mm : w - mm]).sum())
    if sad >= zsad * 0.8:
        return (0, 0)
    return (int(dy) * 8, int(dx) * 8)
