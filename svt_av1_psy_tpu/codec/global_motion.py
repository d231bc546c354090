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
    # full-res refine around the scaled candidate
    dy0, dx0 = dyq * 4, dxq * 4
    mm = 3 + max(abs(dy0), abs(dx0))
    if h <= 2 * mm + 16 or w <= 2 * mm + 16:
        return (0, 0)
    innf = cur8[mm : h - mm, mm : w - mm]
    y0, x0 = mm + dy0 - 3, mm + dx0 - 3
    dy, dx, sad = mc_native.sad_grid(innf, ref8, y0, y0 + 7, x0, x0 + 7)
    dy, dx = dy - mm, dx - mm
    if dy == 0 and dx == 0:
        return (0, 0)
    # accept only if clearly better than the zero shift
    zsad = int(np.abs(innf - ref8[mm : h - mm, mm : w - mm]).sum())
    if sad >= zsad * 0.8:
        return (0, 0)
    return (int(dy) * 8, int(dx) * 8)
