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


def estimate_global_rotzoom(ref_y: np.ndarray, cur_y: np.ndarray,
                            bd: int = 8, base_mv=(0, 0)):
    """ROTZOOM global model fit (global_me.c analog, re-designed): a coarse
    block motion field (full-pel block searches around the translation
    seed) is fit by least squares to x' = s*x + b*y + tx, y' = -b*x + s*y
    + ty with one outlier-trim pass; the params are quantized to the GM
    header precision (decoder-exact). Returns wmmat[6] or None."""
    from .warp import WARPEDMODEL_PREC_BITS, get_shear_params

    ref8 = (np.asarray(ref_y) >> (bd - 8)).astype(np.int32)
    cur8 = (np.asarray(cur_y) >> (bd - 8)).astype(np.int32)
    h, w = cur8.shape
    B = 16
    margin = 48
    if h < 2 * margin + 2 * B or w < 2 * margin + 2 * B:
        return None
    # block grid (centered), ~8x8 blocks of 16x16
    ys = np.linspace(margin, h - margin - B, 8).astype(int)
    xs = np.linspace(margin, w - margin - B, 8).astype(int)
    b0r, b0c = int(round(base_mv[0] / 8)), int(round(base_mv[1] / 8))
    pts, vecs = [], []
    for by in ys:
        for bx in xs:
            blk = cur8[by : by + B, bx : bx + B]
            if blk.std() < 2.0:      # textureless: no reliable motion
                continue
            dy, dx, sad = _sad_grid_block(blk, ref8, by + b0r, bx + b0c, 12)
            if sad is None:
                continue
            pts.append((bx + B / 2 - 0.5, by + B / 2 - 0.5))
            vecs.append((dx + b0c, dy + b0r))
    if len(pts) < 8:
        return None
    pts = np.array(pts, np.float64)
    vecs = np.array(vecs, np.float64)

    def fit(p, v):
        # unknowns: [s, b, tx, ty]; x' - x = (s-1)x + b*y + tx etc.
        n = p.shape[0]
        A = np.zeros((2 * n, 4))
        rhs = np.zeros(2 * n)
        A[0::2, 0] = p[:, 0]
        A[0::2, 1] = p[:, 1]
        A[0::2, 2] = 1.0
        rhs[0::2] = v[:, 0] + p[:, 0]
        A[1::2, 0] = p[:, 1]
        A[1::2, 1] = -p[:, 0]
        A[1::2, 3] = 1.0
        rhs[1::2] = v[:, 1] + p[:, 1]
        sol, *_ = np.linalg.lstsq(A, rhs, rcond=None)
        return sol

    sol = fit(pts, vecs)
    # trim the worst-fitting third and refit (RANSAC-lite)
    pred_x = sol[0] * pts[:, 0] + sol[1] * pts[:, 1] + sol[2]
    pred_y = -sol[1] * pts[:, 0] + sol[0] * pts[:, 1] + sol[3]
    err = np.hypot(pred_x - (pts[:, 0] + vecs[:, 0]),
                   pred_y - (pts[:, 1] + vecs[:, 1]))
    keep = err <= max(np.percentile(err, 66), 1.0)
    if keep.sum() >= 8:
        sol = fit(pts[keep], vecs[keep])
        pred_x = sol[0] * pts[:, 0] + sol[1] * pts[:, 1] + sol[2]
        pred_y = -sol[1] * pts[:, 0] + sol[0] * pts[:, 1] + sol[3]
        err = np.hypot(pred_x - (pts[:, 0] + vecs[:, 0]),
                       pred_y - (pts[:, 1] + vecs[:, 1]))
    # accept only when the rotzoom model clearly beats pure translation
    tmed = np.median(vecs, axis=0)
    err_t = np.hypot(vecs[:, 0] - tmed[0], vecs[:, 1] - tmed[1])
    if not (np.median(err_t) > 0.75
            and np.median(err) < 0.7 * np.median(err_t)):
        return None
    s, b, tx, ty = sol
    # quantize to header precision: alpha-class params to 1/2^15 (coded
    # value << GM_ALPHA_PREC_DIFF), translations to 1/2^6 px (<< 10)
    one = 1 << WARPEDMODEL_PREC_BITS
    mat2 = int(np.clip(round(s * (1 << 15)), (1 << 15) - (1 << 12) + 1,
                       (1 << 15) + (1 << 12) - 1)) << 1
    mat3 = int(np.clip(round(b * (1 << 15)), -(1 << 12) + 1,
                       (1 << 12) - 1)) << 1
    mat0 = int(np.clip(round(tx * (1 << 6)), -(1 << 12) + 1,
                       (1 << 12) - 1)) << 10
    mat1 = int(np.clip(round(ty * (1 << 6)), -(1 << 12) + 1,
                       (1 << 12) - 1)) << 10
    wmmat = [mat0, mat1, mat2, mat3, -mat3, mat2]
    if mat2 == one and mat3 == 0:
        return None          # degenerated to translation
    if get_shear_params(wmmat) is None:
        return None
    return wmmat


def _sad_grid_block(blk: np.ndarray, ref: np.ndarray, cy: int, cx: int,
                    rad: int):
    """Best (dy, dx, sad) of blk against ref windows around (cy, cx)."""
    B = blk.shape[0]
    y0, x0 = cy - rad, cx - rad
    if (y0 < 0 or x0 < 0 or cy + rad + B > ref.shape[0]
            or cx + rad + B > ref.shape[1]):
        return None, None, None
    dy, dx, sad = mc_native.sad_grid(blk, ref, y0, cy + rad + 1,
                                     x0, cx + rad + 1)
    return dy - cy, dx - cx, sad
