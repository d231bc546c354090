"""Open-loop motion estimation: HME pyramid + full-pel grid + subpel refine.

Reference analog: motion_estimation.c (hme_level_0/1/2 :820-1025,
integer_search_b64 :1249, svt_aom_motion_estimation_b64 :3076) and the
subpel refinement in mcomp.c. Batched over all blocks of a frame; the SAD
grids run on device in ops/inter_search (_hme/_child_grids; numpy here,
same math).

MVs are in 1/8-pel units (AV1 MV precision), stored (row, col).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import mc_native


def decimate(plane: np.ndarray, times: int) -> np.ndarray:
    """Simple 2x box decimation (PA pyramid analog). Integer throughout:
    (a + b + c + d + 2) >> 2 per 2x2 box (round-half-up)."""
    x = plane.astype(np.uint32)
    for _ in range(times):
        H, W = x.shape
        x = x[: H & ~1, : W & ~1]
        s = x[0::2, 0::2] + x[0::2, 1::2] + x[1::2, 0::2] + x[1::2, 1::2]
        x = (s + 2) >> 2
    return x.astype(plane.dtype)


def _sad_grid(cur: np.ndarray, ref: np.ndarray, cy: int, cx: int, rad: int,
              step: int = 1):
    """SAD of `cur` (h, w) against ref windows centered at (cy+dy, cx+dx),
    dy/dx in [-rad, rad]. C kernel with early-exit rows (the device analog
    is ops/inter_search._hme's decimated SSD surface). Returns
    (best_dy, best_dx, best_sad)."""
    h, w = cur.shape
    H, W = ref.shape
    y0 = max(cy - rad, 0)
    y1 = min(cy + rad + h, H) - h + 1
    x0 = max(cx - rad, 0)
    x1 = min(cx + rad + w, W) - w + 1
    if y1 <= y0 or x1 <= x0:
        return (0, 0, 1 << 60)
    dy, dx, sad = mc_native.sad_grid(cur, ref, y0, y1, x0, x1, step)
    return (dy - cy, dx - cx, sad)


@dataclass
class MeResult:
    mv: tuple          # (row, col) in 1/8 pel
    sad: int


class MotionEstimator:
    """Per-frame ME against one reference plane (luma)."""

    def __init__(self, ref_luma: np.ndarray, search_range: int = 64):
        self.ref = np.ascontiguousarray(ref_luma, np.int32)
        self.ref_q = np.ascontiguousarray(decimate(ref_luma, 2), np.int32)  # 1/4
        self.range = search_range
        self._cur_id = None
        self._cur_q = None
        from .spec_tables import get_tables
        self._filters = np.ascontiguousarray(
            get_tables()._raw["interp_sub_pel_filters_8"], np.int32)

    def _cur_pyramid(self, cur_luma: np.ndarray) -> np.ndarray:
        """1/4-res decimation of the current frame, computed once per frame."""
        if self._cur_id != id(cur_luma):
            self._cur_q = np.ascontiguousarray(decimate(cur_luma, 2), np.int32)
            self._cur_id = id(cur_luma)
        return self._cur_q

    def search_block(self, cur_luma: np.ndarray, x0: int, y0: int, w: int, h: int,
                     subpel: bool = True) -> MeResult:
        cur = np.ascontiguousarray(cur_luma[y0 : y0 + h, x0 : x0 + w], np.int32)
        curq = self._cur_pyramid(cur_luma)
        qy, qx = y0 >> 2, x0 >> 2
        cq = np.ascontiguousarray(curq[qy : qy + (h >> 2), qx : qx + (w >> 2)])
        if w > 4 and h > 4:
            r = mc_native.search_block(cur, self.ref, cq, self.ref_q, x0, y0,
                                       self.range, self._filters, subpel=subpel)
            if r is not None:
                return MeResult((r[0], r[1]), r[2])
        # numpy fallback: HME on the 1/4 pyramid
        rad_q = max(2, self.range >> 2)
        dy_q, dx_q, _ = _sad_grid(cq, self.ref_q, qy, qx, rad_q)
        # full-pel refine around the scaled HME candidate
        dy, dx, sad = _sad_grid(cur, self.ref, y0 + dy_q * 4, x0 + dx_q * 4, 7)
        fy, fx = dy_q * 4 + dy, dx_q * 4 + dx
        if not subpel:
            return MeResult((fy * 8, fx * 8), sad)
        # subpel refinement: one diamond pass per precision (half/quarter/eighth)
        best_mv = (fy * 8, fx * 8)
        best_sad = sad
        if best_sad > (w * h) // 2:  # skip refinement for near-perfect matches
            for step in (4, 2, 1):
                for _ in range(2):  # two descent iterations per precision
                    base = best_mv
                    for dmy, dmx in ((-step, 0), (step, 0), (0, -step), (0, step)):
                        mv = (base[0] + dmy, base[1] + dmx)
                        s = self._subpel_sad(cur, x0, y0, w, h, mv)
                        if s is not None and s < best_sad:
                            best_sad, best_mv = s, mv
                    if best_mv == base:
                        break
        return MeResult(best_mv, best_sad)

    def _subpel_sad(self, cur, x0, y0, w, h, mv):
        py = y0 + (mv[0] >> 3)
        px = x0 + (mv[1] >> 3)
        sy = (mv[0] & 7) << 1   # 1/8 pel -> q4 units
        sx = (mv[1] & 7) << 1
        if py - 3 < 0 or px - 3 < 0 or py + h + 4 > self.ref.shape[0] or px + w + 4 > self.ref.shape[1]:
            return None
        patch = self.ref[py - 3 : py + h + 4, px - 3 : px + w + 4]
        return mc_native.subpel_sad(patch, cur, w, h, sx, sy)
