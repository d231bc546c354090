"""Open-loop motion estimation: HME pyramid + full-pel grid + subpel refine.

Reference analog: motion_estimation.c (hme_level_0/1/2 :820-1025,
integer_search_b64 :1249, svt_aom_motion_estimation_b64 :3076) and the
subpel refinement in mcomp.c. Batched over all blocks of a frame; the SAD
grids are the device kernels in ops/analysis.py (numpy here, same math).

MVs are in 1/8-pel units (AV1 MV precision), stored (row, col).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .convolve import convolve_2d_sr


def decimate(plane: np.ndarray, times: int) -> np.ndarray:
    """Simple 2x box decimation (PA pyramid analog)."""
    x = plane.astype(np.float32)
    for _ in range(times):
        H, W = x.shape
        x = x[: H & ~1, : W & ~1].reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))
    return np.round(x).astype(plane.dtype)


def _sad_grid(cur: np.ndarray, ref: np.ndarray, cy: int, cx: int, rad: int,
              step: int = 1):
    """SAD of `cur` (h, w) against ref windows centered at (cy+dy, cx+dx),
    dy/dx in [-rad, rad]. Returns (best_dy, best_dx, best_sad)."""
    h, w = cur.shape
    H, W = ref.shape
    best = (0, 0, 1 << 60)
    c64 = cur.astype(np.int32)
    for dy in range(-rad, rad + 1, step):
        y0 = cy + dy
        if y0 < 0 or y0 + h > H:
            continue
        for dx in range(-rad, rad + 1, step):
            x0 = cx + dx
            if x0 < 0 or x0 + w > W:
                continue
            sad = int(np.abs(c64 - ref[y0 : y0 + h, x0 : x0 + w]).sum())
            if sad < best[2]:
                best = (dy, dx, sad)
    return best


@dataclass
class MeResult:
    mv: tuple          # (row, col) in 1/8 pel
    sad: int


class MotionEstimator:
    """Per-frame ME against one reference plane (luma)."""

    def __init__(self, ref_luma: np.ndarray, search_range: int = 64):
        self.ref = ref_luma.astype(np.int32)
        self.ref_q = decimate(ref_luma, 2).astype(np.int32)   # 1/4
        self.range = search_range

    def search_block(self, cur_luma: np.ndarray, x0: int, y0: int, w: int, h: int,
                     subpel: bool = True) -> MeResult:
        cur = cur_luma[y0 : y0 + h, x0 : x0 + w].astype(np.int32)
        # HME on the 1/4 pyramid
        cq = decimate(cur_luma[y0 : y0 + h, x0 : x0 + w], 2).astype(np.int32)
        qy, qx = y0 >> 2, x0 >> 2
        rad_q = max(2, self.range >> 2)
        dy_q, dx_q, _ = _sad_grid(cq, self.ref_q, qy, qx, rad_q)
        # full-pel refine around the scaled HME candidate
        dy, dx, sad = _sad_grid(cur, self.ref, y0 + dy_q * 4, x0 + dx_q * 4, 7)
        fy, fx = dy_q * 4 + dy, dx_q * 4 + dx
        if not subpel:
            return MeResult((fy * 8, fx * 8), sad)
        # subpel refinement: half -> quarter -> eighth diamond around best
        best_mv = (fy * 8, fx * 8)
        best_sad = sad
        for step in (4, 2, 1):
            improved = True
            while improved:
                improved = False
                for dmy, dmx in ((-step, 0), (step, 0), (0, -step), (0, step)):
                    mv = (best_mv[0] + dmy, best_mv[1] + dmx)
                    s = self._subpel_sad(cur, x0, y0, w, h, mv)
                    if s is not None and s < best_sad:
                        best_sad, best_mv = s, mv
                        improved = True
        return MeResult(best_mv, best_sad)

    def _subpel_sad(self, cur, x0, y0, w, h, mv):
        py = y0 + (mv[0] >> 3)
        px = x0 + (mv[1] >> 3)
        sy = (mv[0] & 7) << 1   # 1/8 pel -> q4 units
        sx = (mv[1] & 7) << 1
        if py - 3 < 0 or px - 3 < 0 or py + h + 4 > self.ref.shape[0] or px + w + 4 > self.ref.shape[1]:
            return None
        patch = self.ref[py - 3 : py + h + 4, px - 3 : px + w + 4]
        pred = convolve_2d_sr(patch[None], w, h, sx, sy)[0].astype(np.int32)
        return int(np.abs(cur - pred).sum())
