"""Scene change detection (Picture Decision analog, pd_process.c:4526 /
scene_change_detector paths).

The reference compares decimated-luma histogram/SAD statistics of
consecutive pictures against the running average. This detector uses the
same signals on the 1/4-res pyramid: mean-abs-diff of co-located blocks and
luma histogram intersection; either firing strongly marks a scene cut.
Batched (device analog: the decimated SSD surfaces in ops/inter_search).
"""

from __future__ import annotations

import numpy as np

from .me import decimate


def detect_scene_change(prev_y, cur_y, bd: int = 8,
                        mad_thresh: float = 28.0,
                        hist_thresh: float = 0.45) -> bool:
    """True if cur is a scene cut relative to prev.

    mad_thresh: 8-bit-domain mean abs difference on the 1/4 pyramid.
    hist_thresh: minimum histogram intersection to still count as the
    same scene (below it -> cut)."""
    if prev_y is None:
        return False
    prev8 = (np.asarray(prev_y) >> (bd - 8)).astype(np.uint8)
    cur8 = (np.asarray(cur_y) >> (bd - 8)).astype(np.uint8)
    if prev8.shape != cur8.shape:
        return True
    p = decimate(prev8, 2).astype(np.int32)
    c = decimate(cur8, 2).astype(np.int32)
    # motion-compensated MAD: best global shift within +-rad on the 1/4
    # pyramid, so pans are not mistaken for cuts (HME level-0 analog)
    rad = 8
    h, w = c.shape
    if h > 2 * rad + 8 and w > 2 * rad + 8:
        from . import mc_native

        cur_in = c[rad : h - rad, rad : w - rad]
        _, _, sad = mc_native.sad_grid(cur_in, p, 0, 2 * rad + 1, 0, 2 * rad + 1)
        mad = sad / cur_in.size
    else:
        mad = float(np.abs(p - c).mean())
    hp, _ = np.histogram(p, bins=32, range=(0, 256))
    hc, _ = np.histogram(c, bins=32, range=(0, 256))
    n = max(p.size, 1)
    intersection = float(np.minimum(hp, hc).sum()) / n
    return mad > mad_thresh or intersection < hist_thresh
