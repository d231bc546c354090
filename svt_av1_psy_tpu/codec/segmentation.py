"""Segmentation (spec 5.9.14 / 5.11.21): header params, spatial segment-id
prediction, and a variance-class segment assignment (segment-based AQ).

Behavior reference: segmentation_params.c (feature bits/sign tables :16-20),
entropy_coding.c (encode_segmentation :2241, spatial prediction :4633,
neg_interleave :4675, write_segment_id :4712, intra order :4830-4842).
Round-1 scope: SEG_LVL_ALT_Q only (seg_id_pre_skip = 0), map always updated
(primary_ref NONE), no temporal update — matching the reference's supported
subset.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

MAX_SEGMENTS = 8
SEG_LVL_ALT_Q = 0
SEG_LVL_MAX = 8
FEATURE_BITS = (8, 6, 6, 6, 6, 3, 0, 0)
FEATURE_SIGNED = (1, 1, 1, 1, 1, 0, 0, 0)
FEATURE_MAX = (255, 63, 63, 63, 63, 7, 0, 0)


@dataclass
class SegmentationParams:
    enabled: bool = False
    # feature_data[seg][feature]; None = disabled
    feature_data: list = field(default_factory=lambda: [
        [None] * SEG_LVL_MAX for _ in range(MAX_SEGMENTS)])

    @property
    def last_active_seg_id(self) -> int:
        last = 0
        for s in range(MAX_SEGMENTS):
            if any(v is not None for v in self.feature_data[s]):
                last = s
        return last

    def alt_q(self, seg: int) -> int:
        v = self.feature_data[seg][SEG_LVL_ALT_Q]
        return 0 if v is None else int(v)

    def seg_qindex(self, base_q: int, seg: int) -> int:
        return int(np.clip(base_q + self.alt_q(seg), 1, 255))


def neg_interleave(x: int, ref: int, mx: int) -> int:
    """svt_av1_neg_interleave (entropy_coding.c:4675)."""
    diff = x - ref
    if ref == 0:
        return x
    if ref >= mx - 1:
        return -x + mx - 1
    if 2 * ref < mx:
        if abs(diff) <= ref:
            return (diff << 1) - 1 if diff > 0 else (-diff) << 1
        return x
    if abs(diff) < mx - ref:
        return (diff << 1) - 1 if diff > 0 else (-diff) << 1
    return (mx - x) - 1


def spatial_seg_pred(seg_map: np.ndarray, mi_row: int, mi_col: int,
                     tile_mi) -> tuple:
    """(pred, cdf_index) from the 4x4 segment-id map
    (svt_av1_get_spatial_seg_prediction :4633); availability is
    tile-relative."""
    r0, _, c0, _ = tile_mi
    up = mi_row > r0
    left = mi_col > c0
    prev_ul = int(seg_map[mi_row - 1, mi_col - 1]) if (up and left) else -1
    prev_u = int(seg_map[mi_row - 1, mi_col]) if up else -1
    prev_l = int(seg_map[mi_row, mi_col - 1]) if left else -1
    if prev_ul < 0 or prev_u < 0 or prev_l < 0:
        ctx = 0
    elif prev_ul == prev_u == prev_l:
        ctx = 2
    elif prev_ul == prev_u or prev_ul == prev_l or prev_u == prev_l:
        ctx = 1
    else:
        ctx = 0
    if prev_u == -1:
        return (0 if prev_l == -1 else prev_l), ctx
    if prev_l == -1:
        return prev_u, ctx
    return (prev_u if prev_ul == prev_u else prev_l), ctx


def assign_segments_by_variance(variances_sb: np.ndarray,
                                n_segments: int = 3,
                                step_q: int = 10):
    """Variance-class AQ: quiet SBs get finer q, busy SBs coarser
    (segmentation analog of aq-mode 1). Returns (params, sb_seg_map)."""
    rows, cols, _ = variances_sb.shape
    med = np.median(variances_sb, axis=2).astype(np.float64)
    lo, hi = np.percentile(med, 25), np.percentile(med, 75)
    seg_map = np.ones((rows, cols), np.uint8)      # 1 = neutral
    seg_map[med <= lo] = 0                          # quiet -> boost
    seg_map[med >= hi] = 2                          # busy -> coarsen
    params = SegmentationParams(enabled=True)
    params.feature_data[0][SEG_LVL_ALT_Q] = -step_q
    params.feature_data[1][SEG_LVL_ALT_Q] = 0
    params.feature_data[2][SEG_LVL_ALT_Q] = step_q
    return params, seg_map
