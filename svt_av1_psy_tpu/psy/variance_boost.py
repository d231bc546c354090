"""Variance boost: per-superblock qindex lowering for low-variance areas.

Port of av1_get_deltaq_sb_variance_boost + svt_variance_adjust_qp
(rc_process.c:1394-1620) and the PA 8x8 variance statistics
(pic_analysis_process.c:1109). Math follows the reference exactly;
the variance statistic is computed batched (device-offloadable).
"""

from __future__ import annotations

import math

import numpy as np

from ..codec.quant import ac_quant_qtx

VAR_BOOST_MAX_DELTAQ_RANGE = 80
VAR_BOOST_MAX_QSTEP_RATIO_BOOST = 8
_STRENGTHS = (0, 0.65, 1.1, 1.6, 2.5)


def sb_variances_8x8(luma: np.ndarray, sb_size: int = 64) -> np.ndarray:
    """(H, W) luma -> (n_sb_rows, n_sb_cols, 64) uint16 8x8 variances.

    Input must be padded to sb multiples (replicated edges, like PA's padded
    picture)."""
    H, W = luma.shape
    assert H % sb_size == 0 and W % sb_size == 0
    x = luma.astype(np.int64)
    s = x.reshape(H // 8, 8, W // 8, 8).sum(axis=(1, 3))
    s2 = (x * x).reshape(H // 8, 8, W // 8, 8).sum(axis=(1, 3))
    var = (64 * s2 - s * s) // 4096
    n = sb_size // 8
    v = var.reshape(H // sb_size, n, W // sb_size, n).transpose(0, 2, 1, 3)
    return v.reshape(H // sb_size, W // sb_size, n * n).astype(np.uint16)


_Q_FP8_CACHE: dict = {}


def _q_fp8_table(bd: int) -> np.ndarray:
    tab = _Q_FP8_CACHE.get(bd)
    if tab is None:
        shift = {8: 6, 10: 4, 12: 3}[bd]
        tab = np.array([ac_quant_qtx(i, 0, bd) << shift for i in range(256)], np.int64)
        _Q_FP8_CACHE[bd] = tab
    return tab


def _convert_qindex_to_q_fp8(qindex: int, bd: int) -> int:
    return int(_q_fp8_table(bd)[qindex])


def _first_q_index_at_least(q_fp8: int, bd: int) -> int:
    # reference loops i in [1, 254] and keeps the last i if never reached
    tab = _q_fp8_table(bd)
    i = int(np.searchsorted(tab[1:255], q_fp8)) + 1
    return min(i, 254)


def _compute_qdelta_fp(qstart_fp8: int, qtarget_fp8: int, bd: int) -> int:
    return (_first_q_index_at_least(qtarget_fp8, bd)
            - _first_q_index_at_least(qstart_fp8, bd))


def deltaq_sb_variance_boost(base_q_idx: int, variances: np.ndarray, strength: int,
                             bd: int = 8, octile: int = 6, curve: int = 0) -> int:
    """Boost (qindex decrease) for one SB given its 64 8x8 variances."""
    ordered = np.sort(variances.astype(np.int64))
    mid = octile * 8 - 1
    low = max(7, mid - 8)
    upp = min(63, mid + 8)
    variance = int((ordered[low] + 2 * ordered[mid] + ordered[upp] + 2) // 4)
    if variance == 0:
        variance = 1
    if curve == 1:
        qstep_ratio = 0.25 * strength * (-math.log2(variance) + 8) + 1
    elif curve == 2:
        qstep_ratio = 0.15 * strength * (-math.log2(variance) + 10) + 1
    else:
        qstep_ratio = math.pow(1.018, _STRENGTHS[strength] * (-10 * math.log2(variance) + 80))
    qstep_ratio = float(np.clip(qstep_ratio, 1, VAR_BOOST_MAX_QSTEP_RATIO_BOOST))
    base_q = _convert_qindex_to_q_fp8(base_q_idx, bd)
    target_q = int(base_q / qstep_ratio)
    if curve == 2:
        boost = int((base_q_idx + 496) * -_compute_qdelta_fp(base_q, target_q, bd) / (255 + 1024))
    else:
        boost = int((base_q_idx + 40) * -_compute_qdelta_fp(base_q, target_q, bd) / (255 + 40))
    return min(VAR_BOOST_MAX_DELTAQ_RANGE, boost)


def variance_adjust_qp(base_q_idx: int, variances_sb: np.ndarray, strength: int,
                       bd: int = 8, octile: int = 6, curve: int = 0,
                       delta_q_res: int = 4):
    """Per-frame SB qindex map + normalized base qindex
    (svt_variance_adjust_qp with readjust_base_q_idx=True).

    variances_sb: (rows, cols, 64). Returns (new_base_q_idx, qindex_map) with
    every entry == base + k*delta_q_res (so the coded deltas are exact)."""
    rows, cols, _ = variances_sb.shape
    q = np.zeros((rows, cols), np.int32)
    for r in range(rows):
        for c in range(cols):
            boost = deltaq_sb_variance_boost(base_q_idx, variances_sb[r, c], strength,
                                             bd, octile, curve)
            q[r, c] = np.clip(base_q_idx - boost, 1, 255)
    rng = min(int(q.max() - q.min()), VAR_BOOST_MAX_DELTAQ_RANGE)
    new_base = int(q.min()) + (rng >> 1)
    offset = np.clip(q - new_base, -(VAR_BOOST_MAX_DELTAQ_RANGE >> 1),
                     VAR_BOOST_MAX_DELTAQ_RANGE >> 1)
    q = np.clip(new_base + offset, 1, 255)
    # snap offsets to delta_q_res multiples (the coded delta granularity)
    snapped = new_base + ((q - new_base) // delta_q_res) * delta_q_res
    snapped = np.clip(snapped, 1, 255).astype(np.int32)
    # keep offsets exact multiples even after the clip
    snapped = new_base + ((snapped - new_base) // delta_q_res) * delta_q_res
    return new_base, snapped
