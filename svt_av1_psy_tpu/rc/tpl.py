"""TPL: temporal-dependency (mb_tree style) propagation over a lookahead
group.

Behavior reference: src_ops_process.c (TPL dispenser :1963, group
propagation :2289) and the r0 consumers in rc_process.c (:833-872 keyframe
qstep_ratio = sqrt(r0) * weight; svt_aom_sb_qp_derivation_tpl_la :1624 for
per-SB beta offsets). Scope: source-domain costs (SA8D of the
mean-removed block for intra, SA8D of the full-pel MC residual for inter)
and area-weighted backward propagation on a 16x16 grid — the elementary
encoder of the reference is approximated, the propagation and the r0/beta
consumers follow the reference formulas.
"""

from __future__ import annotations

import math

import numpy as np

from ..codec.me import MotionEstimator
from ..psy.psy_rd import sa8d_blocks

BLK = 16


def _tiles16(x: np.ndarray):
    h, w = x.shape
    bh, bw = h // BLK, w // BLK
    t = (x[: bh * BLK, : bw * BLK]
         .reshape(bh, BLK, bw, BLK).transpose(0, 2, 1, 3).reshape(-1, BLK, BLK))
    return t, bh, bw


def _satd16(blocks: np.ndarray) -> np.ndarray:
    """SA8D summed over the four 8x8 quadrants of each 16x16 block."""
    n = blocks.shape[0]
    q = blocks.reshape(n, 2, 8, 2, 8).transpose(0, 1, 3, 2, 4).reshape(n * 4, 8, 8)
    return sa8d_blocks(q).reshape(n, 4).sum(axis=1)


def tpl_analysis(frames: list, bd: int = 8, backend: str = "host"):
    """Propagate dependency costs backward through `frames` (display order,
    frames[0] is the picture being rated). Returns (r0, beta_map) where
    beta_map is (bh, bw) per-16x16 rk/r0-style quality ratios for frames[0].

    backend: "host" (default — the decision-quality reference) runs the
    per-block ME + SA8D loop; "device" opts into the batched ops/tpl cost
    pass (faster after warm-up but its full-pel SA8D proxies still cost
    quality on screen content — keep host until the A/B closes); "auto"
    picks device when an accelerator is attached.
    """
    luma = [np.asarray(f) >> (bd - 8) for f in frames]
    # large frames: run the propagation at half resolution (the reference's
    # decimated TPL input at fast presets); a 16x16 TPL unit then covers a
    # 32x32 source area (unit_px doubles), r0/beta semantics unchanged
    unit_px = BLK
    if luma[0].shape[0] >= 720:
        from ..codec.me import decimate

        luma = [decimate(f, 1) for f in luma]
        unit_px = BLK * 2
    n = len(luma)
    if backend != "host" and min(luma[0].shape) >= 64:
        from ..parallel.pipeline import device_backend_default

        if backend == "device" or device_backend_default():
            from ..ops.tpl import tpl_group_stats
            from ..profiling import stage as _st

            with _st("device:tpl"):
                stats = tpl_group_stats(luma)
            return _propagate(stats, n, unit_px)
    stats = []
    for i, y in enumerate(luma):
        tiles, bh, bw = _tiles16(y.astype(np.int64))
        mean = tiles.mean(axis=(1, 2), keepdims=True).astype(np.int64)
        intra = np.maximum(_satd16(tiles - mean), 1)
        if i == 0:
            stats.append(dict(intra=intra.reshape(bh, bw),
                              inter=intra.reshape(bh, bw),
                              mv=np.zeros((bh, bw, 2), np.int32), bh=bh, bw=bw))
            continue
        me = MotionEstimator(luma[i - 1].astype(np.int32), search_range=32)
        inter = np.empty(bh * bw, np.int64)
        mvs = np.zeros((bh, bw, 2), np.int32)
        H, W = y.shape
        # one int32 view per frame: a fresh astype per block would bust the
        # MotionEstimator's per-frame pyramid cache (id-keyed)
        y32 = np.ascontiguousarray(y, np.int32)
        diffs = np.empty((bh * bw, BLK, BLK), np.int64)
        k = 0
        for by in range(bh):
            for bx in range(bw):
                res = me.search_block(y32, bx * BLK, by * BLK,
                                      BLK, BLK, subpel=False)
                dy, dx = res.mv[0] >> 3, res.mv[1] >> 3
                sy = min(max(by * BLK + dy, 0), H - BLK)
                sx = min(max(bx * BLK + dx, 0), W - BLK)
                pred = luma[i - 1][sy : sy + BLK, sx : sx + BLK].astype(np.int64)
                cur = y[by * BLK : by * BLK + BLK, bx * BLK : bx * BLK + BLK].astype(np.int64)
                diffs[k] = cur - pred
                mvs[by, bx] = (sy - by * BLK, sx - bx * BLK)
                k += 1
        inter = _satd16(diffs)   # one batched SATD for the whole frame
        inter = np.minimum(np.maximum(inter, 1), intra)
        stats.append(dict(intra=intra.reshape(bh, bw), inter=inter.reshape(bh, bw),
                          mv=mvs, bh=bh, bw=bw))
    return _propagate(stats, n, unit_px)


def _propagate(stats: list, n: int, unit_px: int):
    """Backward dependency propagation over per-frame cost stats and the
    r0/beta reduction for frames[0] (mc_flow_dispenser analog)."""
    deps = [np.zeros((s["bh"], s["bw"]), np.float64) for s in stats]
    for i in range(n - 1, 0, -1):
        s = stats[i]
        bh, bw = s["bh"], s["bw"]
        pbh, pbw = stats[i - 1]["bh"], stats[i - 1]["bw"]
        for by in range(bh):
            for bx in range(bw):
                intra = float(s["intra"][by, bx])
                inter = float(s["inter"][by, bx])
                amount = (intra + deps[i][by, bx]) * (1.0 - inter / intra)
                if amount <= 0:
                    continue
                dy, dx = s["mv"][by, bx]
                py = by * BLK + int(dy)
                px = bx * BLK + int(dx)
                # area-weighted split over the up-to-4 overlapped ref blocks
                b0y, b0x = py // BLK, px // BLK
                fy, fx = py - b0y * BLK, px - b0x * BLK
                for (oy, wy) in ((0, BLK - fy), (1, fy)):
                    for (ox, wx) in ((0, BLK - fx), (1, fx)):
                        r, c = b0y + oy, b0x + ox
                        if 0 <= r < pbh and 0 <= c < pbw and wy and wx:
                            deps[i - 1][r, c] += amount * (wy * wx) / (BLK * BLK)

    intra0 = stats[0]["intra"].astype(np.float64)
    dep0 = deps[0]
    r0 = float(intra0.sum() / max(intra0.sum() + dep0.sum(), 1e-9))
    rk = intra0 / np.maximum(intra0 + dep0, 1e-9)
    beta = rk / max(r0, 1e-9)          # >1: less propagated -> can coarsen
    return r0, beta, unit_px


R0_WEIGHT_KEY = 0.75   # r0_weight[I_SLICE] (rc_process.c:775)


def tpl_qindex(base_qindex: int, r0: float, bd: int,
               qsc_weight: float = 1.0, weight: float = R0_WEIGHT_KEY) -> int:
    """Frame qindex from r0 (rc_process.c:872: qstep_ratio = sqrt(r0) *
    weight * qp_scale_compress_weight, clamped to the weight). Lower r0
    (more propagation) -> lower q. weight: r0_weight[] per update type
    (0.75 keyframes, 0.9 base-layer inter; rc_process.c:775)."""
    from .rate_control import convert_qindex_to_q

    qstep_ratio = math.sqrt(max(r0, 1e-4)) * weight * qsc_weight
    qstep_ratio = min(qstep_ratio, weight)
    target_q = convert_qindex_to_q(base_qindex, bd) * qstep_ratio
    lo, hi = 1, base_qindex
    while lo < hi:
        mid = (lo + hi) >> 1
        if convert_qindex_to_q(mid, bd) < target_q:
            lo = mid + 1
        else:
            hi = mid
    return lo


def tpl_sb_qindex_map(base_qindex: int, beta: np.ndarray, sb_rows: int,
                      sb_cols: int, bd: int, delta_q_res: int = 4,
                      unit_px: int = BLK):
    """Per-SB qindex map from the 16x16 beta ratios
    (svt_aom_sb_qp_derivation_tpl_la analog): offset ~ qindex-equivalent of
    a 1/sqrt(beta) qstep scaling, snapped to delta_q_res multiples."""
    from .rate_control import convert_qindex_to_q

    bh, bw = beta.shape
    per_sb = max(64 // unit_px, 1)
    q = np.full((sb_rows, sb_cols), base_qindex, np.int32)
    base_q = convert_qindex_to_q(base_qindex, bd)
    for r in range(sb_rows):
        for c in range(sb_cols):
            b = beta[r * per_sb : (r + 1) * per_sb, c * per_sb : (c + 1) * per_sb]
            if b.size == 0:
                continue
            ratio = float(np.clip(math.sqrt(float(b.mean())), 0.5, 2.0))
            target_q = base_q * ratio
            lo, hi = 1, 255
            while lo < hi:
                mid = (lo + hi) >> 1
                if convert_qindex_to_q(mid, bd) < target_q:
                    lo = mid + 1
                else:
                    hi = mid
            off = int(np.clip(lo - base_qindex, -40, 40))
            q[r, c] = np.clip(base_qindex + (off // delta_q_res) * delta_q_res, 1, 255)
    return q
