"""Temporal filtering (alt-ref style source denoising).

Behavior reference: temporal_filtering.c (svt_av1_init_temporal_filtering:
block ME + 16x16 sub-block refinement when the 32x32 error is high, and the
per-pixel windowed-error weight modifiers of apply_filtering_c; PSY
tf-strength / kf-tf-strength rescaling). Weights: center 16; each neighbor
pixel gets round(16 * exp(-err/thresh)) where err mixes the 5x5 windowed
squared difference with the block MSE — the bilateral shape of the
reference's modifier, with its exp decay. Full-pel TF-ME (the filter is
encoder-side only; no conformance impact).
"""

from __future__ import annotations

import math

import numpy as np

from .me import MotionEstimator

_BLK = 32
_CENTER_W = 16


def _box5_mean(d2: np.ndarray) -> np.ndarray:
    """5x5 windowed mean via an integral image (edge-padded)."""
    p = np.pad(d2, 2, mode="edge").astype(np.int64)
    ii = np.zeros((p.shape[0] + 1, p.shape[1] + 1), np.int64)
    ii[1:, 1:] = np.cumsum(np.cumsum(p, axis=0), axis=1)
    H, W = d2.shape
    s = (ii[5 : 5 + H, 5 : 5 + W] - ii[5 : 5 + H, :W]
         - ii[:H, 5 : 5 + W] + ii[:H, :W])
    return s / 25.0


def _filter_plane(center: np.ndarray, preds: list, weights: list) -> np.ndarray:
    acc = center.astype(np.int64) * _CENTER_W
    den = np.full(center.shape, _CENTER_W, np.int64)
    for pred, w in zip(preds, weights):
        acc += pred.astype(np.int64) * w
        den += w
    return ((acc + den // 2) // den).astype(center.dtype)


def temporal_filter(center, neighbors, strength: int, bd: int = 8):
    """Filter one source picture against neighbor source pictures.

    center: (y, u, v) arrays (u/v may be None). neighbors: list of such
    tuples (past + future originals). strength: 0..4 (0 = off).
    Returns filtered (y, u, v)."""
    cy, cu, cv = center
    if strength <= 0 or not neighbors:
        return cy, cu, cv
    H, W = cy.shape
    # MSE decay scale: stronger filtering accepts larger block errors
    thresh = 24.0 * (2.0 ** (strength - 1)) * (1 << (2 * (bd - 8)))

    n_preds_y, n_w = [], []
    n_preds_u, n_preds_v = [], []
    mono = cu is None
    for ny, nu, nv in neighbors:
        me = MotionEstimator(np.asarray(ny), search_range=32)
        pred_y = np.empty_like(cy)
        w_map = np.zeros(((H + _BLK - 1) // _BLK, (W + _BLK - 1) // _BLK), np.int32)
        mv_map = np.zeros(w_map.shape + (2,), np.int32)
        mse_map = np.zeros(w_map.shape, np.float64)
        for by in range(0, H, _BLK):
            for bx in range(0, W, _BLK):
                h = min(_BLK, H - by)
                w = min(_BLK, W - bx)
                res = me.search_block(np.asarray(cy), bx, by, w, h, subpel=False)
                dy, dx = res.mv[0] >> 3, res.mv[1] >> 3
                sy = min(max(by + dy, 0), H - h)
                sx = min(max(bx + dx, 0), W - w)
                blk = np.asarray(ny)[sy : sy + h, sx : sx + w]
                mse = float(np.mean((blk.astype(np.int64)
                                     - cy[by : by + h, bx : bx + w]) ** 2))
                # 16x16 sub-block refinement when the whole-block match is
                # poor (use_subblock rule, temporal_filtering.c)
                if mse > thresh and min(h, w) == _BLK:
                    blk = blk.copy()
                    half = _BLK >> 1
                    errs = []
                    for oy in (0, half):
                        for ox in (0, half):
                            r2 = me.search_block(np.asarray(cy), bx + ox,
                                                 by + oy, half, half,
                                                 subpel=False)
                            d2y, d2x = r2.mv[0] >> 3, r2.mv[1] >> 3
                            s2y = min(max(by + oy + d2y, 0), H - half)
                            s2x = min(max(bx + ox + d2x, 0), W - half)
                            sb = np.asarray(ny)[s2y : s2y + half,
                                                s2x : s2x + half]
                            blk[oy : oy + half, ox : ox + half] = sb
                            errs.append(np.mean(
                                (sb.astype(np.int64)
                                 - cy[by + oy : by + oy + half,
                                      bx + ox : bx + ox + half]) ** 2))
                    mse2 = float(np.mean(errs))
                    if mse2 < mse:
                        mse = mse2
                pred_y[by : by + h, bx : bx + w] = blk
                wgt = int(round(_CENTER_W * math.exp(-mse / thresh))) if mse < 8 * thresh else 0
                w_map[by // _BLK, bx // _BLK] = wgt
                mse_map[by // _BLK, bx // _BLK] = mse
                mv_map[by // _BLK, bx // _BLK] = (sy - by, sx - bx)
        # per-pixel weights: blend the 5x5 windowed squared difference with
        # the block MSE (the reference's pixel-wise modifier), gated by the
        # per-block acceptance
        gate = np.kron(w_map > 0, np.ones((_BLK, _BLK), bool))[:H, :W]
        bmse = np.kron(mse_map, np.ones((_BLK, _BLK)))[:H, :W]
        d2 = (pred_y.astype(np.int64) - cy.astype(np.int64)) ** 2
        err = 0.5 * _box5_mean(d2) + 0.5 * bmse
        wy = np.rint(_CENTER_W * np.exp(-err / thresh)).astype(np.int32)
        wy[~gate] = 0
        n_preds_y.append(pred_y)
        n_w.append(wy)
        if not mono:
            ch, cw = cu.shape
            pu = np.empty_like(cu)
            pv = np.empty_like(cv)
            for by in range(0, H, _BLK):
                for bx in range(0, W, _BLK):
                    dy, dx = mv_map[by // _BLK, bx // _BLK]
                    cby, cbx = by >> 1, bx >> 1
                    h = min(_BLK >> 1, ch - cby)
                    w = min(_BLK >> 1, cw - cbx)
                    if h <= 0 or w <= 0:
                        continue
                    sy = min(max(cby + (dy >> 1), 0), ch - h)
                    sx = min(max(cbx + (dx >> 1), 0), cw - w)
                    pu[cby : cby + h, cbx : cbx + w] = np.asarray(nu)[sy : sy + h, sx : sx + w]
                    pv[cby : cby + h, cbx : cbx + w] = np.asarray(nv)[sy : sy + h, sx : sx + w]
            n_preds_u.append(pu)
            n_preds_v.append(pv)

    fy = _filter_plane(np.asarray(cy), n_preds_y, n_w)
    if mono:
        return fy, None, None
    wc = [w[::2, ::2][: cu.shape[0], : cu.shape[1]] for w in n_w]
    fu = _filter_plane(np.asarray(cu), n_preds_u, wc)
    fv = _filter_plane(np.asarray(cv), n_preds_v, wc)
    return fy, fu, fv
