"""Temporal filtering (alt-ref style source denoising).

Behavior reference: temporal_filtering.c (svt_av1_init_temporal_filtering,
block-error-adaptive accumulation; PSY tf-strength / kf-tf-strength
rescaling). Round-1 scope: full-pel 32x32 block ME against each neighbor
source frame, error-weighted accumulation in fixed point (center weight 16,
neighbor weights 0..16 by exp decay of block MSE). Subpel TF-ME and the
per-pixel weight refinement are future work; the filter is encoder-side
only (no conformance impact).
"""

from __future__ import annotations

import math

import numpy as np

from .me import MotionEstimator

_BLK = 32
_CENTER_W = 16


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
        for by in range(0, H, _BLK):
            for bx in range(0, W, _BLK):
                h = min(_BLK, H - by)
                w = min(_BLK, W - bx)
                res = me.search_block(np.asarray(cy), bx, by, w, h, subpel=False)
                dy, dx = res.mv[0] >> 3, res.mv[1] >> 3
                sy = min(max(by + dy, 0), H - h)
                sx = min(max(bx + dx, 0), W - w)
                blk = np.asarray(ny)[sy : sy + h, sx : sx + w]
                pred_y[by : by + h, bx : bx + w] = blk
                mse = float(np.mean((blk.astype(np.int64)
                                     - cy[by : by + h, bx : bx + w]) ** 2))
                wgt = int(round(_CENTER_W * math.exp(-mse / thresh))) if mse < 8 * thresh else 0
                w_map[by // _BLK, bx // _BLK] = wgt
                mv_map[by // _BLK, bx // _BLK] = (sy - by, sx - bx)
        # per-block weights expanded to pixels
        wy = np.kron(w_map, np.ones((_BLK, _BLK), np.int32))[:H, :W]
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
