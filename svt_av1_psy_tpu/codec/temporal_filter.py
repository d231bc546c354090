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


def estimate_plane_noise(plane: np.ndarray, bd: int = 8) -> float:
    """Noise sigma via the edge-gated Laplacian estimator the reference
    uses (av1_estimate_noise_from_single_plane, temporal_filtering.c):
    Immerkaer's 3x3 Laplacian accumulated only where the Sobel gradient
    magnitude is below an edge threshold, scaled by sqrt(pi/2)/6."""
    x = (np.asarray(plane) >> (bd - 8)).astype(np.int64)
    if x.shape[0] < 16 or x.shape[1] < 16:
        return 0.0
    c = x[1:-1, 1:-1]
    gx = (x[1:-1, 2:] - x[1:-1, :-2]
          + ((x[:-2, 2:] - x[:-2, :-2]) + (x[2:, 2:] - x[2:, :-2])) // 2)
    gy = (x[2:, 1:-1] - x[:-2, 1:-1]
          + ((x[2:, :-2] - x[:-2, :-2]) + (x[2:, 2:] - x[:-2, 2:])) // 2)
    ga = np.abs(gx) + np.abs(gy)
    lap = np.abs(4 * c - 2 * (x[1:-1, 2:] + x[1:-1, :-2]
                              + x[2:, 1:-1] + x[:-2, 1:-1])
                 + (x[:-2, :-2] + x[:-2, 2:] + x[2:, :-2] + x[2:, 2:]))
    flat = ga < 50                       # EDGE_THRESHOLD
    n = int(flat.sum())
    if n < 16:
        return -1.0                      # too edgy to estimate (ref: -1)
    return float(lap[flat].sum() * math.sqrt(math.pi / 2) / (6.0 * n))


def _noise_decay(noise: float) -> float:
    """Reference decay shape (compute_decay_factor-style): clean content
    filters gently, noisy content accepts larger errors."""
    if noise < 0:
        noise = 0.0
    return min(max(0.7 + math.log1p(noise), 0.7), 4.0)


def _filter_plane(center: np.ndarray, preds: list, weights: list) -> np.ndarray:
    acc = center.astype(np.int64) * _CENTER_W
    den = np.full(center.shape, _CENTER_W, np.int64)
    for pred, w in zip(preds, weights):
        acc += pred.astype(np.int64) * w
        den += w
    return ((acc + den // 2) // den).astype(center.dtype)


def temporal_filter(center, neighbors, strength: int, bd: int = 8,
                    backend: str = "auto"):
    """Filter one source picture against neighbor source pictures.

    center: (y, u, v) arrays (u/v may be None). neighbors: list of such
    tuples (past + future originals). strength: 0..4 (0 = off).
    Returns filtered (y, u, v).

    backend: "auto" runs whole-frame device TF (ops/tf — TF-ME on the
    HME+SSD-grid machinery, dense weight/blend stages) when an
    accelerator is attached; "host" forces this per-block loop. Frames
    with min(dim) < 64 always take the host loop, including under an
    explicit backend="device" request (the device grid machinery needs
    at least one 64x64 SB). The filter is non-normative, so the two
    backends agree in shape (thresholds, weight formula, refinement
    rule) but not bit-for-bit."""
    cy, cu, cv = center
    if strength <= 0 or not neighbors:
        return cy, cu, cv
    if backend != "host" and min(np.asarray(cy).shape) >= 64:
        from ..parallel.pipeline import device_backend_default

        if backend == "device" or device_backend_default():
            from ..ops.tf import temporal_filter_device
            from ..profiling import stage as _st

            with _st("device:tf"):
                return temporal_filter_device(center, neighbors,
                                              strength, bd)
    H, W = cy.shape
    # MSE decay scale: stronger filtering accepts larger block errors;
    # noise-adaptive per plane (the reference's noise_levels ->
    # decay_control path, temporal_filtering.c): clean sources filter
    # gently, noisy sources accept larger windowed errors
    base = 24.0 * (2.0 ** (strength - 1)) * (1 << (2 * (bd - 8)))
    thresh = base * _noise_decay(estimate_plane_noise(cy, bd))
    thresh_uv = None
    if cu is not None:
        thresh_uv = base * _noise_decay(estimate_plane_noise(cu, bd))

    n_preds_y, n_w = [], []
    n_preds_u, n_preds_v = [], []
    mono = cu is None
    from . import mc_native as _mcn

    use_subpel = _mcn.available()
    for ny, nu, nv in neighbors:
        me = MotionEstimator(np.asarray(ny), search_range=32)
        ny_pad = (np.pad(np.asarray(ny), ((3, 4), (3, 4)), mode="edge")
                  if use_subpel else None)

        def nblk(by_, bx_, h_, w_, mv):
            """Neighbor prediction at a 1/8-pel MV (subpel TF-ME,
            temporal_filtering.c:1557-1568): integer part clamped
            in-frame, fractional part through the normative 8-tap
            convolve. Full-pel (or no native lib) is a plain copy."""
            dy_, dx_ = mv[0] >> 3, mv[1] >> 3
            sy_ = min(max(by_ + dy_, 0), H - h_)
            sx_ = min(max(bx_ + dx_, 0), W - w_)
            f8y, f8x = mv[0] & 7, mv[1] & 7
            if use_subpel and (f8y or f8x):
                patch = ny_pad[sy_ : sy_ + h_ + 7, sx_ : sx_ + w_ + 7]
                blk_ = _mcn.convolve_block(patch, w_, h_, f8x << 1,
                                           f8y << 1, bd=bd)
                return blk_.astype(cy.dtype), sy_, sx_
            return np.asarray(ny)[sy_ : sy_ + h_, sx_ : sx_ + w_], sy_, sx_

        pred_y = np.empty_like(cy)
        w_map = np.zeros(((H + _BLK - 1) // _BLK, (W + _BLK - 1) // _BLK), np.int32)
        mv_map = np.zeros(w_map.shape + (2,), np.int32)
        mse_map = np.zeros(w_map.shape, np.float64)
        for by in range(0, H, _BLK):
            for bx in range(0, W, _BLK):
                h = min(_BLK, H - by)
                w = min(_BLK, W - bx)
                res = me.search_block(np.asarray(cy), bx, by, w, h,
                                      subpel=use_subpel)
                blk, sy, sx = nblk(by, bx, h, w, res.mv)
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
                                                 subpel=use_subpel)
                            sb, _, _ = nblk(by + oy, bx + ox, half, half,
                                            r2.mv)
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
    # chroma-aware weights (apply_filtering's planewise path): the luma
    # gate/MV transfer down, but the per-pixel error term comes from the
    # chroma plane itself with its own noise-adapted threshold
    fu_w, fv_w = [], []
    for wy, pu, pv in zip(n_w, n_preds_u, n_preds_v):
        gate = wy[::2, ::2][: cu.shape[0], : cu.shape[1]] > 0
        for cp, pp, out in ((cu, pu, fu_w), (cv, pv, fv_w)):
            d2 = (pp.astype(np.int64) - np.asarray(cp).astype(np.int64)) ** 2
            wch = np.rint(_CENTER_W * np.exp(-_box5_mean(d2) / thresh_uv)) \
                .astype(np.int32)
            wch[~gate] = 0
            out.append(wch)
    fu = _filter_plane(np.asarray(cu), n_preds_u, fu_w)
    fv = _filter_plane(np.asarray(cv), n_preds_v, fv_w)
    return fy, fu, fv
