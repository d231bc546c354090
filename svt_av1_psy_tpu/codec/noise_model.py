"""Film-grain noise-model estimation (the --film-grain / --film-grain-denoise
path).

Behavior reference: noise_model.c:2373 (svt_aom_denoise_and_model_run:
flat-block finder, frequency-domain denoiser, lag-N AR least-squares fit,
per-intensity scaling fit), fft.c / dwt.c (noise PSD tools). Re-designed
as batched array math: block statistics and the AR design matrix are
vectorized sliding windows, the denoiser reuses the codec's own batched
32x32 DCT tier with a per-frequency noise floor measured from the flat
blocks (grain is AR-correlated, so a white-noise threshold would miss its
low-frequency energy), and the scaling points are calibrated against the
repo's dav1d-bit-exact grain synthesizer.

Pipeline:
  1. flat blocks: lowest plane-fit residual std on the source luma
  2. noise field = plane-fit residual of the flat blocks (signal-free)
  3. scaling points from per-intensity-bin noise sigma
  4. lag-2 AR fit on sigma-normalized flat-block noise (normal equations)
  5. y-values calibrated so the synthesized grain std matches measured
     sigma (_gen_template measures the AR field's actual std)
  6. optional denoise: per-frequency DCT floor from the flat blocks drives
     a batched hard-threshold over 4 half-overlapped tilings
"""

from __future__ import annotations

import numpy as np

from .film_grain import FilmGrainParams, _ar_positions, _gen_template, _Lfsr

BLK = 32


def _block_view(plane: np.ndarray, off_r: int = 0, off_c: int = 0):
    """(N, BLK, BLK) non-overlapping blocks starting at (off_r, off_c)."""
    H, W = plane.shape
    rows = (H - off_r) // BLK
    cols = (W - off_c) // BLK
    if rows < 1 or cols < 1:
        return None
    a = plane[off_r : off_r + rows * BLK, off_c : off_c + cols * BLK]
    return (a.reshape(rows, BLK, cols, BLK).transpose(0, 2, 1, 3)
            .reshape(rows * cols, BLK, BLK))


_YY, _XX = np.mgrid[0:BLK, 0:BLK]
_YM = (_YY - _YY.mean()).astype(np.float64)
_XM = (_XX - _XX.mean()).astype(np.float64)


def _plane_resid(blocks: np.ndarray):
    """(resid, means): per-block linear-plane-fit residual + mean."""
    a = blocks.astype(np.float64)
    mean = a.mean(axis=(1, 2))
    gy = (a * _YM).sum(axis=(1, 2)) / (_YM * _YM).sum()
    gx = (a * _XM).sum(axis=(1, 2)) / (_XM * _XM).sum()
    plane = (mean[:, None, None] + gy[:, None, None] * _YM
             + gx[:, None, None] * _XM)
    return a - plane, mean


def analyze_plane(plane: np.ndarray):
    """(blocks, flat_mask, means, resid, resid_std) for one plane, flatness
    by plane-fit residual (flat_block_finder analog, noise_model.c)."""
    blocks = _block_view(plane)
    if blocks is None or blocks.shape[0] < 4:
        return None
    resid, means = _plane_resid(blocks)
    inner = resid[:, 2:-2, 2:-2]
    resid_std = inner.std(axis=(1, 2))
    floor = np.percentile(resid_std, 10.0)
    flat = resid_std <= max(1.5 * floor, floor + 0.5)
    return blocks, flat, means, resid, resid_std


def _ar_fit(noise_blocks: np.ndarray, sigmas: np.ndarray, lag: int = 2):
    """Least-squares AR coefficients over sigma-normalized noise blocks."""
    pos = _ar_positions(lag)
    norm = noise_blocks / np.maximum(sigmas, 0.25)[:, None, None]
    m = BLK - 2 * lag
    target = norm[:, lag : lag + m, lag : lag + m].reshape(-1)
    cols = [norm[:, lag + dr : lag + dr + m, lag + dc : lag + dc + m]
            .reshape(-1) for (dr, dc) in pos]
    A = np.stack(cols, axis=1)
    ata = A.T @ A
    atb = A.T @ target
    ata += np.eye(len(pos)) * (1e-4 * max(ata.max(), 1.0))
    try:
        return np.linalg.solve(ata, atb)
    except np.linalg.LinAlgError:
        return np.zeros(len(pos))


def _template_std(coeffs_int, lag: int, ar_coeff_shift: int, bd: int,
                  seed: int) -> float:
    """Std of the synthesized 64x64 luma grain interior for these AR
    coefficients (drives the scaling-point calibration)."""
    gauss_sec = 12 - bd
    grain_center = 128 << (bd - 8)
    t = _gen_template(_Lfsr(seed), 73, 82, list(coeffs_int), lag,
                      ar_coeff_shift, gauss_sec, -grain_center,
                      (256 << (bd - 8)) - 1 - grain_center, 3, 3, 3)
    return float(t[9:73, 9:73].std())


def dct_denoise(y: np.ndarray, noise_floor: np.ndarray, bd: int = 8,
                k: float = 2.2) -> np.ndarray:
    """Batched 32x32 DCT hard-threshold denoiser over 4 half-overlapped
    tilings; noise_floor is the per-frequency |coeff| floor (BLK, BLK)."""
    from .constants import TxSize
    from .transforms import forward_transform_2d, inverse_transform_add

    H, W = y.shape
    acc = np.zeros((H, W), np.float64)
    cnt = np.zeros((H, W), np.float64)
    thr = (k * noise_floor).reshape(1, -1)
    ts = int(TxSize.TX_32X32)
    for off_r, off_c in ((0, 0), (0, BLK // 2), (BLK // 2, 0),
                         (BLK // 2, BLK // 2)):
        blocks = _block_view(y, off_r, off_c)
        if blocks is None:
            continue
        n = blocks.shape[0]
        rows = (H - off_r) // BLK
        cols = (W - off_c) // BLK
        resid, mean = _plane_resid(blocks)
        co = forward_transform_2d(np.round(resid).astype(np.int32), ts, 0, bd)
        co = co.reshape(n, -1)
        co[np.abs(co) < thr] = 0
        # mid-bias uint16 pred so negative residuals survive the bd-16 clip
        den = inverse_transform_add(
            co.reshape(n, BLK, BLK),
            np.full((n, BLK, BLK), 1 << 15, np.uint16), ts, 0, 16)
        gy = (resid + blocks - blocks)  # placeholder no-op keeps shapes clear
        plane = blocks.astype(np.float64) - resid
        den = den.astype(np.float64) - (1 << 15) + plane
        tiles = den.reshape(rows, cols, BLK, BLK).transpose(0, 2, 1, 3)
        tiles = tiles.reshape(rows * BLK, cols * BLK)
        acc[off_r : off_r + rows * BLK, off_c : off_c + cols * BLK] += tiles
        cnt[off_r : off_r + rows * BLK, off_c : off_c + cols * BLK] += 1
    out = y.astype(np.float64)
    mask = cnt > 0
    out[mask] = acc[mask] / cnt[mask]
    return np.clip(np.round(out), 0, (1 << bd) - 1).astype(y.dtype)


def noise_dct_floor(resid_flat: np.ndarray, bd: int = 8) -> np.ndarray:
    """Per-frequency noise |coeff| level from flat-block residuals:
    median|DCT| * 1.4826 (the PSD measurement of fft.c, as a DCT floor)."""
    from .constants import TxSize
    from .transforms import forward_transform_2d

    co = forward_transform_2d(np.round(resid_flat).astype(np.int32),
                              int(TxSize.TX_32X32), 0, bd)
    co = co.reshape(co.shape[0], -1).astype(np.float64)
    return 1.4826 * np.median(np.abs(co), axis=0).reshape(BLK, BLK)


def estimate_film_grain(y: np.ndarray, u=None, v=None, bd: int = 8,
                        strength: float = 1.0, seed: int = 7391,
                        denoise: bool = False, ar_lag: int = 2):
    """Fit FilmGrainParams to the source noise (reference entry point:
    svt_aom_denoise_and_model_run). Returns (params | None, denoised_y | None);
    params is None when the content has no measurable grain.

    ar_lag: AR neighborhood radius (--adaptive-film-grain scales the grain
    model footprint with resolution; high-res grain has longer-range
    correlation, noise_model.c lag selection)."""
    got = analyze_plane(y)
    if got is None:
        return None, None
    blocks, flat, means, resid, resid_std = got
    fi = np.flatnonzero(flat)
    if len(fi) < 4:
        return None, None
    unit = 1 << (bd - 8)
    sig = resid_std[fi]
    if np.median(sig) < 0.4 * unit:
        return None, None   # effectively clean content
    # ---- per-intensity scaling: median sigma per intensity bin
    mx = np.clip(means[fi] / unit, 0, 255)
    bins = [0, 32, 64, 96, 128, 160, 192, 224, 256]
    pts = []
    for b0, b1 in zip(bins, bins[1:]):
        sel = (mx >= b0) & (mx < b1)
        if sel.sum() >= 2:
            pts.append(((b0 + b1) // 2, float(np.median(sig[sel]))))
    if not pts:
        pts = [(128, float(np.median(sig)))]
    # ---- AR fit on the flat-block noise
    lag = int(min(max(ar_lag, 1), 3))
    c = _ar_fit(resid[fi], sig, lag)
    shift = 7
    tot = np.abs(c).sum()
    if tot > 0.95:  # keep the synthesized AR field stable
        c = c * (0.95 / tot)
    ci = np.clip(np.round(c * (1 << shift)), -128, 127).astype(int)
    gstd = _template_std(list(ci), lag, shift, bd, seed)
    if gstd < 1e-3:
        return None, None
    # ---- calibrate y-values: applied sigma = lut * gstd / 2^scaling_shift
    scaling_shift = 8
    scale = (1 << scaling_shift) / gstd * float(strength) / unit
    spts = [(int(x), int(np.clip(round(s * scale), 0, 255))) for x, s in pts]
    first, last = spts[0], spts[-1]
    curve = [(0, first[1])] + spts + [(255, last[1])]
    dedup = [curve[0]]
    for p in curve[1:]:
        if p[0] > dedup[-1][0] and (p[1] != dedup[-1][1] or p is curve[-1]):
            dedup.append(p)
    if all(p[1] == 0 for p in dedup):
        return None, None
    fg = FilmGrainParams(random_seed=seed, bit_depth=bd)
    fg.scaling_points_y = dedup[:14]
    fg.scaling_shift = scaling_shift
    fg.ar_coeff_lag = lag
    fg.ar_coeffs_y = [int(a) for a in ci]
    fg.ar_coeff_shift = shift
    npos_c = 2 * lag * (lag + 1) + 1
    # ---- chroma: per-plane sigma from the same flat-block machinery
    for plane, attr_pts, attr_cf in ((u, "scaling_points_cb", "ar_coeffs_cb"),
                                     (v, "scaling_points_cr", "ar_coeffs_cr")):
        setattr(fg, attr_cf, [0] * npos_c)
        if plane is None:
            continue
        pg = analyze_plane(plane)
        if pg is None:
            continue
        _, pflat, _, _, pstd = pg
        pfi = np.flatnonzero(pflat)
        if len(pfi) < 2:
            continue
        ps = float(np.median(pstd[pfi]))
        if ps < 0.3 * unit:
            continue
        yv = int(np.clip(round(ps * scale), 0, 255))
        if yv > 0:
            setattr(fg, attr_pts, [(0, yv), (255, yv)])
    fg.overlap_flag = 1
    den = None
    if denoise:
        floor = noise_dct_floor(resid[fi], bd)
        den = dct_denoise(y, floor, bd)
    return fg, den
