"""Quality metrics: PSNR and SSIM (the --enable-stat-report path;
reference: packetization_process.c:639-740, svt_psnr.c, ssim kernels).
"""

from __future__ import annotations

import numpy as np


def psnr(src: np.ndarray, recon: np.ndarray, bd: int = 8) -> float:
    peak = (1 << bd) - 1
    from . import mc_native

    sse = mc_native.plane_sse(src, recon)
    if sse is None:
        sse = float(np.sum((src.astype(np.float64) - recon.astype(np.float64)) ** 2))
    mse = sse / src.size
    if mse <= 0:
        return 100.0
    return float(10 * np.log10(peak * peak / mse))


def ssim(src: np.ndarray, recon: np.ndarray, bd: int = 8) -> float:
    """8x8-windowed SSIM matching the reference's aom_ssim2-style grid
    (8x8 blocks stepped by 4), constants from the SSIM paper."""
    peak = (1 << bd) - 1
    c1 = (0.01 * peak) ** 2
    c2 = (0.03 * peak) ** 2
    from . import mc_native

    if src.shape == recon.shape and min(src.shape) >= 8:
        got = mc_native.ssim_grid(src, recon, c1, c2)
        if got is not None:
            return got
    a = src.astype(np.float64)
    b = recon.astype(np.float64)
    H, W = a.shape
    if H < 8 or W < 8:
        return 1.0
    # 8x8 window sums via integral images (O(HW), not O(HW*64))
    def box8(x):
        cp = np.zeros((x.shape[0] + 1, x.shape[1] + 1), np.float64)
        np.cumsum(np.cumsum(x, axis=0), axis=1, out=cp[1:, 1:])
        i = np.arange(0, x.shape[0] - 7, 4)
        j = np.arange(0, x.shape[1] - 7, 4)
        return (cp[np.ix_(i + 8, j + 8)] - cp[np.ix_(i, j + 8)]
                - cp[np.ix_(i + 8, j)] + cp[np.ix_(i, j)]) / 64.0

    mu_a = box8(a)
    mu_b = box8(b)
    var_a = box8(a * a) - mu_a * mu_a
    var_b = box8(b * b) - mu_b * mu_b
    cov = box8(a * b) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a * mu_a + mu_b * mu_b + c1) * (var_a + var_b + c2)
    )
    return float(s.mean())


def frame_stats(src_planes, recon_planes, bd: int = 8) -> dict:
    """Per-frame stat-report record (luma + chroma PSNR/SSIM)."""
    names = ["y", "u", "v"]
    out = {}
    for name, s, r in zip(names, src_planes, recon_planes):
        if s is None or r is None:
            continue
        out[f"psnr_{name}"] = psnr(s, r, bd)
        out[f"ssim_{name}"] = ssim(s, r, bd)
    return out
