"""Self-guided restoration (SGRPROJ): normative filter + unit search.

Behavior reference: restoration.c:468-1010 (boxsum, selfguided_restoration
fast/internal, svt_apply_selfguided_restoration_c, svt_decode_xq) and
restoration_pick.c:413-640 (get_proj_subspace, encode_xq,
search_selfguided_restoration). The filter math is normative (the decoder
mirrors it), validated bit-exact against the reference oracle in
tests/test_sgr.py.

The per-processing-unit chunking of the reference is output-invariant here
(window truncation never reaches the read positions given the 3-pixel
border), so units are filtered in one vectorized pass.
"""

from __future__ import annotations

import numpy as np

SGRPROJ_PARAMS_BITS = 4
SGRPROJ_PRJ_BITS = 7
SGRPROJ_RST_BITS = 4
SGRPROJ_SGR_BITS = 8
SGRPROJ_SGR = 1 << SGRPROJ_SGR_BITS
SGRPROJ_MTABLE_BITS = 20
SGRPROJ_RECIP_BITS = 12
SGRPROJ_PRJ_SUBEXP_K = 4
SGRPROJ_PRJ_MIN0 = -(1 << SGRPROJ_PRJ_BITS) * 3 // 4
SGRPROJ_PRJ_MAX0 = SGRPROJ_PRJ_MIN0 + (1 << SGRPROJ_PRJ_BITS) - 1
SGRPROJ_PRJ_MIN1 = -(1 << SGRPROJ_PRJ_BITS) // 4
SGRPROJ_PRJ_MAX1 = SGRPROJ_PRJ_MIN1 + (1 << SGRPROJ_PRJ_BITS) - 1
_BORDER = 3

# svt_aom_eb_sgr_params (restoration.c:85): (r0, r1, s0, s1) per ep
SGR_PARAMS = (
    (2, 1, 140, 3236), (2, 1, 112, 2158), (2, 1, 93, 1618), (2, 1, 80, 1438),
    (2, 1, 70, 1295), (2, 1, 58, 1177), (2, 1, 47, 1079), (2, 1, 37, 996),
    (2, 1, 30, 925), (2, 1, 25, 863), (0, 1, -1, 2589), (0, 1, -1, 1618),
    (0, 1, -1, 1177), (0, 1, -1, 925), (2, 0, 56, -1), (2, 0, 22, -1),
)

# svt_aom_eb_x_by_xplus1 (restoration.c:647): round(256x/(x+1)), 0 -> 1,
# 255 -> 256 (verified byte-identical to the reference table)
X_BY_XPLUS1 = np.array(
    [1] + [min(256, (256 * x + (x + 1) // 2) // (x + 1)) for x in range(1, 255)]
    + [256], np.int64)
ONE_BY_X = np.array([4096, 2048, 1365, 1024, 819, 683, 585, 512, 455, 410,
                     372, 341, 315, 293, 273, 256, 241, 228, 216, 205, 195,
                     186, 178, 171, 164], np.int64)


def _rpot(x, n):
    return (x + (1 << (n - 1))) >> n if n > 0 else x


def _boxsum(src: np.ndarray, r: int, sqr: bool) -> np.ndarray:
    """Edge-truncated (2r+1)-box sums over both axes (boxsum1/boxsum2)."""
    x = src.astype(np.int64)
    if sqr:
        x = x * x
    h, w = x.shape
    cs = np.zeros((h + 1, w), np.int64)
    np.cumsum(x, axis=0, out=cs[1:])
    i = np.arange(h)
    v = cs[np.minimum(i + r + 1, h)] - cs[np.maximum(i - r, 0)]
    cs2 = np.zeros((h, w + 1), np.int64)
    np.cumsum(v, axis=1, out=cs2[:, 1:])
    j = np.arange(w)
    return cs2[:, np.minimum(j + r + 1, w)] - cs2[:, np.maximum(j - r, 0)]


def _ab_transform(A, B, r: int, s: int, bd: int):
    """The A/B nonlinearity (restoration.c:710-775), vectorized."""
    n = (2 * r + 1) * (2 * r + 1)
    a = _rpot(A, 2 * (bd - 8))
    b = _rpot(B, bd - 8)
    p = np.maximum(a * n - b * b, 0)
    z = _rpot(p * s, SGRPROJ_MTABLE_BITS)
    At = X_BY_XPLUS1[np.minimum(z, 255)]
    Bt = _rpot((SGRPROJ_SGR - At) * B * ONE_BY_X[n - 1], SGRPROJ_RECIP_BITS)
    return At, Bt


def selfguided_restoration(dgd_ext: np.ndarray, w: int, h: int, ep: int,
                           bd: int = 8):
    """(flt0, flt1) int64 (h, w) from a (h+6, w+6) extended source block
    (3-pixel context on every side, already boundary-substituted)."""
    r0, r1, s0, s1 = SGR_PARAMS[ep]
    from . import mc_native

    if mc_native.available():
        d32 = np.ascontiguousarray(dgd_ext, np.int32)
        return mc_native.sgr_selfguided(d32, w, h, ep, bd, r0 > 0, r1 > 0)
    flt0 = flt1 = None
    # A/B needed on rows/cols [-1, h+1) x [-1, w+1) of the unit
    if r0 > 0:  # fast path, radius 2, A/B on every other row
        A = _boxsum(dgd_ext, r0, True)[_BORDER - 1:_BORDER + h + 1,
                                       _BORDER - 1:_BORDER + w + 1]
        B = _boxsum(dgd_ext, r0, False)[_BORDER - 1:_BORDER + h + 1,
                                        _BORDER - 1:_BORDER + w + 1]
        At, Bt = _ab_transform(A, B, r0, s0, bd)
        dgd = dgd_ext[_BORDER:_BORDER + h, _BORDER:_BORDER + w].astype(np.int64)
        flt0 = np.empty((h, w), np.int64)
        # unit row i maps to A-grid row i+1; even unit rows blend the odd
        # neighbours, odd rows use their own (restoration.c:775-800)
        for parity, nb, rows in ((0, 5, None), (1, 4, None)):
            ii = np.arange(parity, h, 2)
            k = ii + 1
            if parity == 0:
                a = ((At[k - 1, 1:w + 1] + At[k + 1, 1:w + 1]) * 6
                     + (At[k - 1, 0:w] + At[k + 1, 0:w]
                        + At[k - 1, 2:w + 2] + At[k + 1, 2:w + 2]) * 5)
                b = ((Bt[k - 1, 1:w + 1] + Bt[k + 1, 1:w + 1]) * 6
                     + (Bt[k - 1, 0:w] + Bt[k + 1, 0:w]
                        + Bt[k - 1, 2:w + 2] + Bt[k + 1, 2:w + 2]) * 5)
            else:
                a = At[k, 1:w + 1] * 6 + (At[k, 0:w] + At[k, 2:w + 2]) * 5
                b = Bt[k, 1:w + 1] * 6 + (Bt[k, 0:w] + Bt[k, 2:w + 2]) * 5
            v = a * dgd[ii] + b
            flt0[ii] = _rpot(v, SGRPROJ_SGR_BITS + nb - SGRPROJ_RST_BITS)
    if r1 > 0:
        A = _boxsum(dgd_ext, r1, True)[_BORDER - 1:_BORDER + h + 1,
                                       _BORDER - 1:_BORDER + w + 1]
        B = _boxsum(dgd_ext, r1, False)[_BORDER - 1:_BORDER + h + 1,
                                        _BORDER - 1:_BORDER + w + 1]
        At, Bt = _ab_transform(A, B, r1, s1, bd)
        dgd = dgd_ext[_BORDER:_BORDER + h, _BORDER:_BORDER + w].astype(np.int64)
        c = At[1:h + 1, 1:w + 1]
        a = ((c + At[1:h + 1, 0:w] + At[1:h + 1, 2:w + 2]
              + At[0:h, 1:w + 1] + At[2:h + 2, 1:w + 1]) * 4
             + (At[0:h, 0:w] + At[0:h, 2:w + 2]
                + At[2:h + 2, 0:w] + At[2:h + 2, 2:w + 2]) * 3)
        cb = Bt[1:h + 1, 1:w + 1]
        b = ((cb + Bt[1:h + 1, 0:w] + Bt[1:h + 1, 2:w + 2]
              + Bt[0:h, 1:w + 1] + Bt[2:h + 2, 1:w + 1]) * 4
             + (Bt[0:h, 0:w] + Bt[0:h, 2:w + 2]
                + Bt[2:h + 2, 0:w] + Bt[2:h + 2, 2:w + 2]) * 3)
        v = a * dgd + b
        flt1 = _rpot(v, SGRPROJ_SGR_BITS + 5 - SGRPROJ_RST_BITS)
    return flt0, flt1


def decode_xq(xqd, ep: int):
    r0, r1, _, _ = SGR_PARAMS[ep]
    if r0 == 0:
        return 0, (1 << SGRPROJ_PRJ_BITS) - xqd[1]
    if r1 == 0:
        return xqd[0], 0
    return xqd[0], (1 << SGRPROJ_PRJ_BITS) - xqd[0] - xqd[1]


def sgr_filter_block(dgd_ext: np.ndarray, w: int, h: int, ep: int, xqd,
                     bd: int = 8) -> np.ndarray:
    """Normative SGR on one stripe block (svt_apply_selfguided_restoration_c
    analog); dgd_ext is the (h+6, w+6) boundary-substituted source."""
    r0, r1, _, _ = SGR_PARAMS[ep]
    flt0, flt1 = selfguided_restoration(dgd_ext, w, h, ep, bd)
    xq0, xq1 = decode_xq(xqd, ep)
    u = dgd_ext[_BORDER:_BORDER + h, _BORDER:_BORDER + w].astype(np.int64) \
        << SGRPROJ_RST_BITS
    v = u << SGRPROJ_PRJ_BITS
    if r0 > 0:
        v = v + xq0 * (flt0 - u)
    if r1 > 0:
        v = v + xq1 * (flt1 - u)
    out = _rpot(v, SGRPROJ_PRJ_BITS + SGRPROJ_RST_BITS)
    return np.clip(out, 0, (1 << bd) - 1)


def _encode_xq(xq, ep: int):
    r0, r1, _, _ = SGR_PARAMS[ep]
    if r0 == 0:
        xqd0 = 0
        xqd1 = int(np.clip((1 << SGRPROJ_PRJ_BITS) - xq[1],
                           SGRPROJ_PRJ_MIN1, SGRPROJ_PRJ_MAX1))
    elif r1 == 0:
        xqd0 = int(np.clip(xq[0], SGRPROJ_PRJ_MIN0, SGRPROJ_PRJ_MAX0))
        xqd1 = int(np.clip((1 << SGRPROJ_PRJ_BITS) - xqd0,
                           SGRPROJ_PRJ_MIN1, SGRPROJ_PRJ_MAX1))
    else:
        xqd0 = int(np.clip(xq[0], SGRPROJ_PRJ_MIN0, SGRPROJ_PRJ_MAX0))
        xqd1 = int(np.clip((1 << SGRPROJ_PRJ_BITS) - xqd0 - xq[1],
                           SGRPROJ_PRJ_MIN1, SGRPROJ_PRJ_MAX1))
    return xqd0, xqd1


def search_sgr_unit(src: np.ndarray, dgd_ext: np.ndarray, w: int, h: int,
                    bd: int = 8, eps=range(16)):
    """Best (ep, (xqd0, xqd1), sse) for one unit (restoration_pick.c:542
    search_selfguided_restoration): per ep, least-squares projection
    (get_proj_subspace) + exact SSE with the encoded xqd."""
    s = (src.astype(np.float64) * (1 << SGRPROJ_RST_BITS))
    u = (dgd_ext[_BORDER:_BORDER + h, _BORDER:_BORDER + w].astype(np.float64)
         * (1 << SGRPROJ_RST_BITS))
    d = s - u
    best = None
    u_int = (dgd_ext[_BORDER:_BORDER + h, _BORDER:_BORDER + w]
             .astype(np.int64) << SGRPROJ_RST_BITS)
    src_i = src.astype(np.int64)
    peak = (1 << bd) - 1
    for ep in eps:
        r0, r1, _, _ = SGR_PARAMS[ep]
        flt0, flt1 = selfguided_restoration(dgd_ext, w, h, ep, bd)
        f0 = (flt0 - u) if r0 > 0 else None
        f1 = (flt1 - u) if r1 > 0 else None
        if f0 is not None and f1 is not None:
            h00 = float((f0 * f0).mean())
            h11 = float((f1 * f1).mean())
            h01 = float((f0 * f1).mean())
            c0 = float((f0 * d).mean())
            c1 = float((f1 * d).mean())
            det = h00 * h11 - h01 * h01
            if det < 1e-8:
                xq = (0, 0)
            else:
                xq = (int(np.rint((h11 * c0 - h01 * c1) / det * 128)),
                      int(np.rint((h00 * c1 - h01 * c0) / det * 128)))
        elif f0 is not None:
            h00 = float((f0 * f0).mean())
            xq = ((int(np.rint((f0 * d).mean() / h00 * 128))
                   if h00 >= 1e-8 else 0), 0)
        else:
            h11 = float((f1 * f1).mean())
            xq = (0, (int(np.rint((f1 * d).mean() / h11 * 128))
                      if h11 >= 1e-8 else 0))
        xqd = _encode_xq(xq, ep)
        # exact SSE with the encoded xqd, reusing this ep's filters
        xq0, xq1 = decode_xq(xqd, ep)
        v = u_int << SGRPROJ_PRJ_BITS
        if r0 > 0:
            v = v + xq0 * (flt0 - u_int)
        if r1 > 0:
            v = v + xq1 * (flt1 - u_int)
        rec = np.clip(_rpot(v, SGRPROJ_PRJ_BITS + SGRPROJ_RST_BITS), 0, peak)
        sse = int(((rec - src_i) ** 2).sum())
        if best is None or sse < best[2]:
            best = (ep, xqd, sse)
    return best
