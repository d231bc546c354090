"""Device (TPU) loop-restoration search: the SGRPROJ parameter sweep.

The host LR search (codec/restoration.pick_lr) runs the self-guided
filter once per (unit, ep) — the dominant cost of the restoration stage
at quality presets (~half of pick_lr). This module computes, in ONE
jitted program per plane, the whole-plane self-guided filter pair for
every candidate ep and the per-tile Gram/correlation sums
    [f0*f0, f0*f1, f1*f1, f0*d, f1*d, d*d]
(f = flt - dgd<<4, d = src<<4 - dgd<<4) that the projection solve needs.
The host then solves the 2x2 LS per unit (same math as
codec/sgr.search_sgr_unit), estimates each ep's SSE analytically from the
quadratic form, picks the best ep, and runs the exact integer filter once
for that ep only — an 8x cut in host selfguided work plus the sweep moved
on-device.

Behavior reference: restoration_pick.c:413-640 (get_proj_subspace /
search_selfguided_restoration); the filter math mirrors
codec/sgr.selfguided_restoration (restoration.c:468-1010) with one
documented drift: the z index of the A/B nonlinearity is computed in f32
(TPU has no int64 lanes), which can differ by +/-1 at table boundaries —
search-only drift; the committed filter is the exact host one.

Tile sums use the plane's unit grid (partial edge tiles zero-padded, so
merged units are exact sums of their tiles).
"""

from __future__ import annotations

import functools

import numpy as np

from ..codec.sgr import (ONE_BY_X, SGR_PARAMS, SGRPROJ_MTABLE_BITS,
                         SGRPROJ_PRJ_BITS, SGRPROJ_RECIP_BITS,
                         SGRPROJ_RST_BITS, SGRPROJ_SGR, SGRPROJ_SGR_BITS,
                         X_BY_XPLUS1, _encode_xq, decode_xq)

_BORDER = 3


def _jnp():
    import jax.numpy as jnp
    return jnp


def _rpot(x, n):
    return (x + (1 << (n - 1))) >> n if n > 0 else x


def _boxsum_j(x, r):
    """Edge-truncated (2r+1)-box sums (codec/sgr._boxsum), int32."""
    jnp = _jnp()
    h, w = x.shape
    cs = jnp.concatenate([jnp.zeros((1, w), x.dtype),
                          jnp.cumsum(x, axis=0)], axis=0)
    i = np.arange(h)
    v = cs[np.minimum(i + r + 1, h)] - cs[np.maximum(i - r, 0)]
    cs2 = jnp.concatenate([jnp.zeros((h, 1), x.dtype),
                           jnp.cumsum(v, axis=1)], axis=1)
    j = np.arange(w)
    return cs2[:, np.minimum(j + r + 1, w)] - cs2[:, np.maximum(j - r, 0)]


def _ab_transform_j(A, B, r, s, bd):
    """A/B nonlinearity; z in f32 (search-only +/-1 drift at boundaries)."""
    jnp = _jnp()
    n = (2 * r + 1) * (2 * r + 1)
    a = _rpot(A, 2 * (bd - 8))
    b = _rpot(B, bd - 8)
    p = jnp.maximum(a * n - b * b, 0)
    z = jnp.floor((p.astype(jnp.float32) * float(s)
                   + float(1 << (SGRPROJ_MTABLE_BITS - 1)))
                  / float(1 << SGRPROJ_MTABLE_BITS)).astype(jnp.int32)
    At = jnp.asarray(X_BY_XPLUS1, jnp.int32)[jnp.clip(z, 0, 255)]
    # (SGR - At) * B fits int32: 256 * 25 * 4095 < 2^26
    Bt = _rpot((SGRPROJ_SGR - At) * B * int(ONE_BY_X[n - 1]),
               SGRPROJ_RECIP_BITS)
    return At, Bt


def _selfguided_j(dgd_ext, H, W, ep, bd):
    """Whole-plane (flt0, flt1) int32; dgd_ext (H+6, W+6) edge-padded."""
    jnp = _jnp()
    r0, r1, s0, s1 = SGR_PARAMS[ep]
    dgd = dgd_ext[_BORDER:_BORDER + H, _BORDER:_BORDER + W]
    flt0 = flt1 = None
    if r0 > 0:
        A = _boxsum_j(dgd_ext * dgd_ext, r0)[_BORDER - 1:_BORDER + H + 1,
                                             _BORDER - 1:_BORDER + W + 1]
        B = _boxsum_j(dgd_ext, r0)[_BORDER - 1:_BORDER + H + 1,
                                   _BORDER - 1:_BORDER + W + 1]
        At, Bt = _ab_transform_j(A, B, r0, s0, bd)
        # even rows blend the odd neighbours, odd rows use their own
        k = np.arange(H) + 1
        a_own = At[k, 1:W + 1] * 6 + (At[k, 0:W] + At[k, 2:W + 2]) * 5
        b_own = Bt[k, 1:W + 1] * 6 + (Bt[k, 0:W] + Bt[k, 2:W + 2]) * 5
        a_nb = ((At[k - 1, 1:W + 1] + At[k + 1, 1:W + 1]) * 6
                + (At[k - 1, 0:W] + At[k + 1, 0:W]
                   + At[k - 1, 2:W + 2] + At[k + 1, 2:W + 2]) * 5)
        b_nb = ((Bt[k - 1, 1:W + 1] + Bt[k + 1, 1:W + 1]) * 6
                + (Bt[k - 1, 0:W] + Bt[k + 1, 0:W]
                   + Bt[k - 1, 2:W + 2] + Bt[k + 1, 2:W + 2]) * 5)
        even = (np.arange(H) % 2 == 0)[:, None]
        # v fits int32 only marginally at 12-bit (a<=8192, dgd<=4095:
        # a*dgd <= 2^25; + b <= 2^26): safe
        v_even = a_nb * dgd + b_nb
        v_odd = a_own * dgd + b_own
        flt0 = jnp.where(
            even,
            _rpot(v_even, SGRPROJ_SGR_BITS + 5 - SGRPROJ_RST_BITS),
            _rpot(v_odd, SGRPROJ_SGR_BITS + 4 - SGRPROJ_RST_BITS))
    if r1 > 0:
        A = _boxsum_j(dgd_ext * dgd_ext, r1)[_BORDER - 1:_BORDER + H + 1,
                                             _BORDER - 1:_BORDER + W + 1]
        B = _boxsum_j(dgd_ext, r1)[_BORDER - 1:_BORDER + H + 1,
                                   _BORDER - 1:_BORDER + W + 1]
        At, Bt = _ab_transform_j(A, B, r1, s1, bd)
        a = ((At[1:H + 1, 1:W + 1] + At[1:H + 1, 0:W] + At[1:H + 1, 2:W + 2]
              + At[0:H, 1:W + 1] + At[2:H + 2, 1:W + 1]) * 4
             + (At[0:H, 0:W] + At[0:H, 2:W + 2]
                + At[2:H + 2, 0:W] + At[2:H + 2, 2:W + 2]) * 3)
        b = ((Bt[1:H + 1, 1:W + 1] + Bt[1:H + 1, 0:W] + Bt[1:H + 1, 2:W + 2]
              + Bt[0:H, 1:W + 1] + Bt[2:H + 2, 1:W + 1]) * 4
             + (Bt[0:H, 0:W] + Bt[0:H, 2:W + 2]
                + Bt[2:H + 2, 0:W] + Bt[2:H + 2, 2:W + 2]) * 3)
        v = a * dgd + b
        flt1 = _rpot(v, SGRPROJ_SGR_BITS + 5 - SGRPROJ_RST_BITS)
    return flt0, flt1


def _tile_sums(x, th, tw, T):
    """(th*T, tw*T) f32 -> (th, tw) per-tile sums."""
    return x.reshape(th, T, tw, T).sum(axis=(1, 3))


@functools.partial(__import__("jax").jit,
                   static_argnames=("H", "W", "T", "bd", "eps"))
def _sgr_stats(src, dgd, H: int, W: int, T: int, bd: int, eps: tuple):
    """Per-(ep, tile) projection statistics. src/dgd (H, W) int32 planes
    (already cropped); T = unit size. Returns (n_eps, 6, th, tw) f32."""
    jnp = _jnp()
    th, tw = -(-H // T), -(-W // T)
    Hp, Wp = th * T, tw * T
    dgd_ext = jnp.pad(dgd, _BORDER, mode="edge")
    u = dgd << SGRPROJ_RST_BITS
    d = (src << SGRPROJ_RST_BITS) - u
    d_f = d.astype(jnp.float32)

    def padT(x):
        return jnp.pad(x, ((0, Hp - H), (0, Wp - W)))

    d_p = padT(d_f)
    outs = []
    for ep in eps:
        r0, r1, _, _ = SGR_PARAMS[ep]
        flt0, flt1 = _selfguided_j(dgd_ext, H, W, ep, bd)
        f0 = ((flt0 - u).astype(jnp.float32) if r0 > 0
              else jnp.zeros((H, W), jnp.float32))
        f1 = ((flt1 - u).astype(jnp.float32) if r1 > 0
              else jnp.zeros((H, W), jnp.float32))
        f0p, f1p = padT(f0), padT(f1)
        outs.append(jnp.stack([
            _tile_sums(f0p * f0p, th, tw, T),
            _tile_sums(f0p * f1p, th, tw, T),
            _tile_sums(f1p * f1p, th, tw, T),
            _tile_sums(f0p * d_p, th, tw, T),
            _tile_sums(f1p * d_p, th, tw, T),
            _tile_sums(d_p * d_p, th, tw, T),
        ]))
    return jnp.stack(outs)


def sgr_search_units(src_crop, dgd_crop, pr, bd: int, eps) -> dict:
    """Device SGR parameter sweep for every unit of one plane.

    src_crop/dgd_crop: (crop_h, crop_w) int arrays (source and post-CDEF).
    pr: PlaneRestoration (unit grid). Returns {(ui, uj): (ep, xqd,
    est_sse)} with est_sse in pixel-domain units — callers re-verify with
    the exact integer filter before committing."""
    import jax

    eps = tuple(int(e) for e in eps)
    H, W = src_crop.shape
    T = pr.size
    stats = np.asarray(_sgr_stats(
        jax.device_put(np.ascontiguousarray(src_crop, np.int32)),
        jax.device_put(np.ascontiguousarray(dgd_crop, np.int32)),
        H=H, W=W, T=T, bd=bd, eps=eps))
    th, tw = stats.shape[2], stats.shape[3]
    out = {}
    for ui in range(pr.vunits):
        for uj in range(pr.hunits):
            v0, v1, h0, h1 = pr.unit_limits(ui, uj)
            t0r, t1r = v0 // T, -(-v1 // T)
            t0c, t1c = h0 // T, -(-h1 // T)
            s = stats[:, :, t0r:t1r, t0c:t1c].sum(axis=(2, 3))  # (n_eps, 6)
            npix = float((v1 - v0) * (h1 - h0))
            best = None
            for ei, ep in enumerate(eps):
                h00, h01, h11, c0, c1, dd = (float(x) / npix for x in s[ei])
                r0, r1, _, _ = SGR_PARAMS[ep]
                if r0 > 0 and r1 > 0:
                    det = h00 * h11 - h01 * h01
                    if det < 1e-8:
                        xq = (0, 0)
                    else:
                        xq = (int(np.rint((h11 * c0 - h01 * c1) / det * 128)),
                              int(np.rint((h00 * c1 - h01 * c0) / det * 128)))
                elif r0 > 0:
                    xq = ((int(np.rint(c0 / h00 * 128))
                           if h00 >= 1e-8 else 0), 0)
                else:
                    xq = (0, (int(np.rint(c1 / h11 * 128))
                              if h11 >= 1e-8 else 0))
                xqd = _encode_xq(xq, ep)
                xq0, xq1 = decode_xq(xqd, ep)
                # analytic SSE of the quantized projection, <<4 domain
                q0, q1 = xq0 / 128.0, xq1 / 128.0
                est = (dd - 2.0 * (q0 * c0 + q1 * c1)
                       + q0 * q0 * h00 + 2.0 * q0 * q1 * h01
                       + q1 * q1 * h11) * npix
                if best is None or est < best[2]:
                    best = (ep, xqd, est / 256.0)
            out[(ui, uj)] = best
    return out
