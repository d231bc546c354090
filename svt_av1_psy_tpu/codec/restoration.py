"""Loop restoration (Wiener), normative (spec §7.17).

Behavior reference: restoration.c (stripe mechanics: foreach_rest_unit_in_tile
:1250, get_stripe_boundary_info :257, setup_processing_stripe_boundary :288,
boundary saving :1522-1700), convolve.c (svt_av1_wiener_convolve_add_src_c
:100 — "add src" separable 7-tap with round_0=3/round_1=11), restoration.h
(tap ranges :130-153), entropy_coding.c (frame header :2168, per-SB unit
coeffs :4010, subexp primitives :2805-2934).

Round-1 scope: RESTORE_WIENER / RESTORE_NONE per plane (7-tap luma,
5-tap chroma), unit size 64 (chroma 32), single-LR-tile layout (the
reference also treats the whole frame as one LR tile, restoration.c:1444).
SGRPROJ is future work. The filter path is dav1d-verified bit-exact
including stripe-boundary substitution.
"""

from __future__ import annotations

import numpy as np

RESTORE_NONE = 0
RESTORE_WIENER = 1
RESTORE_SGRPROJ = 2
RESTORE_SWITCHABLE = 3

PROC_UNIT = 64          # RESTORATION_PROC_UNIT_SIZE
UNIT_OFFSET = 8         # RESTORATION_UNIT_OFFSET
BORDER = 3              # RESTORATION_BORDER (also EXTRA_HORZ)
CTX_VERT = 2            # RESTORATION_CTX_VERT
FILTER_BITS = 7
ROUND0 = 3              # WIENER_ROUND0_BITS (8/10-bit)

# tap (min, max, mid, subexp k) for taps 0..2 (restoration.h:130-153)
TAPS = ((-5, 10, 3, 1), (-23, 8, -7, 2), (-17, 46, 15, 3))
DEFAULT_TAPS = (3, -7, 15)


def _kernel(taps):
    t0, t1, t2 = taps
    return np.array([t0, t1, t2, -2 * (t0 + t1 + t2), t2, t1, t0, 0], np.int64)


def wiener_filter_block(src_ext: np.ndarray, w: int, h: int, htaps, vtaps,
                        bd: int = 8) -> np.ndarray:
    """Exact Wiener convolve-add-src on one stripe block.

    src_ext: (h + 6, w + 6) source with 3-pixel context on every side
    (already stripe-boundary-substituted). Returns (h, w)."""
    kh = _kernel(htaps)
    kv = _kernel(vtaps)
    x = src_ext.astype(np.int64)
    # horizontal pass over all h+6 rows, producing w columns
    lim = 1 << (bd + 1 + FILTER_BITS - ROUND0)
    acc = np.zeros((h + 6, w), np.int64)
    for k in range(7):
        acc += kh[k] * x[:, k : k + w]
    acc += (x[:, 3 : 3 + w] << FILTER_BITS) + (1 << (bd + FILTER_BITS - 1))
    tmp = np.clip((acc + (1 << (ROUND0 - 1))) >> ROUND0, 0, lim - 1)
    # vertical pass
    round1 = 2 * FILTER_BITS - ROUND0
    acc = np.zeros((h, w), np.int64)
    for k in range(7):
        acc += kv[k] * tmp[k : k + h, :]
    acc += (tmp[3 : 3 + h, :] << FILTER_BITS) - (1 << (bd + round1 - 1))
    out = (acc + (1 << (round1 - 1))) >> round1
    return np.clip(out, 0, (1 << bd) - 1)


class PlaneRestoration:
    """Per-plane LR state: unit grid, boundary rows, unit info."""

    def __init__(self, crop_w: int, crop_h: int, ss: int, unit_size: int = 64):
        self.w, self.h, self.ss = crop_w, crop_h, ss
        self.size = unit_size >> 0 if ss == 0 else unit_size >> 1
        self.hunits = max((crop_w + (self.size >> 1)) // self.size, 1)
        self.vunits = max((crop_h + (self.size >> 1)) // self.size, 1)
        # unit_info[row][col] = None (RESTORE_NONE), ("W", (h_taps, v_taps))
        # or ("S", ep, (xqd0, xqd1))
        self.unit_info = [[None] * self.hunits for _ in range(self.vunits)]
        self.frame_type = RESTORE_NONE

    def unit_limits(self, ui: int, uj: int):
        """(v0, v1, h0, h1) of unit (ui, uj) (foreach_rest_unit_in_tile)."""
        ext = self.size * 3 // 2
        voff = UNIT_OFFSET >> self.ss
        y0, i = 0, 0
        while True:
            rem = self.h - y0
            hh = rem if rem < ext else self.size
            v0 = max(0, y0 - voff)
            v1 = y0 + hh - (voff if y0 + hh < self.h else 0)
            if i == ui:
                break
            y0 += hh
            i += 1
        x0, j = 0, 0
        while True:
            rem = self.w - x0
            ww = rem if rem < ext else self.size
            if j == uj:
                break
            x0 += ww
            j += 1
        return v0, v1, x0, x0 + ww


def save_boundary_rows(deblock: np.ndarray, cdef: np.ndarray, crop_w: int,
                       crop_h: int, ss: int):
    """(above, below) boundary row stores per frame stripe
    (save_tile_row_boundary_lines :1607): interior boundaries from the
    deblocked frame, frame top/bottom from the CDEF output (duplicated).
    Rows are crop-width, padded by BORDER on each side."""
    stripe_h = PROC_UNIT >> ss
    off = UNIT_OFFSET >> ss
    above, below = [], []

    def padrow(row):
        return np.pad(row[:crop_w], (BORDER, BORDER), mode="edge")

    s = 0
    while True:
        y0 = max(0, s * stripe_h - off)
        if y0 >= crop_h:
            break
        y1 = min((s + 1) * stripe_h - off, crop_h)
        if s > 0:
            a = [padrow(deblock[min(y0 - 2 + i, crop_h - 1)]) for i in range(CTX_VERT)]
        else:
            a = [padrow(cdef[y0])] * CTX_VERT
        if y1 < crop_h:
            b = [padrow(deblock[min(y1 + i, crop_h - 1)]) for i in range(CTX_VERT)]
        else:
            b = [padrow(cdef[y1 - 1])] * CTX_VERT
        above.append(np.stack(a))
        below.append(np.stack(b))
        s += 1
    return above, below


def filter_unit(ext: np.ndarray, pr: PlaneRestoration, above, below,
                v0, v1, h0, h1, info, bd) -> np.ndarray:
    """Filter one restoration unit from the extended CDEF plane `ext`
    ((crop_h + 6, crop_w + 6), edge-padded by BORDER). Returns the filtered
    (v1 - v0, h1 - h0) block (svt_av1_loop_restoration_filter_unit :1067)."""
    kind = info[0]
    stripe_h = PROC_UNIT >> pr.ss
    off = UNIT_OFFSET >> pr.ss
    out = np.empty((v1 - v0, h1 - h0), np.int64)
    i = 0
    while v0 + i < v1:
        vs = v0 + i
        stripe = (vs + off) // stripe_h
        nominal = stripe_h - (off if stripe == 0 else 0)
        h = min(nominal, v1 - vs)
        first = vs == 0
        last = vs + (stripe_h - (off if stripe == 0 else 0)) >= pr.h
        # local (h+6, w+6) source with boundary substitution
        blk = ext[vs : vs + h + 6, h0 : h1 + 6].copy()
        cols = slice(h0, h1 + 6)
        if not first:   # copy_above: rows [a0, a0, a1]
            a = above[stripe]
            blk[0] = a[0][cols]
            blk[1] = a[0][cols]
            blk[2] = a[1][cols]
        if not last:    # copy_below: rows [b0, b1, b1]
            b = below[stripe]
            blk[h + 3] = b[0][cols]
            blk[h + 4] = b[1][cols]
            blk[h + 5] = b[1][cols]
        if kind == "W":
            htaps, vtaps = info[1]
            out[i : i + h] = wiener_filter_block(blk, h1 - h0, h, htaps,
                                                 vtaps, bd)
        else:
            from .sgr import sgr_filter_block

            out[i : i + h] = sgr_filter_block(blk, h1 - h0, h, info[1],
                                              info[2], bd)
        i += h
    return out


def apply_restoration(cdef_planes, deblock_planes, rsts, bd: int = 8):
    """Apply LR in place over the visible crop of each plane.

    cdef_planes/deblock_planes: per-plane full (aligned) arrays; rsts:
    per-plane PlaneRestoration (or None). The filter input is the CDEF
    output; dst replaces the crop region."""
    for plane, pr in enumerate(rsts):
        if pr is None or pr.frame_type == RESTORE_NONE:
            continue
        img = cdef_planes[plane]
        crop = img[: pr.h, : pr.w].astype(np.int64)
        ext = np.pad(crop, BORDER, mode="edge")
        above, below = save_boundary_rows(deblock_planes[plane], crop,
                                          pr.w, pr.h, pr.ss)
        dst = crop.copy()
        for ui in range(pr.vunits):
            for uj in range(pr.hunits):
                info = pr.unit_info[ui][uj]
                if info is None:
                    continue
                v0, v1, h0, h1 = pr.unit_limits(ui, uj)
                dst[v0:v1, h0:h1] = filter_unit(ext, pr, above, below,
                                                v0, v1, h0, h1, info, bd)
        img[: pr.h, : pr.w] = dst.astype(img.dtype)


# ------------------------------------------------------------------ search

def _lls(X, r):
    """Least squares via normal equations (the systems are 2x2/3x3; a full
    SVD per unit was the LR search hot spot)."""
    A = X.T @ X
    b = X.T @ r
    try:
        return np.linalg.solve(A, b)
    except np.linalg.LinAlgError:
        return np.linalg.lstsq(X, r, rcond=None)[0]


def _solve_taps(dgd_ext: np.ndarray, src: np.ndarray, iters: int = 2,
                chroma: bool = False):
    """Alternating least squares for the separable Wiener taps on one unit.
    dgd_ext: (h + 6, w + 6). Approximates the pipeline as pure linear
    filtering (the exact filter is used for the final SSE decision).
    chroma: 5-tap window (tap0 constrained to 0)."""
    h, w = src.shape
    d = dgd_ext.astype(np.float64)
    s = src.astype(np.float64)
    taps_h = [0, DEFAULT_TAPS[1], DEFAULT_TAPS[2]] if chroma else list(DEFAULT_TAPS)
    taps_v = list(taps_h)

    def conv_h(x, taps):
        k = _kernel(taps).astype(np.float64)
        out = 128.0 * x[:, 3 : 3 + w]
        for i in range(7):
            out += k[i] * x[:, i : i + w]
        return out

    def conv_v(x, taps):
        k = _kernel(taps).astype(np.float64)
        out = 128.0 * x[3 : 3 + h, :]
        for i in range(7):
            out += k[i] * x[i : i + h, :]
        return out

    for _ in range(iters):
        # fix h, solve v
        inter = conv_h(d, taps_h)               # (h+6, w)
        base = 128.0 * inter[3 : 3 + h]
        cols = []
        for i in range(3):
            cols.append((inter[i : i + h] + inter[6 - i : 6 - i + h]
                         - 2.0 * inter[3 : 3 + h]).ravel())
        if chroma:
            t = _lls(np.stack(cols[1:], axis=1),
                     (128.0 * 128.0 * s - base).ravel())
            taps_v = [0] + [int(np.clip(round(t[i]), TAPS[i + 1][0], TAPS[i + 1][1]))
                            for i in range(2)]
        else:
            X = np.stack(cols, axis=1)
            r = (128.0 * 128.0 * s - base).ravel()
            t = _lls(X, r)
            taps_v = [int(np.clip(round(t[i]), TAPS[i][0], TAPS[i][1])) for i in range(3)]
        # fix v, solve h
        interv = conv_v(d, taps_v)              # (h, w+6)
        base = 128.0 * interv[:, 3 : 3 + w]
        cols = []
        for i in range(3):
            cols.append((interv[:, i : i + w] + interv[:, 6 - i : 6 - i + w]
                         - 2.0 * interv[:, 3 : 3 + w]).ravel())
        if chroma:
            t = _lls(np.stack(cols[1:], axis=1),
                     (128.0 * 128.0 * s - base).ravel())
            taps_h = [0] + [int(np.clip(round(t[i]), TAPS[i + 1][0], TAPS[i + 1][1]))
                            for i in range(2)]
        else:
            X = np.stack(cols, axis=1)
            r = (128.0 * 128.0 * s - base).ravel()
            t = _lls(X, r)
            taps_h = [int(np.clip(round(t[i]), TAPS[i][0], TAPS[i][1])) for i in range(3)]
    return tuple(taps_h), tuple(taps_v)


def pick_lr(src_plane, cdef_plane, deblock_plane, crop_w, crop_h, ss,
            bd: int = 8, unit_size: int = 64,
            enable_sgr: bool = True, sgr_eps_step: int = 1,
            backend: str = "host") -> PlaneRestoration:
    """Per-unit restoration search (restoration_pick.c:1611 analog):
    Wiener (alternating LS taps) vs SGRPROJ (projection search over the 16
    parameter sets) vs NONE by exact SSE; the frame type becomes WIENER /
    SGRPROJ when one tool wins everywhere, else RESTORE_SWITCHABLE.

    backend="device" moves the SGRPROJ parameter sweep to the accelerator
    (ops/lr_search.sgr_search_units): one jitted whole-plane program
    estimates every ep's projected SSE; the host then runs the exact
    integer filter only for each unit's winning ep (the committed filter
    and its SSE stay exact — the device pass only picks which ep to try)."""
    if sgr_eps_step <= 0:
        enable_sgr = False
        sgr_eps_step = 1
    pr = PlaneRestoration(crop_w, crop_h, ss, unit_size)
    crop = np.asarray(cdef_plane)[:crop_h, :crop_w].astype(np.int64)
    ext = np.pad(crop, BORDER, mode="edge")
    above, below = save_boundary_rows(np.asarray(deblock_plane), crop,
                                      crop_w, crop_h, ss)
    src = np.asarray(src_plane)[:crop_h, :crop_w].astype(np.int64)
    dev_sgr = None
    if enable_sgr and backend == "device":
        from ..ops.lr_search import sgr_search_units

        try:
            dev_sgr = sgr_search_units(src, crop, pr, bd,
                                       eps=range(0, 16, sgr_eps_step))
        except Exception:
            from ..log import svt_warn

            svt_warn("device SGR sweep unavailable; host search")
    kinds = set()
    for ui in range(pr.vunits):
        for uj in range(pr.hunits):
            v0, v1, h0, h1 = pr.unit_limits(ui, uj)
            # decoder-compat guard: dav1d 1.0.0 (the conformance target on
            # this host) segfaults filtering a *merged* chroma unit (last
            # unit wider/taller than the nominal size from the half-unit
            # merge rule, spec 5.9.20). Leave such units RESTORE_NONE;
            # libaom decodes them fine, dav1d crashes (verified: widths
            # 129..158, chroma units 33..47 px wide). Bounded loss: a
            # <16-px-wide strip stays unrestored at those geometries.
            if ss and (h1 - h0 > pr.size or v1 - v0 > pr.size):
                continue
            s = src[v0:v1, h0:h1]
            base_sse = int(((crop[v0:v1, h0:h1] - s) ** 2).sum())
            # near-lossless unit: no restoration tool can pay for its
            # coefficients (sub-1/16-px avg error) -> skip the search
            if base_sse < (s.size >> 4):
                continue
            taps = _solve_taps(ext[v0 : v1 + 6, h0 : h1 + 6], s, chroma=ss > 0)
            info = ("W", taps)
            filt = filter_unit(ext, pr, above, below, v0, v1, h0, h1, info, bd)
            sse = int(((filt - s) ** 2).sum())
            if enable_sgr:
                if dev_sgr is not None:
                    ep, xqd, _ = dev_sgr[(ui, uj)]
                else:
                    from .sgr import search_sgr_unit

                    ep, xqd, _ = search_sgr_unit(
                        s, ext[v0 : v1 + 6, h0 : h1 + 6], h1 - h0, v1 - v0,
                        bd, eps=range(0, 16, sgr_eps_step))
                sinfo = ("S", ep, xqd)
                sfilt = filter_unit(ext, pr, above, below, v0, v1, h0, h1,
                                    sinfo, bd)
                ssse = int(((sfilt - s) ** 2).sum())
                if ssse < sse:
                    info, sse = sinfo, ssse
            # small margin so near-ties do not pay the coefficient cost
            if sse + (base_sse >> 8) < base_sse:
                pr.unit_info[ui][uj] = info
                kinds.add(info[0])
    if not kinds:
        pr.frame_type = RESTORE_NONE
    elif kinds == {"W"}:
        pr.frame_type = RESTORE_WIENER
    elif kinds == {"S"}:
        pr.frame_type = RESTORE_SGRPROJ
    else:
        pr.frame_type = RESTORE_SWITCHABLE
    return pr


def pick_wiener(src_plane, cdef_plane, deblock_plane, crop_w, crop_h, ss,
                bd: int = 8, unit_size: int = 64) -> PlaneRestoration:
    """Wiener-only search (round-1 interface; see pick_lr)."""
    return pick_lr(src_plane, cdef_plane, deblock_plane, crop_w, crop_h, ss,
                   bd, unit_size, enable_sgr=False)


# ------------------------------------------------------------------ syntax

def _recenter_nonneg(r, v):
    if v > 2 * r:
        return v
    if v >= r:
        return (v - r) << 1
    return ((r - v) << 1) - 1


def _recenter_finite(n, r, v):
    if 2 * r <= n:
        return _recenter_nonneg(r, v)
    return _recenter_nonneg(n - 1 - r, n - 1 - v)


def write_primitive_subexpfin(enc, n: int, k: int, v: int):
    """Finite subexponential code (entropy_coding.c:2859), on the range
    coder's equiprobable-bit path."""
    i = mk = 0
    while True:
        b = k + i - 1 if i else k
        a = 1 << b
        if n <= mk + 3 * a:
            _write_primitive_quniform(enc, n - mk, v - mk)
            break
        t = int(v >= mk + a)
        enc.encode_literal(t, 1)
        if t:
            i += 1
            mk += a
        else:
            enc.encode_literal(v - mk, b)
            break


def _write_primitive_quniform(enc, n: int, v: int):
    if n <= 1:
        return
    l = (n - 1).bit_length()
    m = (1 << l) - n
    if v < m:
        enc.encode_literal(v, l - 1)
    else:
        enc.encode_literal(m + ((v - m) >> 1), l - 1)
        enc.encode_literal((v - m) & 1, 1)


def write_refsubexpfin(enc, n: int, k: int, ref: int, v: int):
    write_primitive_subexpfin(enc, n, k, _recenter_finite(n, ref, v))


def _write_wiener_payload(enc, taps, refs, is_chroma: bool):
    """Tap coding vs the running reference (write_wiener_filter
    entropy_coding.c:3935). Updates refs in place."""
    htaps, vtaps = taps
    for filt, ref in ((vtaps, refs["v"]), (htaps, refs["h"])):
        for i in range(3):
            mn, mx, _, k = TAPS[i]
            if i == 0 and is_chroma:
                continue   # 5-tap chroma window: tap0 fixed 0, not coded
            write_refsubexpfin(enc, mx - mn + 1, k, ref[i] - mn, filt[i] - mn)
        ref[:] = list(filt)


# SgrprojInfo reference init (restoration.h:245): midpoints of the ranges,
# C truncating division: (-96+31)/2 = -32, (-32+95)/2 = 31
SGR_XQD_REF_INIT = (-32, 31)


def _write_sgr_payload(enc, ep: int, xqd, refs):
    """ep literal + xqd subexp coding vs the running reference
    (write_sgrproj_filter, entropy_coding.c:3976). Updates refs in place."""
    from .sgr import (SGR_PARAMS, SGRPROJ_PRJ_MAX0, SGRPROJ_PRJ_MAX1,
                      SGRPROJ_PRJ_MIN0, SGRPROJ_PRJ_MIN1,
                      SGRPROJ_PRJ_SUBEXP_K)

    enc.encode_literal(ep, 4)
    r0, r1 = SGR_PARAMS[ep][0], SGR_PARAMS[ep][1]
    ref = refs["sgr"]
    k = SGRPROJ_PRJ_SUBEXP_K
    if r0 == 0:
        write_refsubexpfin(enc, SGRPROJ_PRJ_MAX1 - SGRPROJ_PRJ_MIN1 + 1, k,
                           ref[1] - SGRPROJ_PRJ_MIN1, xqd[1] - SGRPROJ_PRJ_MIN1)
    elif r1 == 0:
        write_refsubexpfin(enc, SGRPROJ_PRJ_MAX0 - SGRPROJ_PRJ_MIN0 + 1, k,
                           ref[0] - SGRPROJ_PRJ_MIN0, xqd[0] - SGRPROJ_PRJ_MIN0)
    else:
        write_refsubexpfin(enc, SGRPROJ_PRJ_MAX0 - SGRPROJ_PRJ_MIN0 + 1, k,
                           ref[0] - SGRPROJ_PRJ_MIN0, xqd[0] - SGRPROJ_PRJ_MIN0)
        write_refsubexpfin(enc, SGRPROJ_PRJ_MAX1 - SGRPROJ_PRJ_MIN1 + 1, k,
                           ref[1] - SGRPROJ_PRJ_MIN1, xqd[1] - SGRPROJ_PRJ_MIN1)
    ref[:] = [int(xqd[0]), int(xqd[1])]


def write_lr_unit(fc, enc, frame_type: int, info, refs, is_chroma: bool):
    """One unit's LR syntax under the plane's frame restoration type
    (loop_restoration_write_sb_coeffs, entropy_coding.c:4009)."""
    if frame_type == RESTORE_WIENER:
        fc.write(enc, "wiener_restore", (), int(info is not None), 2)
        if info is not None:
            _write_wiener_payload(enc, info[1], refs, is_chroma)
    elif frame_type == RESTORE_SGRPROJ:
        fc.write(enc, "sgrproj_restore", (), int(info is not None), 2)
        if info is not None:
            _write_sgr_payload(enc, info[1], info[2], refs)
    else:  # RESTORE_SWITCHABLE
        t = 0 if info is None else (RESTORE_WIENER if info[0] == "W"
                                    else RESTORE_SGRPROJ)
        fc.write(enc, "switchable_restore", (), t, 3)
        if t == RESTORE_WIENER:
            _write_wiener_payload(enc, info[1], refs, is_chroma)
        elif t == RESTORE_SGRPROJ:
            _write_sgr_payload(enc, info[1], info[2], refs)


def write_wiener_unit(fc, enc, info, refs, is_chroma: bool):
    """Round-1 interface kept for the unit tests: WIENER frame type."""
    write_lr_unit(fc, enc, RESTORE_WIENER, info, refs, is_chroma)


def lr_units_in_sb(pr: PlaneRestoration, mi_row: int, mi_col: int,
                   sb_mi: int = 16, sr_denom: int = 8):
    """Restoration units whose top-left corner falls inside this SB
    (svt_av1_loop_restoration_corners_in_sb :1427, single LR tile).
    With superres the LR grid lives on the UPSCALED frame, so unit
    columns scale by SuperresDenom/8 (spec 5.11.57 numerator/denominator);
    rows are unaffected (superres is horizontal-only)."""
    mi_size = 4 >> pr.ss
    size = pr.size
    r0 = (mi_row * mi_size + size - 1) // size
    r1 = min(((mi_row + sb_mi) * mi_size + size - 1) // size, pr.vunits)
    numer = mi_size * sr_denom
    denom = size * 8
    c0 = (mi_col * numer + denom - 1) // denom
    c1 = min(((mi_col + sb_mi) * numer + denom - 1) // denom, pr.hunits)
    return [(r, c) for r in range(r0, r1) for c in range(c0, c1)]
