"""ctypes wrapper for native MC/ME kernels (native/mc_native.c).

Bit-identical to codec/convolve.convolve_2d_sr (verified by
tests/test_convolve.py); falls back to the numpy path when the toolchain
is unavailable.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

from .convolve import convolve_2d_sr, get_filter_kernel

_NATIVE = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE / "build" / "libmcnative.so"

_I32P = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_U16P = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
_I64P = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_lib = None
_tried = False

_ZERO8 = np.zeros(8, np.int32)


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src = _NATIVE / "mc_native.c"
    if (not _LIB_PATH.is_file()
            or (src.is_file()
                and src.stat().st_mtime > _LIB_PATH.stat().st_mtime)):
        try:
            _LIB_PATH.parent.mkdir(exist_ok=True)
            subprocess.run(
                ["gcc", "-O3", "-march=native", "-funroll-loops", "-shared", "-fPIC", "-o", str(_LIB_PATH),
                 str(_NATIVE / "mc_native.c")],
                check=True, capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    # raw pointers throughout: ndpointer validation costs ~4us/arg on these
    # hot crossings; wrappers bind arrays to locals for the call's lifetime
    lib.mc_convolve_2d_sr.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_void_p]
    lib.mc_subpel_sad.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_void_p]
    lib.mc_subpel_sad.restype = ctypes.c_int64
    lib.me_sad_grid.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_void_p]
    lib.quantize_txb.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p]
    lib.quantize_txb.restype = ctypes.c_int
    lib.me_search_block.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_void_p]
    lib.filter_intra_pred.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p]
    lib.intra_pred_block.argtypes = [
        ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p]
    lib.intra_dr_pred.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p]
    lib.psy_block_energy.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_void_p]
    lib.psy_distortion_sum.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_void_p]
    lib.psy_distortion_sum.restype = ctypes.c_int64
    lib.psy_distortion_sum_u16.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_void_p]
    lib.psy_distortion_sum_u16.restype = ctypes.c_int64
    lib.cdef_find_dir_blocks.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p]
    lib.inter_decide_frame.argtypes = [
        ctypes.c_void_p, ctypes.c_int,                              # src
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,                # ref_me
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,                # refq
        ctypes.c_void_p, ctypes.c_int,                              # curq
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,                # ref_pad
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,                # gref_me
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,                # grefq
        ctypes.c_void_p, ctypes.c_int,                              # gref_pad
        ctypes.c_void_p, ctypes.c_void_p,                           # filters
        ctypes.c_int, ctypes.c_int, ctypes.c_int,                   # bd ranges
        ctypes.c_int, ctypes.c_int,                                 # gm
        ctypes.c_double, ctypes.c_int, ctypes.c_int,                # psy gate bias
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p,                           # tseeds
        ctypes.c_int, ctypes.c_int,                                 # dists
        ctypes.c_void_p]
    lib.me_subpel_refine_blocks.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p]
    lib.sgr_selfguided.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p]
    lib.deblock_plane_native.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.cdef_filter_blocks.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.ssim_grid_u16.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double]
    lib.ssim_grid_u16.restype = ctypes.c_double
    lib.sse_u16.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_int, ctypes.c_int]
    lib.sse_u16.restype = ctypes.c_double
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _kernels(w, h, sx, sy, interp_x, interp_y):
    fx = get_filter_kernel(interp_x, sx, w) if sx else _ZERO8
    fy = get_filter_kernel(interp_y, sy, h) if sy else _ZERO8
    return np.ascontiguousarray(fx, np.int32), np.ascontiguousarray(fy, np.int32)


def convolve_block(patch: np.ndarray, w: int, h: int, sx: int, sy: int,
                   interp_x: int = 0, interp_y: int = 0, bd: int = 8) -> np.ndarray:
    """Single-block convolve: patch (h+7, w+7) -> (h, w) uint16."""
    lib = _load()
    if lib is None or w > 128 or h > 128:
        return convolve_2d_sr(patch[None], w, h, sx, sy, interp_x, interp_y, bd)[0]
    src = np.ascontiguousarray(patch, np.int32)
    fx, fy = _kernels(w, h, sx, sy, interp_x, interp_y)
    out = np.empty((h, w), np.uint16)
    lib.mc_convolve_2d_sr(src.ctypes.data, src.shape[1], w, h,
                          fx.ctypes.data, fy.ctypes.data,
                          int(sx != 0), int(sy != 0), bd, out.ctypes.data)
    return out


def subpel_sad(patch: np.ndarray, cur: np.ndarray, w: int, h: int, sx: int,
               sy: int, bd: int = 8) -> int:
    lib = _load()
    if lib is None or w > 128 or h > 128:
        pred = convolve_2d_sr(patch[None], w, h, sx, sy, bd=bd)[0].astype(np.int32)
        return int(np.abs(cur - pred).sum())
    src = np.ascontiguousarray(patch, np.int32)
    fx, fy = _kernels(w, h, sx, sy, 0, 0)
    c = np.ascontiguousarray(cur, np.int32)
    return int(lib.mc_subpel_sad(src.ctypes.data, src.shape[1], w, h,
                                 fx.ctypes.data, fy.ctypes.data,
                                 int(sx != 0), int(sy != 0), bd,
                                 c.ctypes.data))


def sad_grid(cur: np.ndarray, ref: np.ndarray, y0: int, y1: int, x0: int,
             x1: int, step: int = 1):
    """argmin SAD over ref windows at offsets [y0,y1) x [x0,x1).
    Returns (dy, dx, sad). Caller guarantees windows in bounds."""
    lib = _load()
    c = np.ascontiguousarray(cur, np.int32)
    r = np.ascontiguousarray(ref, np.int32)
    if lib is None:
        from numpy.lib.stride_tricks import sliding_window_view
        h, w = c.shape
        wins = sliding_window_view(r[y0:, x0:], (h, w))[: y1 - y0 : step, : x1 - x0 : step]
        sads = np.abs(wins.astype(np.int64) - c).sum(axis=(2, 3))
        idx = np.unravel_index(np.argmin(sads), sads.shape)
        return (y0 + idx[0] * step, x0 + idx[1] * step, int(sads[idx]))
    best = np.empty(3, np.int64)
    lib.me_sad_grid(c.ctypes.data, c.shape[1], c.shape[0], r.ctypes.data,
                    r.shape[1], y0, y1, x0, x1, step, best.ctypes.data)
    return (int(best[0]), int(best[1]), int(best[2]))


def search_block(cur, ref, curq, refq, x0, y0, search_range, filters,
                 bd=8, subpel=True):
    """Whole-block ME (HME + full-pel + subpel diamond) in one native call.
    Returns (mv_row, mv_col, sad) with the MV in 1/8-pel units, or None when
    the native library is unavailable (caller falls back to the numpy path)."""
    lib = _load()
    if lib is None:
        return None
    c = np.ascontiguousarray(cur, np.int32)
    cq = np.ascontiguousarray(curq, np.int32)
    out = np.empty(3, np.int64)
    lib.me_search_block(c.ctypes.data, c.shape[1], c.shape[0],
                        ref.ctypes.data, ref.shape[0], ref.shape[1],
                        cq.ctypes.data, cq.shape[1], cq.shape[0],
                        refq.ctypes.data, refq.shape[0], refq.shape[1],
                        x0, y0, search_range, filters.ctypes.data, bd,
                        int(subpel), out.ctypes.data)
    return int(out[0]), int(out[1]), int(out[2])


def inter_decide_frame(src_u16, ref_me, refq, curq, ref_pad, pad, golden,
                       filters8, filters4, bd, search_range, gm_mv, psy_rd,
                       blocks, ref2_gate=4, search_range2=None,
                       inter_bias_pct=100, tseed=None, ref_dists=(1, 1)):
    """Whole-frame open-loop P-frame mode decision in one native call.
    src_u16: padded source luma (uint16 contiguous); ref_me/refq/ref_pad:
    LAST recon (int32), its 1/4 pyramid and the 96-padded MC plane; curq:
    current-frame 1/4 pyramid; golden: (gref_me, grefq, gref_pad) or None.
    blocks: (N, 4) int32 of (x0, y0, W, H). Returns (N, 8) int32 rows
    (use_inter, ref_frame, mode, mv_row, mv_col, mv2_row, mv2_col, 0);
    mode 24 rows are COMPOUND_AVERAGE NEW_NEWMV on the (LAST, ref2) pair.
    Returns None without the lib."""
    lib = _load()
    if lib is None:
        return None
    b = np.ascontiguousarray(blocks, np.int32)
    n = b.shape[0]
    out = np.empty((n, 8), np.int32)
    bx = np.ascontiguousarray(b[:, 0])
    by = np.ascontiguousarray(b[:, 1])
    bw = np.ascontiguousarray(b[:, 2])
    bh = np.ascontiguousarray(b[:, 3])
    if golden is not None:
        gme, gq, gp = golden
        gme_p, gq_p, gp_p = gme.ctypes.data, gq.ctypes.data, gp.ctypes.data
        g_dims = (gme.shape[0], gme.shape[1], gq.shape[0], gq.shape[1],
                  gp.shape[1])
    else:
        gme_p = gq_p = gp_p = None
        g_dims = (0, 0, 0, 0, 0)
    lib.inter_decide_frame(
        src_u16.ctypes.data, src_u16.shape[1],
        ref_me.ctypes.data, ref_me.shape[0], ref_me.shape[1],
        refq.ctypes.data, refq.shape[0], refq.shape[1],
        curq.ctypes.data, curq.shape[1],
        ref_pad.ctypes.data, ref_pad.shape[1], pad,
        gme_p, g_dims[0], g_dims[1],
        gq_p, g_dims[2], g_dims[3],
        gp_p, g_dims[4],
        filters8.ctypes.data, filters4.ctypes.data,
        bd, search_range,
        search_range if search_range2 is None else search_range2,
        int(gm_mv[0]), int(gm_mv[1]), float(psy_rd),
        int(ref2_gate), int(inter_bias_pct),
        bx.ctypes.data, by.ctypes.data, bw.ctypes.data, bh.ctypes.data,
        n,
        tseed[0].ctypes.data if tseed is not None else None,
        tseed[1].ctypes.data if tseed is not None else None,
        int(ref_dists[0]), int(ref_dists[1]),
        out.ctypes.data)
    return out


def subpel_refine_blocks(src_u16, ref_me, filters8, bd, blocks, refine, mvs):
    """In-place sub-pel diamond refinement of full-pel MVs (device-search
    tail). blocks: (N,4) int32 (x0,y0,W,H); refine: (N,) uint8; mvs: (N,2)
    int32 1/8-pel. Returns True, or None without the library."""
    lib = _load()
    if lib is None:
        return None
    b = np.ascontiguousarray(blocks, np.int32)
    bx = np.ascontiguousarray(b[:, 0]); by = np.ascontiguousarray(b[:, 1])
    bw = np.ascontiguousarray(b[:, 2]); bh = np.ascontiguousarray(b[:, 3])
    r8 = np.ascontiguousarray(refine, np.uint8)
    lib.me_subpel_refine_blocks(
        src_u16.ctypes.data, src_u16.shape[1],
        ref_me.ctypes.data, ref_me.shape[0], ref_me.shape[1],
        filters8.ctypes.data, bd,
        bx.ctypes.data, by.ctypes.data, bw.ctypes.data, bh.ctypes.data,
        r8.ctypes.data, b.shape[0], mvs.ctypes.data)
    return True


def sgr_selfguided(dgd_ext32, w, h, ep, bd, need0, need1):
    """Native self-guided restoration filters. dgd_ext32: contiguous int32
    (h+6, w+6). Returns (flt0, flt1) int64 arrays (or None entries per
    need flags), or None without the library."""
    lib = _load()
    if lib is None:
        return None
    f0 = np.empty((h, w), np.int64) if need0 else None
    f1 = np.empty((h, w), np.int64) if need1 else None
    lib.sgr_selfguided(dgd_ext32.ctypes.data, w, h, ep, bd,
                       f0.ctypes.data if need0 else None,
                       f1.ctypes.data if need1 else None)
    return f0, f1


def deblock_plane(buf, H, W, pad, txw, txh, bev, beh, is_luma,
                  level_v, level_h, sharpness, bd):
    """In-place native loop filter on the padded int32 plane buffer.
    Returns True, or None without the library (caller falls back)."""
    lib = _load()
    if lib is None:
        return None
    lib.deblock_plane_native(
        buf.ctypes.data, buf.shape[1], H, W, pad,
        txw.ctypes.data, txh.ctypes.data, bev.ctypes.data, beh.ctypes.data,
        txw.shape[1], int(is_luma), level_v, level_h, sharpness, bd)
    return True


def psy_block_energy(x: np.ndarray, t: int):
    """Per-tile psy energy (SA8D/SATD4 - SAD/4) in raster tile order, or
    None without the library. x: (h, w) any int/uint array."""
    lib = _load()
    if lib is None:
        return None
    x32 = np.ascontiguousarray(x, np.int32)
    h, w = x32.shape
    out = np.empty(((h // t) * (w // t),), np.int64)
    lib.psy_block_energy(x32.ctypes.data, w, h, w, t, out.ctypes.data)
    return out


def psy_distortion_sum(recon: np.ndarray, t: int, src_energy: np.ndarray):
    """sum |src_energy - energy(recon tiles)| or None without the library."""
    lib = _load()
    if lib is None:
        return None
    h, w = recon.shape
    es = src_energy
    if es.dtype != np.int64 or not es.flags["C_CONTIGUOUS"]:
        es = np.ascontiguousarray(es, np.int64)
    if recon.dtype == np.uint16 and recon.flags["C_CONTIGUOUS"]:
        return int(lib.psy_distortion_sum_u16(recon.ctypes.data, w, h, w, t,
                                              es.ctypes.data))
    r32 = np.ascontiguousarray(recon, np.int32)
    return int(lib.psy_distortion_sum(r32.ctypes.data, w, h, w, t,
                                      es.ctypes.data))


def cdef_find_dir_blocks(img32, by32, bx32, coeff_shift):
    """Directions + variances for 8x8 blocks at (by, bx) of img32 (int32
    contiguous). Returns (dirs, var) or None without the library."""
    lib = _load()
    if lib is None:
        return None
    n = len(by32)
    dirs = np.empty(n, np.int32)
    var = np.empty(n, np.int64)
    lib.cdef_find_dir_blocks(img32.ctypes.data, img32.shape[1],
                             by32.ctypes.data, bx32.ctypes.data, n,
                             coeff_shift, dirs.ctypes.data, var.ctypes.data)
    return dirs, var


def cdef_filter_blocks(pad32, dst32, by32, bx32, dirs32, pri32, sec, pdamp,
                       sdamp, bw, bh, bd):
    """Filter the listed blocks from padded plane pad32 into dst32 (both
    int32 contiguous). Returns True, or None without the library."""
    lib = _load()
    if lib is None:
        return None
    lib.cdef_filter_blocks(pad32.ctypes.data, pad32.shape[1],
                           dst32.ctypes.data, dst32.shape[1],
                           by32.ctypes.data, bx32.ctypes.data, len(by32),
                           dirs32.ctypes.data, pri32.ctypes.data,
                           sec, pdamp, sdamp, bw, bh, bd)
    return True


def intra_pred_block(mode, above32, left32, corner, have_above, have_left,
                     W, H, bd):
    """Non-directional intra predictor for one block (mode: 0 DC, 1 V, 2 H,
    3 SMOOTH, 4 SMOOTH_V, 5 SMOOTH_H, 6 PAETH). Returns (H, W) uint16 or
    None without the library."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((H, W), np.uint16)
    lib.intra_pred_block(mode, above32.ctypes.data, left32.ctypes.data,
                         corner, int(have_above), int(have_left), W, H, bd,
                         out.ctypes.data)
    return out


def intra_dr_pred(above32, left32, W, H, dx, dy, zone, bd):
    """Directional (zone 1/2/3) predictor. above32/left32: contiguous int32
    of length 1+W+H with the corner at [0]. Returns (H, W) uint16 or None."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((H, W), np.uint16)
    lib.intra_dr_pred(above32.ctypes.data, left32.ctypes.data, W, H, dx, dy,
                      zone, bd, out.ctypes.data)
    return out


def filter_intra_pred(above32, left32, w, h, taps32, bd):
    """C filter-intra recursion for one block (w,h <= 32). above32/left32:
    contiguous int32 neighbor buffers ([0] = corner); taps32: (8,8) int32
    for one mode. Returns (h, w) uint16 or None without the library."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((h, w), np.uint16)
    lib.filter_intra_pred(above32.ctypes.data, left32.ctypes.data, w, h,
                          taps32.ctypes.data, bd, out.ctypes.data)
    return out


def quantize_txb(coeff_flat, scan, pq, log_scale, qm=None, iqm=None):
    """C quantize for one txb (bit-identical to quant.quantize_b on a
    single block). coeff_flat: (n,) int64 raster; returns
    (qcoeff, dqcoeff, eob) or None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    c = np.ascontiguousarray(coeff_flat, np.int64)
    n = c.shape[0]
    qcoeff = np.empty(n, np.int32)
    dqcoeff = np.empty(n, np.int32)
    scan16 = np.ascontiguousarray(scan, np.int16)
    # keep converted qm arrays referenced until the call returns (a bare
    # `ascontiguousarray(...).ctypes.data` can be freed mid-call)
    qm8 = np.ascontiguousarray(qm, np.uint8) if qm is not None else None
    iqm16 = np.ascontiguousarray(iqm, np.uint16) if iqm is not None else None
    eob = lib.quantize_txb(
        c.ctypes.data, n, scan16.ctypes.data,
        int(pq.zbin[0]), int(pq.zbin[1]), int(pq.round[0]), int(pq.round[1]),
        int(pq.quant[0]), int(pq.quant[1]),
        int(pq.quant_shift[0]), int(pq.quant_shift[1]),
        int(pq.dequant[0]), int(pq.dequant[1]), int(log_scale),
        (qm8.ctypes.data if qm8 is not None else None),
        (iqm16.ctypes.data if iqm16 is not None else None),
        qcoeff.ctypes.data, dqcoeff.ctypes.data)
    return qcoeff, dqcoeff, int(eob)


def ssim_grid(a: np.ndarray, b: np.ndarray, c1: float, c2: float):
    """Mean 8x8-window SSIM (step 4) via the C kernel, or None."""
    lib = _load()
    if lib is None:
        return None
    au = np.ascontiguousarray(a, np.uint16)
    bu = np.ascontiguousarray(b, np.uint16)
    H, W = au.shape
    return float(lib.ssim_grid_u16(au.ctypes.data, W, bu.ctypes.data, W,
                                   W, H, float(c1), float(c2)))


def plane_sse(a: np.ndarray, b: np.ndarray):
    """Sum of squared error between two planes via the C kernel, or None."""
    lib = _load()
    if lib is None:
        return None
    au = np.ascontiguousarray(a, np.uint16)
    bu = np.ascontiguousarray(b, np.uint16)
    H, W = au.shape
    return float(lib.sse_u16(au.ctypes.data, W, bu.ctypes.data, W, W, H))
