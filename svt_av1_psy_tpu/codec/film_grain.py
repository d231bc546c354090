"""Film grain synthesis (normative, spec §7.18.3) + PSY photon-noise tables.

Behavior reference: grainSynthesis.c (template generation :382-512, scaling
LUT :512-556, application with overlap :878-1295) and the fgs-table file
format of app_config.c:2599. The synthesis here is the decoder-side
normative process, re-implemented canvas-style: grain templates are
stitched (with the 27/17 and 23/22 overlap blends) into one full-frame
grain image first, then the piecewise-linear scaling is applied in a single
vectorized pass — mathematically identical to the per-block reference loop
and verified bit-exact against dav1d's grained output.

Encoder side, `photon_noise_params` generates an ISO-style grain table
(the --fgs-table workflow of the PSY fork) and `parse_fgs_table` reads
aom "filmgrn1" tables.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field
from functools import lru_cache
from pathlib import Path

import numpy as np

GAUSS_BITS = 11


@lru_cache(maxsize=1)
def _gaussian_sequence() -> np.ndarray:
    path = Path(__file__).resolve().parent / "tables" / "av1_grain_tables.npz"
    return np.load(path)["gaussian_sequence"].astype(np.int64)


@dataclass
class FilmGrainParams:
    apply_grain: int = 1
    random_seed: int = 7391
    update_parameters: int = 1
    scaling_points_y: list = field(default_factory=list)    # [(x, y), ...] max 14
    scaling_points_cb: list = field(default_factory=list)   # max 10
    scaling_points_cr: list = field(default_factory=list)
    scaling_shift: int = 8        # 8..11
    ar_coeff_lag: int = 0         # 0..3
    ar_coeffs_y: list = field(default_factory=list)
    ar_coeffs_cb: list = field(default_factory=list)
    ar_coeffs_cr: list = field(default_factory=list)
    ar_coeff_shift: int = 6       # 6..9
    cb_mult: int = 128
    cb_luma_mult: int = 192
    cb_offset: int = 256
    cr_mult: int = 128
    cr_luma_mult: int = 192
    cr_offset: int = 256
    overlap_flag: int = 1
    clip_to_restricted_range: int = 0
    chroma_scaling_from_luma: int = 0
    grain_scale_shift: int = 0
    bit_depth: int = 8

    @property
    def num_y_points(self):
        return len(self.scaling_points_y)

    @property
    def num_cb_points(self):
        return len(self.scaling_points_cb)

    @property
    def num_cr_points(self):
        return len(self.scaling_points_cr)


# ------------------------------------------------------------------ encoder

def photon_noise_params(strength: float, bd: int = 8,
                        chroma: bool = False, seed: int = 7391) -> FilmGrainParams:
    """ISO photon-noise style grain table (the PSY --fgs-table workflow,
    app-side counterpart of aom's photon noise tool). Noise std grows as
    sqrt(signal) in linear light; points follow that curve on the 8-bit
    scaling-x grid. strength in (0, 64] maps roughly to ISO/400."""
    s = float(np.clip(strength, 0.1, 64.0))
    pts = []
    xs = [0, 8, 16, 24, 32, 48, 64, 96, 128, 160, 192, 224, 255]
    for x in xs:
        # sqrt-of-luma shot-noise profile with a mild shadow lift
        val = s * (0.8 * math.sqrt(x / 255.0) + 0.2) * 2.0
        pts.append((x, int(np.clip(round(val), 0, 255))))
    # drop duplicate-y leading points to keep the table minimal
    dedup = [pts[0]]
    for p in pts[1:]:
        if p[1] != dedup[-1][1] or p is pts[-1]:
            dedup.append(p)
    fg = FilmGrainParams(random_seed=seed, bit_depth=bd)
    fg.scaling_points_y = dedup[:14]
    if chroma:
        fg.scaling_points_cb = [(x, max(1, y // 2)) for x, y in dedup[:10]]
        fg.scaling_points_cr = list(fg.scaling_points_cb)
    fg.scaling_shift = 8
    fg.ar_coeff_lag = 0
    fg.ar_coeff_shift = 6
    fg.grain_scale_shift = 0
    fg.overlap_flag = 1
    return fg


def parse_fgs_table(text: str) -> list:
    """Parse an aom 'filmgrn1' film grain table (app_config.c:2599 format).
    Returns [(start_ts, end_ts, FilmGrainParams), ...]."""
    if not text.startswith("filmgrn1"):
        raise ValueError("invalid grain table magic")
    toks = text[len("filmgrn1"):].split()
    out = []
    i = 0

    def take(n):
        nonlocal i
        vals = toks[i : i + n]
        i += n
        return vals

    while i < len(toks):
        if toks[i] != "E":
            break
        i += 1
        start, end, apply_g, seed, update = (int(v) for v in take(5))
        fg = FilmGrainParams(apply_grain=apply_g, random_seed=seed,
                             update_parameters=update)
        if update:
            assert toks[i] == "p"
            i += 1
            (fg.ar_coeff_lag, fg.ar_coeff_shift, fg.grain_scale_shift,
             fg.scaling_shift, fg.chroma_scaling_from_luma, fg.overlap_flag,
             fg.cb_mult, fg.cb_luma_mult, fg.cb_offset, fg.cr_mult,
             fg.cr_luma_mult, fg.cr_offset) = (int(v) for v in take(12))
            for name in ("sY", "sCb", "sCr"):
                assert toks[i] == name, (name, toks[i])
                i += 1
                n = int(take(1)[0])
                flat = take(2 * n)
                pts = [(int(flat[2 * k]), int(flat[2 * k + 1])) for k in range(n)]
                setattr(fg, {"sY": "scaling_points_y", "sCb": "scaling_points_cb",
                             "sCr": "scaling_points_cr"}[name], pts)
            npos = 2 * fg.ar_coeff_lag * (fg.ar_coeff_lag + 1)
            for name, cnt in (("cY", npos), ("cCb", npos + 1), ("cCr", npos + 1)):
                assert toks[i] == name, (name, toks[i])
                i += 1
                setattr(fg, {"cY": "ar_coeffs_y", "cCb": "ar_coeffs_cb",
                             "cCr": "ar_coeffs_cr"}[name],
                        [int(v) for v in take(cnt)])
        out.append((start, end, fg))
    return out


# ----------------------------------------------------- normative synthesis

class _Lfsr:
    """16-bit LFSR of spec §7.18.3.2 (grainSynthesis.c:360)."""

    def __init__(self, seed: int):
        self.reg = seed & 0xFFFF

    def bits(self, n: int) -> int:
        r = self.reg
        bit = ((r >> 0) ^ (r >> 1) ^ (r >> 3) ^ (r >> 12)) & 1
        r = ((r >> 1) | (bit << 15)) & 0xFFFF
        self.reg = r
        return (r >> (16 - n)) & ((1 << n) - 1)

    def reseed_row(self, luma_line: int, seed: int):
        reg = seed & 0xFFFF
        luma_num = luma_line >> 5
        reg ^= ((luma_num * 37 + 178) & 255) << 8
        reg ^= (luma_num * 173 + 105) & 255
        self.reg = reg


def _ar_positions(lag: int):
    pos = [(r, c) for r in range(-lag, 0) for c in range(-lag, lag + 1)]
    pos += [(0, c) for c in range(-lag, 0)]
    return pos


def _gen_template(rng: _Lfsr, rows: int, cols: int, coeffs, lag: int,
                  ar_coeff_shift: int, gauss_sec_shift: int,
                  grain_min: int, grain_max: int,
                  top_pad: int, left_pad: int, right_pad: int,
                  luma_block=None, subsamp=(0, 0)):
    g = _gaussian_sequence()
    draws = np.array([rng.bits(GAUSS_BITS) for _ in range(rows * cols)])
    t = ((g[draws] + ((1 << gauss_sec_shift) >> 1)) >> gauss_sec_shift)
    t = t.reshape(rows, cols).astype(np.int64)
    if not coeffs:
        return t
    pos = _ar_positions(lag)
    rof = 1 << (ar_coeff_shift - 1)
    ssy, ssx = subsamp
    for i in range(top_pad, rows):
        for j in range(left_pad, cols - right_pad):
            wsum = 0
            for (dr, dc), a in zip(pos, coeffs):
                wsum += a * t[i + dr, j + dc]
            if luma_block is not None and len(coeffs) == len(pos) + 1:
                # chroma: last coefficient predicts from co-located luma
                ly = ((i - top_pad) << ssy) + top_pad
                lx = ((j - left_pad) << ssx) + left_pad
                av = int(luma_block[ly : ly + ssy + 1, lx : lx + ssx + 1].sum())
                av = (av + ((1 << (ssy + ssx)) >> 1)) >> (ssy + ssx)
                wsum += coeffs[-1] * av
            t[i, j] = np.clip(t[i, j] + ((wsum + rof) >> ar_coeff_shift),
                              grain_min, grain_max)
    return t


def _scaling_lut(points) -> np.ndarray:
    lut = np.zeros(256, np.int64)
    if not points:
        return lut
    lut[: points[0][0]] = points[0][1]
    for (x0, y0), (x1, y1) in zip(points, points[1:]):
        dx, dy = x1 - x0, y1 - y0
        delta = dy * ((65536 + (dx >> 1)) // dx)
        xs = np.arange(dx, dtype=np.int64)
        lut[x0 : x1] = y0 + ((xs * delta + 32768) >> 16)
    lut[points[-1][0] :] = points[-1][1]
    return lut


def _scale_lut(lut: np.ndarray, index: np.ndarray, bd: int) -> np.ndarray:
    if bd == 8:
        return lut[index]
    x = index >> (bd - 8)
    frac = index & ((1 << (bd - 8)) - 1)
    x1 = np.minimum(x + 1, 255)
    interp = lut[x] + (((lut[x1] - lut[x]) * frac + (1 << (bd - 9))) >> (bd - 8))
    return np.where(x == 255, lut[x], interp)


def _blend_cols(left, right, grain_min, grain_max, w):
    if w == 1:
        return np.clip((left * 23 + right * 22 + 16) >> 5, grain_min, grain_max)
    c0 = (27 * left[:, 0] + 17 * right[:, 0] + 16) >> 5
    c1 = (17 * left[:, 1] + 27 * right[:, 1] + 16) >> 5
    return np.clip(np.stack([c0, c1], axis=1), grain_min, grain_max)


def _blend_rows(top, bottom, grain_min, grain_max, h):
    if h == 1:
        return np.clip((top * 23 + bottom * 22 + 16) >> 5, grain_min, grain_max)
    r0 = (27 * top[0] + 17 * bottom[0] + 16) >> 5
    r1 = (17 * top[1] + 27 * bottom[1] + 16) >> 5
    return np.clip(np.stack([r0, r1]), grain_min, grain_max)


def _grain_canvas(template: np.ndarray, H: int, W: int, params: FilmGrainParams,
                  ss: int, grain_min: int, grain_max: int, rng_rows):
    """Stitch per-block template windows (with overlap blending) into a
    (H, W) plane-resolution grain image. ss: subsampling (0 luma, 1 chroma
    4:2:0). rng_rows: per block-row list of (offset_y, offset_x)."""
    sub = 32 >> ss           # subblock size in plane pixels
    pad = 9 if ss == 0 else 6   # offset base: luma 3+2*3, chroma 3+1*3
    ow = 2 >> ss             # overlap width/height
    canvas = np.zeros((H, W), np.int64)
    line_buf = np.zeros((ow, W), np.int64)
    n_cols = -(-W // sub) if W else 0
    for bi, offsets in enumerate(rng_rows):
        py = bi * sub
        if py >= H:
            break
        col_buf = None
        for bj in range(n_cols):
            px = bj * sub
            oy_r, ox_r = offsets[bj]
            oy = pad + (oy_r << (1 - ss))
            ox = pad + (ox_r << (1 - ss))
            cur = template[oy : oy + sub + ow, ox : ox + sub + ow]
            blk = cur[:sub, :sub].copy()
            ch = min(sub + ow, H - py)
            vcol = None
            if params.overlap_flag and bj:
                vcol = _blend_cols(col_buf[:ch], cur[:ch, :ow].reshape(ch, -1),
                                   grain_min, grain_max, ow)
                vcol = vcol.reshape(ch, ow)
                blk[: min(sub, ch), :ow] = vcol[:sub]
            if params.overlap_flag and bi:
                x0c = ow if bj else 0
                wv = min(sub - x0c, W - (px + x0c))
                if wv > 0:
                    top = line_buf[:, px + x0c : px + x0c + wv]
                    bot = cur[:ow, x0c : x0c + wv]
                    blk[:ow, x0c : x0c + wv] = _blend_rows(top, bot, grain_min,
                                                           grain_max, ow)
                if bj:
                    top = line_buf[:, px : px + ow]
                    bot = vcol[:ow]
                    blk[:ow, :ow] = _blend_rows(top, bot, grain_min, grain_max, ow)
            hh, ww = min(sub, H - py), min(sub, W - px)
            canvas[py : py + hh, px : px + ww] = blk[:hh, :ww]
            if params.overlap_flag:
                x0c = ow if bj else 0
                wv = min(sub, W - px) - x0c
                if wv > 0:
                    line_buf[:, px + x0c : px + x0c + wv] = \
                        cur[sub : sub + ow, x0c : x0c + wv]
                if bj and vcol is not None and vcol.shape[0] >= sub + ow:
                    line_buf[:, px : px + ow] = vcol[sub : sub + ow]
                col_buf = cur[:ch, sub : sub + ow].copy()
    return canvas


def apply_film_grain(params: FilmGrainParams, y: np.ndarray,
                     u: np.ndarray | None, v: np.ndarray | None,
                     bd: int = 8):
    """Normative grain application. y/u/v: decoded planes (visible dims,
    4:2:0 or mono). Returns new (y, u, v) arrays; inputs unmodified."""
    H, W = y.shape
    gauss_sec = 12 - bd + params.grain_scale_shift
    grain_center = 128 << (bd - 8)
    grain_min = -grain_center
    grain_max = (256 << (bd - 8)) - 1 - grain_center
    lag = params.ar_coeff_lag
    mono = u is None

    # --- grain templates (73x82 luma, 38x44 chroma for 4:2:0)
    rng = _Lfsr(params.random_seed)
    lbs_y, lbs_x = 3 + 6 + 64 + 0, 3 + 6 + 64 + 6 + 3
    luma_t = np.zeros((lbs_y, lbs_x), np.int64)
    if params.num_y_points:
        luma_t = _gen_template(rng, lbs_y, lbs_x, list(params.ar_coeffs_y), lag,
                               params.ar_coeff_shift, gauss_sec, grain_min,
                               grain_max, 3, 3, 3)
    cb_t = cr_t = None
    if not mono:
        cbs_y = 3 + 3 + 32
        cbs_x = 3 + 3 + 32 + 3 + 3
        need_cb = params.num_cb_points or params.chroma_scaling_from_luma
        need_cr = params.num_cr_points or params.chroma_scaling_from_luma
        # tables store npos+1 chroma coeffs; only npos (+1 if luma points
        # exist) participate (grainSynthesis.c:427 num_pos_chroma)
        npos_c = 2 * lag * (lag + 1) + (1 if params.num_y_points else 0)
        ccoef_cb = list(params.ar_coeffs_cb)[:npos_c]
        ccoef_cr = list(params.ar_coeffs_cr)[:npos_c]
        rng_cb = _Lfsr(0)
        rng_cb.reseed_row(7 << 5, params.random_seed)
        cb_t = (_gen_template(rng_cb, cbs_y, cbs_x, ccoef_cb, lag,
                              params.ar_coeff_shift, gauss_sec, grain_min,
                              grain_max, 3, 3, 3, luma_block=luma_t, subsamp=(1, 1))
                if need_cb else np.zeros((cbs_y, cbs_x), np.int64))
        rng_cr = _Lfsr(0)
        rng_cr.reseed_row(11 << 5, params.random_seed)
        cr_t = (_gen_template(rng_cr, cbs_y, cbs_x, ccoef_cr, lag,
                              params.ar_coeff_shift, gauss_sec, grain_min,
                              grain_max, 3, 3, 3, luma_block=luma_t, subsamp=(1, 1))
                if need_cr else np.zeros((cbs_y, cbs_x), np.int64))

    # --- per-block random offsets (one LFSR stream drives all planes)
    rng_rows = []
    n_cols = max(1, -(-(W // 2) // 16))
    for yy in range(0, H // 2, 16):
        rng.reseed_row(yy * 2, params.random_seed)
        row = []
        for _ in range(n_cols):
            r8 = rng.bits(8)
            row.append((r8 & 15, (r8 >> 4) & 15))
        rng_rows.append(row)

    # --- stitch canvases and apply scaling
    lut_y = _scaling_lut(params.scaling_points_y)
    if params.chroma_scaling_from_luma:
        lut_cb = lut_cr = lut_y
    else:
        lut_cb = _scaling_lut(params.scaling_points_cb)
        lut_cr = _scaling_lut(params.scaling_points_cr)

    peak = (1 << bd) - 1
    if params.clip_to_restricted_range:
        min_l, max_l = 16 << (bd - 8), 235 << (bd - 8)
        min_c, max_c = 16 << (bd - 8), 240 << (bd - 8)
    else:
        min_l = min_c = 0
        max_l = max_c = peak
    rof = 1 << (params.scaling_shift - 1)

    y_out = y.copy()
    # luma processed over even dims only (reference loops y < height/2 * 2)
    eh, ew = (H // 2) * 2, (W // 2) * 2
    if params.num_y_points:
        gy = _grain_canvas(luma_t, eh, ew, params, 0, grain_min, grain_max, rng_rows)
        base = y[:eh, :ew].astype(np.int64)
        noise = (_scale_lut(lut_y, base, bd) * gy + rof) >> params.scaling_shift
        y_out[:eh, :ew] = np.clip(base + noise, min_l, max_l).astype(y.dtype)
    if mono:
        return y_out, None, None

    ch_, cw = (eh) >> 1, (ew) >> 1
    u_out, v_out = u.copy(), v.copy()
    apply_cb = params.num_cb_points or params.chroma_scaling_from_luma
    apply_cr = params.num_cr_points or params.chroma_scaling_from_luma
    if apply_cb or apply_cr:
        # average of the two horizontal co-located luma samples (even rows)
        av_luma = ((y[: ch_ * 2 : 2, : cw * 2 : 2].astype(np.int64)
                    + y[: ch_ * 2 : 2, 1 : cw * 2 : 2] + 1) >> 1)
        if bd == 8:
            cb_mult, cb_lm, cb_off = params.cb_mult - 128, params.cb_luma_mult - 128, params.cb_offset - 256
            cr_mult, cr_lm, cr_off = params.cr_mult - 128, params.cr_luma_mult - 128, params.cr_offset - 256
        else:
            cb_mult, cb_lm = params.cb_mult - 128, params.cb_luma_mult - 128
            cb_off = (params.cb_offset << (bd - 8)) - (1 << bd)
            cr_mult, cr_lm = params.cr_mult - 128, params.cr_luma_mult - 128
            cr_off = (params.cr_offset << (bd - 8)) - (1 << bd)
        if params.chroma_scaling_from_luma:
            cb_mult = cr_mult = 0
            cb_lm = cr_lm = 64
            cb_off = cr_off = 0
        for (apply_p, plane, tmpl, lut, mult, lm, off, out) in (
                (apply_cb, u, cb_t, lut_cb, cb_mult, cb_lm, cb_off, u_out),
                (apply_cr, v, cr_t, lut_cr, cr_mult, cr_lm, cr_off, v_out)):
            if not apply_p:
                continue
            gc = _grain_canvas(tmpl, ch_, cw, params, 1, grain_min, grain_max, rng_rows)
            base = plane[:ch_, :cw].astype(np.int64)
            idx = np.clip(((av_luma[:ch_, :cw] * lm + mult * base) >> 6) + off,
                          0, (256 << (bd - 8)) - 1)
            noise = (_scale_lut(lut, idx, bd) * gc + rof) >> params.scaling_shift
            out[:ch_, :cw] = np.clip(base + noise, min_c, max_c).astype(plane.dtype)
    return y_out, u_out, v_out
