"""Warped motion: the normative warp filter, shear parameters, and the
global-model MV projection.

Behavior references: warped_motion.c:569 (svt_av1_warp_affine_c: 8x8-block
two-stage 8-tap shear filter), :898 (svt_get_shear_params), :336
(resolve_divisor_32 + div_lut), adaptive_mv_pred.c:954
(svt_aom_gm_get_motion_vector_enc), utility.h:362 (convert_to_trans_prec).
The per-8x8-block filtering here is one vectorized gather over all blocks
of the prediction region (numpy; the batched shape is the device contract).
"""

from __future__ import annotations

import functools
from pathlib import Path

import numpy as np

WARPEDMODEL_PREC_BITS = 16
WARPEDDIFF_PREC_BITS = 10      # WARPEDMODEL_PREC_BITS - WARPEDPIXEL_PREC_BITS
WARPEDPIXEL_PREC_SHIFTS = 64
WARP_PARAM_REDUCE_BITS = 6
DIV_LUT_BITS = 8
DIV_LUT_PREC_BITS = 14
FILTER_BITS = 7

IDENTITY, TRANSLATION, ROTZOOM, AFFINE = 0, 1, 2, 3


@functools.lru_cache(maxsize=1)
def _tables():
    f = np.load(Path(__file__).parent / "tables" / "av1_warp.npz")
    return f["warped_filter"].astype(np.int32), f["div_lut"].astype(np.int64)


def _round2s(v, n):
    """ROUND_POWER_OF_TWO_SIGNED."""
    v = int(v)
    r = (abs(v) + (1 << (n - 1))) >> n
    return -r if v < 0 else r


def resolve_divisor_32(d: int):
    """(divisor multiplier, shift) — warped_motion.c:336."""
    shift = d.bit_length() - 1
    e = d - (1 << shift)
    if shift > DIV_LUT_BITS:
        f = (e + (1 << (shift - DIV_LUT_BITS - 1))) >> (shift - DIV_LUT_BITS)
    else:
        f = e << (DIV_LUT_BITS - shift)
    return int(_tables()[1][f]), shift + DIV_LUT_PREC_BITS


def get_shear_params(wmmat):
    """(alpha, beta, gamma, delta) or None when the model is invalid
    (svt_get_shear_params)."""
    mat = [int(v) for v in wmmat]
    if mat[2] <= 0:
        return None

    def clamp16(v):
        return max(-32768, min(32767, v))

    alpha = clamp16(mat[2] - (1 << WARPEDMODEL_PREC_BITS))
    beta = clamp16(mat[3])
    y, shift = resolve_divisor_32(abs(mat[2]))
    y = y if mat[2] >= 0 else -y
    v = (mat[4] << WARPEDMODEL_PREC_BITS) * y
    gamma = clamp16(_round2s(v, shift))
    v = mat[3] * mat[4] * y
    delta = clamp16(mat[5] - _round2s(v, shift) - (1 << WARPEDMODEL_PREC_BITS))

    def reduce(v):
        return _round2s(v, WARP_PARAM_REDUCE_BITS) * (1 << WARP_PARAM_REDUCE_BITS)

    alpha, beta = reduce(alpha), reduce(beta)
    gamma, delta = reduce(gamma), reduce(delta)
    if (4 * abs(alpha) + 7 * abs(beta) >= (1 << WARPEDMODEL_PREC_BITS)
            or 4 * abs(gamma) + 4 * abs(delta) >= (1 << WARPEDMODEL_PREC_BITS)):
        return None
    return alpha, beta, gamma, delta


def gm_get_motion_vector(wmtype, wmmat, mi_row, mi_col, bw, bh,
                         allow_hp=True, is_integer=False):
    """Projected (row_q3, col_q3) of the global model at the block center
    (svt_aom_gm_get_motion_vector_enc)."""
    if wmtype == IDENTITY:
        return (0, 0)
    mat = [int(v) for v in wmmat]
    if wmtype == TRANSLATION:
        row = mat[0] >> 13
        col = mat[1] >> 13
        return (row, col)
    x = mi_col * 4 + bw // 2 - 1
    y = mi_row * 4 + bh // 2 - 1
    xc = (mat[2] - (1 << WARPEDMODEL_PREC_BITS)) * x + mat[3] * y + mat[0]
    yc = mat[4] * x + (mat[5] - (1 << WARPEDMODEL_PREC_BITS)) * y + mat[1]
    if allow_hp:
        tx, ty = _round2s(xc, 13), _round2s(yc, 13)
    else:
        tx, ty = _round2s(xc, 14) * 2, _round2s(yc, 14) * 2
    if is_integer:
        def to_int(v):
            return 0 if abs(v) < 8 else ((v + 3) & ~7 if v > 0 else -((-v + 3) & ~7))
        tx, ty = to_int(tx), to_int(ty)
    return (ty, tx)


def warp_plane(wmtype, wmmat, shear, ref: np.ndarray, px: int, py: int,
               pw: int, ph: int, ss_x: int, ss_y: int, bd: int = 8):
    """Normative warp prediction of the (py, px, ph, pw) region from the
    full (unpadded) reference plane `ref` (svt_av1_warp_affine_c, single
    prediction / non-compound). Returns (ph, pw) uint16."""
    wf, _ = _tables()
    mat = [int(v) for v in wmmat]
    if wmtype == ROTZOOM:
        mat[5] = mat[2]
        mat[4] = -mat[3]
    alpha, beta, gamma, delta = shear
    H, W = ref.shape
    r0 = 3 if bd == 8 else (3 if bd == 10 else 5)
    reduce_h = r0
    reduce_v = 2 * FILTER_BITS - reduce_h
    offs_h = bd + FILTER_BITS - 1
    offs_v = bd + 2 * FILTER_BITS - reduce_h

    nby, nbx = ph // 8, pw // 8
    bi = np.arange(nby) * 8 + py
    bj = np.arange(nbx) * 8 + px
    jj, ii = np.meshgrid(bj, bi)                       # (nby, nbx)
    src_x = ((jj + 4) << ss_x).astype(np.int64)
    src_y = ((ii + 4) << ss_y).astype(np.int64)
    dst_x = mat[2] * src_x + mat[3] * src_y + mat[0]
    dst_y = mat[4] * src_x + mat[5] * src_y + mat[1]
    x4 = dst_x >> ss_x
    y4 = dst_y >> ss_y
    ix4 = (x4 >> WARPEDMODEL_PREC_BITS).reshape(-1)
    sx4 = (x4 & ((1 << WARPEDMODEL_PREC_BITS) - 1)).reshape(-1)
    iy4 = (y4 >> WARPEDMODEL_PREC_BITS).reshape(-1)
    sy4 = (y4 & ((1 << WARPEDMODEL_PREC_BITS) - 1)).reshape(-1)
    sx4 = (sx4 - 4 * (alpha + beta)) & ~((1 << WARP_PARAM_REDUCE_BITS) - 1)
    sy4 = (sy4 - 4 * (gamma + delta)) & ~((1 << WARP_PARAM_REDUCE_BITS) - 1)
    nb = ix4.shape[0]

    k = np.arange(-7, 8)                               # 15 rows
    l = np.arange(-4, 4)                               # 8 cols
    # horizontal pass: tmp (nb, 15, 8)
    sx = (sx4[:, None, None] + beta * (k + 4)[None, :, None]
          + alpha * (l + 4)[None, None, :])
    offs = ((sx + (1 << (WARPEDDIFF_PREC_BITS - 1))) >> WARPEDDIFF_PREC_BITS) \
        + WARPEDPIXEL_PREC_SHIFTS
    coeffs = wf[offs]                                  # (nb, 15, 8, 8)
    iy = np.clip(iy4[:, None] + k[None, :], 0, H - 1)  # (nb, 15)
    ix = np.clip(ix4[:, None, None] + (l - 3)[None, :, None]
                 + np.arange(8)[None, None, :], 0, W - 1)   # (nb, 8, 8)
    samp = ref[iy[:, :, None, None], ix[:, None, :, :]].astype(np.int64)
    tmp = (samp * coeffs).sum(-1) + (1 << offs_h)
    tmp = (tmp + (1 << (reduce_h - 1))) >> reduce_h    # (nb, 15, 8)

    # vertical pass: out (nb, 8, 8)
    kv = np.arange(-4, 4)
    sy = (sy4[:, None, None] + delta * (kv + 4)[None, :, None]
          + gamma * (l + 4)[None, None, :])
    offs = ((sy + (1 << (WARPEDDIFF_PREC_BITS - 1))) >> WARPEDDIFF_PREC_BITS) \
        + WARPEDPIXEL_PREC_SHIFTS
    coeffs = wf[offs]                                  # (nb, 8, 8, 8)
    # window rows (kv + m + 4) for m 0..7: win[n, kk, ll, m] = tmp[n, kk+m, ll]
    win = np.stack([tmp[:, m : m + 8, :] for m in range(8)], axis=-1)
    acc = (win * coeffs).sum(-1)
    s = acc + (1 << offs_v)
    s = (s + (1 << (reduce_v - 1))) >> reduce_v
    out = s - (1 << (bd - 1)) - (1 << bd)
    out = np.clip(out, 0, (1 << bd) - 1)
    return (out.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3)
            .reshape(ph, pw).astype(np.uint16))
