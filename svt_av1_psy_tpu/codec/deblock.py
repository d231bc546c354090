"""AV1 deblocking loop filter (normative; spec §7.14).

Behavior reference: deblocking_common.c (filter4/6/8/14, masks, sharpness
thresholds) + deblocking_filter.c (edge walk). Vectorized: the vertical pass
processes one edge column at a time across all rows (left to right, matching
decoder modification order), the horizontal pass one edge row at a time.

Levels here are frame-constant per plane/direction (no segments or
mode/ref deltas in the all-intra path).
"""

from __future__ import annotations

import numpy as np

MAX_LOOP_FILTER = 63


def thresholds(level: int, sharpness: int, bd: int = 8):
    """(blimit, limit, thresh) scaled for bit depth
    (svt_aom_update_sharpness + highbd scaling)."""
    inside = level >> ((sharpness > 0) + (sharpness > 4))
    if sharpness > 0:
        inside = min(inside, 9 - sharpness)
    inside = max(inside, 1)
    blimit = 2 * (level + 2) + inside
    thresh = level >> 4
    sc = 1 << (bd - 8)
    return blimit * sc, inside * sc, thresh * sc


def pick_filter_level(qindex: int, bd: int = 8, is_key: bool = True) -> int:
    """Encoder-side level choice (LPF_PICK_FROM_Q policy)."""
    from .spec_tables import get_tables

    # av1_ac_quant_Q3: the 8-bit QTX table is already Q3; 10/12-bit scale down
    q = get_tables().ac_q(qindex, bd) >> (bd - 8)
    guess = (q * 20723 + 1015158 + (1 << 19)) >> 20
    if is_key:
        guess -= 4
    return int(np.clip(guess, 0, MAX_LOOP_FILTER))


def _filter4(p1, p0, q0, q1, mask, thresh, bd):
    """Vectorized filter4 (deblocking_common.c:214). Returns new p1,p0,q0,q1."""
    off = 0x80 << (bd - 8)
    lo, hi = -off, off - 1

    def c(x):
        return np.clip(x, lo, hi)

    ps1 = p1.astype(np.int32) - off
    ps0 = p0.astype(np.int32) - off
    qs0 = q0.astype(np.int32) - off
    qs1 = q1.astype(np.int32) - off
    hev = (np.abs(p1.astype(np.int32) - p0) > thresh) | (np.abs(q1.astype(np.int32) - q0) > thresh)
    f = np.where(hev, c(ps1 - qs1), 0)
    f = np.where(mask, c(f + 3 * (qs0 - ps0)), 0)
    f1 = c(f + 4) >> 3
    f2 = c(f + 3) >> 3
    oq0 = c(qs0 - f1) + off
    op0 = c(ps0 + f2) + off
    f3 = np.where(hev, 0, (f1 + 1) >> 1)
    oq1 = c(qs1 - f3) + off
    op1 = c(ps1 + f3) + off
    return op1, op0, oq0, oq1


def _rpot(v, n):
    return (v + (1 << (n - 1))) >> n


def _filter_edge(seg: np.ndarray, fsize: np.ndarray, level: int, sharpness: int, bd: int):
    """seg: (N, 14) int32 pixel neighborhood [p6..p0, q0..q6] per lane.
    fsize: per-lane filter size (0=none, 4, 6, 8, 14). Returns filtered seg."""
    blimit, limit, thresh = thresholds(level, sharpness, bd)
    p = [seg[:, 6 - i] for i in range(7)]   # p[0]=p0 ... p[6]=p6
    q = [seg[:, 7 + i] for i in range(7)]
    a = lambda x, y: np.abs(x - y)

    mask2 = ~((a(p[1], p[0]) > limit) | (a(q[1], q[0]) > limit)
              | (a(p[0], q[0]) * 2 + a(p[1], q[1]) // 2 > blimit))
    mask3 = mask2 & ~((a(p[2], p[1]) > limit) | (a(q[2], q[1]) > limit))
    mask4 = mask3 & ~((a(p[3], p[2]) > limit) | (a(q[3], q[2]) > limit))

    f1 = 1 << (bd - 8)
    flat3 = ~((a(p[1], p[0]) > f1) | (a(q[1], q[0]) > f1)
              | (a(p[2], p[0]) > f1) | (a(q[2], q[0]) > f1))
    flat4 = flat3 & ~((a(p[3], p[0]) > f1) | (a(q[3], q[0]) > f1))
    flat2 = ~((a(p[1 + 5], p[0]) > f1) | (a(q[6], q[0]) > f1)
              | (a(p[5], p[0]) > f1) | (a(q[5], q[0]) > f1)
              | (a(p[4], p[0]) > f1) | (a(q[4], q[0]) > f1))

    out = seg.copy()

    # narrow filter result (applies wherever wide conditions fail)
    m_narrow = {4: mask2, 6: mask3, 8: mask4, 14: mask4}
    for fs in (4, 6, 8, 14):
        lanes = fsize == fs
        if not lanes.any():
            continue
        mask = m_narrow[fs]
        n_p1, n_p0, n_q0, n_q1 = _filter4(p[1], p[0], q[0], q[1], mask, thresh, bd)
        if fs == 4:
            sel = lanes
            for idx, v in ((5, n_p1), (6, n_p0), (7, n_q0), (8, n_q1)):
                out[:, idx] = np.where(sel, v, out[:, idx])
            continue
        if fs == 6:
            wide = lanes & mask & flat3
            w_p1 = _rpot(p[2] * 3 + p[1] * 2 + p[0] * 2 + q[0], 3)
            w_p0 = _rpot(p[2] + p[1] * 2 + p[0] * 2 + q[0] * 2 + q[1], 3)
            w_q0 = _rpot(p[1] + p[0] * 2 + q[0] * 2 + q[1] * 2 + q[2], 3)
            w_q1 = _rpot(p[0] + q[0] * 2 + q[1] * 2 + q[2] * 3, 3)
            vals = {5: (w_p1, n_p1), 6: (w_p0, n_p0), 7: (w_q0, n_q0), 8: (w_q1, n_q1)}
            for idx, (wv, nv) in vals.items():
                out[:, idx] = np.where(lanes, np.where(wide, wv, nv), out[:, idx])
            continue
        # 8-tap core (shared by fs 8 and the fs 14 fallback)
        flat_ok = mask & flat4
        w8 = {
            4: _rpot(p[3] * 3 + 2 * p[2] + p[1] + p[0] + q[0], 3),
            5: _rpot(p[3] * 2 + p[2] + 2 * p[1] + p[0] + q[0] + q[1], 3),
            6: _rpot(p[3] + p[2] + p[1] + 2 * p[0] + q[0] + q[1] + q[2], 3),
            7: _rpot(p[2] + p[1] + p[0] + 2 * q[0] + q[1] + q[2] + q[3], 3),
            8: _rpot(p[1] + p[0] + q[0] + 2 * q[1] + q[2] + 2 * q[3], 3),
            9: _rpot(p[0] + q[0] + q[1] + 2 * q[2] + 3 * q[3], 3),
        }
        if fs == 8:
            vals = {5: n_p1, 6: n_p0, 7: n_q0, 8: n_q1}
            for idx in (4, 5, 6, 7, 8, 9):
                narrow = vals.get(idx, out[:, idx])
                out[:, idx] = np.where(lanes, np.where(flat_ok, w8[idx], narrow), out[:, idx])
            continue
        # fs == 14
        wide2 = flat_ok & flat2
        P = p
        Q = q
        w14 = {
            1: _rpot(P[6] * 7 + P[5] * 2 + P[4] * 2 + P[3] + P[2] + P[1] + P[0] + Q[0], 4),
            2: _rpot(P[6] * 5 + P[5] * 2 + P[4] * 2 + P[3] * 2 + P[2] + P[1] + P[0] + Q[0] + Q[1], 4),
            3: _rpot(P[6] * 4 + P[5] + P[4] * 2 + P[3] * 2 + P[2] * 2 + P[1] + P[0] + Q[0] + Q[1] + Q[2], 4),
            4: _rpot(P[6] * 3 + P[5] + P[4] + P[3] * 2 + P[2] * 2 + P[1] * 2 + P[0] + Q[0] + Q[1] + Q[2] + Q[3], 4),
            5: _rpot(P[6] * 2 + P[5] + P[4] + P[3] + P[2] * 2 + P[1] * 2 + P[0] * 2 + Q[0] + Q[1] + Q[2] + Q[3] + Q[4], 4),
            6: _rpot(P[6] + P[5] + P[4] + P[3] + P[2] + P[1] * 2 + P[0] * 2 + Q[0] * 2 + Q[1] + Q[2] + Q[3] + Q[4] + Q[5], 4),
            7: _rpot(P[5] + P[4] + P[3] + P[2] + P[1] + P[0] * 2 + Q[0] * 2 + Q[1] * 2 + Q[2] + Q[3] + Q[4] + Q[5] + Q[6], 4),
            8: _rpot(P[4] + P[3] + P[2] + P[1] + P[0] + Q[0] * 2 + Q[1] * 2 + Q[2] * 2 + Q[3] + Q[4] + Q[5] + Q[6] * 2, 4),
            9: _rpot(P[3] + P[2] + P[1] + P[0] + Q[0] + Q[1] * 2 + Q[2] * 2 + Q[3] * 2 + Q[4] + Q[5] + Q[6] * 3, 4),
            10: _rpot(P[2] + P[1] + P[0] + Q[0] + Q[1] + Q[2] * 2 + Q[3] * 2 + Q[4] * 2 + Q[5] + Q[6] * 4, 4),
            11: _rpot(P[1] + P[0] + Q[0] + Q[1] + Q[2] + Q[3] * 2 + Q[4] * 2 + Q[5] * 2 + Q[6] * 5, 4),
            12: _rpot(P[0] + Q[0] + Q[1] + Q[2] + Q[3] + Q[4] * 2 + Q[5] * 2 + Q[6] * 7, 4),
        }
        vals8 = {4: w8[4], 5: w8[5], 6: w8[6], 7: w8[7], 8: w8[8], 9: w8[9]}
        valsn = {5: n_p1, 6: n_p0, 7: n_q0, 8: n_q1}
        for idx in range(1, 13):
            mid = vals8.get(idx, out[:, idx])          # flat8 result
            narrow = valsn.get(idx, out[:, idx])       # filter4 fallback
            inner = np.where(flat_ok, mid, narrow)
            out[:, idx] = np.where(lanes, np.where(wide2, w14[idx], inner), out[:, idx])
    return out


class DeblockMaps:
    """Per-plane 4x4-unit maps recorded during encoding."""

    def __init__(self, h_units, w_units):
        self.txw = np.zeros((h_units, w_units), np.uint8)   # tx width px
        self.txh = np.zeros((h_units, w_units), np.uint8)
        self.skip = np.zeros((h_units, w_units), bool)
        self.bedge_v = np.zeros((h_units, w_units), bool)   # block left edges
        self.bedge_h = np.zeros((h_units, w_units), bool)   # block top edges


def deblock_plane(recon: np.ndarray, maps: DeblockMaps, plane: int,
                  level_v: int, level_h: int, sharpness: int, bd: int,
                  width: int, height: int):
    """In-place loop filter of one plane (vert pass then horz pass)."""
    if level_v == 0 and level_h == 0:
        return recon
    H, W = height, width
    hu, wu = (H + 3) >> 2, (W + 3) >> 2
    is_luma = plane == 0

    def fsize_for(t_cur, t_prev):
        m = np.minimum(t_cur, t_prev).astype(np.int32)
        if is_luma:
            return np.where(m >= 16, 14, np.where(m >= 8, 8, 4))
        return np.where(m >= 8, 6, 4)

    pad = 8
    buf = np.pad(recon.astype(np.int32), pad, mode="edge")

    from . import mc_native

    txw = np.ascontiguousarray(maps.txw)
    txh = np.ascontiguousarray(maps.txh)
    bev = np.ascontiguousarray(maps.bedge_v.view(np.uint8))
    beh = np.ascontiguousarray(maps.bedge_h.view(np.uint8))
    if mc_native.deblock_plane(buf, H, W, pad, txw, txh, bev, beh,
                               is_luma, level_v, level_h, sharpness,
                               bd) is not None:
        recon[:] = buf[pad : pad + recon.shape[0],
                       pad : pad + recon.shape[1]].astype(recon.dtype)
        return recon

    if level_v:
        for xu in range(1, wu):
            x = xu * 4
            if x >= W:
                break
            # tx == block in this encoder, so the block-edge map is the tx-edge map
            apply_u = maps.bedge_v[:hu, xu]
            if not apply_u.any():
                continue
            fs_u = fsize_for(maps.txw[:hu, xu], maps.txw[:hu, xu - 1])
            fs_u = np.where(apply_u, fs_u, 0)
            rows = np.arange(H)
            fs = fs_u[rows >> 2]
            if not (fs > 0).any():
                continue
            seg = np.stack([buf[pad : pad + H, pad + x - 7 + i] for i in range(14)], axis=1)
            outseg = _filter_edge(seg, fs, level_v, sharpness, bd)
            buf[pad : pad + H, pad + x - 7 : pad + x + 7] = outseg

    if level_h:
        for yu in range(1, hu):
            y = yu * 4
            if y >= H:
                break
            apply_u = maps.bedge_h[yu, :wu]
            if not apply_u.any():
                continue
            fs_u = fsize_for(maps.txh[yu, :wu], maps.txh[yu - 1, :wu])
            fs_u = np.where(apply_u, fs_u, 0)
            cols = np.arange(W)
            fs = fs_u[cols >> 2]
            if not (fs > 0).any():
                continue
            seg = np.stack([buf[pad + y - 7 + i, pad : pad + W] for i in range(14)], axis=1)
            outseg = _filter_edge(seg, fs, level_h, sharpness, bd)
            buf[pad + y - 7 : pad + y + 7, pad : pad + W] = outseg.T

    recon[:] = buf[pad : pad + recon.shape[0], pad : pad + recon.shape[1]].astype(recon.dtype)
    return recon
