"""AV1 quantization/dequantization, batched.

Behavior reference: svt_av1_build_quantizer + svt_aom_highbd_quantize_b_c
(Source/Lib/Codec/rc_process.c / full_loop.c:81-220, inv_transforms.c:3368+).
The dequant side (qcoeff * dequant / (1 << log_scale), truncating C division)
is the normative decoder reconstruction the encoder recon must match.

Includes the PSY sharpness modulation of zbin/rounding factors
(svt_av1_build_quantizer, SURVEY §2.6 item 4).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from .constants import TX_HEIGHT, TX_WIDTH, TxSize
from .spec_tables import get_tables

AOM_QM_BITS = 5

# av1_get_tx_scale_tab (full_loop.h:53): right-shift of dequantized values
TX_SCALE = np.array([0, 0, 0, 1, 2, 0, 0, 0, 0, 1, 1, 2, 2, 0, 0, 0, 0, 1, 1])


def dc_quant_qtx(qindex: int, delta: int, bd: int) -> int:
    return get_tables().dc_q(np.clip(qindex + delta, 0, 255), bd)


def ac_quant_qtx(qindex: int, delta: int, bd: int) -> int:
    return get_tables().ac_q(np.clip(qindex + delta, 0, 255), bd)


def get_qzbin_factor(q: int, bd: int) -> int:
    quant = dc_quant_qtx(q, 0, bd)
    thresh = {8: 148, 10: 592, 12: 2368}[bd]
    return 64 if q == 0 else (84 if quant < thresh else 80)


def invert_quant(d: int):
    """(quant, quant_shift) from a quantizer step (svt_aom_invert_quant)."""
    t = d
    l = 0
    while t > 1:
        t >>= 1
        l += 1
    m = 1 + (1 << (16 + l)) // d
    quant = np.int16(m - (1 << 16))
    shift = np.int16(1 << (16 - l))
    return int(quant), int(shift)


@dataclass(frozen=True)
class PlaneQuant:
    """Per-plane quantizer state for one qindex (dc at [0], ac at [1])."""

    zbin: tuple
    round: tuple
    quant: tuple
    quant_shift: tuple
    dequant: tuple


@functools.lru_cache(maxsize=512)
def build_plane_quant(
    qindex: int, dc_delta: int, ac_delta: int, bd: int = 8,
    sharpness: int = 0, base_qindex: int = -1,
) -> PlaneQuant:
    """One plane's quantizer for a given effective qindex.

    sharpness (PSY, -7..7) biases zbin/round like svt_av1_build_quantizer:
    diff between this qindex and the frame base qindex gates the offset."""
    q = qindex
    qzbin_factor = get_qzbin_factor(q, bd)
    qrounding_factor = 64 if q == 0 else 48
    if base_qindex >= 0 and sharpness != 0:
        diff = q - base_qindex
        if (sharpness > 0 and diff < 0) or (sharpness < 0 and diff > 0):
            offset = max(sharpness << 1, abs(diff)) if sharpness > 0 else min((-sharpness) << 1, diff)
            qzbin_factor += -offset if sharpness > 0 else offset
            qrounding_factor += offset if sharpness > 0 else -offset
            qzbin_factor = int(np.clip(qzbin_factor, 1, 256))
            qrounding_factor = int(np.clip(qrounding_factor, 1, 256))

    zbin, rnd, quant, qshift, deq = [], [], [], [], []
    for i, delta in enumerate((dc_delta, ac_delta)):
        step = dc_quant_qtx(q, delta, bd) if i == 0 else ac_quant_qtx(q, delta, bd)
        qv, qs = invert_quant(step)
        quant.append(qv)
        qshift.append(qs)
        zbin.append((qzbin_factor * step + 64) >> 7)  # ROUND_POWER_OF_TWO(x, 7)
        rnd.append((qrounding_factor * step) >> 7)
        deq.append(step)
    return PlaneQuant(tuple(zbin), tuple(rnd), tuple(quant), tuple(qshift), tuple(deq))


def eob_fast_trim(coeffs_flat, qc, dqc, eob, scan, pq, tx_size):
    """RDOQ eob-fast tier (update_coeff_eob_fast, full_loop.c:1092): walk
    back from eob zeroing trailing coefficients whose scaled magnitude sits
    under a widened zbin (dequant * ~1.547). Mutates qc/dqc, returns the new
    eob. Non-normative (encoder-side rate optimization)."""
    shift = int(TX_SCALE[int(tx_size)])
    deq_dc, deq_ac = int(pq.dequant[0]), int(pq.dequant[1])
    zbin = (deq_dc + ((deq_dc * 70 + 64) >> 7),
            deq_ac + ((deq_ac * 70 + 64) >> 7))
    e = int(eob)
    for i in range(e - 1, -1, -1):
        rc = int(scan[i])
        if ((int(abs(int(coeffs_flat[rc]))) << (1 + shift)) < zbin[rc != 0]
                or qc[rc] == 0):
            e -= 1
            qc[rc] = 0
            dqc[rc] = 0
        else:
            break
    return e


def quantize_b(
    coeffs: np.ndarray,
    scan: np.ndarray,
    pq: PlaneQuant,
    tx_size: int,
    qm: np.ndarray | None = None,
    iqm: np.ndarray | None = None,
):
    """Batched quantize (B, n) transform coefficients in raster order.

    scan: raster positions in scan order (len n).
    Returns (qcoeff (B,n) raster, dqcoeff (B,n) raster, eob (B,)).
    Matches svt_aom_highbd_quantize_b_c bit-exactly (verified vs oracle)."""
    B, n = coeffs.shape
    log_scale = int(TX_SCALE[int(tx_size)])
    if B == 1:
        # single-txb fast path through the C kernel (bit-identical)
        from . import mc_native

        r = mc_native.quantize_txb(coeffs[0], scan, pq, log_scale, qm, iqm)
        if r is not None:
            qc, dqc, eob = r
            return qc[None], dqc[None], np.array([eob], np.int32)
    is_ac = (np.arange(n) != 0).astype(np.int64)  # raster position 0 is DC

    # ROUND_POWER_OF_TWO(x, log_scale) applied to zbin/round per dc/ac:
    def rpot(v):
        return (v + (1 << (log_scale - 1))) >> log_scale if log_scale else v

    zbin_dc, zbin_ac = rpot(pq.zbin[0]), rpot(pq.zbin[1])
    rnd_dc, rnd_ac = rpot(pq.round[0]), rpot(pq.round[1])
    zbin = np.where(is_ac, zbin_ac, zbin_dc)
    rnd = np.where(is_ac, rnd_ac, rnd_dc)
    quant = np.where(is_ac, pq.quant[1], pq.quant[0])
    qshift = np.where(is_ac, pq.quant_shift[1], pq.quant_shift[0])
    deq = np.where(is_ac, pq.dequant[1], pq.dequant[0]).astype(np.int64)

    wt = (qm.astype(np.int64) if qm is not None else np.full(n, 1 << AOM_QM_BITS, np.int64))
    iwt = (iqm.astype(np.int64) if iqm is not None else np.full(n, 1 << AOM_QM_BITS, np.int64))

    c = coeffs.astype(np.int64)
    sign = c < 0
    abs_c = np.abs(c)
    live = abs_c * wt >= (zbin << AOM_QM_BITS)

    tmpw = (abs_c + rnd) * wt
    abs_q = (((tmpw * quant) >> 16) + tmpw) * qshift >> (16 - log_scale + AOM_QM_BITS)
    abs_q = np.where(live, abs_q, 0)
    qcoeff = np.where(sign, -abs_q, abs_q)

    dequant = (deq * iwt + (1 << (AOM_QM_BITS - 1))) >> AOM_QM_BITS
    abs_dq = (abs_q * dequant) >> log_scale
    dqcoeff = np.where(sign, -abs_dq, abs_dq)
    tmp32 = abs_q

    nz_in_scan = (tmp32[:, scan] != 0)
    any_nz = nz_in_scan.any(axis=1)
    last = n - 1 - np.argmax(nz_in_scan[:, ::-1], axis=1)
    eob = np.where(any_nz, last + 1, 0).astype(np.int32)
    return qcoeff.astype(np.int32), dqcoeff.astype(np.int32), eob


def dequant_coeffs(qcoeff: np.ndarray, pq: PlaneQuant, tx_size: int,
                   iqm: np.ndarray | None = None) -> np.ndarray:
    """Decoder-side reconstruction of dequantized coefficients (raster)."""
    B, n = qcoeff.shape
    log_scale = int(TX_SCALE[int(tx_size)])
    is_ac = (np.arange(n) != 0)
    deq = np.where(is_ac, pq.dequant[1], pq.dequant[0]).astype(np.int64)
    iwt = (iqm.astype(np.int64) if iqm is not None else np.full(n, 1 << AOM_QM_BITS, np.int64))
    dequant = (deq * iwt + (1 << (AOM_QM_BITS - 1))) >> AOM_QM_BITS
    q = qcoeff.astype(np.int64)
    abs_dq = (np.abs(q) * dequant) >> log_scale
    return np.where(q < 0, -abs_dq, abs_dq).astype(np.int32)


NOISE_NORM_THRESH = {1: 9, 2: 8, 3: 6, 4: 4}


def noise_normalize(coeffs, qcoeff, dqcoeff, eob, scan, pq: PlaneQuant,
                    tx_size: int, strength: int,
                    iqm: np.ndarray | None = None) -> int:
    """PSY noise normalization (svt_av1_perform_noise_normalization,
    full_loop.c:1466): boost or revive one AC coefficient whose quantized
    value lost disproportionate energy, preserving perceived noise texture.
    Mutates qcoeff/dqcoeff flat raster arrays in place; returns new eob."""
    if strength < 1 or eob < 1:
        return eob
    w = min(int(TX_WIDTH[tx_size]), 32)
    h = min(int(TX_HEIGHT[tx_size]), 32)
    if w == 4 and h == 4:
        return eob
    log_scale = int(TX_SCALE[int(tx_size)])
    thresh = NOISE_NORM_THRESH.get(int(strength), 4)

    def dqv(ci):
        d = pq.dequant[1 if ci else 0]
        if iqm is not None:
            d = (d * int(iqm[ci]) + (1 << (AOM_QM_BITS - 1))) >> AOM_QM_BITS
        return d

    best_si = -1
    best_gap = 1 << 62
    best_qc = best_dqc = 0
    if eob > 1:
        # textured: boost the last qualifying rounded-down AC coefficient
        for si in range(1, eob):
            ci = int(scan[si])
            tqc, qc, dqc = int(coeffs[ci]), int(qcoeff[ci]), int(dqcoeff[ci])
            if dqc == 0 or abs(tqc) - abs(dqc) <= 0:
                continue
            sign = 1 if tqc < 0 else 0
            abs_low = abs(qc) + 1
            d = dqv(ci)
            dqc_low = (abs_low * d) >> log_scale
            if sign:
                dqc_low = -dqc_low
            gap = abs(dqc_low - tqc)
            step = abs(dqc_low - dqc)
            if step == 0:
                continue
            ratio = ((step - gap) << 4) // step
            if ratio >= thresh:
                best_si = si
                best_qc = -abs_low if sign else abs_low
                best_dqc = dqc_low
    else:
        # flat: revive the zeroed AC coefficient with the smallest gap
        for si in range(1, (w * h) // 16):
            ci = int(scan[si])
            tqc, dqc = int(coeffs[ci]), int(dqcoeff[ci])
            if dqc != 0 or tqc == 0:
                continue
            sign = 1 if tqc < 0 else 0
            d = dqv(ci)
            dqc_low = d >> log_scale
            if sign:
                dqc_low = -dqc_low
            gap = abs(dqc_low - tqc)
            step = abs(dqc_low - dqc)
            if step == 0:
                continue
            ratio = ((step - gap) << 4) // step
            if ratio >= thresh and gap < best_gap:
                best_gap = gap
                best_si = si
                best_qc = -1 if sign else 1
                best_dqc = dqc_low
    if best_si > 0:
        ci = int(scan[best_si])
        qcoeff[ci] = best_qc
        dqcoeff[ci] = best_dqc
        if best_si >= eob:
            eob = best_si + 1
    return eob
