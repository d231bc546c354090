"""AV1 coefficient (transform block) entropy coding.

Behavior reference: av1_write_coeffs_txb_1d (entropy_coding.c:482-613),
context helpers in coefficients.h / common_utils.h / encode_txb_ref_c.c.

Context derivation is pure data-parallel math on the quantized level maps
and is fully vectorized in numpy (device-offloadable later); only the final
symbol emission (range coder + CDF adaptation) is sequential.
"""

from __future__ import annotations

import functools

import numpy as np

from ..bitstream.frame_context import FrameContext
from ..bitstream.range_coder import RangeEncoder
from .constants import TX_HEIGHT, TX_WIDTH, TxType
from .spec_tables import get_tables

TX_PAD_HOR = 4
COEFF_CONTEXT_BITS = 6
COEFF_CONTEXT_MASK = (1 << COEFF_CONTEXT_BITS) - 1
NUM_BASE_LEVELS = 2
COEFF_BASE_RANGE = 12
BR_CDF_SIZE = 4

TX_CLASS_2D, TX_CLASS_HORIZ, TX_CLASS_VERT = 0, 1, 2
# tx_type -> class (V_* are VERT, H_* are HORIZ, rest 2D)
TX_TYPE_CLASS = np.array([0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 2, 1, 2, 1, 2, 1])

# txs_ctx = (sqr + sqr_up + 1) >> 1 (entropy_coding.c:489)
_SQR = np.array([0, 1, 2, 3, 4, 0, 0, 1, 1, 2, 2, 3, 3, 0, 0, 1, 1, 2, 2])
_SQR_UP = np.array([0, 1, 2, 3, 4, 1, 1, 2, 2, 3, 3, 4, 4, 2, 2, 3, 3, 4, 4])
TXS_CTX = (_SQR + _SQR_UP + 1) >> 1
TXSIZE_LOG2_MINUS4 = np.array(
    [0, 2, 4, 6, 6, 1, 1, 3, 3, 5, 5, 6, 6, 2, 2, 4, 4, 5, 5]
)  # log2(min(w,32)*min(h,32)) - 4: TX_16X64/TX_64X16 code 16x32/32x16
#   areas = class 5 (spec eobMultisize), not 6

EOB_GROUP_START = np.array([0, 1, 2, 3, 5, 9, 17, 33, 65, 129, 257, 513], np.int16)
EOB_OFFSET_BITS = np.array([0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9], np.int16)

_EOB_TO_POS_SMALL = np.array(
    [0, 1, 2, 3, 3, 4, 4, 4, 4] + [5] * 8 + [6] * 16, np.int16
)
_EOB_TO_POS_LARGE = np.array([6, 7, 8, 8, 9, 9, 9, 9] + [10] * 8 + [11], np.int16)

NZ_MAP_CTX_OFFSET_1D = np.array([0, 5] + [10] * 30)

_EOB_MULTI_TABLE = ["eob_multi16", "eob_multi32", "eob_multi64", "eob_multi128",
                    "eob_multi256", "eob_multi512", "eob_multi1024"]


def get_eob_pos_token(eob: int):
    if eob < 33:
        t = int(_EOB_TO_POS_SMALL[eob])
    else:
        t = int(_EOB_TO_POS_LARGE[min((eob - 1) >> 5, 16)])
    return t, eob - int(EOB_GROUP_START[t])


def txb_dims(tx_size: int):
    """(clipped_width, clipped_height, bwl) of the coded coefficient area."""
    w = min(int(TX_WIDTH[tx_size]), 32)
    h = min(int(TX_HEIGHT[tx_size]), 32)
    return w, h, int(np.log2(w))


def init_levels(qcoeff: np.ndarray, w: int, h: int) -> np.ndarray:
    """Padded |level| map, uint8 (svt_av1_txb_init_levels): (h+4, w+4)."""
    lv = np.zeros((h + TX_PAD_HOR, w + TX_PAD_HOR), np.uint8)
    lv[:h, :w] = np.minimum(np.abs(qcoeff.reshape(h, w)), 127).astype(np.uint8)
    return lv


def nz_map_contexts(levels: np.ndarray, scan: np.ndarray, eob: int, tx_size: int,
                    tx_class: int) -> np.ndarray:
    """coeff_base context per scan index (vectorized get_nz_map_ctx)."""
    t = get_tables()
    w, h, bwl = txb_dims(tx_size)
    clip = np.minimum(levels, 3).astype(np.int32)
    if tx_class == TX_CLASS_2D:
        mag = (clip[:-4, 1:-3] + clip[1:-3, :-4] + clip[1:-3, 1:-3]
               + clip[:-4, 2:-2] + clip[2:-2, :-4])
    elif tx_class == TX_CLASS_VERT:
        mag = (clip[:-4, 1:-3] + clip[1:-3, :-4] + clip[2:-2, :-4]
               + clip[3:-1, :-4] + clip[4:, :-4])
    else:
        mag = (clip[:-4, 1:-3] + clip[1:-3, :-4] + clip[:-4, 2:-2]
               + clip[:-4, 3:-1] + clip[:-4, 4:])
    ctx = np.minimum((mag + 1) >> 1, 4).reshape(-1)  # (h*w,) raster
    if tx_class == TX_CLASS_2D:
        off = t._raw[f"nzmap_ctx_offset_ts{int(tx_size)}"][: w * h].astype(np.int32)
        base = ctx + off
        base[0] = 0  # (tx_class | coeff_idx) == 0
    else:
        pos = np.arange(w * h)
        row, col = pos >> bwl, pos & (w - 1)
        axis = col if tx_class == TX_CLASS_HORIZ else row
        base = ctx + NZ_MAP_CTX_OFFSET_1D[axis]
    # eob-position override for the last coeff (get_nz_map_ctx is_eob branch)
    out = base[scan[:eob]].copy()
    si = np.arange(eob)
    eob_ctx = np.where(si == 0, 0, np.where(si <= (w * h) // 8, 1,
                       np.where(si <= (w * h) // 4, 2, 3)))
    out[eob - 1] = eob_ctx[eob - 1]
    return out


def br_ctx_map(levels: np.ndarray, tx_size: int, tx_class: int) -> np.ndarray:
    """get_br_ctx for every raster position (vectorized)."""
    w, h, bwl = txb_dims(tx_size)
    lv = levels.astype(np.int32)
    mag = lv[:-4, 1:-3] + lv[1:-3, :-4]
    if tx_class == TX_CLASS_2D:
        mag = mag + lv[1:-3, 1:-3]
    elif tx_class == TX_CLASS_HORIZ:
        mag = mag + lv[:-4, 2:-2]
    else:
        mag = mag + lv[2:-2, :-4]
    mag = np.minimum((mag + 1) >> 1, 6)
    pos = np.arange(w * h)
    row, col = pos >> bwl, pos & (w - 1)
    mag = mag.reshape(-1)
    if tx_class == TX_CLASS_2D:
        off = np.where(pos == 0, 0, np.where((row < 2) & (col < 2), 7, 14))
    elif tx_class == TX_CLASS_HORIZ:
        off = np.where(pos == 0, 0, np.where(col == 0, 7, 14))
    else:
        off = np.where(pos == 0, 0, np.where(row == 0, 7, 14))
    return mag + off


def write_golomb(enc: RangeEncoder, level: int):
    """Exp-Golomb for the coefficient remainder (write_golomb)."""
    x = level + 1
    length = x.bit_length()
    for _ in range(length - 1):
        enc.encode_bool(0, 16384)
    for i in range(length - 1, -1, -1):
        enc.encode_bool((x >> i) & 1, 16384)


def write_coeffs_txb(
    fc: FrameContext,
    enc: RangeEncoder,
    qcoeff: np.ndarray,          # (n,) raster order, clipped coeff area
    eob: int,
    tx_size: int,
    tx_type: int,
    plane_type: int,             # 0 luma, 1 chroma
    txb_skip_ctx: int,
    dc_sign_ctx: int,
    tx_type_writer=None,         # called after the skip symbol when eob > 0
) -> int:
    """Write one transform block's coefficients; returns cul_level | dc sign
    (the value stored into the above/left entropy context arrays)."""
    txs_ctx = int(TXS_CTX[tx_size])
    fc.write(enc, "txb_skip", (txs_ctx, txb_skip_ctx), int(eob == 0), 2)
    if eob == 0:
        return 0
    if tx_type_writer is not None:
        tx_type_writer()

    t = get_tables()
    tx_class = int(TX_TYPE_CLASS[tx_type])
    w, h, bwl = txb_dims(tx_size)
    scan = t.scan(tx_size, tx_type)
    levels = init_levels(qcoeff, w, h)

    # --- eob position
    eob_pt, eob_extra = get_eob_pos_token(eob)
    eob_multi_size = int(TXSIZE_LOG2_MINUS4[tx_size])
    eob_multi_ctx = 0 if tx_class == TX_CLASS_2D else 1
    fc.write(enc, _EOB_MULTI_TABLE[eob_multi_size], (plane_type, eob_multi_ctx),
             eob_pt - 1, eob_multi_size + 5)
    bits = int(EOB_OFFSET_BITS[eob_pt])
    if bits > 0:
        bit = (eob_extra >> (bits - 1)) & 1
        # table is 22 contexts wide, indexed by eob_pt directly (rows 0-2 dummy)
        fc.write(enc, "eob_extra", (txs_ctx, plane_type, eob_pt), bit, 2)
        for i in range(1, bits):
            enc.encode_bool((eob_extra >> (bits - 1 - i)) & 1, 16384)

    # --- base + br levels, reverse scan order
    coeff_ctxs = nz_map_contexts(levels, scan, eob, tx_size, tx_class)
    brmap = br_ctx_map(levels, tx_size, tx_class)
    absq = np.abs(qcoeff)
    for c in range(eob - 1, -1, -1):
        pos = int(scan[c])
        level = int(absq[pos])
        cctx = int(coeff_ctxs[c])
        if c == eob - 1:
            fc.write(enc, "coeff_base_eob_multi", (txs_ctx, plane_type, cctx),
                     min(level, 3) - 1, 3)
        else:
            fc.write(enc, "coeff_base_multi", (txs_ctx, plane_type, cctx),
                     min(level, 3), 4)
        if level > NUM_BASE_LEVELS:
            base_range = level - 1 - NUM_BASE_LEVELS
            br_ctx = int(brmap[pos])
            for idx in range(0, COEFF_BASE_RANGE, BR_CDF_SIZE - 1):
                k = min(base_range - idx, BR_CDF_SIZE - 1)
                fc.write(enc, "coeff_lps_multi", (min(txs_ctx, 3), plane_type, br_ctx),
                         k, BR_CDF_SIZE)
                if k < BR_CDF_SIZE - 1:
                    break

    # --- signs + golomb remainders, forward scan order
    cul_level = 0
    for c in range(eob):
        pos = int(scan[c])
        v = int(qcoeff[pos])
        level = abs(v)
        cul_level += level
        if level:
            sign = 1 if v < 0 else 0
            if c == 0:
                fc.write(enc, "dc_sign", (plane_type, dc_sign_ctx), sign, 2)
            else:
                enc.encode_bool(sign, 16384)
            if level > COEFF_BASE_RANGE + NUM_BASE_LEVELS:
                write_golomb(enc, level - COEFF_BASE_RANGE - 1 - NUM_BASE_LEVELS)

    cul_level = min(COEFF_CONTEXT_MASK, cul_level)
    dc = int(qcoeff[0])
    if dc < 0:
        cul_level |= 1 << COEFF_CONTEXT_BITS
    elif dc > 0:
        cul_level += 2 << COEFF_CONTEXT_BITS
    return cul_level


def write_coeffs_txb_native(
    fc: FrameContext,
    enc,                          # NativeRangeEncoder
    qcoeff: np.ndarray,
    eob: int,
    tx_size: int,
    tx_type: int,
    plane_type: int,
    txb_skip_ctx: int,
    dc_sign_ctx: int,
    tx_type_writer=None,
) -> int:
    """One-call-per-txb C fast path; bit-identical to write_coeffs_txb."""
    txs_ctx = int(TXS_CTX[tx_size])
    skip_row = fc.tables["txb_skip"][txs_ctx, txb_skip_ctx]
    if fc.disable_update:
        enc.encode_symbol(int(eob == 0), skip_row, 2)
    else:
        enc.encode_symbol_adapt(int(eob == 0), skip_row, 2)
    if eob == 0:
        return 0
    if tx_type_writer is not None:
        tx_type_writer()

    tx_class = int(TX_TYPE_CLASS[tx_type])
    w, h, _ = txb_dims(tx_size)
    scan, off2d = _scan_and_off2d(tx_size, tx_type, tx_class)

    eob_multi_size = int(TXSIZE_LOG2_MINUS4[tx_size])
    eob_multi_ctx = 0 if tx_class == TX_CLASS_2D else 1
    tb = fc.tables
    q32 = np.ascontiguousarray(qcoeff, np.int32)
    return enc.write_coeffs_txb_full(
        q32, w, h, eob, scan, tx_class, off2d,
        0 if fc.disable_update else 1,
        tb[_EOB_MULTI_TABLE[eob_multi_size]][plane_type, eob_multi_ctx],
        eob_multi_size + 5,
        tb["eob_extra"][txs_ctx, plane_type],
        tb["coeff_base_eob_multi"][txs_ctx, plane_type],
        tb["coeff_base_multi"][txs_ctx, plane_type],
        tb["coeff_lps_multi"][min(txs_ctx, 3), plane_type],
        tb["dc_sign"][plane_type, dc_sign_ctx],
    )


@functools.lru_cache(maxsize=None)
def _scan_and_off2d(tx_size: int, tx_type: int, tx_class: int):
    """Cached (scan int16 contiguous, nz 2-D offset table int8 or None)."""
    t = get_tables()
    scan = np.ascontiguousarray(t.scan(tx_size, tx_type), np.int16)
    if tx_class != TX_CLASS_2D:
        return scan, None
    w, h, _ = txb_dims(tx_size)
    off = np.ascontiguousarray(
        t._raw[f"nzmap_ctx_offset_ts{int(tx_size)}"][: w * h], np.int8)
    return scan, off


# --------------------------------------------------------------------------
# txb skip / dc sign contexts from the per-4x4 entropy context arrays
# (svt_aom_get_txb_ctx, entropy_coding.c:313-430)
# --------------------------------------------------------------------------

_SKIP_CONTEXTS = np.array(
    [[1, 2, 2, 2, 3], [1, 4, 4, 4, 5], [1, 4, 4, 4, 5], [1, 4, 4, 4, 5], [1, 4, 4, 4, 6]]
)


def get_txb_ctx(
    plane: int,
    tx_size: int,
    above_ctx: np.ndarray,  # per-4x4 entropy context values over the txb width
    left_ctx: np.ndarray,   # over the txb height (already clipped to frame)
    block_matches_tx: bool,
    bigger_than_tx: bool,
):
    """Returns (txb_skip_ctx, dc_sign_ctx). above/left values are the
    cul_level|dc_sign bytes previously stored; empty arrays = unavailable."""
    signs = 0
    for arr in (above_ctx, left_ctx):
        if len(arr):
            s = arr.astype(np.int32) >> COEFF_CONTEXT_BITS
            signs += int(np.sum(np.where(s == 1, -1, np.where(s == 2, 1, 0))))
    dc_sign_ctx = 2 if signs > 0 else (1 if signs < 0 else 0)

    if plane == 0:
        if block_matches_tx:
            return 0, dc_sign_ctx
        top = int(np.bitwise_or.reduce(above_ctx)) & COEFF_CONTEXT_MASK if len(above_ctx) else 0
        left = int(np.bitwise_or.reduce(left_ctx)) & COEFF_CONTEXT_MASK if len(left_ctx) else 0
        mx = min(top | left, 4)
        mn = min(min(top, left), 4)
        return int(_SKIP_CONTEXTS[mn][mx]), dc_sign_ctx
    ctx_base = int((len(above_ctx) and (above_ctx != 0).any())) + int(
        (len(left_ctx) and (left_ctx != 0).any())
    )
    ctx_offset = 10 if bigger_than_tx else 7
    return ctx_base + ctx_offset, dc_sign_ctx
