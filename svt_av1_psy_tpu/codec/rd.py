"""Rate-distortion cost model: lambda from qindex + CDF-derived rate tables.

Behavior references:
  - svt_aom_compute_rd_mult_based_on_qindex (rc_process.c:1040): lambda =
    dc_qstep^2 * frame-type multiplier, >>4 for 10-bit.
  - svt_aom_compute_rd_mult (rc_process.c:1077): frame-position factor >>7.
  - RDCOST (rd_cost.h:37): cost = (rate * rdmult) >> 9 + dist << 7, rate in
    1/512-bit units (av1_cost_symbol, md_rate_estimation.c:33).
  - md_rate_estimation.c: per-frame symbol cost tables built from the
    (default) CDFs; the device search uses context-averaged versions of the
    same tables (the reference's pic_based_rate_est analog).

The tables produced here feed the batched device search (ops/intra_search):
they are plain numpy arrays uploaded once per (qindex-bucket, frame-type).
"""

from __future__ import annotations

import functools

import numpy as np

from ..bitstream.frame_context import FrameContext
from .constants import TxSize
from .quant import dc_quant_qtx

AV1_PROB_COST_SHIFT = 9
RDDIV_BITS = 7

# frame-update rd multipliers (rc_process.c:1028-1038) and position factors
# (rc_process.c:1072)
_KF_MULT = (3.3, 0.0035)
_ARF_MULT = (3.25, 0.0035)
_INTER_MULT = (3.2, 0.0035)
_FRAME_TYPE_FACTOR = {"kf": 140, "arf": 180, "gf": 128, "lf": 140, "intnl_arf": 164}


def rd_mult(qindex: int, bd: int = 8, update_type: str = "kf") -> int:
    """rdmult (lambda in RDCOST units) for a frame qindex."""
    q = dc_quant_qtx(int(qindex), 0, bd)
    base, slope = {"kf": _KF_MULT, "arf": _ARF_MULT, "gf": _ARF_MULT}.get(
        update_type, _INTER_MULT)
    rdmult = q * q * (base + slope * qindex)
    if bd == 10:
        rdmult = (rdmult + 8) / 16
    elif bd == 12:
        rdmult = (rdmult + 128) / 256
    rdmult = rdmult * _FRAME_TYPE_FACTOR.get(update_type, 140) / 128
    return max(int(rdmult), 1)


def lambda_sse_per_bit(qindex: int, bd: int = 8, update_type: str = "kf") -> float:
    """Lambda in natural units: SSE cost of one bit of rate. RDCOST is
    (R512 * RM) >> 9 + D << 7, so one bit (512 units) costs RM * 512 / 2^9
    against D * 128 -> lambda = RM / 128."""
    return rd_mult(qindex, bd, update_type) / (1 << RDDIV_BITS)


def cdf_bits(icdf_row: np.ndarray, nsyms: int) -> np.ndarray:
    """Per-symbol cost in bits (float) from an inverse-CDF row."""
    prev = 32768.0
    out = np.zeros(nsyms, np.float64)
    for i in range(nsyms):
        p = max(prev - float(icdf_row[i]), 4.0)  # EC_MIN_PROB floor
        out[i] = -np.log2(p / 32768.0)
        prev = float(icdf_row[i])
    return out


def _avg_ctx_bits(table: np.ndarray, nsyms: int) -> np.ndarray:
    """Average symbol costs over all leading context dims of a CDF table."""
    rows = table.reshape(-1, table.shape[-1])
    return np.mean([cdf_bits(r, nsyms) for r in rows], axis=0)


# TXS_CTX (coeff_coding): tx-size context class 0..4 by min(sqr, sqr_up) avg
_TXS_CTX = np.array([0, 1, 2, 3, 4, 1, 1, 2, 2, 3, 3, 4, 4, 1, 1, 2, 2, 3, 3])
_EOB_TABLE = {0: ("eob_multi16", 5), 1: ("eob_multi32", 6), 2: ("eob_multi64", 7),
              3: ("eob_multi128", 8), 4: ("eob_multi256", 9),
              5: ("eob_multi512", 10), 6: ("eob_multi1024", 11)}
_TXSIZE_LOG2_MINUS4 = np.array([0, 2, 4, 6, 6, 1, 1, 3, 3, 5, 5, 6, 6, 2, 2, 4, 4, 6, 6])


class IntraRateModel:
    """Context-averaged rate tables for the open-loop device search.

    All arrays are in float bits (not 1/512 units); the search multiplies by
    lambda_sse_per_bit directly. Built once per qindex bucket + frame type.
    """

    def __init__(self, qindex: int):
        fc = FrameContext(qindex, disable_cdf_update=True)
        t = fc.tables

        # kf y-mode cost averaged over the 5x5 neighbor-context grid, plus
        # the angle_delta==0 symbol for directional modes
        self.y_mode_bits = _avg_ctx_bits(t["kf_y_mode"], 13).astype(np.float32)
        ad = _avg_ctx_bits(t["angle_delta"], 7)
        self.y_mode_bits[1:9] += np.float32(ad[3])  # delta 0 -> symbol 3

        # partition bits per bsl (8->0 .. 64->3): cost of NONE and SPLIT,
        # averaged over the 4 (above, left) neighbor contexts
        part = t["partition"]  # (20, 11) contexts x syms
        self.part_none_bits = np.zeros(5, np.float32)
        self.part_split_bits = np.zeros(5, np.float32)
        self.part_horz_bits = np.zeros(5, np.float32)
        self.part_vert_bits = np.zeros(5, np.float32)
        for bsl in range(5):
            nsyms = 4 if bsl == 0 else (8 if bsl == 4 else 10)
            costs = _avg_ctx_bits(part[bsl * 4:(bsl + 1) * 4], nsyms)
            self.part_none_bits[bsl] = costs[0]
            self.part_split_bits[bsl] = costs[3]
            self.part_horz_bits[bsl] = costs[1]
            self.part_vert_bits[bsl] = costs[2]

        # skip flag (averaged over ctx)
        sk = _avg_ctx_bits(t["skip"], 2)
        self.skip_bits = np.float32(sk[1])
        self.noskip_bits = np.float32(sk[0])

        # intra tx-type sets: bits per tx symbol, averaged over intra modes
        # (intra_ext_tx cdf is (eset, sqr, mode, syms))
        ext = t["intra_ext_tx"]
        self.ext_tx_bits = {}
        for eset, nsyms in ((1, 7), (2, 5)):
            for sqr in range(4):
                self.ext_tx_bits[(eset, sqr)] = _avg_ctx_bits(
                    ext[eset, sqr], nsyms).astype(np.float32)

        # --- coefficient model per txs_ctx class, luma
        self.coeff = {}
        for txs in range(5):
            self.coeff[txs] = self._coeff_tables(t, txs)

        # eob position bits per tx size-log2-minus-4 class (n = coded coeffs)
        self.eob = {}
        for lg, n in ((0, 16), (1, 32), (2, 64), (3, 128), (4, 256),
                      (5, 512), (6, 1024)):
            self.eob[lg] = self.eob_bits_for_txsize(t, n, lg)

    def _coeff_tables(self, t, txs_ctx: int, plane: int = 0):
        """(txb_skip0, txb_skip1, level_bits[64], eob_pt_bits[11]) for one
        tx-size class: the flattened LV_MAP cost model. Level costs include
        base symbol + base-range increments + golomb tail + sign."""
        tb = _avg_ctx_bits(t["txb_skip"][txs_ctx], 2)
        base = _avg_ctx_bits(t["coeff_base_multi"][min(txs_ctx, 4), plane], 4)
        lps = _avg_ctx_bits(t["coeff_lps_multi"][min(txs_ctx, 3), plane], 4)
        level_bits = np.zeros(64, np.float32)
        level_bits[0] = base[0]
        for lvl in range(1, 64):
            b = base[min(lvl, 3)] + 1.0  # sign bit
            if lvl > 2:
                br = lvl - 3  # base_range counts above NUM_BASE_LEVELS+1
                for idx in range(0, 12, 3):
                    k = min(br - idx, 3)
                    b += lps[k]
                    if k < 3:
                        break
                if lvl > 14:
                    rem = lvl - 15
                    b += 2 * (rem + 1).bit_length() - 1  # exp-golomb tail
            level_bits[lvl] = b
        return {"txb_skip": tb.astype(np.float32),
                "level_bits": level_bits}

    def eob_bits_for_txsize(self, t_eob_tables: dict, n: int,
                            size_log2m4: int) -> np.ndarray:
        """eob_bits[e] for e in 0..n: cost of the eob position symbol plus
        its literal offset bits (eob=0 entry unused; txb_skip covers it)."""
        name, nsyms = _EOB_TABLE[size_log2m4]
        pt_bits = _avg_ctx_bits(t_eob_tables[name], nsyms)
        from .coeff_coding import EOB_OFFSET_BITS, get_eob_pos_token

        out = np.zeros(n + 1, np.float32)
        for e in range(1, n + 1):
            pt, _extra = get_eob_pos_token(e)
            out[e] = pt_bits[pt - 1] + int(EOB_OFFSET_BITS[pt])
        return out


@functools.lru_cache(maxsize=8)
def _rate_model_for_bucket(bucket: int) -> IntraRateModel:
    # representative qindex per coefficient-CDF quantizer context bucket
    return IntraRateModel({0: 10, 1: 40, 2: 90, 3: 160}[bucket])


def intra_rate_model(qindex: int) -> IntraRateModel:
    """Bucketed by the coefficient-CDF quantizer context (the only
    qindex-dependence of the default tables), so the model and the derived
    device tables are shared across frames."""
    from ..bitstream.frame_context import _coeff_qctx

    return _rate_model_for_bucket(_coeff_qctx(int(qindex)))
