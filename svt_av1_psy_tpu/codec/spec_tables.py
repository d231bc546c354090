"""Loader for AV1 spec-constant tables (see tools/extract_spec_tables.py).

Default CDFs are stored in the codec's internal "inverted" form:
icdf[i] = 32768 - cdf[i] (AOM_ICDF), with one trailing adaptation-counter
element per row (value 0). Ragged tables (where symbol count varies per
context) are zero-padded to their declared C dimensions at load.
"""

from __future__ import annotations

import functools
import json
from pathlib import Path

import numpy as np

_TABLE_DIR = Path(__file__).resolve().parent / "tables"


def _pad_rows(flat: np.ndarray, row_lens: list, pad_to: int) -> np.ndarray:
    """Re-inflate a ragged flat initializer into padded rows."""
    out = np.zeros((len(row_lens), pad_to), dtype=flat.dtype)
    pos = 0
    for i, n in enumerate(row_lens):
        out[i, :n] = flat[pos : pos + n]
        pos += n
    assert pos == len(flat), (pos, len(flat))
    return out


class SpecTables:
    def __init__(self):
        z = np.load(_TABLE_DIR / "av1_spec_tables.npz")
        self._raw = {k: z[k] for k in z.files}
        self._scan_map = json.loads((_TABLE_DIR / "scan_order_map.json").read_text())
        self._fixup_ragged()

    def __getattr__(self, name):
        raw = self.__dict__.get("_raw")
        if raw is not None and name in raw:
            return raw[name]
        raise AttributeError(name)

    def _fixup_ragged(self):
        r = self._raw
        # uv_mode: [CFL_ALLOWED=2][INTRA_MODES=13][CDF_SIZE(14)=15]
        if r["cdf_uv_mode"].ndim == 1:
            rows = [14] * 13 + [15] * 13
            r["cdf_uv_mode"] = _pad_rows(r["cdf_uv_mode"], rows, 15).reshape(2, 13, 15)
        # partition: 20 contexts; 8x8 ctxs have 4 symbols, 128x128 have 8, rest 10
        if r["cdf_partition"].ndim == 1:
            rows = [5] * 4 + [11] * 12 + [9] * 4
            r["cdf_partition"] = _pad_rows(r["cdf_partition"], rows, 11)
        # intra_ext_tx: [3][4][13][CDF_SIZE(16)=17]; set0 empty, set1 7sym, set2 5sym
        if r["cdf_intra_ext_tx"].ndim == 1:
            rows = [1] * 52 + [8] * 52 + [6] * 52
            r["cdf_intra_ext_tx"] = _pad_rows(r["cdf_intra_ext_tx"], rows, 17).reshape(3, 4, 13, 17)
        # inter_ext_tx: [4][4][17]; sets 0..3 have 0,16,12,2 symbols
        if r["cdf_inter_ext_tx"].ndim == 1:
            rows = [1] * 4 + [17] * 4 + [13] * 4 + [3] * 4
            r["cdf_inter_ext_tx"] = _pad_rows(r["cdf_inter_ext_tx"], rows, 17).reshape(4, 4, 17)
        # palette color index: [PALETTE_SIZES=7][5 ctx][CDF_SIZE(8)=9]
        for key in ("cdf_palette_y_color_index", "cdf_palette_uv_color_index"):
            if r[key].ndim == 1:
                rows = [n + 2 for n in range(1, 8) for _ in range(5)]
                r[key] = _pad_rows(r[key], rows, 9).reshape(7, 5, 9)
        # tx_size: [MAX_TX_CATS=4][TX_SIZE_CONTEXTS=3][CDF_SIZE(3)=4]; cat0 2sym
        if r["cdf_tx_size"].ndim == 1:
            rows = [3] * 3 + [4] * 9
            r["cdf_tx_size"] = _pad_rows(r["cdf_tx_size"], rows, 4).reshape(4, 3, 4)

    # ---------------------------------------------------------------- quant
    def dc_q(self, qindex: int, bit_depth: int = 8) -> int:
        key = {8: "dc_qlookup", 10: "dc_qlookup_10", 12: "dc_qlookup_12"}[bit_depth]
        return int(self._raw[key][np.clip(qindex, 0, 255)])

    def ac_q(self, qindex: int, bit_depth: int = 8) -> int:
        key = {8: "ac_qlookup", 10: "ac_qlookup_10", 12: "ac_qlookup_12"}[bit_depth]
        return int(self._raw[key][np.clip(qindex, 0, 255)])

    # ---------------------------------------------------------------- scans
    def scan(self, tx_size: int, tx_type: int) -> np.ndarray:
        """Scan-order position list: scan[i] = raster index of i-th coeff."""
        name = self._scan_map[tx_size][tx_type]
        return self._raw[f"scan_{name}"]

    def iscan(self, tx_size: int, tx_type: int) -> np.ndarray:
        s = self.scan(tx_size, tx_type)
        inv = np.empty_like(s)
        inv[s] = np.arange(len(s), dtype=s.dtype)
        return inv

    def cdf(self, name: str) -> np.ndarray:
        return self._raw[f"cdf_{name}"]

    def names(self):
        return sorted(self._raw)


@functools.lru_cache(maxsize=None)
def get_tables() -> SpecTables:
    return SpecTables()
