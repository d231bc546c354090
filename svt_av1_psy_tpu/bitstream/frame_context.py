"""Per-frame adaptive CDF context (the reference's FRAME_CONTEXT analog).

Holds mutable copies of all default CDF tables, indexed by name; symbols are
written through `write()` which also applies the normative per-symbol
adaptation (unless disable_cdf_update).
"""

from __future__ import annotations

import numpy as np

from ..codec.spec_tables import get_tables
from .range_coder import RangeEncoder, update_cdf


class FrameContext:
    def __init__(self, base_qindex: int, disable_cdf_update: bool = False):
        t = get_tables()
        self.disable_update = disable_cdf_update
        self.tables = {}
        for name in t.names():
            if name.startswith("cdf_"):
                self.tables[name[4:]] = np.array(t._raw[name], dtype=np.uint16, copy=True)
        self.qctx = _coeff_qctx(base_qindex)
        # pre-slice the quantizer-context dimension of the coefficient CDFs
        for name in ("txb_skip", "eob_extra", "dc_sign", "coeff_base_multi",
                     "coeff_base_eob_multi", "coeff_lps_multi", "eob_multi16",
                     "eob_multi32", "eob_multi64", "eob_multi128", "eob_multi256",
                     "eob_multi512", "eob_multi1024"):
            self.tables[name] = self.tables[name][self.qctx].copy()

    def write(self, enc, name: str, idx: tuple, symbol: int, nsyms: int):
        cdf = self.tables[name]
        row = cdf[idx] if idx else cdf
        if self.disable_update:
            enc.encode_symbol(symbol, row, nsyms)
        else:
            enc.encode_symbol_adapt(symbol, row, nsyms)

    def row(self, name: str, idx: tuple):
        cdf = self.tables[name]
        return cdf[idx] if idx else cdf


def _coeff_qctx(base_qindex: int) -> int:
    if base_qindex <= 20:
        return 0
    if base_qindex <= 60:
        return 1
    if base_qindex <= 120:
        return 2
    return 3
